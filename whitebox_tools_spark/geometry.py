"""Vectorized numpy geometry kernels (the pandas-UDF hot path).

Each kernel pins the exact semantics of the reference implementation it
re-answers (file:line cites into /root/reference) so that outputs are
row-identical. All kernels are vectorized over points (O(edges) numpy passes
over the whole point vector) — no per-row Python.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Winding-number even-odd point-in-polygon
# (whitebox-common/src/algorithms/poly_ops.rs:41-72; even-odd modulo at :33;
#  boundary points are OUTSIDE per doc :26-27 and test :198-210)
# ---------------------------------------------------------------------------
def winding_number(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Winding number of each point wrt one closed ring (first==last vertex).

    Vectorized transcription of the reference's crossing rules:
      upward crossing  (y0 <= py < y1)  and point strictly left  -> wn += 1
      downward crossing (y1 <= py < y0) and point strictly right -> wn -= 1
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 2:
        return np.zeros(len(px), dtype=np.int64)
    if xs[0] != xs[-1] or ys[0] != ys[-1]:
        raise ValueError("ring must be closed (first vertex == last vertex)")
    wn = np.zeros(len(px), dtype=np.int64)
    for i in range(len(xs) - 1):
        x0, y0, x1, y1 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        is_left = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
        up = (y0 <= py) & (y1 > py) & (is_left > 0.0)
        dn = (y0 > py) & (y1 <= py) & (is_left < 0.0)
        wn += up.astype(np.int64)
        wn -= dn.astype(np.int64)
    return wn


def point_in_ring(px, py, xs, ys) -> np.ndarray:
    """Even-odd containment (poly_ops.rs:33: winding_number % 2 != 0)."""
    return winding_number(px, py, xs, ys) % 2 != 0


def point_in_parts(px, py, parts: list[tuple[np.ndarray, np.ndarray, bool]]) -> np.ndarray:
    """Multi-part polygon containment with the reference Clip point-case
    resolution (gis_analysis/clip.rs:299-370): parts are tested IN ORDER; a
    containing shell sets keep=True, a containing hole sets keep=False,
    later parts win.

    parts: list of (xs, ys, is_hole) closed rings in part order.
    """
    keep = np.zeros(len(np.asarray(px)), dtype=bool)
    for xs, ys, is_hole in parts:
        inside = point_in_ring(px, py, xs, ys)
        keep = np.where(inside, not is_hole, keep)
    return keep


def segment_split_ts(
    px0: float, py0: float, px1: float, py1: float,
    ex0: np.ndarray, ey0: np.ndarray, ex1: np.ndarray, ey1: np.ndarray,
) -> np.ndarray:
    """Parametric positions t in (0, 1) where segment P = p0 + t*(p1-p0)
    properly crosses any of the edges (e0 -> e1), vectorized over edges.

    Same role as the reference's find_split_points_at_line_intersections
    (whitebox-common/src/algorithms/line_ops.rs:138). t is rounded to 9
    decimals (and deduplicated) so the DuckDB oracle — which evaluates the
    *identical* IEEE-754 expression — produces bit-equal split points;
    rounding also collapses the duplicate hit when a crossing lands exactly
    on a shared edge vertex (u = 1 on one edge, u = 0 on the next).
    """
    dx, dy = px1 - px0, py1 - py0
    fx, fy = ex1 - ex0, ey1 - ey0
    denom = dx * fy - dy * fx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((ex0 - px0) * fy - (ey0 - py0) * fx) / denom
        u = ((ex0 - px0) * dy - (ey0 - py0) * dx) / denom
    ok = (denom != 0.0) & (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
    return np.unique(np.round(t[ok], 9))


# ---------------------------------------------------------------------------
# Ring orientation / hole detection
# (whitebox-vector/src/shapefile/geometry.rs:307-340 — shapefile winding:
#  shells are clockwise, holes are counter-clockwise)
# ---------------------------------------------------------------------------
def signed_area2(xs: np.ndarray, ys: np.ndarray) -> float:
    """Twice the signed shoelace area; > 0 means counter-clockwise."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))


def is_hole(xs, ys) -> bool:
    """CCW ring == hole (geometry.rs:307-340, Bourke's method)."""
    return signed_area2(xs, ys) > 0.0


# ---------------------------------------------------------------------------
# Area / perimeter (whitebox-common/src/algorithms/poly_area.rs:12-26,
# poly_perimeter.rs:12-24; both close the ring implicitly and area is abs/2)
# ---------------------------------------------------------------------------
def polygon_area(xs, ys) -> float:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    a = np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1])
    a += xs[-1] * ys[0] - xs[0] * ys[-1]
    return abs(float(a)) / 2.0


def polygon_perimeter(xs, ys) -> float:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    d = np.sum(np.sqrt(np.diff(xs) ** 2 + np.diff(ys) ** 2))
    d += float(np.sqrt((xs[-1] - xs[0]) ** 2 + (ys[-1] - ys[0]) ** 2))
    return float(d)


# ---------------------------------------------------------------------------
# Misc kernels used by GEO-class operators
# ---------------------------------------------------------------------------
def centroid(xs, ys) -> tuple[float, float]:
    """Area-weighted polygon centroid over the closed ring (standard
    shoelace centroid; reference CentroidVector averages vertices for
    polylines/points but uses area centroid for polygons)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
    a2 = np.sum(cross)
    if a2 == 0.0:
        return float(np.mean(xs[:-1])), float(np.mean(ys[:-1]))
    cx = np.sum((xs[:-1] + xs[1:]) * cross) / (3.0 * a2)
    cy = np.sum((ys[:-1] + ys[1:]) * cross) / (3.0 * a2)
    return float(cx), float(cy)


def convex_hull(xs, ys) -> tuple[np.ndarray, np.ndarray]:
    """Andrew's monotone chain (same algorithm family as
    whitebox-common/src/algorithms/convex_hull.rs:12). Returns open hull
    ring in CCW order."""
    pts = np.unique(np.column_stack([np.asarray(xs, float), np.asarray(ys, float)]), axis=0)
    if len(pts) <= 2:
        return pts[:, 0], pts[:, 1]
    # lexicographic sort is given by np.unique
    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-1]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull[:, 0], hull[:, 1]


def simplify_rdp(xs, ys, epsilon: float) -> tuple[np.ndarray, np.ndarray]:
    """Ramer-Douglas-Peucker (whitebox-common/src/algorithms/line_ops.rs:66),
    iterative stack formulation."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        seg = np.hypot(x1 - x0, y1 - y0)
        mids = np.arange(i0 + 1, i1)
        if seg == 0.0:
            d = np.hypot(xs[mids] - x0, ys[mids] - y0)
        else:
            d = np.abs((x1 - x0) * (y0 - ys[mids]) - (x0 - xs[mids]) * (y1 - y0)) / seg
        imax = int(np.argmax(d))
        if d[imax] > epsilon:
            k = mids[imax]
            keep[k] = True
            stack.append((i0, k))
            stack.append((k, i1))
    return xs[keep], ys[keep]


def bbox_of(xs, ys) -> tuple[float, float, float, float]:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def minimum_bounding_box(xs, ys) -> tuple[np.ndarray, np.ndarray, float]:
    """Minimum-area oriented bounding box via rotating calipers over the
    convex hull (same approach as whitebox-common/src/algorithms/
    minimum_bounding_box.rs:28). Returns (corner_xs, corner_ys, area) with
    4 corners in order."""
    hx, hy = convex_hull(xs, ys)
    n = len(hx)
    if n <= 2:
        xmin, ymin, xmax, ymax = bbox_of(xs, ys)
        cx = np.array([xmin, xmax, xmax, xmin])
        cy = np.array([ymin, ymin, ymax, ymax])
        return cx, cy, (xmax - xmin) * (ymax - ymin)
    pts = np.column_stack([hx, hy])
    best = (np.inf, None)
    for i in range(n):
        e = pts[(i + 1) % n] - pts[i]
        norm = np.hypot(e[0], e[1])
        if norm == 0:
            continue
        ux, uy = e / norm            # edge direction
        vx, vy = -uy, ux             # perpendicular
        pu = pts @ np.array([ux, uy])
        pv = pts @ np.array([vx, vy])
        w = pu.max() - pu.min()
        h = pv.max() - pv.min()
        area = w * h
        if area < best[0]:
            best = (area, (ux, uy, vx, vy, pu.min(), pu.max(), pv.min(), pv.max()))
    area, (ux, uy, vx, vy, u0, u1, v0, v1) = best
    corners_uv = [(u0, v0), (u1, v0), (u1, v1), (u0, v1)]
    cx = np.array([u * ux + v * vx for u, v in corners_uv])
    cy = np.array([u * uy + v * vy for u, v in corners_uv])
    return cx, cy, float(area)
