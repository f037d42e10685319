"""TIN construction + TIN gridding (class NNI).

Re-answers ConstructVectorTIN (gis_analysis/construct_vector_tin.rs:170 —
Delaunay triangulation of a point set, one polygon feature per triangle)
and TINGridding (gis_analysis/tin_gridding.rs — linear interpolation of
grid cell centers from the containing triangle's plane). The reference
builds one global in-memory triangulation; the Spark shape is per-tile
triangulation with a halo (points within `halo` of the tile boundary are
shared by neighboring tiles), so each tile's interior triangles match the
global TIN wherever the halo exceeds the local Delaunay edge length — the
standard distributed-Delaunay construction.

The Delaunay kernel is a from-scratch numpy Bowyer-Watson (no scipy in
this environment): super-triangle, incremental insertion, cavity
re-triangulation. Exactness note: co-circular degeneracies pick an
arbitrary diagonal — any such triangulation interpolates LINEAR surfaces
identically, which is what the plane-recovery oracle checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec


def delaunay(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay triangulation -> list of vertex-index
    triples (counter-clockwise)."""
    n = len(xs)
    if n < 3:
        return []
    xmin, xmax = float(xs.min()), float(xs.max())
    ymin, ymax = float(ys.min()), float(ys.max())
    span = max(xmax - xmin, ymax - ymin, 1.0)
    cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    # The super-triangle must enclose every CIRCUMCIRCLE of the final
    # triangulation, not just the points — near-collinear hull triples have
    # circumradii ~ side^3 / (2 * area), so a merely "20x span" super-triangle
    # silently dropped hull slivers (observed: hull-interior cells falling
    # through a coverage hole), and even 1e9x span lost a hull sliver of
    # area2 ~ 8.5e-12 (circumradius ~ 5e16; caught round 5 by the
    # brute-force empty-circumcircle oracle). 1e18x span covers slivers
    # down to area2 ~ 1e-13 at span ~ 1e3; the exact-rational predicate
    # fallback keeps topology decisions correct at this scale (floats stay
    # ~ 1e63 << DBL_MAX).
    big = 1e18 * span
    sx = np.array([cx - 2.0 * big, cx + 2.0 * big, cx])
    sy = np.array([cy - big, cy - big, cy + 2.0 * big])
    px = np.concatenate([xs, sx]).astype(np.float64)
    py = np.concatenate([ys, sy]).astype(np.float64)
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]

    # Floating-point-filtered exact predicates: float64 fast path; when a
    # determinant's magnitude falls under a conservative relative error
    # bound, its sign is re-derived in EXACT rational arithmetic (every
    # float is an exact rational), so topology decisions are never wrong —
    # the huge super-triangle costs fast-path precision, never correctness.
    from fractions import Fraction

    def _det_incircle(ax, ay, bx, by, cx_, cy_):
        return (
            (ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
            - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
            + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay)
        )

    def circum_contains(t, i):
        a, b, c = t
        ax, ay = px[a] - px[i], py[a] - py[i]
        bx, by = px[b] - px[i], py[b] - py[i]
        cx_, cy_ = px[c] - px[i], py[c] - py[i]
        det = _det_incircle(ax, ay, bx, by, cx_, cy_)
        mag = (
            (ax * ax + ay * ay) * (abs(bx * cy_) + abs(cx_ * by))
            + (bx * bx + by * by) * (abs(ax * cy_) + abs(cx_ * ay))
            + (cx_ * cx_ + cy_ * cy_) * (abs(ax * by) + abs(bx * ay))
        )
        if abs(det) > 1e-12 * mag:
            return det > 0.0
        F_ = Fraction
        exact = _det_incircle(
            F_(px[a]) - F_(px[i]), F_(py[a]) - F_(py[i]),
            F_(px[b]) - F_(px[i]), F_(py[b]) - F_(py[i]),
            F_(px[c]) - F_(px[i]), F_(py[c]) - F_(py[i]),
        )
        return exact > 0

    def ccw(t):
        a, b, c = t
        d = (px[b] - px[a]) * (py[c] - py[a]) - (px[c] - px[a]) * (py[b] - py[a])
        mag = abs((px[b] - px[a]) * (py[c] - py[a])) + abs(
            (px[c] - px[a]) * (py[b] - py[a])
        )
        if abs(d) <= 1e-12 * mag:
            F_ = Fraction
            d = (F_(px[b]) - F_(px[a])) * (F_(py[c]) - F_(py[a])) - (
                F_(px[c]) - F_(px[a])
            ) * (F_(py[b]) - F_(py[a]))
        if d < 0:
            return (a, c, b)
        return t

    tris[0] = ccw(tris[0])
    for i in range(n):
        bad = [t for t in tris if circum_contains(t, i)]
        if not bad:
            # point duplicates an existing vertex or precision corner:
            # skip (duplicate points add nothing to a TIN)
            continue
        # cavity boundary = edges appearing exactly once among bad tris
        edges: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                if key in edges:
                    edges.pop(key)
                else:
                    edges[key] = e
        tris = [t for t in tris if t not in bad]
        for e in edges.values():
            tris.append(ccw((e[0], e[1], i)))
    # drop triangles touching the super-triangle
    return [t for t in tris if max(t) < n]


def _tin_rows(pdf: pd.DataFrame, with_z: bool) -> pd.DataFrame:
    xs = pdf["x"].to_numpy(dtype=np.float64)
    ys = pdf["y"].to_numpy(dtype=np.float64)
    tris = delaunay(xs, ys)
    rows = []
    for k, (a, b, c) in enumerate(tris):
        row = {
            "tri_idx": k,
            "ax": xs[a], "ay": ys[a], "bx": xs[b], "by": ys[b],
            "cx": xs[c], "cy": ys[c],
        }
        if with_z:
            zs = pdf["z"].to_numpy(dtype=np.float64)
            row.update({"az": zs[a], "bz": zs[b], "cz": zs[c]})
        rows.append(row)
    cols = ["tri_idx", "ax", "ay", "bx", "by", "cx", "cy"] + (
        ["az", "bz", "cz"] if with_z else []
    )
    return pd.DataFrame(rows, columns=cols)


def construct_tin(points: DataFrame, *, x: str = "x", y: str = "y", z: str | None = "z") -> DataFrame:
    """ConstructVectorTIN: -> one row per triangle with its vertex coords
    (and z when given). Single-group triangulation (a base TIN is a small
    side input at engine scale; tile the input upstream for huge clouds)."""
    with_z = z is not None
    cols = [F.col(x).alias("x"), F.col(y).alias("y")]
    if with_z:
        cols.append(F.col(z).alias("z"))
    src = points.select(*cols).withColumn("__g", F.lit(0))
    schema = "tri_idx long, ax double, ay double, bx double, by double, cx double, cy double"
    if with_z:
        schema += ", az double, bz double, cz double"
    return src.groupBy("__g").applyInPandas(
        lambda key, pdf: _tin_rows(pdf, with_z), schema=schema
    )


def _circumcenter(ax, ay, bx, by, cx, cy):
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    return ux, uy


def sibson_weights(xs, ys, tris, qx: float, qy: float):
    """Sibson natural-neighbour weights of query point (qx, qy) inside the
    hull of the triangulation `tris` over points (xs, ys).

    Area-stealing via virtual Bowyer-Watson insertion
    (gis_analysis/natural_neighbour_interpolation.rs, Sibson 1981): the
    cavity = triangles whose circumcircle contains q; q's new Voronoi cell
    is bounded by circumcenters of the new triangles (edge, q); the area
    stolen from each cavity-boundary vertex p is the polygon
    [cc(u,p,q), old cavity circumcenters around p, cc(p,v,q)].
    Returns dict vertex_index -> weight (sums to 1), or None when q is
    outside the hull / degenerate."""
    # cavity by circumcircle containment
    cavity = []
    for t in tris:
        a, b, c = t
        cc = _circumcenter(xs[a], ys[a], xs[b], ys[b], xs[c], ys[c])
        if cc is None:
            continue
        r2 = (xs[a] - cc[0]) ** 2 + (ys[a] - cc[1]) ** 2
        d2 = (qx - cc[0]) ** 2 + (qy - cc[1]) ** 2
        if d2 < r2 * (1.0 - 1e-12):
            cavity.append((t, cc))
    if not cavity:
        return None
    # directed cavity boundary edges (triangles are CCW; an edge kept once)
    cnt: dict = {}
    for (a, b, c), _cc in cavity:
        for e in ((a, b), (b, c), (c, a)):
            k = (min(e), max(e))
            cnt[k] = cnt.get(k, 0) + 1
    boundary = {}
    for (a, b, c), _cc in cavity:
        for e in ((a, b), (b, c), (c, a)):
            if cnt[(min(e), max(e))] == 1:
                boundary[e[0]] = e[1]
    if not boundary:
        return None
    # cyclic order: p's incoming edge is (u, p), outgoing (p, v)
    prev = {v: u for u, v in boundary.items()}
    # old cavity triangles incident to each vertex, keyed by their two
    # vertex-adjacent edges for the fan walk
    at_p: dict = {}
    for t, cc in cavity:
        a, b, c = t
        for p, q1, q2 in ((a, b, c), (b, c, a), (c, a, b)):
            at_p.setdefault(p, {})[frozenset((p, q1))] = (t, cc, frozenset((p, q2)))
    weights: dict = {}
    total = 0.0
    for p, v in boundary.items():
        u = prev.get(p)
        if u is None:
            return None
        cc1 = _circumcenter(xs[u], ys[u], xs[p], ys[p], qx, qy)
        cc2 = _circumcenter(xs[p], ys[p], xs[v], ys[v], qx, qy)
        if cc1 is None or cc2 is None:
            return None
        # fan walk around p: the at_p map chains each cavity triangle from
        # its clockwise-most p-edge to its CCW p-edge, so starting at the
        # OUTGOING boundary edge (p, v) sweeps the cavity interior and ends
        # at the incoming edge (p, u); [cc2, fan..., cc1] is rotationally
        # ordered (orientation handled by abs below)
        poly = [cc2]
        fan = at_p.get(p, {})
        edge = frozenset((p, v))
        guard = 0
        while edge in fan and guard <= len(fan) + 1:
            _t, cc, nxt_edge = fan[edge]
            poly.append(cc)
            edge = nxt_edge
            guard += 1
        poly.append(cc1)
        s = 0.0
        for i in range(len(poly)):
            x0, y0 = poly[i]
            x1, y1 = poly[(i + 1) % len(poly)]
            s += x0 * y1 - x1 * y0
        w = abs(s) / 2.0
        weights[p] = weights.get(p, 0.0) + w
        total += w
    if total <= 0.0:
        return None
    return {p: w / total for p, w in weights.items()}


def natural_neighbour_gridding(
    points: DataFrame,
    grid: GridSpec,
    *,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    tile: int | None = None,
    halo: float | None = None,
) -> DataFrame:
    """NaturalNeighbourInterpolation (gis_analysis/
    natural_neighbour_interpolation.rs, Sibson 1981 area-stealing): grid
    cell centers interpolated with Sibson weights from the Delaunay
    natural neighbours; centers outside the hull are nodata (absent) — the
    reference's --clip behavior. Same per-tile + halo distribution as
    tin_gridding. -> (row, col, value)."""
    pts = points.select(
        F.col(x).alias("x"), F.col(y).alias("y"), F.col(z).alias("z")
    )
    if tile is None:
        src = pts.withColumn("__tr", F.lit(0)).withColumn("__tc", F.lit(0))
        tiles = [(0, 0, grid.west, grid.west + grid.cols * grid.res_x,
                  grid.north - grid.rows * grid.res_y, grid.north)]
    else:
        if halo is None:
            halo = 4.0 * max(grid.res_x, grid.res_y) * tile ** 0.5
        tiles = []
        tw = grid.cols * grid.res_x / tile
        th = grid.rows * grid.res_y / tile
        for tr in range(tile):
            for tc in range(tile):
                x0 = grid.west + tc * tw
                y1 = grid.north - tr * th
                tiles.append((tr, tc, x0, x0 + tw, y1 - th, y1))
        spark = pts.sparkSession
        tdf = F.broadcast(spark.createDataFrame(
            tiles, "tr int, tc int, x0 double, x1 double, y0 double, y1 double"
        ))
        src = pts.crossJoin(tdf).filter(
            (F.col("x") >= F.col("x0") - halo) & (F.col("x") <= F.col("x1") + halo)
            & (F.col("y") >= F.col("y0") - halo) & (F.col("y") <= F.col("y1") + halo)
        ).select("x", "y", "z", F.col("tr").alias("__tr"), F.col("tc").alias("__tc"))

    gw, gn, rx, ry = grid.west, grid.north, grid.res_x, grid.res_y
    nrows, ncols = grid.rows, grid.cols
    tile_boxes = {(tr, tc): (x0, x1, y0, y1) for tr, tc, x0, x1, y0, y1 in tiles}

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tr, tc = int(key[0]), int(key[1])
        x0, x1, y0, y1 = tile_boxes[(tr, tc)]
        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        zs = pdf["z"].to_numpy(dtype=np.float64)
        tris = delaunay(xs, ys)
        c0 = max(0, int(np.floor((x0 - gw) / rx)))
        c1 = min(ncols - 1, int(np.ceil((x1 - gw) / rx)))
        r0 = max(0, int(np.floor((gn - y1) / ry)))
        r1 = min(nrows - 1, int(np.ceil((gn - y0) / ry)))
        if c1 < c0 or r1 < r0 or not tris:
            return pd.DataFrame(columns=["row", "col", "value"])
        cc_, rr_ = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
        cc_, rr_ = cc_.ravel(), rr_.ravel()
        cxs = gw + (cc_ + 0.5) * rx
        cys = gn - (rr_ + 0.5) * ry
        core = (cxs >= x0) & (cxs < x1) & (cys >= y0) & (cys < y1)
        cc_, rr_, cxs, cys = cc_[core], rr_[core], cxs[core], cys[core]
        # hull containment: q must lie inside some triangle
        in_hull = np.zeros(len(cc_), bool)
        for a, b, c in tris:
            ax_, ay_, bx_, by_, cx2, cy2 = xs[a], ys[a], xs[b], ys[b], xs[c], ys[c]
            det = (by_ - cy2) * (ax_ - cx2) + (cx2 - bx_) * (ay_ - cy2)
            if det == 0.0:
                continue
            w1 = ((by_ - cy2) * (cxs - cx2) + (cx2 - bx_) * (cys - cy2)) / det
            w2 = ((cy2 - ay_) * (cxs - cx2) + (ax_ - cx2) * (cys - cy2)) / det
            in_hull |= (w1 >= 0) & (w2 >= 0) & (1.0 - w1 - w2 >= 0)
        rows = []
        for i in np.nonzero(in_hull)[0]:
            qx, qy = float(cxs[i]), float(cys[i])
            d2 = (xs - qx) ** 2 + (ys - qy) ** 2
            jmin = int(np.argmin(d2))
            if d2[jmin] < 1e-18:
                rows.append((int(rr_[i]), int(cc_[i]), float(zs[jmin])))
                continue
            w = sibson_weights(xs, ys, tris, qx, qy)
            if w is not None:
                val = sum(wt * zs[p] for p, wt in w.items())
            else:
                # degenerate cavity (hull-edge grazing): fall back to the
                # containing triangle's barycentric plane — identical for
                # any surface with linear precision
                val = None
                for a, b, c in tris:
                    ax_, ay_ = xs[a], ys[a]
                    bx_, by_ = xs[b], ys[b]
                    cx2, cy2 = xs[c], ys[c]
                    det = (by_ - cy2) * (ax_ - cx2) + (cx2 - bx_) * (ay_ - cy2)
                    if det == 0.0:
                        continue
                    w1 = ((by_ - cy2) * (qx - cx2) + (cx2 - bx_) * (qy - cy2)) / det
                    w2 = ((cy2 - ay_) * (qx - cx2) + (ax_ - cx2) * (qy - cy2)) / det
                    w3 = 1.0 - w1 - w2
                    if w1 >= 0 and w2 >= 0 and w3 >= 0:
                        val = w1 * zs[a] + w2 * zs[b] + w3 * zs[c]
                        break
                if val is None:
                    continue
            rows.append((int(rr_[i]), int(cc_[i]), float(val)))
        return pd.DataFrame(rows, columns=["row", "col", "value"])

    return src.groupBy("__tr", "__tc").applyInPandas(
        kernel, schema="row long, col long, value double"
    )


def tin_gridding(
    points: DataFrame,
    grid: GridSpec,
    *,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    tile: int | None = None,
    halo: float | None = None,
    max_edge: float | None = None,
) -> DataFrame:
    """TINGridding: grid cell centers linearly interpolated from the
    containing Delaunay triangle's plane; centers outside the hull are
    nodata (absent). -> (row, col, value).

    max_edge (the reference's --max_triangle_edge_length, lidar_dsm.rs /
    lidar_tin_gridding.rs): triangles with any edge longer than this are
    skipped, leaving their cells nodata (long slivers across voids).

    tile=None triangulates globally in one group (correct, bounded by the
    point count); tile=k splits the grid into k x k CELL blocks whose
    points (+ halo distance) triangulate independently — interior
    triangles match the global TIN when halo >= the local Delaunay edge
    length, the distributed trade-off the module docstring describes."""
    pts = points.select(
        F.col(x).alias("x"), F.col(y).alias("y"), F.col(z).alias("z")
    )
    if tile is None:
        src = pts.withColumn("__tr", F.lit(0)).withColumn("__tc", F.lit(0))
        tiles = [(0, 0, grid.west, grid.west + grid.cols * grid.res_x,
                  grid.north - grid.rows * grid.res_y, grid.north)]
    else:
        if halo is None:
            halo = 4.0 * max(grid.res_x, grid.res_y) * tile ** 0.5
        tiles = []
        tw = grid.cols * grid.res_x / tile
        th = grid.rows * grid.res_y / tile
        for tr in range(tile):
            for tc in range(tile):
                x0 = grid.west + tc * tw
                y1 = grid.north - tr * th
                tiles.append((tr, tc, x0, x0 + tw, y1 - th, y1))
        # explode points into every tile whose halo-extended box covers them
        spark = pts.sparkSession
        tdf = F.broadcast(spark.createDataFrame(
            tiles, "tr int, tc int, x0 double, x1 double, y0 double, y1 double"
        ))
        src = pts.crossJoin(tdf).filter(
            (F.col("x") >= F.col("x0") - halo) & (F.col("x") <= F.col("x1") + halo)
            & (F.col("y") >= F.col("y0") - halo) & (F.col("y") <= F.col("y1") + halo)
        ).select("x", "y", "z", F.col("tr").alias("__tr"), F.col("tc").alias("__tc"))

    gw, gn, rx, ry = grid.west, grid.north, grid.res_x, grid.res_y
    nrows, ncols = grid.rows, grid.cols
    tile_boxes = {(tr, tc): (x0, x1, y0, y1) for tr, tc, x0, x1, y0, y1 in tiles}

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tr, tc = int(key[0]), int(key[1])
        x0, x1, y0, y1 = tile_boxes[(tr, tc)]
        xs = pdf["x"].to_numpy(dtype=np.float64)
        ys = pdf["y"].to_numpy(dtype=np.float64)
        zs = pdf["z"].to_numpy(dtype=np.float64)
        tris = delaunay(xs, ys)
        # cell centers whose center lies in THIS tile's core box
        c0 = max(0, int(np.floor((x0 - gw) / rx)))
        c1 = min(ncols - 1, int(np.ceil((x1 - gw) / rx)))
        r0 = max(0, int(np.floor((gn - y1) / ry)))
        r1 = min(nrows - 1, int(np.ceil((gn - y0) / ry)))
        if c1 < c0 or r1 < r0 or not tris:
            return pd.DataFrame(columns=["row", "col", "value"])
        cc, rr = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
        cc, rr = cc.ravel(), rr.ravel()
        cxs = gw + (cc + 0.5) * rx
        cys = gn - (rr + 0.5) * ry
        core = (cxs >= x0) & (cxs < x1) & (cys >= y0) & (cys < y1)
        cc, rr, cxs, cys = cc[core], rr[core], cxs[core], cys[core]
        out_val = np.full(len(cc), np.nan)
        for a, b, c in tris:
            ax_, ay_, bx_, by_, cx_, cy_ = xs[a], ys[a], xs[b], ys[b], xs[c], ys[c]
            det = (by_ - cy_) * (ax_ - cx_) + (cx_ - bx_) * (ay_ - cy_)
            if det == 0.0:
                continue
            if max_edge is not None and (
                (ax_ - bx_) ** 2 + (ay_ - by_) ** 2 > max_edge * max_edge
                or (bx_ - cx_) ** 2 + (by_ - cy_) ** 2 > max_edge * max_edge
                or (cx_ - ax_) ** 2 + (cy_ - ay_) ** 2 > max_edge * max_edge
            ):
                continue
            w1 = ((by_ - cy_) * (cxs - cx_) + (cx_ - bx_) * (cys - cy_)) / det
            w2 = ((cy_ - ay_) * (cxs - cx_) + (ax_ - cx_) * (cys - cy_)) / det
            w3 = 1.0 - w1 - w2
            inside = (w1 >= 0) & (w2 >= 0) & (w3 >= 0) & np.isnan(out_val)
            if inside.any():
                out_val[inside] = (
                    w1[inside] * zs[a] + w2[inside] * zs[b] + w3[inside] * zs[c]
                )
        keep = ~np.isnan(out_val)
        return pd.DataFrame({"row": rr[keep], "col": cc[keep], "value": out_val[keep]})

    return src.groupBy("__tr", "__tc").applyInPandas(
        kernel, schema="row long, col long, value double"
    )


def voronoi_cell_areas(
    points: DataFrame,
    *,
    extent: tuple[float, float, float, float],
    x: str = "x",
    y: str = "y",
    id_col: str = "point_id",
) -> DataFrame:
    """VoronoiDiagram (gis_analysis/voronoi_diagram.rs): Voronoi cell of
    each input point, clipped to `extent` = (x0, y0, x1, y1).
    -> (point_id, area, n_vertices).

    The cell is built by Sutherland-Hodgman-clipping the extent rectangle
    with the perpendicular-bisector half-planes of the point's DELAUNAY
    neighbors (a Voronoi cell is exactly the intersection of its Delaunay
    neighbors' bisector half-planes, so the all-pairs clip is never
    needed). Documented deviation: the reference bounds the diagram with a
    ghost-point frame 2x the mean spacing outside the data (parabolic edge
    cells); this engine clips to the caller's exact rectangle — pass a
    larger extent for looser edges. Grouped kernel like construct_tin; a
    100-TB corpus uses the tile+halo split of tin_gridding."""
    x0, y0, x1, y1 = (float(v) for v in extent)
    pts = points.select(
        F.col(id_col).alias("point_id"), F.col(x).alias("x"), F.col(y).alias("y")
    ).withColumn("__g", F.lit(0))

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["x"].to_numpy(np.float64)
        ys = pdf["y"].to_numpy(np.float64)
        ids = pdf["point_id"].to_numpy(np.int64)
        tris = delaunay(xs, ys)
        nbrs: dict[int, set] = {i: set() for i in range(len(xs))}
        for a, b, c in tris:
            nbrs[a].update((b, c)); nbrs[b].update((a, c)); nbrs[c].update((a, b))
        out_id, out_area, out_nv = [], [], []
        base = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        for i in range(len(xs)):
            poly = base
            for j in sorted(nbrs[i]):
                # half-plane: closer to i than j  <=>  (p - m).(pj - pi) <= 0
                nx_, ny_ = xs[j] - xs[i], ys[j] - ys[i]
                mx, my = (xs[i] + xs[j]) / 2.0, (ys[i] + ys[j]) / 2.0
                nxt = []
                for k in range(len(poly)):
                    px, py = poly[k]
                    qx, qy = poly[(k + 1) % len(poly)]
                    dp = (px - mx) * nx_ + (py - my) * ny_
                    dq = (qx - mx) * nx_ + (qy - my) * ny_
                    if dp <= 0.0:
                        nxt.append((px, py))
                    if (dp < 0.0) != (dq < 0.0) and dp != dq:
                        t = dp / (dp - dq)
                        nxt.append((px + t * (qx - px), py + t * (qy - py)))
                poly = nxt
                if not poly:
                    break
            area = 0.0
            for k in range(len(poly)):
                px, py = poly[k]
                qx, qy = poly[(k + 1) % len(poly)]
                area += px * qy - qx * py
            out_id.append(ids[i]); out_area.append(abs(area) / 2.0)
            out_nv.append(len(poly))
        return pd.DataFrame({
            "point_id": np.array(out_id, np.int64),
            "area": np.array(out_area, np.float64),
            "n_vertices": np.array(out_nv, np.int64),
        })

    return pts.groupBy("__g").applyInPandas(
        kernel, schema="point_id long, area double, n_vertices long"
    )


def contours_from_points(
    points: DataFrame,
    *,
    interval: float = 10.0,
    base: float = 0.0,
    max_edge: float | None = None,
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """ContoursFromPoints (terrain_analysis/contours_from_points.rs:
    439-570): Delaunay-triangulate the points, then per triangle emit one
    straight segment for every contour level crossing it (linear edge
    interpolation; triangles with any squared edge length >
    max_edge^2 skipped; segments shorter than the reference's 10*EPSILON
    precision dropped). -> (height, x1, y1, x2, y2) segment multiset.
    The vertex-hit dedup (3 coincident intersections) keeps the first two
    pairwise-distinct points in the reference's pt1/pt2/pt3 order — the
    same outcome as its sequential elimination. Segment extraction is pure
    column expressions over the triangle table."""
    import sys

    eps = sys.float_info.epsilon * 10.0
    tin = construct_tin(points, x=x, y=y, z=z)
    if max_edge is not None:
        m2 = float(max_edge) ** 2
        tin = tin.filter(
            ((F.col("ax") - F.col("bx")) ** 2 + (F.col("ay") - F.col("by")) ** 2 <= m2)
            & ((F.col("bx") - F.col("cx")) ** 2 + (F.col("by") - F.col("cy")) ** 2 <= m2)
            & ((F.col("ax") - F.col("cx")) ** 2 + (F.col("ay") - F.col("cy")) ** 2 <= m2)
        )
    iv, bs = float(interval), float(base)
    zmin = F.least("az", "bz", "cz")
    zmax = F.greatest("az", "bz", "cz")
    t = tin.withColumn("lo", F.ceil((zmin - bs) / iv)).withColumn(
        "hi", F.floor((zmax - bs) / iv)
    ).filter(F.col("hi") >= F.col("lo"))
    lv = t.select(
        "ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz",
        F.explode(F.sequence("lo", "hi")).alias("k"),
    ).withColumn("h", F.lit(bs) + F.col("k").cast("double") * F.lit(iv))

    def edge_pt(x1c, y1c, z1c, x2c, y2c, z2c, px, py):
        hit = (F.col("h") >= F.least(F.col(z1c), F.col(z2c))) & (
            F.col("h") <= F.greatest(F.col(z1c), F.col(z2c))
        )
        frac = F.when(
            F.col(z1c) != F.col(z2c),
            (F.col("h") - F.col(z1c)) / (F.col(z2c) - F.col(z1c)),
        ).otherwise(F.lit(0.0))
        return (
            lv_kind.withColumn(px, F.when(hit, F.col(x1c) + frac * (F.col(x2c) - F.col(x1c))))
            .withColumn(py, F.when(hit, F.col(y1c) + frac * (F.col(y2c) - F.col(y1c))))
        )

    lv_kind = lv
    lv_kind = edge_pt("ax", "ay", "az", "bx", "by", "bz", "p1x", "p1y")
    lv_kind = edge_pt("bx", "by", "bz", "cx", "cy", "cz", "p2x", "p2y")
    lv_kind = edge_pt("ax", "ay", "az", "cx", "cy", "cz", "p3x", "p3y")
    pts_arr = F.filter(
        F.array(
            F.struct(F.col("p1x").alias("x"), F.col("p1y").alias("y")),
            F.struct(F.col("p2x").alias("x"), F.col("p2y").alias("y")),
            F.struct(F.col("p3x").alias("x"), F.col("p3y").alias("y")),
        ),
        lambda s: s["x"].isNotNull(),
    )
    d = lv_kind.withColumn("pts", pts_arr).filter(F.size("pts") >= 2)
    # first two pairwise-distinct (> precision) points in order
    first = F.col("pts")[0]
    p2cand = F.col("pts")[1]
    p3cand = F.when(F.size("pts") >= 3, F.col("pts")[2])
    dist2 = lambda a, b: F.sqrt((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2)  # noqa: E731
    second = F.when(dist2(first, p2cand) > eps, p2cand).otherwise(
        F.when(p3cand.isNotNull() & (dist2(first, p3cand) > eps), p3cand)
    )
    return (
        d.withColumn("pa", first)
        .withColumn("pb", second)
        .filter(F.col("pb").isNotNull())
        .select(
            F.col("h").alias("height"),
            F.col("pa.x").alias("x1"), F.col("pa.y").alias("y1"),
            F.col("pb.x").alias("x2"), F.col("pb.y").alias("y2"),
        )
    )
