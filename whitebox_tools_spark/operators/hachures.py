"""TopographicHachures (terrain_analysis/topographic_hachures.rs:274-1460,
Samsonov 2014 "Morphometric Mapping of Topography by Flowline Hachures"):
short downslope/upslope flowlines seeded along contour lines, with per-
hachure HEIGHT/SLOPE/ASPECT and the 8 illumination cosines.

Distributed decomposition (the reference is one serial sweep):

* stage 0 — the contour CRACK SEGMENTS are emitted as a DataFrame by four
  directed neighbor equi-joins over the band raster (JVM-side, one shuffle;
  identical to the reference's row-major cell scan, creation order preserved
  as the (row, col, n, level) sort key).
* stage 1 — hachure levels are INDEPENDENT for everything except upslope
  truncation: a level's contours and its downslope flowlines (plus the
  divergence-area insertions) depend only on that level's segments
  (connections require equal contour value; `segment_live` never couples
  levels — topographic_hachures.rs:855-870). So stage 1 is one
  applyInPandas over levels: trace contours (loop-1 open chains by
  max-deflection walk, loop-2 closed loops; smoothing clamp/wrap variants;
  deflection-tolerance simplification), seed them, trace + truncate +
  insert downslope flowlines.
* stage 2 — upslope flowlines at level v are truncated against
  `flowlines_prev`, the downslope flowlines of the PREVIOUSLY FINISHED
  level (the nearest higher level that produced >=1 contour —
  topographic_hachures.rs:1343-1345). That is a lag join over the level
  chain: ship each level's stage-1 flowlines to its successor and run a
  second per-level kernel (upslope trace + truncation + insertion +
  attribute computation).

The per-level kernels are sequential by the algorithm's nature (each
flowline is truncated against every previously accepted one), which makes
the level the natural parallel grain; the DEM coverage is shipped to the
kernels as broadcast bilinear-patch coefficients (test rasters are small;
at continental scale each level group would carry a tile+halo slice of the
coverage bounded by the max flowline reach ~ interval / tan(slopemin)).

Scalar helpers (`_get_flowline`, `_intersection_idx`, `_insert_flowlines`,
`_Coverage`) transcribe topographic_hachures.rs:1609-1838 exactly — plain
python floats so the distributed path is bit-identical to a serial sweep.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F, Window

__all__ = ["hachure_crack_segments", "hachures"]


# ---------------------------------------------------------------------------
# stage 0: directed crack segments in reference creation order


def hachure_crack_segments(
    cells: DataFrame, grid, *, interval: float = 10.0, base: float = 0.0
) -> DataFrame:
    """Directed contour crack segments (topographic_hachures.rs:640-712):
    for each cell with band b = floor((z-base)/interval) and each 4-neighbor
    (n = 0 up, 1 right, 2 down, 3 left) with smaller band nb, one segment
    per level in (nb, b], endpoints from the clockwise edge-offset tables
    (p1 -> p2 keeps higher ground on a consistent side). All JVM-side."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select(
        "row",
        "col",
        F.floor((F.col("value") - F.lit(base)) / F.lit(interval))
        .cast("long")
        .alias("band"),
    )
    dirs = spark.createDataFrame(
        [(0, -1, 0), (1, 0, 1), (2, 1, 0), (3, 0, -1)], "n int, dr int, dc int"
    )
    nbr = src.select(
        F.col("row").alias("nrow"),
        F.col("col").alias("ncol"),
        F.col("band").alias("nband"),
    )
    pair = (
        src.crossJoin(F.broadcast(dirs))
        .join(
            nbr,
            (F.col("nrow") == F.col("row") + F.col("dr"))
            & (F.col("ncol") == F.col("col") + F.col("dc")),
        )
        .filter(F.col("band") > F.col("nband"))
    )
    lev = pair.select(
        "row", "col", "n",
        F.explode(F.sequence(F.col("nband") + 1, F.col("band"))).alias("lev"),
    )
    hx, hy = grid.res_x / 2.0, grid.res_y / 2.0
    # cell center
    cx = F.lit(grid.west) + F.lit(hx) + F.col("col") * F.lit(grid.res_x)
    cy = F.lit(grid.north) - F.lit(hy) - F.col("row") * F.lit(grid.res_y)
    p1x_off = F.element_at(F.array(*[F.lit(v) for v in (-hx, hx, hx, -hx)]), F.col("n") + 1)
    p1y_off = F.element_at(F.array(*[F.lit(v) for v in (hy, hy, -hy, -hy)]), F.col("n") + 1)
    p2x_off = F.element_at(F.array(*[F.lit(v) for v in (hx, hx, -hx, -hx)]), F.col("n") + 1)
    p2y_off = F.element_at(F.array(*[F.lit(v) for v in (hy, -hy, -hy, hy)]), F.col("n") + 1)
    return lev.select(
        "row", "col", "n", "lev",
        (cx + p1x_off).alias("x1"),
        (cy + p1y_off).alias("y1"),
        (cx + p2x_off).alias("x2"),
        (cy + p2y_off).alias("y2"),
    )


# ---------------------------------------------------------------------------
# exact scalar transcriptions (shared by both per-level kernels)


class _Coverage:
    """RasterCoverage (topographic_hachures.rs:1536-1671): bilinear patches
    anchored between cell centers; a00 at (row+1, col), xcell east of the
    column center, ycell upward from the (row+1) center."""

    def __init__(self, dem, grid, nodata=-32768.0):
        import numpy as np

        rows, cols = dem.shape
        z = np.where(np.isnan(dem), nodata, dem)
        # z00 = z[r+1, c], z10 = z[r+1, c+1], z01 = z[r, c], z11 = z[r, c+1]
        # (out-of-range reads return nodata in the reference; those patches
        # are unreachable because get_cell_coords rejects the last row/col)
        pad = np.full((rows + 1, cols + 1), nodata)
        pad[:rows, :cols] = z
        z00 = pad[1:, :cols]
        z10 = pad[1:, 1:]
        z01 = pad[:rows, :cols]
        z11 = pad[:rows, 1:]
        self.a00 = z00
        self.a10 = z10 - z00
        self.a01 = z01 - z00
        self.a11 = z00 + z11 - z01 - z10
        self.rows, self.cols = rows, cols
        self.west, self.north = grid.west, grid.north
        self.res_x, self.res_y = grid.res_x, grid.res_y
        self.nodata = nodata

    def cell_coords(self, x, y):
        col = math.floor((x - self.west - 0.5 * self.res_x) / self.res_x)
        row = math.floor((self.north - y - 0.5 * self.res_y) / self.res_y)
        if row < 0 or col < 0 or row >= self.rows - 1 or col >= self.cols - 1:
            return None
        xcol = self.west + self.res_x / 2.0 + col * self.res_x
        yrow = self.north - self.res_y / 2.0 - row * self.res_y
        xcell = (x - xcol) / self.res_x
        ycell = 1.0 - (yrow - y) / self.res_y
        return row, col, xcell, ycell

    def value(self, x, y):
        cc = self.cell_coords(x, y)
        if cc is None:
            return self.nodata
        r, c, xc, yc = cc
        return (
            self.a00[r, c]
            + self.a10[r, c] * xc
            + self.a01[r, c] * yc
            + self.a11[r, c] * xc * yc
        )

    def gradient(self, x, y):
        # the reference indexes the patch arrays unchecked here (a panic on
        # out-of-domain points, which valid traces never produce); clamp so
        # both this and the serial oracle share one total semantics.
        cc = self.cell_coords(x, y)
        if cc is None:
            col = math.floor((x - self.west - 0.5 * self.res_x) / self.res_x)
            row = math.floor((self.north - y - 0.5 * self.res_y) / self.res_y)
            r = min(max(row, 0), self.rows - 2)
            c = min(max(col, 0), self.cols - 2)
            xc = yc = 0.0
        else:
            r, c, xc, yc = cc
        return (
            (self.a10[r, c] + self.a11[r, c] * yc) / self.res_x,
            (self.a01[r, c] + self.a11[r, c] * xc) / self.res_y,
        )

    def slope(self, x, y):
        gx, gy = self.gradient(x, y)
        return math.sqrt(gx * gx + gy * gy)


def _path_turn(p1, p2, p3):
    ax, ay = p2[0] - p1[0], p2[1] - p1[1]
    bx, by = p3[0] - p2[0], p3[1] - p2[1]
    mag = math.sqrt(ax * ax + ay * ay) * math.sqrt(bx * bx + by * by)
    # Rust f64 0/0 = NaN (comparisons with NaN are false); python raises
    return (ax * bx + ay * by) / mag if mag != 0.0 else math.nan


def _get_flowline(cov, p, discr, zlim, slopemin, defmin, down):
    """get_flowline (topographic_hachures.rs:1675-1752): midpoint-corrected
    gradient stepping until zlim / min slope / max turn / nodata."""
    points = []
    sign = 1.0 if down else -1.0
    p1 = p
    zprev = cov.value(p1[0], p1[1])
    if zprev == zlim or zprev == cov.nodata:
        return points
    points.append(p1)
    while True:
        slope = cov.slope(p1[0], p1[1])
        if slope < slopemin:
            break
        gx, gy = cov.gradient(p1[0], p1[1])
        p2 = (p1[0] - sign * discr * gx / slope, p1[1] - sign * discr * gy / slope)
        zcur = cov.value(p2[0], p2[1])
        if zcur == cov.nodata:
            break
        g2x, g2y = cov.gradient(p2[0], p2[1])
        gx = 0.5 * (gx + g2x)
        gy = 0.5 * (gy + g2y)
        gl = math.sqrt(gx * gx + gy * gy)
        p2 = (p1[0] - sign * discr * gx / gl, p1[1] - sign * discr * gy / gl)
        zcur = cov.value(p2[0], p2[1])
        if (down and zcur < zlim) or (not down and zcur > zlim):
            t = (zprev - zlim) / (zprev - zcur)
            points.append(((1.0 - t) * p1[0] + t * p2[0], (1.0 - t) * p1[1] + t * p2[1]))
            break
        elif (down and zcur < zprev) or (not down and zcur > zprev):
            points.append(p2)
            p1 = p2
            zprev = zcur
        else:
            break
        n = len(points)
        if n >= 3 and _path_turn(points[n - 3], points[n - 2], points[n - 1]) < defmin:
            points.pop()
            break
    return points


def _point_side(p1, p2, p3):
    return (p3[0] - p1[0]) * (p2[1] - p1[1]) < (p3[1] - p1[1]) * (p2[0] - p1[0])


def _is_intersection(p1, p2, p3, p4):
    return (_point_side(p1, p2, p3) != _point_side(p1, p2, p4)) and (
        _point_side(p3, p4, p1) != _point_side(p3, p4, p2)
    )


def _dist(a, b):
    # Point2D::distance (point2d.rs:62): sqrt(dx*dx + dy*dy) — NOT hypot,
    # which rounds differently at the ulp level.
    dx = a[0] - b[0]
    dy = a[1] - b[1]
    return math.sqrt(dx * dx + dy * dy)


def _intersection_idx(newline, lines, dist):
    """intersection_idx (topographic_hachures.rs:1801-1829): first vertex of
    `newline` that comes within `dist` of (or crosses) any accepted line,
    gated by an endpoint-span bounding-circle test."""
    imin = len(newline)
    nl0, nl1 = newline[0], newline[-1]
    d1 = _dist(nl0, nl1)
    c1 = ((nl0[0] + nl1[0]) / 2.0, (nl0[1] + nl1[1]) / 2.0)
    for line in reversed(lines):
        d2 = _dist(line[0], line[-1])
        c2 = ((line[0][0] + line[-1][0]) / 2.0, (line[0][1] + line[-1][1]) / 2.0)
        if _dist(c1, c2) < (d1 + d2) / 2.0:
            for i in range(1, len(newline)):
                for j in range(1, len(line)):
                    if _dist(newline[i], line[j]) < dist:
                        if i < imin:
                            imin = i
                        if imin == 1:
                            return imin
                    if _is_intersection(newline[i - 1], newline[i], line[j - 1], line[j]):
                        if i < imin:
                            imin = i
                        if imin == 1:
                            return imin
    return imin


def _insert_flowlines(cov, flowlines, n1, n2, k1, k2, depth, distmin, distmax,
                      discr, zlim, slopemin, defmin, down):
    """insert_flowlines (topographic_hachures.rs:1755-1798): recursive
    divergence-area fill between flowline pair (n1, n2)."""
    if depth == 0:
        return
    n = min(len(flowlines[n1]) - k1, len(flowlines[n2]) - k2)
    for i in range(n):
        p1 = flowlines[n1][i + k1]
        p2 = flowlines[n2][i + k2]
        if _dist(p1, p2) >= distmax:
            p3 = ((p1[0] + p2[0]) / 2.0, (p1[1] + p2[1]) / 2.0)
            flowline = _get_flowline(cov, p3, discr, zlim, slopemin, defmin, down)
            if len(flowline) > 1:
                idx = _intersection_idx(flowline, flowlines, distmin)
                flowline = flowline[:idx]
                if len(flowline) > 1:
                    flowlines.append(flowline)
                    nlast = len(flowlines) - 1
                    _insert_flowlines(cov, flowlines, n1, nlast, i + k1, 0,
                                      depth - 1, distmin, distmax, discr,
                                      zlim, slopemin, defmin, down)
                    _insert_flowlines(cov, flowlines, n2, nlast, i + k2, 0,
                                      depth - 1, distmin, distmax, discr,
                                      zlim, slopemin, defmin, down)
            return


# ---------------------------------------------------------------------------
# per-level contour tracer (loops 1+2, topographic_hachures.rs:766-1182)


def _change_in_heading(prev, cur, nxt):
    ax, ay = cur[0] - prev[0], cur[1] - prev[1]
    bx, by = nxt[0] - cur[0], nxt[1] - cur[1]
    mag = math.sqrt(ax * ax + ay * ay) * math.sqrt(bx * bx + by * by)
    ratio = (ax * bx + ay * by) / mag if mag != 0.0 else math.nan
    if ratio > 1.0:
        ratio = 1.0
    if ratio < -1.0:
        ratio = -1.0
    # is_left(current; previous, next) >= 0 -> +acos else -acos
    left = (nxt[0] - prev[0]) * (cur[1] - prev[1]) - (cur[0] - prev[0]) * (
        nxt[1] - prev[1]
    )
    return math.acos(ratio) if left >= 0.0 else -math.acos(ratio)


def _path_deflection(p1, p2, p3):
    ax, ay = p2[0] - p1[0], p2[1] - p1[1]
    bx, by = p3[0] - p2[0], p3[1] - p2[1]
    mag = math.sqrt(ax * ax + ay * ay) * math.sqrt(bx * bx + by * by)
    return abs((ax * bx + ay * by) / mag) if mag != 0.0 else math.nan


def _smooth_open(points, filter_size):
    fr = filter_size // 2
    n = len(points)
    for _sweep in (0, 1):
        idxs = range(n) if _sweep == 0 else range(n - 1, -1, -1)
        for a in idxs:
            sx = sy = 0.0
            for p in range(-fr, fr + 1):
                pid = a + p
                if pid < 0:
                    pid = 0
                if pid >= n:
                    pid = n - 1
                sx += points[pid][0]
                sy += points[pid][1]
            points[a] = (sx / filter_size, sy / filter_size)
    return points


def _smooth_closed(points, filter_size):
    fr = filter_size // 2
    n = len(points)
    for _sweep in (0, 1):
        idxs = range(n) if _sweep == 0 else range(n - 1, -1, -1)
        for a in idxs:
            sx = sy = 0.0
            for p in range(-fr, fr + 1):
                pid = a + p
                if pid < 0:
                    pid += n - 1
                if pid >= n:
                    pid -= n - 1
                sx += points[pid][0]
                sy += points[pid][1]
            points[a] = (sx / filter_size, sy / filter_size)
        points[n - 1] = points[0]
    return points


def _simplify(points, tol_cos):
    if tol_cos is None:
        return points
    for a in range(len(points) - 2, 0, -1):
        d = _path_deflection(points[a - 1], points[a], points[a + 1])
        if d > tol_cos:
            del points[a]
    return points


def _trace_level_contours(segs, filter_size, tol_cos, res_x, res_y):
    """Trace one level's crack segments (already in creation order) into
    ordered contours: loop-1 open chains started at free endpoints (next
    segment by max |change_in_heading|), then loop-2 closed loops. Returns
    [(points, closed)] in the reference's within-level discovery order."""
    nseg = len(segs)
    live = [True] * nseg

    def key(pt):
        return (round(pt[0], 6), round(pt[1], 6))

    at = {}
    for i, (p1, p2) in enumerate(segs):
        at.setdefault(key(p1), []).append(2 * i)
        at.setdefault(key(p2), []).append(2 * i + 1)

    def node_pt(node):
        seg = segs[node // 2]
        return seg[0] if node % 2 == 0 else seg[1]

    def free_end(node):
        pt = node_pt(node)
        for other in at.get(key(pt), ()):  # any other live same-level node?
            if other != node and live[other // 2]:
                return False
        return True

    def walk(start_node):
        current = start_node
        points = []
        while True:
            seg_i = current // 2
            points.append(node_pt(current))
            if live[seg_i]:
                live[seg_i] = False
                p1, p2 = segs[seg_i]
                points.append(((p1[0] + p2[0]) / 2.0, (p1[1] + p2[1]) / 2.0))
                current = current + 1 if current % 2 == 0 else current - 1
            else:
                pt = node_pt(current)
                connected = [n for n in at.get(key(pt), ())
                             if live[n // 2]]
                if not connected:
                    return points
                if len(connected) == 1:
                    current = connected[0]
                else:
                    # greatest path deflection (topographic_hachures.rs:867)
                    sa, sb = segs[seg_i]
                    if current % 2 == 0:
                        p1h, p2h = sb, sa
                    else:
                        p1h, p2h = sa, sb
                    max_h, best = 0.0, None
                    for n in connected:
                        so = segs[n // 2]
                        p3 = so[1] if n % 2 == 0 else so[0]
                        h = abs(_change_in_heading(p1h, p2h, p3))
                        if h > max_h:
                            max_h, best = h, n
                    if best is None:
                        return points
                    current = best

    contours = []
    # loop 1: open chains
    for i in range(nseg):
        if not live[i]:
            continue
        start = None
        if free_end(2 * i):
            start = 2 * i
        elif free_end(2 * i + 1):
            start = 2 * i + 1
        if start is None:
            continue
        points = walk(start)
        if len(points) > 1:
            if len(points) > filter_size and filter_size > 0:
                points = _smooth_open(points, filter_size)
            points = _simplify(points, tol_cos)
            contours.append((points, False))
    # loop 2: closed loops
    for i in range(nseg):
        if not live[i]:
            continue
        points = walk(2 * i)
        n = len(points)
        if n > 1:
            if n > filter_size and filter_size > 0:
                points = _smooth_closed(points, filter_size)
            points = _simplify(points, tol_cos)
            xs = [p[0] for p in points]
            ys = [p[1] for p in points]
            if (max(xs) - min(xs)) > res_x or (max(ys) - min(ys)) > res_y:
                contours.append((points, True))
    return contours


# ---------------------------------------------------------------------------
# per-level hachure kernels


def _level_downslope(contours, cov, params):
    """Downslope pass for one finished level (topographic_hachures.rs:
    1199-1290): seeds along each contour, flowline trace + truncation, then
    the divergence-area insertion sweep. Returns (flowlines, level_seeds,
    seed_start_bounds, last new_distmin/new_distmax/discr, zmin)."""
    res_xy = 0.5 * (cov.res_x + cov.res_y)
    discr = params["discretization"] * res_xy
    flowlines = []
    starts = set()
    seed_starts = {0}
    level_seeds = []
    new_distmin = params["distmin"] * params["separation"] * res_xy
    new_distmax = params["distmax"] * params["separation"] * res_xy
    zmin = None
    for points, _closed in contours:
        npts = len(points)
        perim = 0.0
        accdist = [0.0] * npts
        for i in range(1, npts):
            perim += _dist(points[i - 1], points[i])
            accdist[i] = perim
        step = params["separation"] * res_xy
        num = perim / step
        to_up = (math.ceil(num) - num) < (num - math.floor(num))
        # Rust f64 division by 0.0 yields inf (num < 1 contours get only
        # their two terminal seeds); python raises, so guard explicitly
        denom = math.ceil(num) if to_up else math.floor(num)
        new_step = perim / denom if denom != 0 else math.inf
        num_seeds = int(perim / new_step) if new_step > 0 else 0
        val = params["value"]
        zmin = val - params["interval"]
        new_distmin = params["distmin"] * new_step
        new_distmax = params["distmax"] * new_step
        seeds = [points[0]]
        j = 0
        for i in range(1, num_seeds):
            d = i * new_step
            while d > accdist[j]:
                j += 1
            t = (d - accdist[j - 1]) / (accdist[j] - accdist[j - 1])
            seed = (
                (1.0 - t) * points[j - 1][0] + t * points[j][0],
                (1.0 - t) * points[j - 1][1] + t * points[j][1],
            )
            seeds.append(seed)
            level_seeds.append(seed)
        seeds.append(points[npts - 1])
        level_seeds.append(points[npts - 1])
        starts.add(len(flowlines))
        seed_starts.add(len(level_seeds))
        for seed in seeds:
            fl = _get_flowline(cov, seed, discr, zmin, params["slopemin_t"],
                               params["turnmax_c"], True)
            if len(fl) > 1:
                idx = _intersection_idx(fl, flowlines, new_distmin)
                fl = fl[:idx]
                if len(fl) > 1:
                    flowlines.append(fl)
    n = len(flowlines)
    if n > 1:
        for i in range(n - 1):
            if (i + 1) not in starts:
                _insert_flowlines(cov, flowlines, i, i + 1, 0, 0,
                                  params["depth"], new_distmin, new_distmax,
                                  discr, zmin, params["slopemin_t"],
                                  params["turnmax_c"], True)
    return flowlines, level_seeds, seed_starts, new_distmin, new_distmax, discr


def _level_upslope(level_seeds, seed_starts, flowlines_down, flowlines_prev,
                   cov, params, new_distmin, new_distmax, discr):
    """Upslope pass (topographic_hachures.rs:1296-1341): seeds reuse the
    level's interior+terminal seed set; truncation against the previous
    level's flowlines at `step` and against accepted upslope lines at
    new_distmin; insertion only between consecutive same-contour seeds."""
    res_xy = 0.5 * (cov.res_x + cov.res_y)
    step = params["separation"] * res_xy
    zmax = params["value"] + params["interval"]
    flowlines_up = []
    idxs = []
    for i, seed in enumerate(level_seeds):
        fl = _get_flowline(cov, seed, discr, zmax, params["slopemin_t"],
                           params["turnmax_c"], False)
        if len(fl) > 1:
            idx1 = _intersection_idx(fl, flowlines_prev, step)
            idx2 = _intersection_idx(fl, flowlines_up, new_distmin)
            fl = fl[:min(idx1, idx2)]
            if len(fl) > 1:
                flowlines_up.append(fl)
                idxs.append(i)
    n = len(flowlines_up)
    if n > 1:
        for i in range(n - 1):
            if idxs[i + 1] not in seed_starts and idxs[i + 1] - idxs[i] == 1:
                _insert_flowlines(cov, flowlines_up, i, i + 1, 0, 0,
                                  params["depth"], new_distmin, new_distmax,
                                  discr, zmax, params["slopemin_t"],
                                  params["turnmax_c"], False)
    return flowlines_up


def _flowline_attrs(fl, cov):
    """HEIGHT-independent per-hachure attributes (topographic_hachures.rs:
    1367-1424): mean negated gradient -> slope/aspect + 8 direction
    cosines."""
    dxs = dys = 0.0
    for (x, y) in fl:
        gx, gy = cov.gradient(x, y)
        dxs += gx
        dys += gy
    dx = -dxs / len(fl)
    dy = -dys / len(fl)
    gl = math.sqrt(dx * dx + dy * dy)
    slope = math.degrees(math.atan(gl))
    math_aspect = math.degrees(math.atan2(dy, dx))
    aspect = 90.0 - math_aspect if math_aspect < 90.0 else 450.0 - math_aspect
    dx1, dy1 = dx / gl, dy / gl
    s05 = math.sqrt(0.5)
    return (
        slope, aspect,
        dy1, s05 * dx1 + s05 * dy1, dx1, s05 * dx1 - s05 * dy1,
        -dy1, -s05 * dx1 - s05 * dy1, -dx1, -s05 * dx1 + s05 * dy1,
    )


# ---------------------------------------------------------------------------
# the distributed operator


def hachures(
    cells: DataFrame,
    grid,
    *,
    interval: float = 10.0,
    base: float = 0.0,
    filter_size: int = 9,
    tolerance: float = 10.0,
    separation: float = 2.0,
    distmin: float = 0.5,
    distmax: float = 2.0,
    discretization: float = 0.5,
    turnmax: float = 45.0,
    slopemin: float = 0.5,
    depth: int = 16,
) -> DataFrame:
    """TopographicHachures, distributed per contour level (two stages with a
    lag join shipping each level's downslope flowlines to its successor).
    -> (hid, height, slope, aspect, n, ne, e, se, s, sw, w, nw, xs, ys)."""
    import numpy as np
    import pandas as pd

    spark = cells.sparkSession
    if filter_size % 2 == 0:
        filter_size += 1
    tol_cos = math.cos(math.radians(tolerance)) if tolerance > 0 else None
    turnmax_c = math.cos(math.radians(turnmax))
    slopemin_t = math.tan(math.radians(slopemin))

    # the kernels need the bilinear coverage: materialize the (small) DEM
    # once; at scale this becomes a per-level tile+halo cogroup keyed by the
    # level's bounding box padded by interval / tan(slopemin).
    pdf = cells.select("row", "col", "value").toPandas()
    dem = np.full((grid.rows, grid.cols), np.nan)
    dem[pdf["row"].to_numpy(int), pdf["col"].to_numpy(int)] = pdf["value"].to_numpy(float)
    cov_bc = spark.sparkContext.broadcast((dem, grid.west, grid.north,
                                           grid.res_x, grid.res_y))

    class _G:  # tiny grid view for _Coverage inside executors
        pass

    def _mk_cov():
        demv, west, north, rx, ry = cov_bc.value
        g = _G()
        g.west, g.north, g.res_x, g.res_y = west, north, rx, ry
        return _Coverage(demv, g)

    segs = hachure_crack_segments(cells, grid, interval=interval, base=base)

    base_params = dict(
        interval=interval, separation=separation, distmin=distmin,
        distmax=distmax, discretization=discretization, depth=depth,
        slopemin_t=slopemin_t, turnmax_c=turnmax_c,
    )

    s1_schema = (
        "lev long, kind string, idx long, flag int, xs array<double>, ys array<double>"
    )

    def _stage1(pdf: pd.DataFrame) -> pd.DataFrame:
        lev = int(pdf["lev"].iloc[0])
        pdf = pdf.sort_values(["row", "col", "n"], kind="mergesort")
        seg_list = [
            ((x1, y1), (x2, y2))
            for x1, y1, x2, y2 in zip(pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"])
        ]
        cov = _mk_cov()
        contours = _trace_level_contours(
            seg_list, filter_size, tol_cos, cov.res_x, cov.res_y
        )
        rows = []
        if contours:
            rows.append((lev, "level", 0, 0, [], []))
            params = dict(base_params, value=base + lev * interval)
            fls, level_seeds, seed_starts, ndmin, ndmax, discr = _level_downslope(
                contours, cov, params
            )
            for i, fl in enumerate(fls):
                rows.append((lev, "fl", i, 0,
                             [p[0] for p in fl], [p[1] for p in fl]))
            for i, sd in enumerate(level_seeds):
                rows.append((lev, "seed", i, 1 if i in seed_starts else 0,
                             [sd[0]], [sd[1]]))
            # stage-2 needs the LAST contour's step params (the reference
            # reuses the loop variables after the contour loop)
            rows.append((lev, "params", 0, 0, [ndmin, ndmax, discr], []))
        return pd.DataFrame(rows, columns=["lev", "kind", "idx", "flag", "xs", "ys"])

    stage1 = segs.groupBy("lev").applyInPandas(_stage1, s1_schema)
    stage1 = stage1.localCheckpoint()  # the lag join re-reads it twice

    # level chain: prev(level) = nearest HIGHER level that produced contours
    levels = stage1.filter(F.col("kind") == "level").select("lev")
    w = Window.orderBy(F.col("lev").desc())
    chain = levels.select(
        F.col("lev").alias("succ_lev"), F.lag("lev", 1).over(w).alias("prev_lev")
    ).filter(F.col("prev_lev").isNotNull())

    # re-key each level's flowlines to its successor level (kind='prev')
    prev_rows = (
        stage1.filter(F.col("kind") == "fl")
        .join(chain, F.col("lev") == F.col("prev_lev"))
        .select(F.col("succ_lev").alias("lev"), F.lit("prev").alias("kind"),
                "idx", "flag", "xs", "ys")
    )
    s2_in = stage1.unionByName(prev_rows)

    s2_schema = (
        "lev long, idx long, height double, slope double, aspect double, "
        "n double, ne double, e double, se double, s double, sw double, "
        "w double, nw double, xs array<double>, ys array<double>"
    )

    def _stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        lev = int(pdf["lev"].iloc[0])
        if not (pdf["kind"] == "level").any():
            return pd.DataFrame(columns=[f.split()[0] for f in s2_schema.split(", ")])
        cov = _mk_cov()
        params = dict(base_params, value=base + lev * interval)

        def lines_of(kind):
            sub = pdf[pdf["kind"] == kind].sort_values("idx")
            return [list(zip(xs, ys)) for xs, ys in zip(sub["xs"], sub["ys"])]

        fl_down = lines_of("fl")
        fl_prev = lines_of("prev")
        seeds_sub = pdf[pdf["kind"] == "seed"].sort_values("idx")
        level_seeds = [(xs[0], ys[0]) for xs, ys in
                       zip(seeds_sub["xs"], seeds_sub["ys"])]
        seed_starts = {int(i) for i, fl in
                       zip(seeds_sub["idx"], seeds_sub["flag"]) if fl == 1}
        seed_starts.add(0)
        prow = pdf[pdf["kind"] == "params"]
        if len(prow):
            ndmin, ndmax, discr = list(prow["xs"].iloc[0])
        else:
            res_xy = 0.5 * (cov.res_x + cov.res_y)
            ndmin = distmin * separation * res_xy
            ndmax = distmax * separation * res_xy
            discr = discretization * res_xy
        fl_up = _level_upslope(level_seeds, seed_starts, fl_down, fl_prev,
                               cov, params, ndmin, ndmax, discr)
        out = []
        val = base + lev * interval
        for i, fl in enumerate(fl_down + fl_up):
            a = _flowline_attrs(fl, cov)
            out.append((lev, i, val) + a +
                       ([p[0] for p in fl], [p[1] for p in fl]))
        cols = ["lev", "idx", "height", "slope", "aspect", "n", "ne", "e",
                "se", "s", "sw", "w", "nw", "xs", "ys"]
        return pd.DataFrame(out, columns=cols)

    out = s2_in.groupBy("lev").applyInPandas(_stage2, s2_schema)
    # hid = 1..n in (level desc, within-level) order — distributed
    # range-partitioned sequence, no single-partition global window
    from whitebox_tools_spark.distributed import with_global_seq

    seq = with_global_seq(
        out.withColumn("neg_lev", -F.col("lev")), ["neg_lev", "idx"],
        out_col="hid",
    )
    return seq.select(
        "hid", "height", "slope", "aspect", "n", "ne", "e", "se", "s", "sw",
        "w", "nw", "xs", "ys",
    )
