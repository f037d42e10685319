"""RasterToVectorLines vs an independent WHOLE-RASTER global serial
transcription of data_tools/raster_to_vector_lines.rs (global FIFO across
components, exactly the reference control flow — the engine runs the
per-component equivalent, so geometry multisets must match)."""

from collections import deque

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

DX = [1, 1, 1, 0, -1, -1, -1, 0]
DY = [-1, 0, 1, 1, 1, 0, -1, -1]


def _global_trace(cellv, grid):
    cnt = {p: sum((p[0] + DY[i], p[1] + DX[i]) in cellv for i in range(8))
           for p in cellv}
    visited = set()
    queue = deque(sorted(p for p, n in cnt.items() if n == 1))
    lines = []

    def trace(r, c):
        pts = [(r, c)]
        visited.add((r, c))
        while True:
            highest, best, others = 0, None, []
            for i in range(8):
                p = (r + DY[i], c + DX[i])
                if p in cellv and p not in visited:
                    if cnt[p] > highest:
                        if highest > 0:
                            others.append(best)
                        highest, best = cnt[p], p
                    else:
                        others.append(p)
            if best is None:
                return pts
            queue.extend(others)
            r, c = best
            pts.append((r, c))
            visited.add((r, c))

    def emit(pts, val):
        if len(pts) < 2:
            return
        xs = [grid.west + grid.res_x / 2.0 + c * grid.res_x for _, c in pts]
        ys = [grid.north - grid.res_y / 2.0 - r * grid.res_y for r, _ in pts]
        length = sum(((xs[i + 1] - xs[i]) ** 2 + (ys[i + 1] - ys[i]) ** 2) ** 0.5
                     for i in range(len(pts) - 1))
        lines.append((val, len(pts), round(length, 6),
                      round(xs[0], 6), round(ys[0], 6),
                      round(xs[-1], 6), round(ys[-1], 6)))

    while queue:
        p = queue.popleft()
        if p not in visited:
            emit(trace(*p), cellv[p])
    for p in sorted(cellv):
        if p not in visited:
            emit(trace(*p), cellv[p])
    return lines


def test_raster_to_vector_lines_matches_global_transcription(spark):
    from whitebox_tools_spark.operators.raster_vector import raster_to_vector_lines

    rng = np.random.default_rng(8)
    n = 30
    cellv = {}
    # draw a few random walks + a closed square loop
    for w in range(5):
        r, c = int(rng.integers(2, n - 2)), int(rng.integers(2, n - 2))
        for _ in range(25):
            cellv[(r, c)] = float(w + 1)
            i = int(rng.integers(0, 8))
            r = min(max(r + DY[i], 0), n - 1)
            c = min(max(c + DX[i], 0), n - 1)
    for k in range(5):
        cellv[(1, 10 + k)] = 9.0
        cellv[(5, 10 + k)] = 9.0
        cellv[(1 + k, 10)] = 9.0
        cellv[(1 + k, 14)] = 9.0
    g = GridSpec(west=0.0, north=n * 2.0, res_x=2.0, res_y=2.0, rows=n, cols=n)
    df = spark.createDataFrame(
        [(r, c, v) for (r, c), v in cellv.items()], "row long, col long, value double"
    )
    got = sorted(
        (r.value, r.n_vertices, r.length, r.x1, r.y1, r.x2, r.y2)
        for r in raster_to_vector_lines(df, g).collect()
    )
    want = sorted(_global_trace(cellv, g))
    assert got == want and len(got) >= 5
