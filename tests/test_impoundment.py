"""ImpoundmentSizeIndex / InsertDams vs independent serial transcriptions
(brute-force window fill for the crest; re-derived (W, hops, lex) forest;
explicit path walks for the upstream sets)."""

import heapq
import math
from collections import deque

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

DX = [1, 1, 1, 0, -1, -1, -1, 0]
DY = [-1, 0, 1, 1, 1, 0, -1, -1]
STEPS = {"ew": (0, 1), "ns": (1, 0), "nesw": (-1, 1), "senw": (1, 1)}


def _crest_serial(cells, h):
    crest = {}
    for (r, c) in cells:
        best = -np.inf
        for dr, dc in STEPS.values():
            for s in range(0, 2 * h + 1):
                lmax = max(
                    (cells.get((r - k * dr, c - k * dc), -np.inf) for k in range(s + 1)),
                )
                rmax = max(
                    (cells.get((r + k * dr, c + k * dc), -np.inf)
                     for k in range(2 * h - s + 1)),
                )
                best = max(best, min(lmax, rmax))
        crest[(r, c)] = best
    return crest


def _forest_serial(cells, n):
    # flat fill W
    W = {}
    pq = [(z, r, c) for (r, c), z in cells.items()
          if r in (0, n - 1) or c in (0, n - 1)]
    heapq.heapify(pq)
    while pq:
        w0, r, c = heapq.heappop(pq)
        if (r, c) in W:
            continue
        W[(r, c)] = w0
        for i in range(8):
            p = (r + DY[i], c + DX[i])
            if p in cells and p not in W:
                heapq.heappush(pq, (max(w0, cells[p]), p[0], p[1]))
    # plateau hops
    hops = {}
    dq = deque()
    for (r, c), w0 in W.items():
        nbs = [(r + DY[i], c + DX[i]) for i in range(8)]
        if (r in (0, n - 1) or c in (0, n - 1)
                or any(p not in W for p in nbs)
                or any(W.get(p, np.inf) < w0 for p in nbs)):
            hops[(r, c)] = 0
            dq.append((r, c))
    while dq:
        r, c = dq.popleft()
        for i in range(8):
            p = (r + DY[i], c + DX[i])
            if p in W and p not in hops and W[p] == W[(r, c)]:
                hops[p] = hops[(r, c)] + 1
                dq.append(p)
    big = 2 ** 62
    ptr = {}
    for (r, c) in W:
        own = (W[(r, c)], hops.get((r, c), big), r, c)
        best = None
        for i in range(8):
            p = (r + DY[i], c + DX[i])
            if p in W:
                cand = (W[p], hops.get(p, big), p[0], p[1])
                if best is None or cand < best:
                    best = cand
        if best is not None and best < own:
            ptr[(r, c)] = (best[2], best[3])
    return ptr


def test_impoundment_size_index_matches_serial(spark):
    from whitebox_tools_spark.operators.impoundment import impoundment_size_index

    rng = np.random.default_rng(77)
    n, h = 16, 2
    vals = rng.uniform(10, 30, (n, n))
    cells = {(r, c): float(vals[r, c]) for r in range(n) for c in range(n)}
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    df = spark.createDataFrame(
        [(r, c, v) for (r, c), v in cells.items()], "row long, col long, value double"
    )
    got = {(r.row, r.col): (r.dam_height, r.area, r.volume, r.max_depth)
           for r in impoundment_size_index(df, g, dam_length=2 * h + 1,
                                           block=8).collect()}
    crest = _crest_serial(cells, h)
    ptr = _forest_serial(cells, n)
    upstream = {p: set() for p in cells}
    for u in cells:
        cur = u
        while cur in ptr:
            cur = ptr[cur]
            upstream[cur].add(u)
    ga = 25.0
    for p in cells:
        below = [cells[u] for u in upstream[p] if cells[u] < crest[p]]
        want = (
            crest[p] - cells[p],
            ga * len(below),
            ga * sum(crest[p] - z for z in below),
            max((crest[p] - z for z in below), default=0.0),
        )
        for a, b in zip(got[p], want):
            assert a == pytest.approx(b, abs=1e-8), (p, got[p], want)


def test_insert_dams_raises_profile(spark):
    from whitebox_tools_spark.operators.impoundment import (
        dam_crest_elevation,
        insert_dams,
    )

    rng = np.random.default_rng(99)
    n, h = 14, 2
    vals = rng.uniform(10, 30, (n, n))
    cells = {(r, c): float(vals[r, c]) for r in range(n) for c in range(n)}
    df = spark.createDataFrame(
        [(r, c, v) for (r, c), v in cells.items()], "row long, col long, value double"
    )
    dams = spark.createDataFrame([(7, 7), (3, 10)], "row long, col long")
    out = {(r.row, r.col): r.value
           for r in insert_dams(df, dams, dam_length=2 * h + 1).collect()}
    crest = _crest_serial(cells, h)
    # serial: winning direction = first direction attaining the max crest
    lifted = {}
    for (pr, pc) in [(7, 7), (3, 10)]:
        per_dir = {}
        for name, (dr, dc) in STEPS.items():
            best = -np.inf
            for s in range(0, 2 * h + 1):
                lmax = max(cells.get((pr - k * dr, pc - k * dc), -np.inf)
                           for k in range(s + 1))
                rmax = max(cells.get((pr + k * dr, pc + k * dc), -np.inf)
                           for k in range(2 * h - s + 1))
                best = max(best, min(lmax, rmax))
            per_dir[name] = best
        cbest = crest[(pr, pc)]
        name = next(nm for nm in ("ew", "ns", "nesw", "senw")
                    if per_dir[nm] == cbest)
        dr, dc = STEPS[name]
        for k in range(-h, h + 1):
            q = (pr + k * dr, pc + k * dc)
            if q in cells:
                lifted[q] = max(lifted.get(q, -np.inf), cbest)
    for p, z in cells.items():
        want = max(z, lifted.get(p, z))
        assert out[p] == pytest.approx(want, abs=1e-12), p
