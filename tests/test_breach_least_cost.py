"""BreachDepressionsLeastCost vs an independent serial transcription.

The oracle below re-implements the engine's documented contract (module
docstring of operators/breach.py, derived from
hydro_analysis/breach_depressions_least_cost.rs) with pure-python dicts and
a serial pit loop — no numpy dense blocks, no tiling — so a tiling/halo bug
in the engine cannot also hide in the oracle.
"""

import heapq
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

DX = [1, 1, 1, 0, -1, -1, -1, 0]
DY = [-1, 0, 1, 1, 1, 0, -1, -1]


def _serial_breach(vals, grid, *, dist, max_cost, min_dist, s):
    """Independent transcription: raise pits, per-pit Dijkstra on the raised
    surface (deterministic (cost,row,col) heap order), min-combine carves."""
    z0 = {}
    for r in range(len(vals)):
        for c in range(len(vals[0])):
            if vals[r][c] is not None:
                z0[(r, c)] = float(vals[r][c])
    raised = dict(z0)
    pits = []
    for (r, c), z in z0.items():
        nbs = [z0.get((r + DY[n], c + DX[n])) for n in range(8)]
        if all(v is not None for v in nbs) and min(nbs) >= z:
            raised[(r, c)] = min(nbs) - s
            pits.append((r, c))
    diag = math.sqrt(grid.res_x**2 + grid.res_y**2)
    cdist = [diag, grid.res_x, diag, grid.res_y, diag, grid.res_x, diag, grid.res_y]
    carve = {}
    for pr, pc in sorted(pits):
        z = raised[(pr, pc)]
        heap = [(0.0, pr, pc)]
        enc = {(pr, pc)}
        plen = {(pr, pc): 0}
        back = {}
        solved = False
        while heap and not solved:
            accum, r, c = heapq.heappop(heap)
            if accum > max_cost:
                break
            L = plen[(r, c)]
            cost1 = raised[(r, c)] - z + L * s
            for n in range(8):
                rn, cn = r + DY[n], c + DX[n]
                if (rn, cn) in enc:
                    continue
                Ln = L + 1
                plen[(rn, cn)] = Ln
                back[(rn, cn)] = (r, c)
                zn = raised.get((rn, cn))
                zout = z - Ln * s
                if zn is not None and zn > zout:
                    enc.add((rn, cn))
                    if Ln <= dist:
                        w = (cost1 + (zn - zout)) / 2.0 * cdist[n] if min_dist \
                            else zn - zout
                        heapq.heappush(heap, (accum + w, rn, cn))
                else:
                    br, bc = rn, cn
                    while (br, bc) in back:
                        br, bc = back[(br, bc)]
                        zb = z - plen[(br, bc)] * s
                        if raised[(br, bc)] > zb:
                            carve[(br, bc)] = min(carve.get((br, bc), zb), zb)
                    solved = True
                    break
    return {k: min(v, carve.get(k, v)) for k, v in raised.items()}


def _random_dem(seed, n=18, n_pits=6):
    rng = np.random.default_rng(seed)
    vals = (rng.uniform(50, 60, (n, n)) + np.arange(n)[:, None] * 0.5).tolist()
    for _ in range(n_pits):  # dig depressions of varying depth/size
        r, c = rng.integers(2, n - 2, 2)
        rad = int(rng.integers(1, 3))
        for dr in range(-rad, rad + 1):
            for dc in range(-rad, rad + 1):
                vals[r + dr][c + dc] = float(rng.uniform(20, 40))
    vals[0][3] = None  # interior-ish nodata hole on the edge row
    vals[5][0] = None
    return vals


@pytest.mark.parametrize("seed,min_dist", [(11, True), (12, False)])
def test_breach_least_cost_matches_serial(spark, seed, min_dist):
    from whitebox_tools_spark.operators.breach import breach_depressions_least_cost

    grid = GridSpec(west=0.0, north=90.0, res_x=5.0, res_y=5.0, rows=18, cols=18)
    vals = _random_dem(seed)
    s = 0.001
    rows = [(r, c, vals[r][c]) for r in range(18) for c in range(18)
            if vals[r][c] is not None]
    df = spark.createDataFrame(rows, "row long, col long, value double")
    out = breach_depressions_least_cost(
        df, grid, dist=6, min_dist=min_dist, fill=False, flat_increment=s, tile=8
    )
    got = {(r.row, r.col): r.value for r in out.collect()}
    want = _serial_breach(vals, grid, dist=6, max_cost=float("inf"),
                          min_dist=min_dist, s=s)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_breach_least_cost_tile_invariance_and_fill(spark):
    from whitebox_tools_spark.operators.breach import breach_depressions_least_cost

    grid = GridSpec(west=0.0, north=90.0, res_x=5.0, res_y=5.0, rows=18, cols=18)
    vals = _random_dem(21)
    rows = [(r, c, vals[r][c]) for r in range(18) for c in range(18)
            if vals[r][c] is not None]
    df = spark.createDataFrame(rows, "row long, col long, value double")
    kw = dict(dist=5, max_cost=8.0, flat_increment=0.001)
    a = {(r.row, r.col): r.value
         for r in breach_depressions_least_cost(df, grid, tile=8, fill=False, **kw).collect()}
    b = {(r.row, r.col): r.value
         for r in breach_depressions_least_cost(df, grid, tile=64, fill=False, **kw).collect()}
    assert a == b  # halo/tiling must not change the result
    # max_cost leaves some pits unsolved -> fill resolves them: the filled
    # surface has no interior pit cell left
    filled = breach_depressions_least_cost(df, grid, tile=8, fill=True, **kw)
    fz = {(r.row, r.col): r.value for r in filled.collect()}
    for (r, c), z in fz.items():
        nbs = [fz.get((r + DY[n], c + DX[n])) for n in range(8)]
        if all(v is not None for v in nbs):
            assert min(nbs) <= z + 1e-9, (r, c)
