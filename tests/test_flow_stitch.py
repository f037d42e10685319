"""Tile-stitched hydrology (flow_stitch) pinned bit-for-bit against the
superstep-peel / fixpoint implementations that are themselves oracle-green,
plus an independent serial priority-flood ground truth."""

import heapq

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _random_dem(spark, rows, cols, seed, holes=0.0):
    rng = np.random.RandomState(seed)
    z = rng.rand(rows, cols) * 100.0
    recs = []
    for r in range(rows):
        for c in range(cols):
            if holes and rng.rand() < holes:
                continue
            recs.append((r, c, float(z[r, c])))
    return spark.createDataFrame(recs, "row long, col long, value double")


def _serial_fill(rows_list):
    """Independent ground truth: serial priority flood (Barnes/Wang-Liu)."""
    z = {(r, c): v for r, c, v in rows_list}
    r0 = min(k[0] for k in z)
    r1 = max(k[0] for k in z)
    c0 = min(k[1] for k in z)
    c1 = max(k[1] for k in z)

    def outlet(k):
        r, c = k
        if r in (r0, r1) or c in (c0, c1):
            return True
        return any((r + dr, c + dc) not in z for dr, dc in N8)

    fill = {}
    h = [(z[k], k) for k in z if outlet(k)]
    heapq.heapify(h)
    while h:
        lvl, k = heapq.heappop(h)
        if k in fill:
            continue
        fill[k] = lvl
        for dr, dc in N8:
            k2 = (k[0] + dr, k[1] + dc)
            if k2 in z and k2 not in fill:
                heapq.heappush(h, (max(lvl, z[k2]), k2))
    return fill


def _serial_accum(rows_list, grid):
    """Independent ground truth: D8 accumulation via direct pointer chase."""
    import math

    z = {(r, c): v for r, c, v in rows_list}
    diag = math.sqrt(grid.res_x**2 + grid.res_y**2)
    dx = [1, 1, 1, 0, -1, -1, -1, 0]
    dy = [-1, 0, 1, 1, 1, 0, -1, -1]
    lens = [diag, grid.res_x, diag, grid.res_y, diag, grid.res_x, diag, grid.res_y]
    nxt = {}
    for (r, c), v in z.items():
        best = None
        for i in range(8):
            k2 = (r + dy[i], c + dx[i])
            if k2 in z:
                s = (v - z[k2]) / lens[i]
                if s > 0 and (best is None or s > best[0]):
                    best = (s, k2)
        if best:
            nxt[(r, c)] = best[1]
    fa = {k: 1.0 for k in z}
    indeg = {k: 0 for k in z}
    for k, t in nxt.items():
        indeg[t] += 1
    stack = [k for k in z if indeg[k] == 0]
    while stack:
        k = stack.pop()
        if k in nxt:
            t = nxt[k]
            fa[t] += fa[k]
            indeg[t] -= 1
            if indeg[t] == 0:
                stack.append(t)
    return fa


@pytest.mark.parametrize("block", [4, 7, 16])
def test_d8_accum_tiled_matches_serial(spark, block):
    from whitebox_tools_spark.operators.flow_stitch import d8_flow_accumulation_tiled

    grid = GridSpec(west=0.0, north=100.0, res_x=2.0, res_y=2.0, rows=30, cols=24)
    dem = _random_dem(spark, 30, 24, seed=11, holes=0.05)
    rows_list = [(r.row, r.col, r.value) for r in dem.collect()]
    truth = _serial_accum(rows_list, grid)
    out = {
        (r.row, r.col): r.value
        for r in d8_flow_accumulation_tiled(dem, grid, block=block).collect()
    }
    assert set(out) == set(truth)
    for k in truth:
        assert out[k] == truth[k], (k, out[k], truth[k])


@pytest.mark.parametrize("block", [4, 7, 16])
def test_fill_tiled_matches_serial(spark, block):
    from whitebox_tools_spark.operators.flow_stitch import fill_depressions_tiled

    dem = _random_dem(spark, 30, 24, seed=23, holes=0.05)
    rows_list = [(r.row, r.col, r.value) for r in dem.collect()]
    truth = _serial_fill(rows_list)
    out = {
        (r.row, r.col): r.value
        for r in fill_depressions_tiled(dem, block=block).collect()
    }
    assert set(out) == set(truth)
    for k in truth:
        assert out[k] == pytest.approx(truth[k], abs=0.0), k


def test_tiled_matches_peel_and_fixpoint(spark):
    """Bit-match against the oracle-green superstep implementations."""
    from whitebox_tools_spark.operators.flow_stitch import (
        d8_flow_accumulation_tiled,
        fill_depressions_tiled,
    )
    from whitebox_tools_spark.operators.hydro import (
        d8_flow_accumulation,
        fill_depressions,
    )

    grid = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=20)
    dem = _random_dem(spark, 20, 20, seed=5).localCheckpoint()

    a = d8_flow_accumulation(dem, grid).withColumnRenamed("value", "v1")
    b = d8_flow_accumulation_tiled(dem, grid, block=6).withColumnRenamed("value", "v2")
    j = a.join(b, ["row", "col"], "full")
    assert (
        j.filter(
            (F.col("v1") != F.col("v2")) | F.col("v1").isNull() | F.col("v2").isNull()
        ).count()
        == 0
    )

    a = fill_depressions(dem).withColumnRenamed("value", "v1")
    b = fill_depressions_tiled(dem, block=6).withColumnRenamed("value", "v2")
    j = a.join(b, ["row", "col"], "full")
    assert (
        j.filter(
            (F.col("v1") != F.col("v2")) | F.col("v1").isNull() | F.col("v2").isNull()
        ).count()
        == 0
    )


def test_solve_fa_weighted_recursion(spark):
    """Deep recursion path: chain graph forcing multiple stitch levels,
    weighted seeds."""
    from whitebox_tools_spark.operators.flow_stitch import solve_fa

    n = 500
    recs = [(0, c, float(c + 1), 0 if c + 1 < n else None, c + 1 if c + 1 < n else None)
            for c in range(n)]
    nodes = spark.createDataFrame(
        recs, "row long, col long, w double, nrow long, ncol long"
    )
    out = {
        r.col: r.fa
        for r in solve_fa(nodes, block=8, scale=4, direct_threshold=10).collect()
    }
    # fa(c) = sum of w over cells 0..c = (c+1)(c+2)/2
    for c in range(n):
        assert out[c] == (c + 1) * (c + 2) / 2


@pytest.mark.parametrize("block", [6, 16])
def test_breach_removes_all_pits(spark, block):
    """Semantic invariant of Lindsay-2016 breaching: after carving, every
    interior cell has a strictly lower 8-neighbor (no pits, no flats that
    trap flow)."""
    from whitebox_tools_spark.operators.breach import breach_depressions
    from whitebox_tools_spark.operators.hydro import d8_pointer

    grid = GridSpec(west=0.0, north=100.0, res_x=2.0, res_y=2.0, rows=24, cols=20)
    dem = _random_dem(spark, 24, 20, seed=41, holes=0.04).localCheckpoint()
    out = breach_depressions(dem, grid, block=block).localCheckpoint()
    assert out.count() == dem.count()
    ptr = d8_pointer(out, grid)
    # pointer 0 allowed only at outlets (border or nodata-adjacent)
    cellset = {(r.row, r.col) for r in dem.collect()}
    pits = [
        (r.row, r.col)
        for r in ptr.filter(F.col("pointer") == 0).collect()
        if not (
            r.row in (0, 23)
            or r.col in (0, 19)
            or any(
                (r.row + dr, r.col + dc) not in cellset
                for dr, dc in N8
            )
        )
    ]
    assert pits == []


def test_breach_carves_minimally(spark):
    """Cells outside depressions keep their original elevation."""
    from whitebox_tools_spark.operators.breach import breach_depressions

    grid = GridSpec(west=0.0, north=100.0, res_x=2.0, res_y=2.0, rows=12, cols=12)
    # strictly draining cone: z = distance from border -> no depressions
    recs = [
        (r, c, float(min(r, c, 11 - r, 11 - c)))
        for r in range(12)
        for c in range(12)
    ]
    dem = spark.createDataFrame(recs, "row long, col long, value double")
    out = breach_depressions(dem, grid, block=5)
    changed = (
        out.join(dem.withColumnRenamed("value", "z"), ["row", "col"])
        .filter(F.abs(F.col("value") - F.col("z")) > 1e-12)
        .count()
    )
    # the flat cone rings ARE plateaus in z; carving may grade them, but the
    # cone apex path is monotone so nothing deepens below 0 - s*diameter
    assert out.agg(F.min("value")).collect()[0][0] >= -1.0
    assert changed < 144


def test_solve_fa_max_semiring(spark):
    """max-upslope propagation vs a serial pointer chase."""
    import numpy as np

    from whitebox_tools_spark.operators.flow_stitch import solve_fa

    rng = np.random.RandomState(17)
    n = 24
    z = rng.rand(n, n) * 100
    w = rng.rand(n, n) * 50
    grid = GridSpec(west=0.0, north=100.0, res_x=2.0, res_y=2.0, rows=n, cols=n)
    dem = spark.createDataFrame(
        [(r, c, float(z[r, c])) for r in range(n) for c in range(n)],
        "row long, col long, value double",
    )
    from whitebox_tools_spark.operators.hydro import _flow_edges

    edges = _flow_edges(dem, grid)
    nodes = spark.createDataFrame(
        [(r, c, float(w[r, c])) for r in range(n) for c in range(n)],
        "row long, col long, w double",
    ).join(edges, ["row", "col"], "left").select(
        "row", "col", "w",
        F.col("trow").alias("nrow"), F.col("tcol").alias("ncol"),
    )
    got = {
        (r.row, r.col): r.fa
        for r in solve_fa(nodes, block=7, scale=4, direct_threshold=20, op="max").collect()
    }
    # serial truth
    nxt = {(r.row, r.col): (r.trow, r.tcol) for r in edges.collect()}
    best = {(r, c): w[r, c] for r in range(n) for c in range(n)}
    import collections

    indeg = collections.Counter(nxt.values())
    stack = [k for k in best if indeg.get(k, 0) == 0]
    seen_in = collections.Counter()
    while stack:
        k = stack.pop()
        if k in nxt:
            t = nxt[k]
            best[t] = max(best[t], best[k])
            seen_in[t] += 1
            if seen_in[t] == indeg[t]:
                stack.append(t)
    for k, v in best.items():
        assert got[k] == v, k


def _serial_fd8(rows_list, grid, exponent=1.1):
    """Independent ground truth: FD8 fractions computed from scratch
    (slope^exponent proportioning, fd8_flow_accum.rs:400-470) + a serial
    topological accumulate."""
    import math

    z = {(r, c): v for r, c, v in rows_list}
    diag = math.sqrt(grid.res_x**2 + grid.res_y**2)
    dx = [1, 1, 1, 0, -1, -1, -1, 0]
    dy = [-1, 0, 1, 1, 1, 0, -1, -1]
    lens = [diag, grid.res_x, diag, grid.res_y, diag, grid.res_x, diag, grid.res_y]
    edges = {}
    for (r, c), v in z.items():
        ws = []
        for i in range(8):
            k2 = (r + dy[i], c + dx[i])
            s = (v - z[k2]) / lens[i] if k2 in z else 0.0
            ws.append((k2, s**exponent if s > 0 else 0.0))
        tot = sum(w for _, w in ws)
        if tot > 0:
            edges[(r, c)] = [
                (k2, w / tot) for k2, w in ws if w > 0 and k2 in z
            ]
    fa = {k: 1.0 for k in z}
    indeg = {k: 0 for k in z}
    for k, outs in edges.items():
        for t, _ in outs:
            indeg[t] += 1
    stack = [k for k in z if indeg[k] == 0]
    while stack:
        k = stack.pop()
        for t, f in edges.get(k, ()):  # push
            fa[t] += fa[k] * f
            indeg[t] -= 1
            if indeg[t] == 0:
                stack.append(t)
    return fa


@pytest.mark.parametrize("block", [4, 7, 16])
def test_fd8_tiled_matches_serial(spark, block):
    """solve_wfa (weighted-semiring tile stitch) vs an independent serial
    FD8 — recursion FORCED via a tiny direct_threshold so the multi-level
    inlet-graph path is what's certified."""
    from whitebox_tools_spark.operators.flow_stitch import (
        fd8_flow_accumulation_tiled,
    )

    grid = GridSpec(west=0.0, north=100.0, res_x=2.0, res_y=2.0, rows=30, cols=24)
    dem = _random_dem(spark, 30, 24, seed=31, holes=0.05)
    rows_list = [(r.row, r.col, r.value) for r in dem.collect()]
    truth = _serial_fd8(rows_list, grid)
    out = {
        (r.row, r.col): r.value
        for r in fd8_flow_accumulation_tiled(
            dem, grid, block=block, direct_threshold=10
        ).collect()
    }
    assert set(out) == set(truth)
    for k in truth:
        assert out[k] == pytest.approx(truth[k], rel=1e-9), k


def test_weighted_tiled_matches_peel(spark):
    """FD8 and DInf: tile stitch vs the oracle-green superstep peel on the
    same edge set (two independent solvers of one linear system)."""
    from whitebox_tools_spark.operators.flow_stitch import (
        dinf_flow_accumulation_tiled,
        fd8_flow_accumulation_tiled,
    )
    from whitebox_tools_spark.operators.hydro import dinf_flow_accum, fd8_flow_accum

    grid = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=20)
    dem = _random_dem(spark, 20, 20, seed=7).localCheckpoint()

    for peel, tiled in (
        (fd8_flow_accum, fd8_flow_accumulation_tiled),
        (dinf_flow_accum, dinf_flow_accumulation_tiled),
    ):
        a = {(r.row, r.col): r.value for r in peel(dem, grid).collect()}
        b = {
            (r.row, r.col): r.value
            for r in tiled(dem, grid, block=6, direct_threshold=10).collect()
        }
        assert set(a) == set(b)
        for k in a:
            assert b[k] == pytest.approx(a[k], rel=1e-9), k


def test_fill_spill_graph_distributed(spark):
    """VERDICT r04 item 4: the spill-graph minimax solve must not collect
    O(tiles) data — force the hierarchical path (spill_threshold tiny) on
    a >= 64-tile decomposition and demand bit-identity with the serial
    priority-flood ground truth AND with the driver-Dijkstra path."""
    from whitebox_tools_spark.operators.flow_stitch import fill_depressions_tiled

    dem = _random_dem(spark, 60, 48, seed=41, holes=0.04)
    rows_list = [(r.row, r.col, r.value) for r in dem.collect()]
    truth = _serial_fill(rows_list)
    out = {
        (r.row, r.col): r.value
        for r in fill_depressions_tiled(
            dem, block=4, spill_threshold=10
        ).collect()
    }
    assert set(out) == set(truth)
    for k in truth:
        assert out[k] == truth[k], (k, out[k], truth[k])
    # and equals the driver-path result exactly
    out2 = {
        (r.row, r.col): r.value
        for r in fill_depressions_tiled(dem, block=4).collect()
    }
    assert out == out2
