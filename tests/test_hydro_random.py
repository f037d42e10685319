"""D8 pointer / flow accumulation, RND operators, multi-band tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

G5 = GridSpec(west=0.0, north=25.0, res_x=5.0, res_y=5.0, rows=5, cols=5)


def _dem(spark, vals):
    rows = [
        (r, c, float(vals[r][c]))
        for r in range(len(vals))
        for c in range(len(vals[0]))
        if vals[r][c] is not None
    ]
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_d8_pointer_simple_slope(spark):
    from whitebox_tools_spark.operators.hydro import d8_pointer

    # elevation increases with row -> everything drains N (dir 7 -> 128);
    # top row has no downslope -> 0
    vals = [[10 * r + 1 for c in range(3)] for r in range(3)]
    out = {(r.row, r.col): r.pointer for r in d8_pointer(_dem(spark, vals), G5).collect()}
    assert out[(0, 0)] == 0 and out[(0, 2)] == 0
    assert out[(1, 1)] == 128 and out[(2, 1)] == 128


def test_d8_pointer_tie_breaks_lowest_index(spark):
    from whitebox_tools_spark.operators.hydro import d8_pointer

    # center higher than all equal neighbors: diagonal slopes are smaller
    # (longer run), so E (index 1, value 2) wins among the cardinal ties
    vals = [[1, 1, 1], [1, 5, 1], [1, 1, 1]]
    out = {(r.row, r.col): r.pointer for r in d8_pointer(_dem(spark, vals), G5).collect()}
    assert out[(1, 1)] == 2


def test_d8_flow_accumulation_chain_and_merge(spark):
    from whitebox_tools_spark.operators.hydro import d8_flow_accumulation

    # single column decreasing southward: strict chain 1,2,3
    vals = [[30.0], [20.0], [10.0]]
    out = {(r.row, r.col): r.value for r in
           d8_flow_accumulation(_dem(spark, vals), G5).collect()}
    assert out == {(0, 0): 1.0, (1, 0): 2.0, (2, 0): 3.0}


def test_d8_flow_accumulation_matches_bfs_oracle(spark):
    """Random surface: compare against a python topological-sum oracle."""
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY, d8_flow_accumulation

    rng = np.random.default_rng(5)
    n = 8
    vals = rng.uniform(0, 100, (n, n))
    out = {(r.row, r.col): r.value for r in
           d8_flow_accumulation(_dem(spark, vals), G5).collect()}

    import math
    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    succ = {}
    for r in range(n):
        for c in range(n):
            best = None
            for i in range(8):
                rr, cc = r + D8_DY[i], c + D8_DX[i]
                if 0 <= rr < n and 0 <= cc < n:
                    s = (vals[r][c] - vals[rr][cc]) / lens[i]
                    if s > 0 and (best is None or s > best[0]):
                        best = (s, (rr, cc))
            succ[(r, c)] = best[1] if best else None
    acc = {k: 1.0 for k in succ}
    for start in succ:
        cur = succ[start]
        while cur is not None:
            acc[cur] += 1.0
            cur = succ[cur]
    assert out == acc


def test_basins_matches_walk_oracle(spark):
    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY, basins

    rng = np.random.default_rng(21)
    n = 9
    vals = rng.uniform(0, 100, (n, n))
    out = {(r.row, r.col): r.basin_id for r in basins(_dem(spark, vals), G5).collect()}

    import math
    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    succ = {}
    for r in range(n):
        for c in range(n):
            best = None
            for i in range(8):
                rr, cc = r + D8_DY[i], c + D8_DX[i]
                if 0 <= rr < n and 0 <= cc < n:
                    s = (vals[r][c] - vals[rr][cc]) / lens[i]
                    if s > 0 and (best is None or s > best[0]):
                        best = (s, (rr, cc))
            succ[(r, c)] = best[1] if best else None
    term = {}
    for start in succ:
        cur = start
        while succ[cur] is not None:
            cur = succ[cur]
        term[start] = cur
    terminals = sorted({t for t in term.values()}, key=lambda t: t[0] * (1 << 31) + t[1])
    ids = {t: i + 1 for i, t in enumerate(terminals)}
    expect = {k: ids[v] for k, v in term.items()}
    assert out == expect


def test_cost_distance_matches_dijkstra(spark):
    import heapq
    import math

    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY, cost_distance

    rng = np.random.default_rng(31)
    n = 8
    vals = rng.uniform(1, 10, (n, n))
    cost = _dem(spark, vals)
    sources = spark.createDataFrame([(0, 0), (7, 7)], "row long, col long")
    out = {(r.row, r.col): r.value for r in
           cost_distance(cost, sources, G5).collect()}

    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    dist = {(0, 0): 0.0, (7, 7): 0.0}
    heap = [(0.0, 0, 0), (0.0, 7, 7)]
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist.get((r, c), float("inf")):
            continue
        for i in range(8):
            rr, cc = r + D8_DY[i], c + D8_DX[i]
            if 0 <= rr < n and 0 <= cc < n:
                nd = d + (vals[r][c] + vals[rr][cc]) / 2.0 * lens[i]
                if nd < dist.get((rr, cc), float("inf")):
                    dist[(rr, cc)] = nd
                    heapq.heappush(heap, (nd, rr, cc))
    assert set(out) == set(dist)
    for k in dist:
        assert out[k] == pytest.approx(dist[k], abs=1e-9)


def test_fill_depressions_bowl(spark):
    from whitebox_tools_spark.operators.hydro import fill_depressions

    # 5x5 rim at 10 with an interior pit (1) whose pour path runs through
    # a channel (4, 3) to a border outlet at 7 -> the whole depression
    # fills to the pour elevation 7
    vals = [[10.0] * 5 for _ in range(5)]
    vals[2][2] = 1.0
    vals[1][2] = 3.0
    vals[2][1] = 4.0
    vals[2][0] = 7.0
    out = {(r.row, r.col): r.value for r in
           fill_depressions(_dem(spark, vals)).collect()}
    assert out[(2, 2)] == 7.0   # raised to the pour elevation
    assert out[(2, 1)] == 7.0
    assert out[(1, 2)] == 7.0
    assert out[(2, 0)] == 7.0   # border outlet keeps its own z
    assert out[(0, 0)] == 10.0


def test_fill_depressions_matches_priority_flood(spark):
    """Random DEM vs a python priority-flood (heapq) reference."""
    import heapq

    from whitebox_tools_spark.operators.hydro import fill_depressions

    rng = np.random.default_rng(13)
    n = 10
    vals = rng.uniform(0, 100, (n, n))
    out = {(r.row, r.col): r.value for r in
           fill_depressions(_dem(spark, vals)).collect()}

    filled = np.full((n, n), np.inf)
    heap = []
    for r in range(n):
        for c in range(n):
            if r in (0, n - 1) or c in (0, n - 1):
                filled[r][c] = vals[r][c]
                heapq.heappush(heap, (vals[r][c], r, c))
    while heap:
        w, r, c = heapq.heappop(heap)
        if w > filled[r][c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                rr, cc = r + dr, c + dc
                if (dr or dc) and 0 <= rr < n and 0 <= cc < n:
                    nw = max(vals[rr][cc], w)
                    if nw < filled[rr][cc]:
                        filled[rr][cc] = nw
                        heapq.heappush(heap, (nw, rr, cc))
    expect = {(r, c): filled[r][c] for r in range(n) for c in range(n)}
    assert out == expect


def test_random_field_distribution(spark):
    from whitebox_tools_spark.operators.random import random_field

    g = GridSpec(west=0.0, north=500.0, res_x=5.0, res_y=5.0, rows=100, cols=100)
    vals = [r.value for r in random_field(spark, g, seed=11).collect()]
    assert len(vals) == 10_000
    m, sd = float(np.mean(vals)), float(np.std(vals))
    assert abs(m) < 0.05 and abs(sd - 1.0) < 0.05
    # determinism
    vals2 = [r.value for r in random_field(spark, g, seed=11).collect()]
    assert vals == vals2


def test_random_sample_deterministic_and_valid(spark):
    from whitebox_tools_spark.operators.random import random_sample

    cells = spark.createDataFrame(
        [(r, c, float(r * 10 + c)) for r in range(20) for c in range(20)],
        "row long, col long, value double",
    )
    a = sorted((r.row, r.col, r.sample_id) for r in random_sample(cells, 30, seed=2).collect())
    b = sorted((r.row, r.col, r.sample_id) for r in random_sample(cells, 30, seed=2).collect())
    assert a == b and len(a) == 30
    assert {s for _, _, s in a} == set(range(1, 31))


def test_tiled_gather_bit_identical(spark):
    """gather25_tiled must equal gather25 bit-for-bit (it only moves
    values), so slope via the tiled path equals the scatter path exactly —
    including grid edges and nodata holes, with a tile size that forces
    multiple tiles and halo crossings."""
    from whitebox_tools_spark.operators.focal import gather25, gather25_tiled, slope

    rng = np.random.default_rng(17)
    rows = [
        (r, c, float(rng.uniform(0, 1000)))
        for r in range(20) for c in range(20)
        if (r, c) not in {(3, 3), (10, 11), (0, 19)}  # nodata holes
    ]
    cells = spark.createDataFrame(rows, "row long, col long, value double")
    a = sorted(tuple(r) for r in gather25(cells, z_factor=2.0).collect())
    b = sorted(tuple(r) for r in gather25_tiled(cells, z_factor=2.0, tile=8).collect())
    assert a == b
    sa = sorted(tuple(r) for r in slope(cells, res=5.0).collect())
    sb = sorted(tuple(r) for r in slope(cells, res=5.0, tiled=True, tile=8).collect())
    assert sa == sb


def test_normalized_difference(spark):
    from whitebox_tools_spark.operators.raster_math import normalized_difference

    rows = [(1, 0, 0, 8.0), (2, 0, 0, 2.0), (1, 0, 1, 3.0), (2, 0, 1, -3.0)]
    banded = spark.createDataFrame(rows, "band int, row long, col long, value double")
    out = {(r.row, r.col): r.value for r in normalized_difference(banded, 1, 2).collect()}
    assert out[(0, 0)] == pytest.approx(0.6)
    assert out[(0, 1)] is None  # a + b == 0 -> nodata


def test_stream_network_suite_semantics(spark):
    """Fishbone valley: tributaries join a main stem — checks confluence
    semantics (Shreve sums, Strahler promotion, link segmentation,
    first-pour-point watersheds, monotone flowpath lengths)."""
    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators import streams as S
    from pyspark.sql import functions as F

    R, C = 14, 11
    recs = []
    for r in range(R):
        for c in range(C):
            v = abs(c - 5) * 50.0 + (R - r) * 2.0 + ((r * 31 + c * 17) % 7) * 0.1
            if r % 4 == 1 and c != 5:
                v -= 45.0
            recs.append((r, c, v))
    cells = spark.createDataFrame(recs, "row long, col long, value double")
    grid = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=R, cols=C)
    th = 4.0

    sm = {(r.row, r.col): r.value for r in S.shreve_magnitude(cells, grid, threshold=th).collect()}
    li = S.stream_link_identifier(cells, grid, threshold=th).collect()
    so = S.strahler_order(cells, grid, threshold=th).collect()
    assert max(sm.values()) > 1.0  # confluences sum magnitudes
    assert set(sm) == {(r.row, r.col) for r in li}  # same stream cells
    assert max(r.value for r in so) == 2.0  # fishbone promotes stem to 2
    # links partition the stream cells; ids dense 1..n
    ids = {r.link_id for r in li}
    assert ids == set(range(1, len(ids) + 1))

    # Shreve magnitude is non-decreasing downstream along the stem (col 5)
    stem = sorted((rc[0], v) for rc, v in sm.items() if rc[1] == 5)
    assert all(v2 >= v1 for (_, v1), (_, v2) in zip(stem, stem[1:]))

    pour = spark.createDataFrame(
        [(11, 5, 7), (3, 5, 9)], "row long, col long, pour_id long"
    )
    ws = S.watershed(cells, grid, pour).collect()
    sizes = {}
    for r in ws:
        sizes[r.pour_id] = sizes.get(r.pour_id, 0) + 1
    # upstream pour point captures its own watershed; cells above it do NOT
    # reach the downstream pour point (first-pour wins)
    assert set(sizes) == {7, 9} and sizes[9] > 0 and sizes[7] > 0
    assert sizes[7] + sizes[9] < R * C  # cells below the last pour stay unlabeled

    fl = {(r.row, r.col): r.value for r in S.downslope_flowpath_length(cells, grid).collect()}
    # along the stem the remaining distance decreases going downstream
    stem_fl = sorted((rc[0], v) for rc, v in fl.items() if rc[1] == 5)
    assert all(v2 <= v1 for (_, v1), (_, v2) in zip(stem_fl, stem_fl[1:]))


def test_fd8_flow_accum_matches_numpy(spark):
    import numpy as np

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import fd8_flow_accum

    rng = np.random.default_rng(41)
    R, C = 12, 9
    z = rng.uniform(0, 100, (R, C))
    grid = GridSpec(west=0.0, north=R * 5.0, res_x=5.0, res_y=5.0, rows=R, cols=C)
    cells = spark.createDataFrame(
        [(r, c, float(z[r, c])) for r in range(R) for c in range(C)],
        "row long, col long, value double",
    )
    exponent = 1.1
    out = {(r.row, r.col): r.value
           for r in fd8_flow_accum(cells, grid, exponent=exponent).collect()}

    # numpy oracle: process in decreasing elevation (a topological order of
    # the strictly-downhill flow DAG), reference weights slope^p over lower
    # valid neighbors (fd8_flow_accum.rs:424-470)
    dxs = [1, 1, 1, 0, -1, -1, -1, 0]
    dys = [-1, 0, 1, 1, 1, 0, -1, -1]
    diag = 5.0 * np.sqrt(2.0)
    lens = [diag, 5.0, diag, 5.0, diag, 5.0, diag, 5.0]
    fa = np.ones((R, C))
    order = np.argsort(-z, axis=None)
    for idx in order:
        r, c = divmod(idx, C)
        w = np.zeros(8)
        for i in range(8):
            rn, cn = r + dys[i], c + dxs[i]
            if 0 <= rn < R and 0 <= cn < C and z[rn, cn] < z[r, c]:
                w[i] = ((z[r, c] - z[rn, cn]) / lens[i]) ** exponent
        tw = w.sum()
        if tw > 0:
            for i in range(8):
                if w[i] > 0:
                    fa[r + dys[i], c + dxs[i]] += fa[r, c] * w[i] / tw
    for r in range(R):
        for c in range(C):
            assert out[(r, c)] == pytest.approx(fa[r, c], rel=1e-9), (r, c)


def test_dinf_flow_accum_matches_numpy(spark):
    import numpy as np

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import dinf_flow_accum, dinf_pointer

    rng = np.random.default_rng(43)
    R, C = 10, 10
    z = rng.uniform(0, 50, (R, C))
    grid = GridSpec(west=0.0, north=R * 5.0, res_x=5.0, res_y=5.0, rows=R, cols=C)
    cells = spark.createDataFrame(
        [(r, c, float(z[r, c])) for r in range(R) for c in range(C)],
        "row long, col long, value double",
    )
    dirs = {(r.row, r.col): r.value for r in dinf_pointer(cells, grid).collect()}
    out = {(r.row, r.col): r.value for r in dinf_flow_accum(cells, grid).collect()}

    # numpy oracle: elevation-desc order + the sector proportion table
    # (dinf_flow_accum.rs:545-603); flow to off-grid targets vanishes
    offs = [(0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1)]
    fa = np.ones((R, C))
    order = np.argsort(-z, axis=None)
    for idx in order:
        r, c = divmod(idx, C)
        d = dirs[(r, c)]
        if d is None or d < 0:
            continue
        k = min(int(d // 45.0), 7)
        p2 = (d - k * 45.0) / 45.0
        p1 = 1.0 - p2
        for (kk, p) in ((k, p1), ((k + 1) % 8, p2)):
            if p <= 0.0:
                continue
            rn, cn = r + offs[kk][1], c + offs[kk][0]
            if 0 <= rn < R and 0 <= cn < C:
                fa[rn, cn] += fa[r, c] * p
    for r in range(R):
        for c in range(C):
            assert out[(r, c)] == pytest.approx(fa[r, c], rel=1e-9), (r, c)


def test_cost_allocation_matches_dijkstra(spark):
    import heapq
    import math

    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY, cost_allocation

    rng = np.random.default_rng(33)
    n = 8
    vals = rng.uniform(1, 10, (n, n))
    cost = _dem(spark, vals)
    sources = spark.createDataFrame(
        [(0, 0, 1), (7, 7, 2)], "row long, col long, source_id long"
    )
    out = {(r.row, r.col): r.value for r in
           cost_allocation(cost, sources, G5).collect()}

    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    # multi-source Dijkstra carrying the claiming source; cost ties break to
    # the lowest source id (the engine's documented rule)
    dist = {(0, 0): (0.0, 1), (7, 7): (0.0, 2)}
    heap = [(0.0, 1, 0, 0), (0.0, 2, 7, 7)]
    while heap:
        d, sid, r, c = heapq.heappop(heap)
        if (d, sid) > dist.get((r, c), (float("inf"), 99)):
            continue
        for i in range(8):
            rr, cc = r + D8_DY[i], c + D8_DX[i]
            if 0 <= rr < n and 0 <= cc < n:
                nd = d + (vals[r][c] + vals[rr][cc]) / 2.0 * lens[i]
                if (nd, sid) < dist.get((rr, cc), (float("inf"), 99)):
                    dist[(rr, cc)] = (nd, sid)
                    heapq.heappush(heap, (nd, sid, rr, cc))
    assert set(out) == set(dist)
    for k, (d, sid) in dist.items():
        assert out[k] == sid, (k, out[k], dist[k])


def test_dinf_mass_flux_pinned(spark):
    """DInfMassFlux vs a serial numpy re-run of the Tarboton split +
    mass recurrence (independent of the Spark peel)."""
    import numpy as np
    from pyspark.sql import functions as F

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import _dinf_edges, dinf_mass_flux

    rng = np.random.RandomState(3)
    n = 14
    z = rng.rand(n, n) * 60
    grid = GridSpec(west=0.0, north=100.0, res_x=2.0, res_y=2.0, rows=n, cols=n)
    dem = spark.createDataFrame(
        [(r, c, float(z[r, c])) for r in range(n) for c in range(n)],
        "row long, col long, value double",
    ).localCheckpoint()
    loading = dem.withColumn("value", F.lit(1.0))
    eff = dem.withColumn("value", F.lit(0.9))
    ab = dem.withColumn("value", F.lit(0.05))
    got = {
        (r.row, r.col): r.value
        for r in dinf_mass_flux(dem, grid, loading, eff, ab).collect()
    }
    # serial: same edges (pulled from the engine's edge builder — the PIN is
    # on the mass recurrence), topological accumulate in python
    edges = [
        (r.row, r.col, r.trow, r.tcol, r.frac)
        for r in _dinf_edges(dem, grid).collect()
    ]
    import collections

    indeg = collections.Counter((tr, tc) for _r, _c, tr, tc, _f in edges)
    out_edges = collections.defaultdict(list)
    for r, c, tr, tc, f in edges:
        out_edges[(r, c)].append((tr, tc, f))
    m = {(r, c): 1.0 for r in range(n) for c in range(n)}
    seen = collections.Counter()
    stack = [k for k in m if indeg.get(k, 0) == 0]
    while stack:
        k = stack.pop()
        for tr, tc, f in out_edges.get(k, ()):
            m[(tr, tc)] += (m[k] - 0.05) * 0.9 * f
            seen[(tr, tc)] += 1
            if seen[(tr, tc)] == indeg[(tr, tc)]:
                stack.append((tr, tc))
    for k, v in m.items():
        assert got[k] == pytest.approx(v, rel=1e-9), k


def test_isobasins_matches_serial(spark):
    """Isobasins vs an independent serial transcription of the reference
    sweep (isobasins.rs:392-470), compared as PARTITIONS (ids canonicalized
    to each basin's outlet cell; the reference numbers by stack order, the
    engine by outlet scan order)."""
    import numpy as np

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import isobasins

    rng = np.random.RandomState(17)
    R, C = 18, 15
    grid = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=R, cols=C)
    recs = [
        (r, c, float(rng.rand() * 50.0 + 0.3 * r + 0.2 * c))
        for r in range(R) for c in range(C) if rng.rand() > 0.03
    ]
    dem = spark.createDataFrame(recs, "row long, col long, value double")
    size = 12

    # --- serial reference transcription ---
    import math

    z = {(r, c): v for r, c, v in recs}
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
    indeg = {k: 0 for k in z}
    for k, t in nxt.items():
        indeg[t] += 1
    order = [k for k in z if indeg[k] == 0]
    accum = {k: 1.0 for k in z}
    outlets = set()
    qi = 0
    deg = dict(indeg)
    while qi < len(order):
        k = order[qi]
        qi += 1
        fa = accum[k]
        if fa >= size:
            inla, inla_k = 0.0, None
            for i in range(8):
                k2 = (k[0] + dy[i], k[1] + dx[i])
                if k2 in z and nxt.get(k2) == k and accum[k2] > inla:
                    inla, inla_k = accum[k2], k2
            if inla <= size and (size - inla) < (fa - size) and inla_k is not None:
                fa -= inla
                outlets.add(inla_k)
            else:
                fa = 1.0
                outlets.add(k)
        if k in nxt:
            t = nxt[k]
            accum[t] += fa
            deg[t] -= 1
            if deg[t] == 0:
                order.append(t)
        else:
            outlets.add(k)
    # serial watershed: first outlet on path
    def first_outlet(k):
        while True:
            if k in outlets:
                return k
            if k not in nxt:
                return None
            k = nxt[k]

    truth = {k: first_outlet(k) for k in z}

    out = isobasins(dem, grid, size=size).collect()
    # canonicalize engine ids back to outlet cells via each basin's outlet:
    # the outlet cell of basin b is the unique cell whose value is b and
    # whose flow target has a different (or no) basin... simpler: id ->
    # outlet = the basin's cell that equals its own first_outlet in truth.
    got = {(r.row, r.col): r.value for r in out}
    # partition comparison: same-basin iff same-truth-outlet
    ids_by_outlet = {}
    for k, o in truth.items():
        if o is None:
            assert k not in got, k
            continue
        assert k in got, k
        if o in ids_by_outlet:
            assert got[k] == ids_by_outlet[o], (k, o)
        else:
            ids_by_outlet[o] = got[k]
    # distinct outlets map to distinct ids
    assert len(set(ids_by_outlet.values())) == len(ids_by_outlet)


def test_cost_distance_tiled_matches_bf_and_dijkstra(spark):
    """Hierarchical boundary-graph solver == Bellman-Ford supersteps ==
    independent python Dijkstra (block=8/threshold=200 forces >=1 real
    contraction level on the 24x24 surface)."""
    import heapq
    import math

    from whitebox_tools_spark.operators.hydro import (
        D8_DX, D8_DY, cost_distance, cost_distance_tiled,
    )

    rng = np.random.default_rng(47)
    n = 24
    vals = rng.uniform(1, 10, (n, n))
    cost = _dem(spark, vals)
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    sources = spark.createDataFrame([(0, 0), (23, 23), (3, 20)], "row long, col long")
    tiled = {(r.row, r.col): r.value
             for r in cost_distance_tiled(cost, sources, g, block=8,
                                          direct_threshold=200).collect()}
    bf = {(r.row, r.col): r.value for r in cost_distance(cost, sources, g).collect()}
    assert set(tiled) == set(bf)
    for k in bf:
        assert tiled[k] == pytest.approx(bf[k], rel=1e-9), k

    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    dist = {(0, 0): 0.0, (23, 23): 0.0, (3, 20): 0.0}
    heap = [(0.0, r, c) for (r, c) in dist]
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist.get((r, c), float("inf")):
            continue
        for i in range(8):
            rr, cc = r + D8_DY[i], c + D8_DX[i]
            if 0 <= rr < n and 0 <= cc < n:
                nd = d + (vals[r][c] + vals[rr][cc]) / 2.0 * lens[i]
                if nd < dist.get((rr, cc), float("inf")):
                    dist[(rr, cc)] = nd
                    heapq.heappush(heap, (nd, rr, cc))
    for k in dist:
        assert tiled[k] == pytest.approx(dist[k], rel=1e-9), k


def test_cost_allocation_tiled_matches_supersteps(spark):
    from whitebox_tools_spark.operators.hydro import (
        cost_allocation, cost_allocation_tiled,
    )

    rng = np.random.default_rng(53)
    n = 20
    vals = rng.uniform(1, 10, (n, n))
    cost = _dem(spark, vals)
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    sources = spark.createDataFrame(
        [(0, 0, 3), (19, 19, 1), (2, 17, 2)], "row long, col long, source_id long"
    )
    a = {(r.row, r.col): r.value
         for r in cost_allocation_tiled(cost, sources, g, block=8,
                                        direct_threshold=150).collect()}
    b = {(r.row, r.col): r.value for r in cost_allocation(cost, sources, g).collect()}
    assert a == b


def test_upslope_depression_storage_matches_serial(spark):
    """Independent serial transcription: python minimax flat fill +
    plateau BFS epsilon ramp + topological FD8 over dicts."""
    import heapq
    from collections import deque

    from whitebox_tools_spark.operators.hydro import (
        D8_DX, D8_DY, upslope_depression_storage,
    )

    rng = np.random.default_rng(61)
    n = 14
    vals = rng.uniform(10, 20, (n, n))
    vals[4:7, 4:7] = 11.0       # flat-bottomed depression
    vals[9:11, 2:5] = 12.5
    cost = _dem(spark, vals)
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    s = 0.001
    got = {(r.row, r.col): r.value for r in
           upslope_depression_storage(cost, g, flat_increment=s, block=8,
                                      direct_threshold=50).collect()}

    # --- serial oracle ---
    cells = {(r, c): float(vals[r][c]) for r in range(n) for c in range(n)}
    # minimax flat fill (priority flood from border)
    W = {}
    pq = []
    for (r, c), z in cells.items():
        if r in (0, n - 1) or c in (0, n - 1):
            heapq.heappush(pq, (z, r, c))
    while pq:
        w0, r, c = heapq.heappop(pq)
        if (r, c) in W:
            continue
        W[(r, c)] = w0
        for i in range(8):
            p = (r + D8_DY[i], c + D8_DX[i])
            if p in cells and p not in W:
                heapq.heappush(pq, (max(w0, cells[p]), p[0], p[1]))
    # plateau BFS hops to a lower-W (or border) cell
    hops = {}
    dq = deque()
    for (r, c), w0 in W.items():
        nbs = [(r + D8_DY[i], c + D8_DX[i]) for i in range(8)]
        if (r in (0, n - 1) or c in (0, n - 1)
                or any(p not in W for p in nbs)
                or any(W.get(p, 1e18) < w0 for p in nbs)):
            hops[(r, c)] = 0
            dq.append((r, c))
    while dq:
        r, c = dq.popleft()
        for i in range(8):
            p = (r + D8_DY[i], c + D8_DX[i])
            if p in W and p not in hops and W[p] == W[(r, c)]:
                hops[p] = hops[(r, c)] + 1
                dq.append(p)
    eps = {p: W[p] + s * hops[p] for p in W}
    depth = {p: eps[p] - cells[p] for p in W}
    # topological FD8 (exponent 1.1) over eps
    order = sorted(W, key=lambda p: (-eps[p], p))
    acc_d = dict(depth)
    acc_n = {p: 1.0 for p in W}
    for p in order:
        r, c = p
        ws = []
        for i in range(8):
            q = (r + D8_DY[i], c + D8_DX[i])
            if q in eps and eps[q] < eps[p]:
                ws.append((q, (eps[p] - eps[q]) ** 1.1))
        tot = sum(w for _, w in ws)
        if tot > 0:
            for q, w in ws:
                acc_d[q] += acc_d[p] * (w / tot)
                acc_n[q] += acc_n[p] * (w / tot)
    for p in W:
        assert got[p] == pytest.approx(round(acc_d[p] / acc_n[p], 6), abs=2e-6), p


def test_mdinf_matches_serial_transcription(spark):
    """Pure-python per-cell MDInf facet/valley/weight transcription +
    topological accumulation (independent of the numpy kernel)."""
    import math

    from whitebox_tools_spark.operators.hydro import (
        _MDINF_DD, _MDINF_XD, _MDINF_YD, mdinf_flow_accumulation,
    )

    rng = np.random.default_rng(83)
    n = 12
    vals = rng.uniform(0, 100, (n, n))
    df = _dem(spark, vals)
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    got = {(r.row, r.col): r.value
           for r in mdinf_flow_accumulation(df, g, block=8).collect()}

    gr, qpi = 5.0, math.pi / 4.0
    xd, yd, dd = _MDINF_XD, _MDINF_YD, _MDINF_DD
    cells = {(r, c): float(vals[r][c]) for r in range(n) for c in range(n)}

    def weights_of(rc):
        r0, c0 = rc
        z = cells[rc]
        P = [cells.get((r0 + yd[i], c0 + xd[i])) for i in range(8)]
        rr = [0.0] * 8
        ss = [0.0] * 8
        valid = [False] * 8
        down = [P[i] is not None and P[i] < z for i in range(8)]
        for c in range(8):
            i, ii = c, (c + 1) % 8
            p1, p2 = P[i], P[ii]
            if p1 is not None and p2 is not None:
                z1, z2 = p1 - z, p2 - z
                nx = (yd[i] * z2 - yd[ii] * z1) * gr
                ny = (xd[ii] * z1 - xd[i] * z2) * gr
                nzv = float(xd[i] * yd[ii] - xd[ii] * yd[i]) * gr * gr
                if nx == 0.0:
                    hr = 0.0 if ny >= 0.0 else math.pi
                elif nx >= 0.0:
                    hr = math.pi / 2.0 - math.atan(ny / nx)
                else:
                    hr = 3.0 * math.pi / 2.0 - math.atan(ny / nx)
                hs = -math.tan(math.acos(nzv / math.sqrt(nx * nx + ny * ny + nzv * nzv)))
                if hr < i * qpi or hr > (i + 1) * qpi:
                    if p1 < p2:
                        hr, hs = i * qpi, (z - p1) / (dd[i] * gr)
                    else:
                        hr, hs = ii * qpi, (z - p2) / (dd[ii] * gr)
                rr[c], ss[c], valid[c] = hr, hs, True
            elif p1 is not None and p1 < z:
                rr[c], ss[c], valid[c] = (i / 4.0) * math.pi, (z - p1) / (dd[ii] * gr), True
        valley = [0.0] * 8
        for i in range(8):
            ii, im = (i + 1) % 8, (i + 7) % 8
            if valid[i] and ss[i] > 0.0:
                if (i * qpi < rr[i] < (i + 1) * qpi) or rr[i] == rr[ii] \
                        or (not valid[ii] and rr[i] == (i + 1) * qpi) \
                        or (not valid[im] and rr[i] == i * qpi):
                    valley[i] = ss[i]
        valley = [v ** 1.1 for v in valley]
        vs = sum(valley)
        w = [0.0] * 8
        if vs > 0.0:
            valley = [v / vs for v in valley]
            if rr[7] == 0.0:
                rr[7] = 2.0 * math.pi
            for i in range(8):
                ii = (i + 1) % 8
                if valley[i] > 0.0:
                    w[i] += valley[i] * (((i + 1) * qpi - rr[i]) / qpi)
                    w[ii] += valley[i] * ((rr[i] - i * qpi) / qpi)
        return [(i, w[i]) for i in range(8) if down[i] and w[i] > 0.0]

    fa = {p: 1.0 for p in cells}
    for p in sorted(cells, key=lambda q: (-cells[q], q)):
        for i, w in weights_of(p):
            q = (p[0] + yd[i], p[1] + xd[i])
            fa[q] += fa[p] * w
    for p in cells:
        assert got[p] == pytest.approx(fa[p], rel=1e-9), p


@pytest.mark.parametrize("which", ["quinn", "qin"])
def test_quinn_qin_match_serial(spark, which):
    import math

    from whitebox_tools_spark.operators.hydro import (
        D8_DX, D8_DY, qin_flow_accumulation, quinn_flow_accumulation,
    )

    rng = np.random.default_rng(29)
    n = 10
    vals = rng.uniform(0, 100, (n, n))
    df = _dem(spark, vals)
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    if which == "quinn":
        got = {(r.row, r.col): r.value
               for r in quinn_flow_accumulation(df, g, block=8).collect()}
    else:
        got = {(r.row, r.col): r.value
               for r in qin_flow_accumulation(df, g, block=8).collect()}
    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    cl = [0.354 * 5.0, 0.5 * 5.0] * 4
    us = math.tan(math.radians(45.0))
    cells = {(r, c): float(vals[r][c]) for r in range(n) for c in range(n)}
    fa = {p: 1.0 for p in cells}
    for p in sorted(cells, key=lambda q: (-cells[q], q)):
        z = cells[p]
        slopes = []
        for i in range(8):
            q = (p[0] + D8_DY[i], p[1] + D8_DX[i])
            if q in cells and cells[q] < z:
                slopes.append((i, q, (z - cells[q]) / lens[i]))
        if not slopes:
            continue
        if which == "quinn":
            ws = [(q, cl[i] * s) for i, q, s in slopes]
        else:
            smax = max(s for _, _, s in slopes)
            f = min(smax, us) / us * (10.0 - 1.1) + 1.1
            ws = [(q, cl[i] * s ** f) for i, q, s in slopes]
        tot = sum(w for _, w in ws)
        for q, w in ws:
            fa[q] += fa[p] * (w / tot)
    for p in cells:
        assert got[p] == pytest.approx(fa[p], rel=1e-9), p


def test_cost_pathway_matches_serial(spark):
    import heapq
    import math

    from whitebox_tools_spark.operators.hydro import D8_DX, D8_DY, cost_pathway

    rng = np.random.default_rng(71)
    n = 12
    vals = rng.uniform(1, 10, (n, n))
    cost = _dem(spark, vals)
    g = GridSpec(west=0.0, north=n * 5.0, res_x=5.0, res_y=5.0, rows=n, cols=n)
    sources = spark.createDataFrame([(0, 0)], "row long, col long")
    dests = spark.createDataFrame([(11, 11), (2, 10)], "row long, col long")
    out = cost_pathway(cost, sources, dests, g, block=8, direct_threshold=100)
    got = {}
    for r in out.collect():
        got.setdefault(r.dest_id, set()).add((r.row, r.col))

    lens = [math.sqrt(50.0), 5.0, math.sqrt(50.0), 5.0] * 2
    dist = {(0, 0): 0.0}
    heap = [(0.0, 0, 0)]
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist.get((r, c), float("inf")):
            continue
        for i in range(8):
            rr, cc = r + D8_DY[i], c + D8_DX[i]
            if 0 <= rr < n and 0 <= cc < n:
                nd = d + (vals[r][c] + vals[rr][cc]) / 2.0 * lens[i]
                if nd < dist.get((rr, cc), float("inf")):
                    dist[(rr, cc)] = nd
                    heapq.heappush(heap, (nd, rr, cc))
    for dest in [(11, 11), (2, 10)]:
        path = [dest]
        cur = dest
        while dist[cur] > 0.0:
            cands = []
            for i in range(8):
                p = (cur[0] + D8_DY[i], cur[1] + D8_DX[i])
                if p in dist:
                    w = (vals[p[0]][p[1]] + vals[cur[0]][cur[1]]) / 2.0 * lens[i]
                    if abs(dist[p] + w - dist[cur]) <= 1e-9:
                        cands.append(p)
            cur = min(cands)
            path.append(cur)
        did = dest[0] * (1 << 31) + dest[1]
        assert got[did] == set(path), dest
