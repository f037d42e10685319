"""kNN join / NN gridding / IDW vs brute-force oracle."""

import numpy as np
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import CellIndex, GridSpec
from whitebox_tools_spark.operators.knn import idw_gridding, knn_join, nearest_neighbour_gridding

IDX = CellIndex(0.0, 0.0, 1000.0, 4)
GRID = GridSpec(west=0.0, north=1000.0, res_x=100.0, res_y=100.0, rows=10, cols=10)


def _points(spark, n=60, seed=5):
    rng = np.random.default_rng(seed)
    rows = [
        (i, float(x), float(y), float(z))
        for i, (x, y, z) in enumerate(
            np.column_stack([rng.uniform(0, 1000, (n, 2)), rng.uniform(0, 10, (n, 1))])
        )
    ]
    # duplicated point for tie exercise (same z)
    rows.append((n, rows[0][1], rows[0][2], rows[0][3]))
    return spark.createDataFrame(rows, "point_id long, x double, y double, z double"), rows


def _brute_knn(targets, pts, k):
    out = {}
    for tid, tx, ty in targets:
        d = sorted(
            ((px - tx) ** 2 + (py - ty) ** 2, pid, z) for pid, px, py, z in pts
        )
        out[tid] = d[:k]
    return out


def test_knn_join_exact(spark):
    pts_df, rows = _points(spark)
    rng = np.random.default_rng(9)
    targets = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 1000, (25, 2)))]
    tdf = spark.createDataFrame(targets, "target_id long, x double, y double")
    got = knn_join(tdf, pts_df, 3, IDX)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.target_id, []).append((r.rank, r.dist_sq, r.point_id))
    brute = _brute_knn(targets, rows, 3)
    for tid, expected in brute.items():
        mine = sorted(got_map[tid])
        assert len(mine) == 3
        for (rank, dsq, pid), (bdsq, bpid, _) in zip(mine, expected):
            assert dsq == bdsq and pid == bpid, (tid, rank)


def test_nn_gridding_dense_output(spark):
    pts_df, rows = _points(spark)
    out = nearest_neighbour_gridding(pts_df, GRID, IDX, max_dist=1e18)
    vals = {(r.row, r.col): r.value for r in out.collect()}
    assert len(vals) == 100
    brute = _brute_knn(
        [(r * 10 + c, GRID.west + (c + 0.5) * 100.0, GRID.north - (r + 0.5) * 100.0)
         for r in range(10) for c in range(10)],
        rows, 1,
    )
    for tid, [(dsq, pid, z)] in brute.items():
        assert vals[(tid // 10, tid % 10)] == z


def test_nn_gridding_max_dist_nodata(spark):
    pts_df, _ = _points(spark, n=2)
    out = nearest_neighbour_gridding(pts_df, GRID, IDX, max_dist=50.0)
    vals = [r.value for r in out.collect()]
    assert vals.count(GRID.nodata) >= 90  # most cells have no point within 50


def test_idw_exact_hit_short_circuit(spark):
    # a point exactly on a cell center -> that cell takes the point's z
    rows = [(0, GRID.west + 0.5 * 100.0, GRID.north - 0.5 * 100.0, 42.0),
            (1, 500.0, 500.0, 7.0)]
    pts = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    out = {(r.row, r.col): r.value for r in
           idw_gridding(pts, GRID, IDX, weight=2.0, radius=0.0, min_points=2).collect()}
    assert out[(0, 0)] == 42.0
