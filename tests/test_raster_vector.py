"""Raster->vector conversion: clump, boundary tracing, ring stitching.

Validation strategy (SURVEY.md 2.2 RasterToVectorPolygons): exact ring
geometry is checked by self-consistency — ring signed areas must add up to
the clump's cell count x cell area, and rasterizing the rings back through
the engine's own PIP kernel must reproduce the clump mask exactly.
"""

import numpy as np
from pyspark.sql import functions as F

from whitebox_tools_spark import geometry as G
from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.operators.raster_vector import (
    boundary_edges,
    clump,
    raster_to_vector_polygons,
)

GRID = GridSpec(west=0.0, north=100.0, res_x=10.0, res_y=10.0, rows=10, cols=10)


def _mask_df(spark, mask):
    recs = [
        (r, c, float(mask[r][c]))
        for r in range(len(mask))
        for c in range(len(mask[0]))
        if mask[r][c] != 0
    ]
    return spark.createDataFrame(recs, "row long, col long, value double")


def test_clump_two_components(spark):
    mask = np.zeros((10, 10))
    mask[1:3, 1:3] = 1.0  # component A (scan-order first)
    mask[6:9, 6:9] = 1.0  # component B
    out = clump(_mask_df(spark, mask)).collect()
    ids = {(r.row, r.col): r.clump_id for r in out}
    assert ids[(1, 1)] == 1 and ids[(2, 2)] == 1
    assert ids[(6, 6)] == 2 and ids[(8, 8)] == 2


def test_clump_diagonal_connectivity(spark):
    mask = np.zeros((5, 5))
    mask[0, 0] = mask[1, 1] = mask[2, 2] = 1.0  # diagonal chain
    out8 = clump(_mask_df(spark, mask), diagonals=True).collect()
    assert len({r.clump_id for r in out8}) == 1
    out4 = clump(_mask_df(spark, mask), diagonals=False).collect()
    assert len({r.clump_id for r in out4}) == 3


def test_clump_values_separate_components(spark):
    mask = [[1.0, 2.0], [2.0, 1.0]]
    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 2.0), (1, 1, 1.0)],
        "row long, col long, value double",
    )
    out = clump(df, diagonals=False).collect()
    assert len({r.clump_id for r in out}) == 4  # 4-connectivity, values differ


def test_boundary_edge_count_square(spark):
    mask = np.zeros((6, 6))
    mask[2:4, 2:4] = 1.0  # 2x2 block -> 8 boundary edges
    labeled = clump(_mask_df(spark, mask))
    edges = boundary_edges(labeled, GRID).collect()
    assert len(edges) == 8


def test_rings_area_and_roundtrip(spark):
    # block with a hole: 4x4 block, 1x1 hole in the middle-ish
    mask = np.zeros((10, 10))
    mask[2:6, 2:6] = 1.0
    mask[3, 3] = 0.0
    out = raster_to_vector_polygons(_mask_df(spark, mask), GRID).collect()
    shells = [r for r in out if not r.is_hole]
    holes = [r for r in out if r.is_hole]
    assert len(shells) == 1 and len(holes) == 1
    # shapefile winding: shell CW (negative signed area), hole CCW
    assert G.signed_area2(shells[0].xs, shells[0].ys) < 0
    assert G.signed_area2(holes[0].xs, holes[0].ys) > 0
    # net area == cell count * cell area
    net = G.polygon_area(shells[0].xs, shells[0].ys) - G.polygon_area(holes[0].xs, holes[0].ys)
    assert net == 15 * 100.0
    # rasterize back: cell centers inside (shell minus hole) == mask cells
    parts = [
        (np.asarray(shells[0].xs), np.asarray(shells[0].ys), False),
        (np.asarray(holes[0].xs), np.asarray(holes[0].ys), True),
    ]
    px, py, expect = [], [], []
    for r in range(10):
        for c in range(10):
            px.append(GRID.x_center(c))
            py.append(GRID.y_center(r))
            expect.append(mask[r, c] != 0)
    got = G.point_in_parts(np.array(px), np.array(py), parts)
    assert got.tolist() == expect


def test_rings_multiple_components(spark):
    mask = np.zeros((10, 10))
    mask[1:3, 1:3] = 1.0
    mask[5:8, 5:8] = 1.0
    out = raster_to_vector_polygons(_mask_df(spark, mask), GRID).collect()
    fids = {r.fid for r in out}
    assert fids == {1, 2}
    areas = {r.fid: G.polygon_area(r.xs, r.ys) for r in out}
    assert areas[1] == 4 * 100.0
    assert areas[2] == 9 * 100.0


def test_pinch_corner_touching_cells(spark):
    # two cells touching only at a corner (8-connected -> one clump) trace
    # into rings without losing edges
    mask = np.zeros((6, 6))
    mask[1, 1] = 1.0
    mask[2, 2] = 1.0
    out = raster_to_vector_polygons(_mask_df(spark, mask), GRID).collect()
    total_shell_area = sum(
        G.polygon_area(r.xs, r.ys) for r in out if not r.is_hole
    ) - sum(G.polygon_area(r.xs, r.ys) for r in out if r.is_hole)
    assert total_shell_area == 2 * 100.0
