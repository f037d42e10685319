"""BoundaryShapeComplexity: per-clump distributed combination == the
reference's single-scan global per-value accumulators
(boundary_shape_complexity.rs:397-519), including the global top-2
exterior-link merge, on grids where one VALUE spans several distant
components and different-valued polygons touch (union-mask thinning)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _grid(seed=11, n=48):
    g = np.zeros((n, n))
    # value 1: two DISTANT components (same value, must be separate tasks)
    g[2:8, 2:10] = 1.0
    g[38:46, 36:46] = 1.0
    # value 2: an L-shape touching value 3 (union thinning interaction)
    g[14:24, 5:9] = 2.0
    g[22:24, 9:18] = 2.0
    g[14:24, 18:22] = 3.0
    # value 4: a thin snake (long exterior links)
    g[30, 2:26] = 4.0
    g[30:36, 26] = 4.0
    # random same-value speckle for value 1 (more components)
    rng = np.random.default_rng(seed)
    for _ in range(6):
        r, c = rng.integers(4, n - 6, 2)
        if g[r - 2:r + 3, c - 2:c + 3].sum() == 0:
            g[r, c:c + 3] = 1.0
    return g


def _serial_bsc(g):
    """Reference transcription: one global scan of the union-thinned mask
    with per-value accumulators (exactly _bsc_partials on the WHOLE grid,
    which is the single-task case) -> per-value BSC."""
    from whitebox_tools_spark.operators.binary_morph import _bsc_partials

    out = {}
    for value, n, tot, longest, second in _bsc_partials(g):
        out[value] = 0.0 if n == 0 else 100.0 * (tot - longest - second) / n
    return out


def _df(spark, g):
    n = g.shape[0]
    rows = [(r, c, float(g[r, c])) for r in range(n) for c in range(n)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_bsc_distributed_matches_global_scan(spark):
    from whitebox_tools_spark.operators.binary_morph import (
        boundary_shape_complexity,
    )

    g = _grid()
    got = {
        (r.row, r.col): r.value
        for r in boundary_shape_complexity(_df(spark, g)).collect()
    }
    per_value = _serial_bsc(g)
    n = g.shape[0]
    for r in range(n):
        for c in range(n):
            want = per_value.get(g[r, c], 0.0) if g[r, c] > 0 else 0.0
            assert got[(r, c)] == pytest.approx(want, abs=1e-12), (r, c)
    # non-vacuous: value 1 spans several components and has a nonzero BSC
    assert per_value[4.0] != 0.0


def test_bsc_same_value_distant_polygons_are_separate_tasks(spark):
    """The parallelism claim: grouping key is the union-mask clump id, so
    the two distant value-1 polygons land in DIFFERENT Arrow groups."""
    from whitebox_tools_spark.operators.raster_vector import clump

    g = _grid()
    fg = _df(spark, g).filter(F.col("value") > 0)
    comp = clump(
        fg.select("row", "col", F.lit(1.0).alias("value")), diagonals=True
    ).select("row", "col", "clump_id")
    labelled = comp.join(fg.select("row", "col", "value"), ["row", "col"])
    n_clumps_value1 = (
        labelled.filter(F.col("value") == 1.0)
        .select("clump_id").distinct().count()
    )
    assert n_clumps_value1 >= 2
