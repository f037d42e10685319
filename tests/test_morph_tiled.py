"""Per-component tiled morphology == whole-raster single-task sweep,
bit-for-bit (the distribution argument in _apply_grid_op_tiled)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _binary(spark, seed=5, n=40, density=0.12):
    rng = np.random.default_rng(seed)
    g = (rng.random((n, n)) < density).astype(float)
    # add a few deliberate line structures + close pairs (thicken contention)
    g[5, 3:15] = 1.0
    g[10:22, 8] = 1.0
    g[30, 20:30] = 1.0
    g[32, 20:30] = 1.0  # two lines 2 apart: contested background row 31
    rows = [(r, c, float(g[r, c])) for r in range(n) for c in range(n)]
    return spark.createDataFrame(rows, "row long, col long, value double")


@pytest.mark.parametrize("op,kwargs", [
    ("line_thinning", {}),
    ("remove_spurs", {"max_iterations": 10}),
    ("thicken_raster_line", {}),
])
def test_tiled_morphology_matches_single_task(spark, op, kwargs):
    import whitebox_tools_spark.operators.binary_morph as bm

    fn = getattr(bm, op)
    df = _binary(spark)
    a = {(r.row, r.col): r.value for r in fn(df, tiled=False, **kwargs).collect()}
    b = {(r.row, r.col): r.value for r in fn(df, tiled=True, **kwargs).collect()}
    assert a == b
    # non-vacuous: the op changed something
    src = {(r.row, r.col): r.value for r in df.collect()}
    assert a != src
