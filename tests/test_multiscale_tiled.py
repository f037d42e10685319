"""Tiled integral-image window stats vs the offset scatter.

Counts must match exactly; float sums agree to ~1e-12 relative (prefix sums
order adds differently from the hash aggregate, whose own order is
partition-dependent), so derived magnitudes are compared at 9 dp — tighter
than the 6 dp every oracle rounds to.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

G = GridSpec(west=0.0, north=150.0, res_x=5.0, res_y=5.0, rows=30, cols=30)


def _dem(spark, seed=7, n=30):
    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 100, (n, n))
    rows = [
        (r, c, float(vals[r, c]))
        for r in range(n)
        for c in range(n)
        if not (10 <= r <= 12 and 4 <= c <= 8)  # nodata hole
    ]
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_window_stats_tiled_matches_scatter(spark):
    from whitebox_tools_spark.operators.multiscale import (
        _full_offsets,
        _pane_offsets,
        _rects_full,
        _rects_panes,
        _window_stats,
        window_stats_tiled,
    )

    df = _dem(spark)
    for m in (2, 9):
        rect_sets = {"w": _rects_full(m), **_rects_panes(m)}
        tiled = window_stats_tiled(df, rect_sets, tile=8)
        got = {(r.row, r.col): r.asDict() for r in tiled.collect()}
        scat = df.select("row", "col")
        want_all = {}
        for p, offs in [("w", _full_offsets(m))] + list(_pane_offsets(m).items()):
            st = _window_stats(df, offs, out_prefix=p)
            ref = scat.join(st, ["row", "col"], "left")
            for r in ref.collect():
                want_all.setdefault((r.row, r.col), {}).update(r.asDict())
        assert got.keys() == want_all.keys()
        for k, g in got.items():
            w = want_all[k]
            for p in rect_sets:
                wn = w.get(f"{p}n") or 0
                assert g[f"{p}n"] == wn, (k, p, m)
                if wn:
                    assert g[f"{p}sum"] == pytest.approx(w[f"{p}sum"], rel=1e-12)
                    assert g[f"{p}sumsq"] == pytest.approx(w[f"{p}sumsq"], rel=1e-12)


@pytest.mark.parametrize(
    "fn_name,kwargs",
    [
        ("max_difference_from_mean", {"scales": (2, 9)}),
        ("max_anisotropy_dev", {"scales": (3, 9)}),
        ("multiscale_roughness", {"scales": (2, 8)}),
    ],
)
def test_multiscale_tiled_matches_scatter(spark, fn_name, kwargs):
    import whitebox_tools_spark.operators.multiscale as ms

    fn = getattr(ms, fn_name)
    df = _dem(spark, seed=11)
    args = (df, G) if fn_name == "multiscale_roughness" else (df,)
    a = fn(*args, tiled=False, **kwargs)
    b = fn(*args, tiled=True, tile=8, **kwargs)
    ga = {(r.row, r.col): (round(r.magnitude, 9), r.scale) for r in a.collect()}
    gb = {(r.row, r.col): (round(r.magnitude, 9), r.scale) for r in b.collect()}
    assert ga == gb
