"""TopographicHachures: distributed two-stage per-level pipeline vs the
independent serial transcription of topographic_hachures.rs (one global
sweep) — full vertex-sequence equality, plus partition invariance."""

import math

import pytest

import __spark_entry__ as E
from whitebox_tools_spark.operators.hachures import hachures


def _collect_engine(spark):
    dem = spark.createDataFrame(
        E._hachure_dem_rows(), "row long, col long, value double"
    )
    out = hachures(
        dem,
        E.HACH_GRID,
        interval=E._HACH_PARAMS["interval"],
        base=E._HACH_PARAMS["base"],
        filter_size=E._HACH_PARAMS["filter_size"],
        tolerance=E._HACH_PARAMS["tolerance"],
        separation=E._HACH_PARAMS["separation"],
        distmin=E._HACH_PARAMS["distmin"],
        distmax=E._HACH_PARAMS["distmax"],
        discretization=E._HACH_PARAMS["discretization"],
        turnmax=E._HACH_PARAMS["turnmax"],
        slopemin=E._HACH_PARAMS["slopemin"],
        depth=E._HACH_PARAMS["depth"],
    )
    return out.orderBy("hid").collect()


def test_hachures_match_serial_transcription(spark):
    expected = E._hachures_expected()
    got = _collect_engine(spark)
    assert len(got) == len(expected)
    for row, exp in zip(got, expected):
        hid, val = exp[0], exp[1]
        attrs = exp[2:12]
        pts = exp[12]
        assert row["hid"] == hid
        assert row["height"] == val
        for name, v in zip(
            ("slope", "aspect", "n", "ne", "e", "se", "s", "sw", "w", "nw"),
            attrs,
        ):
            if isinstance(v, float) and math.isnan(v):
                assert math.isnan(row[name])
            else:
                assert row[name] == pytest.approx(v, abs=0.0), (hid, name)
        assert list(row["xs"]) == [p[0] for p in pts], hid
        assert list(row["ys"]) == [p[1] for p in pts], hid


def test_hachures_partition_invariance(spark):
    dem = spark.createDataFrame(
        E._hachure_dem_rows(), "row long, col long, value double"
    ).repartition(17)
    out = hachures(dem, E.HACH_GRID, interval=8.0, base=0.0)
    rows = out.orderBy("hid").collect()
    expected = E._hachures_expected()
    assert len(rows) == len(expected)
    assert [r["hid"] for r in rows] == [e[0] for e in expected]
    assert [list(r["xs"]) for r in rows] == [[p[0] for p in e[12]] for e in expected]
