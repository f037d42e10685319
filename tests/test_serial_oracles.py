"""The literal serial-transcription oracles (serial_oracles.py) match the
distributed engine on the FIXED fixtures, with rounding-boundary margins
far above the observed engine-serial float delta — so the 6-dp literal
VALUES oracles in __spark_entry__.oracle_sql() cannot flip a rounded
digit. (scripts/calibrate_serial_oracles.py is the full sweep; this pins
the contract in CI for one solver per family.)"""

import math

import pytest

from whitebox_tools_spark import serial_oracles as so


def _margin(vals, k):
    """Min distance of |v|*10^k's fractional part from the 0.5 cliff."""
    return min(abs(math.fmod(abs(v) * 10.0 ** k, 1.0) - 0.5) for v in vals)


def _check(got, want, *, decimals, max_abs):
    assert set(got) == set(want)
    err = max(abs(got[p] - want[p]) for p in want)
    assert err <= max_abs, f"engine-serial delta {err:.3e} > {max_abs:.0e}"
    if decimals is not None:
        m = _margin(want.values(), decimals) * 10.0 ** -decimals
        assert m > 50 * max(err, 1e-300), (
            f"rounding margin {m:.3e} too close to delta {err:.3e}"
        )


def _dict_of(df):
    return {(r.row, r.col): r.value for r in df.collect()}


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    s = get_spark(app_name="serial-oracles", cores=4, shuffle_partitions=4)
    yield s


def test_cost_family_vs_serial(spark):
    from pyspark.sql import functions as F

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import (
        cost_allocation_tiled,
        cost_distance_tiled,
    )

    g20 = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=20)
    cost = spark.range(400).select(
        (F.col("id") / 20).cast("long").alias("row"),
        (F.col("id") % 20).alias("col"),
        (((F.col("id") * 48271 + 7) % 1000).cast("double") / 100.0 + 1.0).alias(
            "value"
        ),
    )
    cvals = so.cost20_vals()

    srcs = spark.createDataFrame([(0, 0), (19, 19)], "row long, col long")
    got = _dict_of(
        cost_distance_tiled(cost, srcs, g20, block=8, direct_threshold=200)
    )
    want = so.cost_distance_serial(cvals, 5.0, 5.0, [(0, 0), (19, 19)])
    _check(got, want, decimals=6, max_abs=1e-12)

    srcs2 = spark.createDataFrame(
        [(0, 0, 1), (19, 19, 2)], "row long, col long, source_id long"
    )
    got = _dict_of(
        cost_allocation_tiled(cost, srcs2, g20, block=8, direct_threshold=150)
    )
    want = {
        k: float(v)
        for k, v in so.cost_allocation_serial(
            cvals, 5.0, 5.0, [(0, 0, 1), (19, 19, 2)]
        ).items()
    }
    _check(got, want, decimals=None, max_abs=0.0)
    # allocation is tie-safe: the two sources' cost fields never get close
    d1 = so.cost_distance_serial(cvals, 5.0, 5.0, [(0, 0)])
    d2 = so.cost_distance_serial(cvals, 5.0, 5.0, [(19, 19)])
    assert min(abs(d1[p] - d2[p]) for p in d1) > 1.0


def test_mdinf_vs_serial(spark):
    from pyspark.sql import functions as F

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import mdinf_flow_accumulation

    eg = GridSpec(west=0.0, north=1000.0, res_x=5.0, res_y=5.0, rows=200, cols=200)
    noise = spark.range(1, 2001).select(
        (F.col("id") % 200).alias("row"),
        (F.floor(F.col("id") / F.lit(200.0)).cast("long") % 200).alias("col"),
        (((F.col("id") * 48271) % 100000).cast("double") / 100.0).alias("value"),
    )
    got = _dict_of(mdinf_flow_accumulation(noise, eg, block=16))
    want = so.mdinf_serial(so.noise_vals(), 5.0)
    _check(got, want, decimals=6, max_abs=1e-12)


def test_dinf_family_vs_serial(spark):
    """FD8 / DInf accumulation and DInf mass flux vs the independent
    pure-python transcriptions (round-5 conversions). Mass flux uses the
    per-cell check: a cell is safe if bit-identical to the serial sweep
    (single-inflow chains) or its 6-dp margin dwarfs the delta."""
    from pyspark.sql import functions as F

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.flow_stitch import (
        dinf_flow_accumulation_tiled,
        fd8_flow_accumulation_tiled,
    )
    from whitebox_tools_spark.operators.hydro import dinf_mass_flux

    eg = GridSpec(west=0.0, north=1000.0, res_x=5.0, res_y=5.0, rows=200, cols=200)
    noise = spark.range(1, 2001).select(
        (F.col("id") % 200).alias("row"),
        (F.floor(F.col("id") / F.lit(200.0)).cast("long") % 200).alias("col"),
        (((F.col("id") * 48271) % 100000).cast("double") / 100.0).alias("value"),
    )
    nv = so.noise_vals()

    got = _dict_of(
        fd8_flow_accumulation_tiled(noise, eg, block=16, direct_threshold=64)
    )
    _check(got, so.fd8_serial(nv, 5.0), decimals=6, max_abs=1e-13)

    got = _dict_of(
        dinf_flow_accumulation_tiled(noise, eg, block=16, direct_threshold=64)
    )
    _check(got, so.dinf_serial(nv, 5.0), decimals=6, max_abs=1e-13)

    loading = noise.withColumn("value", F.lit(1.0) + F.col("value") / F.lit(500.0))
    eff = noise.withColumn("value", F.lit(0.4) + F.col("value") / F.lit(2500.0))
    ab = noise.withColumn("value", F.col("value") / F.lit(20000.0))
    got = _dict_of(dinf_mass_flux(noise, eg, loading, eff, ab))
    want = so.dinf_mass_flux_serial(
        nv, 5.0,
        loading=lambda z: 1.0 + z / 500.0,
        efficiency=lambda z: 0.4 + z / 2500.0,
        absorption=lambda z: z / 20000.0,
    )
    assert set(got) == set(want)
    for p, w in want.items():
        g = got[p]
        if g == w:
            continue
        m = abs(math.fmod(abs(w) * 1e6, 1.0) - 0.5) * 1e-6
        assert m > 50 * abs(g - w), (p, w, g, m)


def test_isobasins_vs_serial(spark):
    from pyspark.sql import functions as F

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.hydro import isobasins

    sg = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=25)
    valley = spark.range(1, 501).select(
        ((F.col("id") - 1) % 20).alias("row"),
        F.floor((F.col("id") - 1) / F.lit(20)).cast("long").alias("col"),
        (
            F.abs((F.col("id") - 1) % 20 - 10).cast("double") * 50.0
            + (25 - F.floor((F.col("id") - 1) / F.lit(20))).cast("double") * 2.0
            + ((F.col("id") * 31) % 7).cast("double") * 0.1
            + F.when(
                (F.floor((F.col("id") - 1) / F.lit(20)) % 4 == 1)
                & ((F.col("id") - 1) % 20 != 10),
                F.lit(-45.0),
            ).otherwise(F.lit(0.0))
        ).alias("value"),
    )
    got = _dict_of(isobasins(valley, sg, size=12))
    want = so.isobasins_serial(so.valley_vals(), 5.0, 5.0, 12)
    _check(got, want, decimals=None, max_abs=0.0)


def test_literal_values_sql_round_trips_duckdb():
    """The VALUES emitter reproduces the serial dict exactly through
    DuckDB (repr round-trip + 6-dp rounding + signed-zero normalize)."""
    import duckdb

    import __spark_entry__ as E

    want = so.cost_distance_serial(
        so.cost20_vals(), 5.0, 5.0, [(0, 0), (19, 19)]
    )
    sql = E._serial_values_sql(want, decimals=6)
    got = {(r, c): v for r, c, v in duckdb.sql(sql).fetchall()}
    assert set(got) == set(want)
    for p, v in want.items():
        assert got[p] == so.round_half_away(v, 6) + 0.0


def test_pca_vs_serial_jacobi(spark):
    """Deterministic correlation-PCA scores vs the independent pure-python
    cyclic-Jacobi eigensolver (round-5 conversion): engine-serial delta at
    float noise, 6-dp margins far above it."""
    import __spark_entry__ as E
    from whitebox_tools_spark.operators.ml import pca_scores_deterministic

    out = pca_scores_deterministic(
        E._pca_fixture(spark), [f"f{i}" for i in range(8)], 2, id_col="vec_id"
    )
    got = {r.vec_id: (r.pc1, r.pc2) for r in out.collect()}
    want = so.pca_scores_serial(so.pca_vals(), 2)
    assert set(got) == set(want)
    err = max(
        max(abs(got[i][j] - want[i][j]) for j in (0, 1)) for i in want
    )
    assert err < 1e-12
    vals = [x for v in want.values() for x in v]
    m = _margin(vals, 6) * 1e-6
    assert m > 50 * max(err, 1e-300)
