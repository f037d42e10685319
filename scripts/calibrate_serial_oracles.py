"""One-time calibration: engine vs serial_oracles on the FIXED fixtures.

For each converted query, print max abs/rel engine-serial diff and the
minimum rounding-boundary margin at candidate decimal counts, to pick a
per-query rounding where margin >> error (then pinned in pytest)."""

import math
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from whitebox_tools_spark import serial_oracles as so
from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.session import get_spark


def margin(vals, k):
    """Min distance of v*10^k's fractional part from 0.5 (rounding cliff)."""
    m = 1.0
    worst = None
    for v in vals:
        f = abs(math.fmod(abs(v) * 10.0 ** k, 1.0) - 0.5)
        if f < m:
            m, worst = f, v
    return m, worst


def report(name, got, want, decimals=(2, 3, 4, 6)):
    assert set(got) == set(want), (
        name, len(got), len(want),
        list(set(got) ^ set(want))[:5],
    )
    mx_abs = max(abs(got[p] - want[p]) for p in want)
    mx_rel = max(
        abs(got[p] - want[p]) / max(1e-300, abs(want[p])) for p in want
    )
    print(f"{name}: n={len(want)} max_abs={mx_abs:.3e} max_rel={mx_rel:.3e}")
    for k in decimals:
        m, worst = margin(want.values(), k)
        ok = "OK " if m * 10.0 ** -k > 50 * mx_abs else "BAD"
        print(f"  k={k}: min_margin={m:.2e} (={m * 10.0 ** -k:.2e} abs, "
              f"worst v={worst}) {ok}")


def dict_of(df):
    return {(r.row, r.col): r.value for r in df.collect()}


def main():
    spark = get_spark(cores=8)
    from whitebox_tools_spark.operators.breach import breach_depressions_least_cost
    from whitebox_tools_spark.operators.hydro import (
        cost_allocation_tiled,
        cost_distance_tiled,
        isobasins,
        mdinf_flow_accumulation,
        qin_flow_accumulation,
        quinn_flow_accumulation,
        upslope_depression_storage,
    )

    g20 = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=20)
    eg = GridSpec(west=0.0, north=1000.0, res_x=5.0, res_y=5.0, rows=200, cols=200)

    cost = spark.range(400).select(
        (F.col("id") / 20).cast("long").alias("row"),
        (F.col("id") % 20).alias("col"),
        (((F.col("id") * 48271 + 7) % 1000).cast("double") / 100.0 + 1.0).alias("value"),
    )
    cvals = so.cost20_vals()

    srcs = spark.createDataFrame([(0, 0), (19, 19)], "row long, col long")
    got = dict_of(cost_distance_tiled(cost, srcs, g20, block=8, direct_threshold=200))
    want = so.cost_distance_serial(cvals, 5.0, 5.0, [(0, 0), (19, 19)])
    report("cost_distance", got, want)

    srcs2 = spark.createDataFrame(
        [(0, 0, 1), (19, 19, 2)], "row long, col long, source_id long"
    )
    got = dict_of(cost_allocation_tiled(cost, srcs2, g20, block=8, direct_threshold=150))
    want = {k: float(v) for k, v in
            so.cost_allocation_serial(cvals, 5.0, 5.0, [(0, 0, 1), (19, 19, 2)]).items()}
    report("cost_allocation", got, want, decimals=(0,))
    # allocation tie safety: min |d1-d2| across cells
    d1 = so.cost_distance_serial(cvals, 5.0, 5.0, [(0, 0)])
    d2 = so.cost_distance_serial(cvals, 5.0, 5.0, [(19, 19)])
    print("  alloc tie margin:", min(abs(d1[p] - d2[p]) for p in d1))

    dense = spark.range(1, 2001).select(
        (F.col("id") % 20).alias("row"),
        F.floor(F.col("id") / F.lit(20.0)).cast("long").alias("col"),
        (((F.col("id") * 48271) % 100000).cast("double") / 100.0).alias("value"),
    )
    dvals = so.dense20_vals()
    got = dict_of(upslope_depression_storage(dense, eg, flat_increment=0.001, block=16))
    want = so.upslope_depression_storage_serial(dvals, 5.0, 5.0, 0.001)
    report("upslope_depression_storage", got, want)

    got = dict_of(breach_depressions_least_cost(
        dense, eg, dist=5, max_cost=50.0, flat_increment=0.001, tile=16, fill=False))
    want = so.breach_least_cost_serial(
        dvals, 5.0, 5.0, dist=5, max_cost=50.0, min_dist=True, s=0.001)
    report("breach_least_cost(fill=False)", got, want)

    noise = spark.range(1, 2001).select(
        (F.col("id") % 200).alias("row"),
        (F.floor(F.col("id") / F.lit(200.0)).cast("long") % 200).alias("col"),
        (((F.col("id") * 48271) % 100000).cast("double") / 100.0).alias("value"),
    )
    nvals = so.noise_vals()
    got = dict_of(mdinf_flow_accumulation(noise, eg, block=16))
    want = so.mdinf_serial(nvals, 5.0)
    report("mdinf", got, want)

    got = dict_of(quinn_flow_accumulation(noise, eg, block=16))
    want = so.quinn_qin_serial(nvals, 5.0, "quinn")
    report("quinn", got, want)

    got = dict_of(qin_flow_accumulation(noise, eg, block=16))
    want = so.quinn_qin_serial(nvals, 5.0, "qin")
    report("qin", got, want)

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
    sg = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=25)
    got = dict_of(isobasins(valley, sg, size=12))
    want = so.isobasins_serial(so.valley_vals(), 5.0, 5.0, 12)
    report("isobasins", got, want, decimals=(0,))

    spark.stop()
    print("DONE")


if __name__ == "__main__":
    main()
