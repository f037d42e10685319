"""Statistical operators (class AGG/STAT) over cell tables and attribute
columns — all single hash-aggregate plans (partial + final combine free).

References:
  - RasterSummaryStats: /root/reference/whitebox-tools-app/src/tools/
    math_stat_analysis/raster_summary_stats.rs:134 (min/max/mean/sd/n/total).
  - RasterHistogram: raster_histogram.rs:128.
  - Quantiles: quantiles.rs:136 (values -> quantile bin 1..q over the
    non-nodata distribution, :263-268).
  - ZScores: zscores.rs:130 ((v - mean) / sd).
  - RootMeanSquareError: root_mean_square_error.rs:130.
  - ListUniqueValues: list_unique_values.rs:149 (attribute value -> count).
  - RescaleValueRange: rescale_value_range.rs:152 (min-max stretch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def raster_summary_stats(cells: DataFrame, *, value: str = "value") -> DataFrame:
    v = F.col(value)
    return cells.filter(v.isNotNull()).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("total"),
        F.avg(v).alias("mean_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.stddev_samp(v).alias("sd"),
    )


def raster_histogram(
    cells: DataFrame, *, value: str = "value", vmin: float, vmax: float, bins: int
) -> DataFrame:
    """Counts per equal-width bin over [vmin, vmax]; top edge clamped into
    the last bin (reference closes the final interval)."""
    v = F.col(value)
    width = (vmax - vmin) / bins
    b = F.least(
        F.floor((v - F.lit(vmin)) / F.lit(width)).cast("long"), F.lit(bins - 1).cast("long")
    )
    return (
        cells.filter(v.isNotNull() & (v >= vmin) & (v <= vmax))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles(cells: DataFrame, q: int, *, value: str = "value") -> DataFrame:
    """Quantile bin 1..q per cell — equal-count quantile transform
    (quantiles.rs:263-268), same bin sizes as SQL ntile(q).

    Scale path: a global ntile window would funnel every cell through one
    task; instead the global rank comes from the distributed
    range-partition + offset pattern and the ntile arithmetic (first n % q
    tiles get ceil(n/q) rows) is a pure expression on (rank, n)."""
    from whitebox_tools_spark.distributed import with_global_seq

    v = F.col(value)
    src = cells.filter(v.isNotNull())
    ranked = with_global_seq(src, [value], out_col="__rank")
    total = src.agg(F.count(F.lit(1)).alias("__n"))
    j = ranked.join(F.broadcast(total), how="cross")
    big = F.floor(F.col("__n") / q) + 1           # size of the first n % q tiles
    r = F.col("__n") % q                          # number of big tiles
    cutoff = r * big
    small = F.greatest(big - 1, F.lit(1).cast("long"))
    tile = F.when(
        F.col("__rank") <= cutoff, F.floor((F.col("__rank") - 1) / big)
    ).otherwise(r + F.floor((F.col("__rank") - 1 - cutoff) / small))
    return j.withColumn("quantile", (tile + 1).cast("int")).drop("__rank", "__n")


def zscores(cells: DataFrame, *, value: str = "value") -> DataFrame:
    """(v - mean) / sd (population mean, sample sd as the reference)."""
    v = F.col(value)
    stats = cells.filter(v.isNotNull()).agg(
        F.avg(v).alias("__mean"), F.stddev_samp(v).alias("__sd")
    )
    return (
        cells.filter(v.isNotNull())
        .crossJoin(F.broadcast(stats))
        .withColumn("zscore", (v - F.col("__mean")) / F.col("__sd"))
        .drop("__mean", "__sd")
    )


def rescale_value_range(
    cells: DataFrame, *, value: str = "value", new_min: float, new_max: float
) -> DataFrame:
    """Min-max stretch to [new_min, new_max]."""
    v = F.col(value)
    stats = cells.filter(v.isNotNull()).agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    return (
        cells.filter(v.isNotNull())
        .crossJoin(F.broadcast(stats))
        .withColumn(
            value,
            F.lit(new_min)
            + (v - F.col("__lo")) / (F.col("__hi") - F.col("__lo")) * F.lit(new_max - new_min),
        )
        .drop("__lo", "__hi")
    )


def rmse(a: DataFrame, b: DataFrame, *, value: str = "value") -> DataFrame:
    """RootMeanSquareError between two aligned rasters."""
    j = a.select("row", "col", F.col(value).alias("__v1")).join(
        b.select("row", "col", F.col(value).alias("__v2")), ["row", "col"]
    )
    d = F.col("__v1") - F.col("__v2")
    return j.agg(
        F.sqrt(F.avg(d * d)).alias("rmse"),
        F.avg(d).alias("mean_error"),
        F.count(F.lit(1)).alias("n"),
    )


def list_unique_values(df: DataFrame, field: str) -> DataFrame:
    """ListUniqueValues: distinct attribute values with counts."""
    return df.groupBy(F.col(field).alias("value")).agg(F.count(F.lit(1)).alias("n"))


def kappa_index(a: DataFrame, b: DataFrame, *, value: str = "value") -> DataFrame:
    """KappaIndex (kappa_index.rs:141): agreement of two categorical rasters.
    kappa = (po - pe) / (1 - pe) from the confusion matrix; overall accuracy po."""
    j = (
        a.select("row", "col", F.col(value).alias("__c1"))
        .join(b.select("row", "col", F.col(value).alias("__c2")), ["row", "col"])
        .filter(F.col("__c1").isNotNull() & F.col("__c2").isNotNull())
    )
    n = j.count()
    po = j.filter(F.col("__c1") == F.col("__c2")).count() / n
    m1 = j.groupBy("__c1").count().withColumnRenamed("count", "n1")
    m2 = j.groupBy("__c2").count().withColumnRenamed("count", "n2")
    pe_row = (
        m1.join(m2, m1["__c1"] == m2["__c2"])
        .agg(F.sum(F.col("n1").cast("double") * F.col("n2") / (n * n)).alias("pe"))
        .collect()[0]
    )
    pe = pe_row["pe"] or 0.0
    kappa = (po - pe) / (1 - pe) if pe != 1.0 else 1.0
    return a.sparkSession.createDataFrame(
        [(float(po), float(pe), float(kappa), int(n))],
        "overall_accuracy double, chance_agreement double, kappa double, n long",
    )


def trend_surface(
    cells: DataFrame,
    grid,
    *,
    order: int = 1,
    x: str | None = None,
    y: str | None = None,
) -> tuple[DataFrame, list[float]]:
    """TrendSurface (math_stat_analysis/trend_surface.rs:138): least-squares
    polynomial surface z = f(x, y) of the given order over cell centers,
    returning (fitted cell table, coefficients).

    Spark plan: the normal equations X'X / X'y are sums of products —
    ONE aggregate over the data (partial+final combine); the tiny
    (terms x terms) system is solved driver-side with numpy; fitted values
    are a pure column expression. No data leaves the cluster except the
    moment matrix.

    Numerics: the solve runs in the CENTERED basis (x-mean_x, y-mean_y,
    z-mean_z) — raw moments of world-scale coordinates make the normal
    matrix ill-conditioned (cond ~ extent^order), which loses ~cond*eps of
    the fitted precision; centering makes the system O(1)-conditioned so
    engine and DuckDB oracle agree far below the round-6 gate. Returned
    coefficients are re-expanded to the RAW x/y basis (binomial shift)."""
    import math as _math

    import numpy as np

    xs = grid.x_center_expr(F.col("col")) if x is None else F.col(x)
    ys = grid.y_center_expr(F.col("row")) if y is None else F.col(y)
    src = (
        cells.filter(F.col("value").isNotNull())
        .withColumn("__x", xs)
        .withColumn("__y", ys)
    )
    means = src.agg(
        F.avg("__x").alias("mx"), F.avg("__y").alias("my"), F.avg("value").alias("mz")
    ).collect()[0]
    mx, my, mz = float(means.mx), float(means.my), float(means.mz)

    terms = [(i, j) for j in range(order + 1) for i in range(order + 1 - j)]
    cx, cy = F.col("__x") - F.lit(mx), F.col("__y") - F.lit(my)
    term_cols = [
        (F.pow(cx, F.lit(float(i))) * F.pow(cy, F.lit(float(j)))).alias(f"t{k}")
        for k, (i, j) in enumerate(terms)
    ]
    t = src.select((F.col("value") - F.lit(mz)).alias("z"), *term_cols)
    aggs = []
    for a in range(len(terms)):
        for b in range(a, len(terms)):
            aggs.append(F.sum(F.col(f"t{a}") * F.col(f"t{b}")).alias(f"xx_{a}_{b}"))
        aggs.append(F.sum(F.col(f"t{a}") * F.col("z")).alias(f"xy_{a}"))
    row = t.agg(*aggs).collect()[0]
    n = len(terms)
    xtx = np.zeros((n, n))
    xty = np.zeros(n)
    for a in range(n):
        xty[a] = row[f"xy_{a}"]
        for b in range(a, n):
            xtx[a, b] = xtx[b, a] = row[f"xx_{a}_{b}"]
    coef, *_ = np.linalg.lstsq(xtx, xty, rcond=None)

    fitted = F.lit(mz)
    for k, (i, j) in enumerate(terms):
        fitted = fitted + F.lit(float(coef[k])) * F.pow(cx, F.lit(float(i))) * F.pow(
            cy, F.lit(float(j))
        )
    out = src.select("row", "col", fitted.alias("value"))

    # re-expand centered coefficients to the raw basis:
    # (x-mx)^i (y-my)^j = sum C(i,a) C(j,b) (-mx)^(i-a) (-my)^(j-b) x^a y^b
    index = {t_: k for k, t_ in enumerate(terms)}
    raw = np.zeros(n)
    for k, (i, j) in enumerate(terms):
        for a in range(i + 1):
            for b in range(j + 1):
                raw[index[(a, b)]] += (
                    coef[k]
                    * _math.comb(i, a) * _math.comb(j, b)
                    * ((-mx) ** (i - a)) * ((-my) ** (j - b))
                )
    raw[index[(0, 0)]] += mz
    return out, [float(c) for c in raw]
