"""Image enhancement tools (class MAP/AGG hybrids) over the cell table.

References:
  - FlipImage: image_analysis/flip_image.rs:229-250 — vertical/horizontal/
    both reflection of the grid.
  - GammaCorrection: image_analysis/gamma_correction.rs:279 — z^gamma.
  - MinMaxContrastStretch: image_analysis/min_max_contrast_stretch.rs:367-373
    — floor((z - min)/range * num_tones), clamped to [0, num_tones-1].
  - HistogramEqualization: image_analysis/histogram_equalization.rs:272-387
    — binned CDF mapping: round((cdf[bin] - histo[0]) / (n - histo[0]) *
    (num_tones - 1)) with num_bins = max(num_tones, round(range)).

Scale shapes: flip/gamma/stretch are pure per-cell expressions. The
histogram equalization CDF is a window over NUM_BINS rows (a constant
bounded by num_tones, independent of raster size), then a broadcast join
back to the cells — the only "global" structure is histogram-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec


def flip_image(cells: DataFrame, grid: GridSpec, *, direction: str = "vertical") -> DataFrame:
    """-> (row, col, value) reflected. direction: vertical (row mirror),
    horizontal (col mirror), or both."""
    r = F.lit(grid.rows - 1) - F.col("row")
    c = F.lit(grid.cols - 1) - F.col("col")
    if direction == "vertical":
        sel = [r.alias("row"), F.col("col"), F.col("value")]
    elif direction == "horizontal":
        sel = [F.col("row"), c.alias("col"), F.col("value")]
    elif direction == "both":
        sel = [r.alias("row"), c.alias("col"), F.col("value")]
    else:
        raise ValueError(direction)
    return cells.filter(F.col("value").isNotNull()).select(*sel)


def flip_image_oracle_sql(source_sql: str, grid: GridSpec, *, direction: str = "vertical") -> str:
    r = f"{grid.rows - 1} - row"
    c = f"{grid.cols - 1} - col"
    row = r if direction in ("vertical", "both") else "row"
    col = c if direction in ("horizontal", "both") else "col"
    return f"""
SELECT {row} AS row, {col} AS col, value
FROM ({source_sql}) WHERE value IS NOT NULL
"""


def gamma_correction(cells: DataFrame, *, gamma: float) -> DataFrame:
    return cells.filter(F.col("value").isNotNull()).select(
        "row", "col", F.pow(F.col("value"), F.lit(gamma)).alias("value")
    )


def min_max_contrast_stretch(
    cells: DataFrame, *, min_val: float, max_val: float, num_tones: float = 256.0
) -> DataFrame:
    z = (F.col("value") - F.lit(min_val)) / F.lit(max_val - min_val) * F.lit(num_tones)
    z = F.floor(z).cast("double")
    z = F.when(z < 0.0, 0.0).when(z >= num_tones, num_tones - 1.0).otherwise(z)
    return cells.filter(F.col("value").isNotNull()).select("row", "col", z.alias("value"))


def min_max_stretch_oracle_sql(
    source_sql: str, *, min_val: float, max_val: float, num_tones: float = 256.0
) -> str:
    z = f"CAST(floor((value - {min_val!r}) / {max_val - min_val!r} * {num_tones!r}) AS DOUBLE)"
    return f"""
SELECT row, col,
       CASE WHEN {z} < 0.0 THEN 0.0
            WHEN {z} >= {num_tones!r} THEN {num_tones - 1.0!r}
            ELSE {z} END AS value
FROM ({source_sql}) WHERE value IS NOT NULL
"""


def histogram_equalization(cells: DataFrame, *, num_tones: int = 256) -> DataFrame:
    """Grayscale branch of histogram_equalization.rs. The CDF window runs
    over at most max(num_tones, round(value range)) rows — a constant —
    and is broadcast back; the raster itself sees only two expressions and
    one broadcast join."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    stats = src.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).withColumn(
        "nb",
        F.when(
            F.round(F.col("mx") - F.col("mn")) > num_tones,
            F.round(F.col("mx") - F.col("mn")),
        ).otherwise(F.lit(float(num_tones))),
    )
    d = src.crossJoin(F.broadcast(stats))
    binned = d.withColumn(
        "bin",
        F.floor(
            (F.col("value") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / (F.col("nb") - 1.0))
        ),
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).cast("double").alias("h"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = hist.withColumn("cdf", F.sum("h").over(w))
    h0 = hist.filter(F.col("bin") == 0).select(F.col("h").alias("h0"))
    out = (
        binned.join(F.broadcast(cdf.select("bin", "cdf")), "bin")
        .crossJoin(F.broadcast(h0))
        .select(
            "row", "col",
            F.round(
                (F.col("cdf") - F.col("h0")) / (F.col("n") - F.col("h0"))
                * F.lit(float(num_tones - 1))
            ).cast("double").alias("value"),
        )
    )
    return out


def histogram_equalization_oracle_sql(source_sql: str, *, num_tones: int = 256) -> str:
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
s AS (
  SELECT min(value) AS mn, max(value) AS mx, CAST(count(*) AS DOUBLE) AS n,
         CASE WHEN round(max(value) - min(value)) > {num_tones}
              THEN round(max(value) - min(value))
              ELSE CAST({num_tones} AS DOUBLE) END AS nb
  FROM src
),
binned AS (
  SELECT row, col, value,
         floor((value - mn) / ((mx - mn) / (nb - 1.0))) AS bin, n
  FROM src CROSS JOIN s
),
hist AS (SELECT bin, CAST(count(*) AS DOUBLE) AS h FROM binned GROUP BY bin),
cdf AS (
  SELECT bin, sum(h) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdf
  FROM hist
),
h0 AS (SELECT h AS h0 FROM hist WHERE bin = 0)
SELECT b.row, b.col,
       CAST(round((c.cdf - h0.h0) / (b.n - h0.h0) * {num_tones - 1.0!r}) AS DOUBLE) AS value
FROM binned b JOIN cdf c ON c.bin = b.bin CROSS JOIN h0
"""
