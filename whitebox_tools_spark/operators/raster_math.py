"""Raster math (classes MAP and ZIP) — per-cell transforms and cell-wise
combines over long-form cell tables (row, col, value).

The reference implements ~40 standalone tools for these
(/root/reference/whitebox-tools-app/src/tools/math_stat_analysis/{abs,sin,
cos,tan,ln,log10,log2,sqrt,square,negate,reciprocal,round,truncate,
to_degrees,to_radians,add,subtract,multiply,divide,min,max,modulo,power,
integer_division,equal_to,not_equal_to,greater_than,less_than,and,or,not,
xor}.rs plus gis_analysis/reclass.rs and weighted_sum.rs). Every one maps to
a built-in pyspark.sql.functions expression — JVM-side, whole-stage codegen,
zero UDFs. NoData is NULL; NULL propagates through expressions exactly as
the reference's nodata guard skips cells.

ZIP ops align two rasters by (row, col) equi-join — broadcast when one side
is small, otherwise a co-partitioned shuffle join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MAP: value -> value (tool name -> expression builder)
MAP_OPS: dict = {
    "abs": F.abs,
    "negate": lambda c: -c,
    "reciprocal": lambda c: F.lit(1.0) / c,
    "square": lambda c: c * c,
    "sqrt": F.sqrt,
    "ln": F.log,
    "log10": F.log10,
    "log2": F.log2,
    "exp": F.exp,
    "exp2": lambda c: F.pow(F.lit(2.0), c),
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "ceil": lambda c: F.ceil(c).cast("double"),
    "floor": lambda c: F.floor(c).cast("double"),
    "round": lambda c: F.round(c, 0),
    "to_degrees": F.degrees,
    "to_radians": F.radians,
    "is_nodata": lambda c: F.when(c.isNull(), F.lit(1.0)).otherwise(F.lit(0.0)),
}

# ZIP: (value1, value2) -> value
ZIP_OPS: dict = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "min": F.least,
    "max": F.greatest,
    "modulo": lambda a, b: a % b,
    "power": F.pow,
    "integer_division": lambda a, b: F.floor(a / b).cast("double"),
    "equal_to": lambda a, b: (a == b).cast("double"),
    "not_equal_to": lambda a, b: (a != b).cast("double"),
    "greater_than": lambda a, b: (a > b).cast("double"),
    "less_than": lambda a, b: (a < b).cast("double"),
    "and": lambda a, b: ((a != 0) & (b != 0)).cast("double"),
    "or": lambda a, b: ((a != 0) | (b != 0)).cast("double"),
    "xor": lambda a, b: ((a != 0) != (b != 0)).cast("double"),
}


def apply_map(cells: DataFrame, op: str, *, value: str = "value") -> DataFrame:
    """One MAP tool over a cell table (NULL nodata propagates)."""
    return cells.withColumn(value, MAP_OPS[op](F.col(value)))


def combine(
    a: DataFrame,
    b: DataFrame,
    op: str,
    *,
    value: str = "value",
    broadcast_b: bool = False,
    how: str = "inner",
) -> DataFrame:
    """One ZIP tool: align on (row, col) and combine values."""
    bb = b.select("row", "col", F.col(value).alias("__v2"))
    if broadcast_b:
        bb = F.broadcast(bb)
    return (
        a.join(bb, ["row", "col"], how)
        .withColumn(value, ZIP_OPS[op](F.col(value), F.col("__v2")))
        .drop("__v2")
    )


def scalar_op(cells: DataFrame, op: str, const: float, *, value: str = "value") -> DataFrame:
    """Raster (op) constant — the tools' --input2 scalar path."""
    return cells.withColumn(value, ZIP_OPS[op](F.col(value), F.lit(const)))


def reclass(
    cells: DataFrame,
    ranges: list[tuple[float, float, float]],
    *,
    value: str = "value",
    assign_mode: bool = False,
) -> DataFrame:
    """Reclass (gis_analysis/reclass.rs): (new, lower, upper] ranges as a
    single CASE chain; assign_mode means exact-value mapping (new, old).
    Unmatched values pass through unchanged (reference behavior)."""
    col = F.col(value)
    expr = None
    for new, lo, hi in ranges:
        cond = (col == F.lit(lo)) if assign_mode else ((col >= F.lit(lo)) & (col < F.lit(hi)))
        expr = F.when(cond, F.lit(new)) if expr is None else expr.when(cond, F.lit(new))
    return cells.withColumn(value, expr.otherwise(col) if expr is not None else col)


def weighted_sum(layers: list[tuple[DataFrame, float]], *, value: str = "value") -> DataFrame:
    """WeightedSum (gis_analysis/weighted_sum.rs): sum(w_i * raster_i) over
    aligned cells — iterative inner joins on (row, col)."""
    (df0, w0), rest = layers[0], layers[1:]
    out = df0.select("row", "col", (F.col(value) * F.lit(w0)).alias(value))
    for df, w in rest:
        out = combine(out, df.select("row", "col", (F.col(value) * F.lit(w)).alias(value)), "add")
    return out


def convert_nodata_to_zero(cells: DataFrame, *, value: str = "value") -> DataFrame:
    """ConvertNodataToZero (data_tools/convert_nodata_to_zero.rs:119)."""
    return cells.withColumn(value, F.coalesce(F.col(value), F.lit(0.0)))


def new_raster_from_base(spark, grid, init_value: float | None) -> DataFrame:
    """NewRasterFromBase (data_tools/new_raster.rs:145): dense constant grid."""
    return (
        spark.range(grid.rows * grid.cols)
        .select(
            (F.col("id") / grid.cols).cast("long").alias("row"),
            (F.col("id") % grid.cols).alias("col"),
        )
        .withColumn("value", F.lit(init_value).cast("double"))
    )


def mosaic(layers: list[DataFrame], *, method: str = "last") -> DataFrame:
    """Mosaic (image_analysis/mosaic.rs): merge overlapping rasters into one.
    method='last' mirrors the reference's later-input-wins resolution for
    nearest-neighbour resampling on shared cells; 'first'/'min'/'max'/'mean'
    offered as the distributed generalizations. One union + one aggregate."""
    tagged = [
        df.select("row", "col", "value", F.lit(i).alias("__src"))
        for i, df in enumerate(layers)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    u = u.filter(F.col("value").isNotNull())
    if method in ("last", "first"):
        pick = F.max_by("value", F.col("__src")) if method == "last" else F.min_by(
            "value", F.col("__src")
        )
        return u.groupBy("row", "col").agg(pick.alias("value"))
    fn = {"min": F.min, "max": F.max, "mean": F.avg}[method]
    return u.groupBy("row", "col").agg(fn("value").alias("value"))


# ---------------------------------------------------------------------------
# Multi-band cell tables: (band, row, col, value) — SURVEY.md section 1.1
# maps RasterConfigs.bands explicitly; these cover the image_analysis
# band-composite tools (e.g. normalized-difference indices over RGB/NIR
# composites) without widening the single-band schema elsewhere.
# ---------------------------------------------------------------------------
def band_select(cells: DataFrame, band: int, *, band_col: str = "band") -> DataFrame:
    """One band of a multi-band cell table as a plain (row, col, value)."""
    return cells.filter(F.col(band_col) == band).drop(band_col)


def combine_bands(
    cells: DataFrame, band_a: int, band_b: int, op: str, *, band_col: str = "band"
) -> DataFrame:
    """ZIP of two bands of ONE multi-band table — a self-aligned combine;
    a single shuffle on (row, col) when not pre-bucketed."""
    return combine(band_select(cells, band_a, band_col=band_col),
                   band_select(cells, band_b, band_col=band_col), op)


def normalized_difference(
    cells: DataFrame, band_a: int, band_b: int, *, band_col: str = "band"
) -> DataFrame:
    """(a - b) / (a + b) — the NDVI-style normalized difference index
    (image_analysis band composites); a + b == 0 -> NULL (nodata)."""
    a = band_select(cells, band_a, band_col=band_col)
    b = band_select(cells, band_b, band_col=band_col).select(
        "row", "col", F.col("value").alias("__v2")
    )
    s = F.col("value") + F.col("__v2")
    nd = F.when(s != 0.0, (F.col("value") - F.col("__v2")) / s)
    return a.join(b, ["row", "col"]).withColumn("value", nd).drop("__v2")
