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


# ---------------------------------------------------------------------------
# Image-stack overlay family (gis_analysis/{max,min,sum,average,max_abs,
# min_abs,multiply}_overlay.rs, highest_pos.rs, lowest_pos.rs, count_if.rs,
# percent_{equal_to,greater_than,less_than}.rs, pick_from_list.rs) over the
# multi-band cell table (band, row, col, value); band = 1-based stack
# position. All are one hash aggregate (or one equi-join) per cell.
# ---------------------------------------------------------------------------
def stack_overlay(cells: DataFrame, op: str) -> DataFrame:
    """-> (row, col, value) combining all bands per cell: max, min, sum,
    average, max_abs, min_abs (the reference returns the magnitude), or
    multiply."""
    from pyspark.sql import functions as F

    src = cells.filter(F.col("value").isNotNull())
    g = src.groupBy("row", "col")
    if op == "max":
        out = g.agg(F.max("value").alias("value"))
    elif op == "min":
        out = g.agg(F.min("value").alias("value"))
    elif op == "sum":
        out = g.agg(F.sum("value").alias("value"))
    elif op == "average":
        out = g.agg(F.avg("value").alias("value"))
    elif op == "max_abs":
        out = g.agg(F.max(F.abs(F.col("value"))).alias("value"))
    elif op == "min_abs":
        out = g.agg(F.min(F.abs(F.col("value"))).alias("value"))
    elif op == "multiply":
        # product via sign-aware exp/sum/log: exact for reasonable stacks
        # would lose precision; use aggregate over collect_list instead
        out = g.agg(
            F.aggregate(
                F.collect_list("value"), F.lit(1.0), lambda acc, x: acc * x
            ).alias("value")
        )
    else:
        raise ValueError(op)
    return out


def stack_overlay_oracle_sql(stack_sql: str, op: str) -> str:
    agg = {
        "max": "max(value)",
        "min": "min(value)",
        "sum": "sum(value)",
        "average": "avg(value)",
        "max_abs": "max(abs(value))",
        "min_abs": "min(abs(value))",
        "multiply": "product(value)",
    }[op]
    return f"""
SELECT row, col, {agg} AS value FROM ({stack_sql}) t
WHERE value IS NOT NULL GROUP BY row, col
"""


def stack_position(cells: DataFrame, *, highest: bool = True) -> DataFrame:
    """HighestPosition / LowestPosition: the 1-based band index of the
    extreme value per cell; ties break to the LOWEST band (the reference's
    scan order). -> (row, col, value)."""
    from pyspark.sql import functions as F

    src = cells.filter(F.col("value").isNotNull())
    if highest:
        pick = F.max(
            F.struct(F.col("value").alias("v"), (-F.col("band")).alias("nb"))
        )
    else:
        pick = F.min(
            F.struct(F.col("value").alias("v"), F.col("band").alias("nb"))
        )
    out = src.groupBy("row", "col").agg(pick.alias("w"))
    band = F.when(F.lit(highest), -F.col("w.nb")).otherwise(F.col("w.nb"))
    return out.select("row", "col", F.abs(F.col("w.nb")).cast("double").alias("value"))


def stack_position_oracle_sql(stack_sql: str, *, highest: bool = True) -> str:
    if highest:
        pick = "max(struct_pack(v := value, nb := -band))"
    else:
        pick = "min(struct_pack(v := value, nb := band))"
    return f"""
SELECT row, col, CAST(abs(({pick}).nb) AS DOUBLE) AS value
FROM ({stack_sql}) t WHERE value IS NOT NULL GROUP BY row, col
"""


def count_if(cells: DataFrame, *, value: float) -> DataFrame:
    """CountIf (gis_analysis/count_if.rs): per cell, how many stack bands
    equal `value`. -> (row, col, value)."""
    from pyspark.sql import functions as F

    return (
        cells.filter(F.col("value").isNotNull())
        .groupBy("row", "col")
        .agg(
            F.sum(F.when(F.col("value") == value, 1).otherwise(0))
            .cast("double").alias("value")
        )
    )


def count_if_oracle_sql(stack_sql: str, *, value: float) -> str:
    return f"""
SELECT row, col,
       CAST(sum(CASE WHEN value = {value!r} THEN 1 ELSE 0 END) AS DOUBLE) AS value
FROM ({stack_sql}) t WHERE value IS NOT NULL GROUP BY row, col
"""


def percent_compare(cells: DataFrame, comp: DataFrame, *, op: str) -> DataFrame:
    """PercentEqualTo / PercentGreaterThan / PercentLessThan: per cell,
    100 * (# bands with value <op> comparison) / (# valid bands).
    -> (row, col, value)."""
    from pyspark.sql import functions as F

    c = comp.filter(F.col("value").isNotNull()).select(
        "row", "col", F.col("value").alias("cv")
    )
    j = cells.filter(F.col("value").isNotNull()).join(c, ["row", "col"])
    cond = {
        "eq": F.col("value") == F.col("cv"),
        "gt": F.col("value") > F.col("cv"),
        "lt": F.col("value") < F.col("cv"),
    }[op]
    return j.groupBy("row", "col").agg(
        (
            F.sum(F.when(cond, 1.0).otherwise(0.0)) / F.count(F.lit(1)) * 100.0
        ).alias("value")
    )


def percent_compare_oracle_sql(stack_sql: str, comp_sql: str, *, op: str) -> str:
    cmp_op = {"eq": "=", "gt": ">", "lt": "<"}[op]
    return f"""
WITH s AS (SELECT band, row, col, value FROM ({stack_sql}) t WHERE value IS NOT NULL),
c AS (SELECT row, col, value AS cv FROM ({comp_sql}) t WHERE value IS NOT NULL)
SELECT s.row, s.col,
       sum(CASE WHEN s.value {cmp_op} c.cv THEN 1.0 ELSE 0.0 END) / count(*) * 100.0 AS value
FROM s JOIN c ON c.row = s.row AND c.col = s.col
GROUP BY s.row, s.col
"""


def pick_from_list(cells: DataFrame, pos: DataFrame) -> DataFrame:
    """PickFromList (gis_analysis/pick_from_list.rs): per cell, the value
    of the band named by the position raster (1-based).
    -> (row, col, value)."""
    from pyspark.sql import functions as F

    p = pos.filter(F.col("value").isNotNull()).select(
        "row", "col", F.col("value").cast("long").alias("band")
    )
    return cells.filter(F.col("value").isNotNull()).join(
        p, ["row", "col", "band"]
    ).select("row", "col", "value")


def pick_from_list_oracle_sql(stack_sql: str, pos_sql: str) -> str:
    return f"""
WITH s AS (SELECT band, row, col, value FROM ({stack_sql}) t WHERE value IS NOT NULL),
p AS (SELECT row, col, CAST(value AS BIGINT) AS band FROM ({pos_sql}) t
      WHERE value IS NOT NULL)
SELECT s.row, s.col, s.value
FROM s JOIN p ON p.row = s.row AND p.col = s.col AND p.band = s.band
"""
