"""FillMissingData (terrain_analysis/fill_missing_data.rs).

Reference semantics: nodata gap cells are estimated by IDW over the
'edge cells' — valid cells 8-adjacent to a gap cell — within a Euclidean
search radius of `filter` CELL units, weight 1/d^weight
(fill_missing_data.rs:342-430; with weight=2 the reference switches the
FRS metric to squared-Euclidean, i.e. 1/d^2 — identical result). Valid
cells pass through unchanged; gap cells with no edge cell in radius stay
nodata (absent).

Spark plan: gap cells = the grid-extent complement of the cell table
(sequence-explode minus anti-join); candidates via a block equi-join at
block = filter (each gap cell probes its 3x3 block neighborhood), so the
pair volume is bounded by density x filter^2 — no cross join at any
scale. Pure built-in expressions throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fill_missing_data(
    cells: DataFrame,
    *,
    filter_size: int = 11,
    weight: float = 2.0,
    exclude_edge_nodata: bool = False,
) -> DataFrame:
    """-> (row, col, value): the input raster with interior gaps IDW-filled.

    exclude_edge_nodata mirrors --no_edges: gap regions 8-connected to the
    data extent border are left unfilled."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    st = src.agg(
        F.min("row").alias("r0"), F.max("row").alias("r1"),
        F.min("col").alias("c0"), F.max("col").alias("c1"),
    ).collect()[0]
    spark = cells.sparkSession
    full = (
        spark.range(int(st.r0), int(st.r1) + 1)
        .select(F.col("id").alias("row"))
        .crossJoin(
            spark.range(int(st.c0), int(st.c1) + 1).select(F.col("id").alias("col"))
        )
    )
    gaps = full.join(src, ["row", "col"], "left_anti")

    if exclude_edge_nodata:
        # gap components touching the extent border stay nodata: clump the
        # gap cells (8-connectivity) and drop border-touching components
        from whitebox_tools_spark.operators.raster_vector import clump

        labeled = clump(gaps.withColumn("value", F.lit(1.0)))
        border_labels = labeled.filter(
            (F.col("row") == st.r0) | (F.col("row") == st.r1)
            | (F.col("col") == st.c0) | (F.col("col") == st.c1)
        ).select("value").distinct()
        gaps = labeled.join(border_labels, "value", "left_anti").select("row", "col")

    # edge cells: valid cells with a gap 8-neighbor (gap = in-extent missing)
    radius = float(filter_size)
    nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    offsets = F.broadcast(
        spark.createDataFrame(nbrs, "dy int, dx int")
    )
    gap_marks = gaps.select(
        F.col("row").alias("grow"), F.col("col").alias("gcol")
    )
    edge = (
        src.crossJoin(offsets)
        .join(
            gap_marks,
            (F.col("row") + F.col("dy") == F.col("grow"))
            & (F.col("col") + F.col("dx") == F.col("gcol")),
            "semi",
        )
        .select("row", "col", "value")
        .distinct()
    )

    # block equi-join candidates: gap cell probes the 3x3 blocks around it
    blk = int(filter_size)
    e = edge.select(
        F.col("row").alias("erow"), F.col("col").alias("ecol"),
        F.col("value").alias("ez"),
        F.floor(F.col("row") / blk).alias("br"),
        F.floor(F.col("col") / blk).alias("bc"),
    )
    g = gaps.select("row", "col").withColumn(
        "br0", F.floor(F.col("row") / blk)
    ).withColumn("bc0", F.floor(F.col("col") / blk))
    probes = g.withColumn(
        "br", F.explode(F.array(*[F.col("br0") + d for d in (-1, 0, 1)]))
    ).withColumn(
        "bc", F.explode(F.array(*[F.col("bc0") + d for d in (-1, 0, 1)]))
    )
    cand = probes.join(e, ["br", "bc"])
    dist = F.sqrt(
        (F.col("row") - F.col("erow")) * (F.col("row") - F.col("erow"))
        + (F.col("col") - F.col("ecol")) * (F.col("col") - F.col("ecol"))
    )
    w = F.lit(1.0) / F.pow(dist, F.lit(float(weight)))
    filled = (
        cand.withColumn("d", dist)
        .filter(F.col("d") <= radius)
        .withColumn("w", w)
        .groupBy("row", "col")
        .agg((F.sum(F.col("w") * F.col("ez")) / F.sum("w")).alias("value"))
    )
    return src.unionByName(filled)


def fill_missing_data_oracle_sql(
    source_sql: str, *, filter_size: int = 11, weight: float = 2.0
) -> str:
    """DuckDB mirror: same extent complement, edge-cell set, radius filter
    and 1/d^w weighting."""
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
full_grid AS (
  SELECT r.row, c.col
  FROM (SELECT unnest(generate_series((SELECT min(row) FROM src),
                                      (SELECT max(row) FROM src))) AS row) r
  CROSS JOIN (SELECT unnest(generate_series((SELECT min(col) FROM src),
                                            (SELECT max(col) FROM src))) AS col) c
),
gaps AS (
  SELECT f.row, f.col FROM full_grid f
  ANTI JOIN src s ON s.row = f.row AND s.col = f.col
),
edge AS (
  SELECT DISTINCT s.row, s.col, s.value FROM src s
  JOIN gaps g ON abs(g.row - s.row) <= 1 AND abs(g.col - s.col) <= 1
),
cand AS (
  SELECT g.row, g.col, e.value AS ez,
         sqrt((g.row - e.row) * (g.row - e.row)
            + (g.col - e.col) * (g.col - e.col)) AS d
  FROM gaps g JOIN edge e
    ON abs(e.row - g.row) <= {filter_size} AND abs(e.col - g.col) <= {filter_size}
),
filled AS (
  SELECT row, col,
         SUM(ez / pow(d, {float(weight)!r})) / SUM(1.0 / pow(d, {float(weight)!r})) AS value
  FROM cand WHERE d <= {float(filter_size)!r}
  GROUP BY row, col
)
SELECT row, col, value FROM src
UNION ALL
SELECT row, col, value FROM filled
"""
