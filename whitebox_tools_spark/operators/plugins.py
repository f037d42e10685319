"""Plugin-tool re-answers (whitebox-plugins/*): heat_map,
otsu_thresholding, extract_by_attribute, individual_tree_detection,
max_upslope_value, edge_contamination, normalize_lidar (= the
HeightAboveGround kernel in lidar.py).

All are compositions of existing engine machinery: block-candidate joins,
histogram aggregates, and the hierarchical flow-graph solve (max semiring).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec


def heat_map(
    points: DataFrame, grid: GridSpec, *, radius: float,
    kernel: str = "quartic",
) -> DataFrame:
    """heat_map plugin (whitebox-plugins/heat_map): kernel density estimate
    of a point set at grid cell centers; quartic kernel
    K(u) = 15/16 (1-u^2)^2 for u = d/radius < 1 (the plugin's default).
    Block equi-join: each point scatters into the 3x3 block neighborhood
    at block = radius, so candidate volume is density-bounded.
    -> (row, col, value) for cells with non-zero density."""
    spark = points.sparkSession
    blk = radius
    p = points.select(
        "x", "y",
        F.floor(F.col("x") / blk).alias("bx"),
        F.floor(F.col("y") / blk).alias("by"),
    )
    n = grid.rows * grid.cols
    centers = spark.range(n, numPartitions=max(1, n // 262144)).select(
        (F.col("id") / grid.cols).cast("long").alias("row"),
        (F.col("id") % grid.cols).alias("col"),
    ).select(
        "row", "col",
        (F.lit(grid.west) + (F.col("col") + 0.5) * grid.res_x).alias("cx"),
        (F.lit(grid.north) - (F.col("row") + 0.5) * grid.res_y).alias("cy"),
    )
    probes = centers.withColumn(
        "bx", F.explode(F.array(*[F.floor(F.col("cx") / blk) + d for d in (-1, 0, 1)]))
    ).withColumn(
        "by", F.explode(F.array(*[F.floor(F.col("cy") / blk) + d for d in (-1, 0, 1)]))
    )
    j = probes.join(p, ["bx", "by"])
    d = F.sqrt(
        (F.col("cx") - F.col("x")) * (F.col("cx") - F.col("x"))
        + (F.col("cy") - F.col("y")) * (F.col("cy") - F.col("y"))
    )
    u = d / F.lit(radius)
    k = F.lit(15.0 / 16.0) * (1.0 - u * u) * (1.0 - u * u)
    return (
        j.filter(u < 1.0)
        .groupBy("row", "col")
        .agg(F.sum(k).alias("value"))
    )


def heat_map_oracle_sql(points_sql: str, grid: GridSpec, *, radius: float) -> str:
    return f"""
WITH pts AS ({points_sql}),
centers AS (
  SELECT CAST(r AS BIGINT) AS row, CAST(c AS BIGINT) AS col,
         {grid.west!r} + (c + 0.5) * {grid.res_x!r} AS cx,
         {grid.north!r} - (r + 0.5) * {grid.res_y!r} AS cy
  FROM generate_series(0, {grid.rows - 1}) t1(r), generate_series(0, {grid.cols - 1}) t2(c)
),
j AS (
  SELECT g.row, g.col,
         sqrt((g.cx - p.x) * (g.cx - p.x) + (g.cy - p.y) * (g.cy - p.y))
           / {float(radius)!r} AS u
  FROM centers g JOIN pts p
    ON abs(p.x - g.cx) <= {float(radius)!r} AND abs(p.y - g.cy) <= {float(radius)!r}
)
SELECT row, col, SUM((15.0 / 16.0) * (1.0 - u * u) * (1.0 - u * u)) AS value
FROM j WHERE u < 1.0 GROUP BY row, col
"""


def otsu_thresholding(cells: DataFrame, *, bins: int = 256) -> DataFrame:
    """otsu_thresholding plugin: the histogram threshold maximizing
    between-class variance (Otsu 1979); output 0/1 binary raster
    (value >= threshold -> 1). The 256-bin histogram is a driver-side
    structure; the scan is exact integer/float arithmetic so both engines
    derive the same threshold."""
    src = cells.filter(F.col("value").isNotNull())
    st = src.agg(F.min("value").alias("mn"), F.max("value").alias("mx")).collect()[0]
    bw = (st.mx - st.mn) / bins
    b = F.least(
        F.floor((F.col("value") - F.lit(st.mn)) / F.lit(bw)).cast("long"),
        F.lit(bins - 1),
    )
    hist = {int(r["b"]): r["n"] for r in src.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    counts = [hist.get(i, 0) for i in range(bins)]
    total = sum(counts)
    # Otsu scan (public formulation): maximize w0*w1*(mu0-mu1)^2
    sum_all = sum(i * counts[i] for i in range(bins))
    w0 = 0
    sum0 = 0.0
    best, best_t = -1.0, 0
    for t in range(bins):
        w0 += counts[t]
        if w0 == 0:
            continue
        w1 = total - w0
        if w1 == 0:
            break
        sum0 += t * counts[t]
        mu0 = sum0 / w0
        mu1 = (sum_all - sum0) / w1
        v = w0 * w1 * (mu0 - mu1) * (mu0 - mu1)
        if v > best:
            best, best_t = v, t
    thresh = st.mn + (best_t + 1) * bw
    return src.select(
        "row", "col",
        F.when(F.col("value") >= F.lit(thresh), 1.0).otherwise(0.0).alias("value"),
    )


def extract_by_attribute(table: DataFrame, predicate_sql: str) -> DataFrame:
    """extract_by_attribute plugin: SQL-predicate feature filter."""
    return table.filter(F.expr(predicate_sql))


def individual_tree_detection(
    points: DataFrame, *, min_height: float, radius: float
) -> DataFrame:
    """individual_tree_detection plugin: a point is a tree top when its z
    is >= min_height and strictly the maximum among points within `radius`
    (2D), ties resolved to the lowest point_id. Block candidate join."""
    blk = radius
    a = points.select(
        "point_id", "x", "y", "z",
        F.floor(F.col("x") / blk).alias("bx"),
        F.floor(F.col("y") / blk).alias("by"),
    ).filter(F.col("z") >= min_height)
    probes = a.withColumn(
        "nbx", F.explode(F.array(*[F.col("bx") + d for d in (-1, 0, 1)]))
    ).withColumn(
        "nby", F.explode(F.array(*[F.col("by") + d for d in (-1, 0, 1)]))
    )
    b = points.select(
        F.col("point_id").alias("oid"), F.col("x").alias("ox"),
        F.col("y").alias("oy"), F.col("z").alias("oz"),
        F.floor(F.col("x") / blk).alias("nbx"),
        F.floor(F.col("y") / blk).alias("nby"),
    )
    j = probes.join(b, ["nbx", "nby"]).filter(
        (F.col("oid") != F.col("point_id"))
        & (
            (F.col("ox") - F.col("x")) * (F.col("ox") - F.col("x"))
            + (F.col("oy") - F.col("y")) * (F.col("oy") - F.col("y"))
            <= F.lit(radius * radius)
        )
    )
    # dominated: a neighbor is higher, or equal-high with lower id
    dominated = j.filter(
        (F.col("oz") > F.col("z"))
        | ((F.col("oz") == F.col("z")) & (F.col("oid") < F.col("point_id")))
    ).select("point_id").distinct()
    return a.join(dominated, "point_id", "left_anti").select(
        "point_id", "x", "y", "z"
    )


def individual_tree_detection_oracle_sql(
    points_sql: str, *, min_height: float, radius: float
) -> str:
    return f"""
WITH pts AS ({points_sql}),
cand AS (SELECT * FROM pts WHERE z >= {float(min_height)!r}),
dominated AS (
  SELECT DISTINCT c.point_id
  FROM cand c JOIN pts o
    ON o.point_id <> c.point_id
   AND (o.x - c.x) * (o.x - c.x) + (o.y - c.y) * (o.y - c.y)
       <= {float(radius * radius)!r}
   AND (o.z > c.z OR (o.z = c.z AND o.point_id < c.point_id))
)
SELECT point_id, x, y, z FROM cand
WHERE point_id NOT IN (SELECT point_id FROM dominated)
"""


def max_upslope_value(
    cells: DataFrame, values: DataFrame, grid: GridSpec, *, block: int = 256
) -> DataFrame:
    """max_upslope_value plugin: per cell, the maximum of `values` over
    every cell whose D8 flow path passes through it (self included) —
    flow_stitch.solve_fa in the max semiring, O(log n) supersteps."""
    from whitebox_tools_spark.operators.flow_stitch import solve_fa
    from whitebox_tools_spark.operators.hydro import _flow_edges

    edges = _flow_edges(cells, grid)
    nodes = (
        values.filter(F.col("value").isNotNull())
        .select("row", "col", F.col("value").alias("w"))
        .join(edges, ["row", "col"], "left")
        .select(
            "row", "col", "w",
            F.col("trow").alias("nrow"), F.col("tcol").alias("ncol"),
        )
    )
    return solve_fa(nodes, block=block, op="max").select(
        "row", "col", F.col("fa").alias("value")
    )


def max_upslope_value_oracle_sql(
    dem_sql: str, values_sql: str, grid: GridSpec
) -> str:
    from whitebox_tools_spark.operators.hydro import _fd_ctes

    return f"""
WITH RECURSIVE {_fd_ctes(dem_sql, grid)},
vals AS (SELECT row, col, value FROM ({values_sql}) WHERE value IS NOT NULL),
walk(orow, ocol, row, col) AS (
  SELECT row, col, row, col FROM cells
  UNION
  SELECT w.orow, w.ocol, f.trow, f.tcol
  FROM walk w JOIN fd f ON f.row = w.row AND f.col = w.col
)
SELECT w.row, w.col, max(v.value) AS value
FROM walk w JOIN vals v ON v.row = w.orow AND v.col = w.ocol
GROUP BY w.row, w.col
"""


def edge_contamination(cells: DataFrame, grid: GridSpec, *, block: int = 256) -> DataFrame:
    """edge_contamination plugin: 1.0 where any upslope cell touches the
    data-extent edge (its catchment may be truncated) — max_upslope_value
    with an edge-indicator seed."""
    src = cells.filter(F.col("value").isNotNull())
    st = src.agg(
        F.min("row").alias("r0"), F.max("row").alias("r1"),
        F.min("col").alias("c0"), F.max("col").alias("c1"),
    ).collect()[0]
    edge = (
        (F.col("row") == st.r0) | (F.col("row") == st.r1)
        | (F.col("col") == st.c0) | (F.col("col") == st.c1)
    )
    ind = src.select(
        "row", "col", F.when(edge, 1.0).otherwise(0.0).alias("value")
    )
    return max_upslope_value(cells, ind, grid, block=block)


def edge_contamination_oracle_sql(dem_sql: str, grid: GridSpec) -> str:
    ind = f"""
SELECT c.row, c.col,
       CASE WHEN c.row = b.r0 OR c.row = b.r1 OR c.col = b.c0 OR c.col = b.c1
            THEN 1.0 ELSE 0.0 END AS value
FROM (SELECT row, col FROM ({dem_sql}) WHERE value IS NOT NULL) c
CROSS JOIN (SELECT min(row) AS r0, max(row) AS r1, min(col) AS c0, max(col) AS c1
            FROM ({dem_sql}) WHERE value IS NOT NULL) b
"""
    return max_upslope_value_oracle_sql(dem_sql, ind, grid)


def otsu_oracle_sql(source_sql: str, *, bins: int = 256) -> str:
    """SQL mirror of the Otsu scan: window cumulative sums over the bin
    histogram, v(t) = w0*w1*(mu0-mu1)^2, threshold = earliest argmax
    (identical float arithmetic to the driver-side scan)."""
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
st AS (SELECT min(value) AS mn, max(value) AS mx FROM src),
binned AS (
  SELECT least(CAST(floor((value - mn) / ((mx - mn) / {bins})) AS BIGINT), {bins - 1}) AS b
  FROM src CROSS JOIN st
),
hist AS (
  SELECT t.b, coalesce(h.n, 0) AS n
  FROM (SELECT unnest(generate_series(0, {bins - 1})) AS b) t
  LEFT JOIN (SELECT b, count(*) AS n FROM binned GROUP BY b) h ON h.b = t.b
),
cum AS (
  SELECT b,
         SUM(n) OVER (ORDER BY b) AS w0,
         SUM(CAST(b AS DOUBLE) * n) OVER (ORDER BY b) AS sum0,
         SUM(n) OVER () AS total,
         SUM(CAST(b AS DOUBLE) * n) OVER () AS sum_all
  FROM hist
),
v AS (
  SELECT b,
         CAST(w0 AS DOUBLE) * (total - w0)
           * ((sum0 / w0) - ((sum_all - sum0) / (total - w0)))
           * ((sum0 / w0) - ((sum_all - sum0) / (total - w0))) AS v
  FROM cum WHERE w0 > 0 AND w0 < total
),
best AS (SELECT min(b) AS bt FROM v WHERE v = (SELECT max(v) FROM v)),
thr AS (SELECT mn + (bt + 1) * ((mx - mn) / {bins}) AS t FROM best CROSS JOIN st)
SELECT row, col,
       CASE WHEN value >= thr.t THEN 1.0 ELSE 0.0 END AS value
FROM src CROSS JOIN thr
"""
