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


# ---------------------------------------------------------------------------
# local_quadratic_regression (Wood 1996)
# ---------------------------------------------------------------------------
_LQR_REL_SUMS = {
    # z-moments are RELATIVE to the center elevation (main.rs:292 "zs.push(zi - z)")
    "szx2": "sum((zi - z) * xx * xx)",
    "szy2": "sum((zi - z) * yy * yy)",
    "szxy": "sum((zi - z) * xx * yy)",
    "szx": "sum((zi - z) * xx)",
    "szy": "sum((zi - z) * yy)",
    "sz": "sum(zi - z)",
    "szz": "sum((zi - z) * (zi - z))",
    # monomial sums for the normal matrix + goodness-of-fit expansion
    "sx": "sum(xx)",
    "sy": "sum(yy)",
    "sxx": "sum(xx * xx)",
    "syy": "sum(yy * yy)",
    "sxy": "sum(xx * yy)",
    "sx3": "sum(xx * xx * xx)",
    "sy3": "sum(yy * yy * yy)",
    "sx2y": "sum(xx * xx * yy)",
    "sxy2": "sum(xx * yy * yy)",
    "sx4": "sum(xx * xx * xx * xx)",
    "sy4": "sum(yy * yy * yy * yy)",
    "sx2y2": "sum(xx * xx * yy * yy)",
    "sx3y": "sum(xx * xx * xx * yy)",
    "sxy3": "sum(xx * yy * yy * yy)",
    "nv": "count(*)",
}

# coefficient closed forms: the reference's Matrix5 (main.rs:312-321) is
# block diagonal — LU-solving it equals a 2x2 Cramer solve for (a, b) plus
# three scalar divisions; "invertible" = all pivots nonzero.
_LQR_COEF = {
    "det2": "(sx4 * sx4 - sx2y2 * sx2y2)",
    "inv": "(CASE WHEN (sx4 * sx4 - sx2y2 * sx2y2) <> 0 AND sx2y2 <> 0 AND sxx <> 0 THEN 1 ELSE 0 END)",
    "ca": "(CASE WHEN (sx4 * sx4 - sx2y2 * sx2y2) <> 0 AND sx2y2 <> 0 AND sxx <> 0 THEN (szx2 * sx4 - szy2 * sx2y2) / (sx4 * sx4 - sx2y2 * sx2y2) ELSE 0.0 END)",
    "cb": "(CASE WHEN (sx4 * sx4 - sx2y2 * sx2y2) <> 0 AND sx2y2 <> 0 AND sxx <> 0 THEN (szy2 * sx4 - szx2 * sx2y2) / (sx4 * sx4 - sx2y2 * sx2y2) ELSE 0.0 END)",
    "cc": "(CASE WHEN (sx4 * sx4 - sx2y2 * sx2y2) <> 0 AND sx2y2 <> 0 AND sxx <> 0 THEN szxy / sx2y2 ELSE 0.0 END)",
    "cd": "(CASE WHEN (sx4 * sx4 - sx2y2 * sx2y2) <> 0 AND sx2y2 <> 0 AND sxx <> 0 THEN szx / sxx ELSE 0.0 END)",
    "ce": "(CASE WHEN (sx4 * sx4 - sx2y2 * sx2y2) <> 0 AND sx2y2 <> 0 AND sxx <> 0 THEN szy / sxx ELSE 0.0 END)",
}

# derived outputs (Quadratic2d, main.rs:504-562). pow(t, 1.5) is written
# t * sqrt(t): IEEE-deterministic in both engines (libm powf is not),
# mathematically identical.
_LQR_OUT = {
    "slope": "atan(sqrt(cd * cd + ce * ce))",
    "aspect": "(CASE WHEN ce = 0 OR cd = 0 THEN 0.0 ELSE atan(ce / cd) END)",
    "prof_c": (
        "(CASE WHEN (-200.0 * ((ca * cd * cd) + (cb * ce * ce) + (cc * cd * ce))) = 0 "
        "OR (((ce * ce) + (cd * cd)) * ((1.0 + (cd * cd) + (ce * ce)) * sqrt(1.0 + (cd * cd) + (ce * ce)))) = 0 THEN 0.0 "
        "ELSE (-200.0 * ((ca * cd * cd) + (cb * ce * ce) + (cc * cd * ce))) / "
        "(((ce * ce) + (cd * cd)) * ((1.0 + (cd * cd) + (ce * ce)) * sqrt(1.0 + (cd * cd) + (ce * ce)))) END)"
    ),
    "plan_c": (
        "(CASE WHEN (200.0 * ((cb * cd * cd) + (ca * ce * ce) - (cc * cd * ce))) = 0 "
        "OR ((((ce * ce) + (cd * cd))) * sqrt((ce * ce) + (cd * cd))) = 0 THEN 0.0 "
        "ELSE (200.0 * ((cb * cd * cd) + (ca * ce * ce) - (cc * cd * ce))) / "
        "((((ce * ce) + (cd * cd))) * sqrt((ce * ce) + (cd * cd))) END)"
    ),
    "long_c": (
        "(CASE WHEN ((ca * cd * cd) + (cb * ce * ce) + (cc * cd * ce)) = 0 "
        "OR ((cd * cd) + (ce * ce)) = 0 THEN 0.0 "
        "ELSE -2.0 * (((ca * cd * cd) + (cb * ce * ce) + (cc * cd * ce)) / ((cd * cd) + (ce * ce))) END)"
    ),
    "cross_c": (
        "(CASE WHEN ((cb * cd * cd) + (ca * ce * ce) - (cc * cd * ce)) = 0 "
        "OR ((cd * cd) + (ce * ce)) = 0 THEN 0.0 "
        "ELSE -2.0 * (((cb * cd * cd) + (ca * ce * ce) - (cc * cd * ce)) / ((cd * cd) + (ce * ce))) END)"
    ),
    "procmin_c": "((ca * -1.0) - cb - sqrt((ca - cb) * (ca - cb) + (cc * cc)))",
    "goodness": (
        "(CASE WHEN (CAST(nv AS DOUBLE) * sum_xy - (sz * sum_y)) = 0 "
        "OR (sqrt(CAST(nv AS DOUBLE) * szz - (sz * sz)) * sqrt(CAST(nv AS DOUBLE) * sum_yy - (sum_y * sum_y))) = 0 THEN 0.0 "
        "ELSE ((CAST(nv AS DOUBLE) * sum_xy - (sz * sum_y)) / "
        "(sqrt(CAST(nv AS DOUBLE) * szz - (sz * sz)) * sqrt(CAST(nv AS DOUBLE) * sum_yy - (sum_y * sum_y)))) "
        "* ((CAST(nv AS DOUBLE) * sum_xy - (sz * sum_y)) / "
        "(sqrt(CAST(nv AS DOUBLE) * szz - (sz * sz)) * sqrt(CAST(nv AS DOUBLE) * sum_yy - (sum_y * sum_y)))) END)"
    ),
}

# goodness-of-fit intermediates: sum_y = sum(z_pred), sum_yy = sum(z_pred^2),
# sum_xy = sum(z_act * z_pred) — expanded over the monomial sums so no second
# pass over the window is needed (main.rs:325-345 does a second loop; the
# expansion is algebraically identical)
_LQR_GOF = {
    "sum_y": "(ca * sxx + cb * syy + cc * sxy + cd * sx + ce * sy)",
    "sum_yy": (
        "(ca * ca * sx4 + cb * cb * sy4 + cc * cc * sx2y2 + cd * cd * sxx + ce * ce * syy "
        "+ 2.0 * ca * cb * sx2y2 + 2.0 * ca * cc * sx3y + 2.0 * ca * cd * sx3 + 2.0 * ca * ce * sx2y "
        "+ 2.0 * cb * cc * sxy3 + 2.0 * cb * cd * sxy2 + 2.0 * cb * ce * sy3 "
        "+ 2.0 * cc * cd * sx2y + 2.0 * cc * ce * sxy2 + 2.0 * cd * ce * sxy)"
    ),
    "sum_xy": "(ca * szx2 + cb * szy2 + cc * szxy + cd * szx + ce * szy)",
}


def local_quadratic_regression(
    cells: DataFrame, grid: GridSpec, *, filter_size: int = 3
) -> DataFrame:
    """local_quadratic_regression plugin (whitebox-plugins/src/
    local_quadratic_regression/main.rs:232-420, Wood 1996): per-cell
    quadratic fit z = ax^2 + by^2 + cxy + dx + ey over the window
    (elevations relative to the center, constrained through the origin),
    emitting slope, aspect, profile/plan convexity, longitudinal/cross-
    sectional/min-profile curvature and r^2 goodness-of-fit.

    One offset scatter + hash aggregate (the repo's focal idiom) computes
    every monomial/z-moment sum; the block-diagonal normal system solves
    in closed form (2x2 Cramer + scalar divisions — what the reference's
    LU of its Matrix5 reduces to); the goodness-of-fit second pass is
    algebraically expanded over the same sums. With integer-valued inputs
    and integer cell offsets all window sums are exact, so the closed
    forms are engine-invariant; atan outputs get the repo's 9-dp libm
    guard at the query layer. Cells with fewer than 8 valid neighbors are
    dropped (main.rs:297)."""
    if filter_size % 2 == 0:
        filter_size += 1
    half = (filter_size - 1) // 2
    res = grid.res_x
    spark = cells.sparkSession
    offs = spark.createDataFrame(
        [(dx, dy) for dy in range(-half, half + 1) for dx in range(-half, half + 1)],
        "dx int, dy int",
    )
    c = cells.select("row", "col", F.col("value").alias("z"))
    nb = (
        c.crossJoin(F.broadcast(offs))
        .withColumn("nrow", F.col("row") + F.col("dy"))
        .withColumn("ncol", F.col("col") + F.col("dx"))
        .join(
            cells.select(
                F.col("row").alias("nrow"), F.col("col").alias("ncol"),
                F.col("value").alias("zi"),
            ),
            ["nrow", "ncol"],
        )
        .withColumn("xx", F.col("dx").cast("double") * F.lit(res))
        .withColumn("yy", F.col("dy").cast("double") * F.lit(res))
    )
    sums = nb.groupBy("row", "col", "z").agg(
        *[F.expr(e).alias(k) for k, e in _LQR_REL_SUMS.items()]
    ).filter(F.col("nv") >= 8)
    coef = sums
    for k in ("ca", "cb", "cc", "cd", "ce"):
        coef = coef.withColumn(k, F.expr(_LQR_COEF[k]))
    for k in ("sum_y", "sum_yy", "sum_xy"):
        coef = coef.withColumn(k, F.expr(_LQR_GOF[k]))
    return coef.select(
        "row", "col", *[F.expr(e).alias(k) for k, e in _LQR_OUT.items()]
    )


def local_quadratic_regression_oracle_sql(
    dem_sql: str, *, filter_size: int = 3, resolution: float
) -> str:
    """DuckDB mirror: identical formula strings over identical sums."""
    if filter_size % 2 == 0:
        filter_size += 1
    half = (filter_size - 1) // 2
    offs = ", ".join(
        f"({dx}, {dy})"
        for dy in range(-half, half + 1)
        for dx in range(-half, half + 1)
    )
    sums = ", ".join(f"{e} AS {k}" for k, e in _LQR_REL_SUMS.items())
    coefs = ", ".join(f"{_LQR_COEF[k]} AS {k}" for k in ("ca", "cb", "cc", "cd", "ce"))
    gofs = ", ".join(f"{_LQR_GOF[k]} AS {k}" for k in ("sum_y", "sum_yy", "sum_xy"))
    outs = ", ".join(f"{e} AS {k}" for k, e in _LQR_OUT.items())
    return f"""
WITH cells AS ({dem_sql}),
offs AS (SELECT * FROM (VALUES {offs}) AS o(dx, dy)),
nb AS (
  SELECT c.row, c.col, c.value AS z,
         CAST(o.dx AS DOUBLE) * {resolution!r} AS xx,
         CAST(o.dy AS DOUBLE) * {resolution!r} AS yy,
         n.value AS zi
  FROM cells c CROSS JOIN offs o
  JOIN cells n ON n.row = c.row + o.dy AND n.col = c.col + o.dx
),
sums0 AS (SELECT row, col, z, {sums} FROM nb GROUP BY row, col, z),
sums AS (SELECT * FROM sums0 WHERE nv >= 8),
coef AS (SELECT *, {coefs} FROM sums),
gof AS (SELECT *, {gofs} FROM coef)
SELECT row, col, {outs} FROM gof
"""


# ---------------------------------------------------------------------------
# travelling_salesman_problem
# ---------------------------------------------------------------------------
def _tsp_tour(px, py, start: int):
    """Deterministic nearest-neighbour tour + first-improvement 2-opt
    (the reference's 2-opt core, travelling_salesman_problem main.rs:
    tour.optimize_kopt, with its wall-clock budget and entropy restarts
    replaced by bounded deterministic restarts — the repo's RND/ITR
    determinism convention)."""
    import numpy as np

    n = len(px)
    unvisited = set(range(n))
    tour = [start]
    unvisited.remove(start)
    cur = start
    while unvisited:
        best = min(
            unvisited,
            key=lambda j: ((px[j] - px[cur]) ** 2 + (py[j] - py[cur]) ** 2, j),
        )
        tour.append(best)
        unvisited.remove(best)
        cur = best

    def d(i, j):
        return math.hypot(px[i] - px[j], py[i] - py[j])

    improved = True
    while improved:
        improved = False
        for i in range(n - 1):
            for k in range(i + 2, n):
                a, b = tour[i], tour[i + 1]
                c, e = tour[k], tour[(k + 1) % n]
                if a == e:
                    continue
                if d(a, c) + d(b, e) < d(a, b) + d(c, e) - 1e-12:
                    tour[i + 1 : k + 1] = reversed(tour[i + 1 : k + 1])
                    improved = True
    length = sum(d(tour[i], tour[(i + 1) % n]) for i in range(n))
    return tour, length


def travelling_salesman_problem(points: DataFrame, *, restarts: int | None = None) -> DataFrame:
    """travelling_salesman_problem plugin (whitebox-plugins/src/
    travelling_salesman_problem/main.rs): approximate shortest closed
    tour. The reference spawns one optimizer per core with a wall-clock
    budget (irreproducible); this engine runs DETERMINISTIC restarts (one
    NN+2-opt per start node) in parallel across the cluster and keeps the
    best by (length, start). Points are broadcast (a TSP instance is
    small by nature — the tour itself is O(n) driver output).
    points: (point_id, x, y) -> (seq, point_id) of the best tour."""
    import pandas as pd

    rows = points.select("point_id", "x", "y").orderBy("point_id").collect()
    ids = [r.point_id for r in rows]
    px = [float(r.x) for r in rows]
    py = [float(r.y) for r in rows]
    n = len(ids)
    restarts = restarts or n
    spark = points.sparkSession
    starts = spark.range(min(restarts, n)).select(F.col("id").cast("int").alias("start"))

    def _run(batches):
        for pdf in batches:
            out = []
            for s in pdf["start"]:
                tour, length = _tsp_tour(px, py, int(s))
                out.append((int(s), length, tour))
            yield pd.DataFrame(out, columns=["start", "length", "tour"])

    res = starts.repartition(max(1, min(32, n))).mapInPandas(
        _run, "start int, length double, tour array<int>"
    )
    best = res.orderBy("length", "start").limit(1)
    ex = best.select(F.posexplode("tour").alias("seq", "idx"))
    idmap = spark.createDataFrame(
        [(i, int(ids[i])) for i in range(n)], "idx int, point_id long"
    )
    return ex.join(F.broadcast(idmap), "idx").select("seq", "point_id")


# ---------------------------------------------------------------------------
# conditioned_latin_hypercube
# ---------------------------------------------------------------------------
_CLHS_M = 2147483647
_CLHS_A = 48271


class _Minstd:
    """Sequential minstd stream — the deterministic replacement for the
    reference's StdRng (seeded ChaCha; bit-reproducing it is not
    practical, so the repo's RND convention applies: same algorithm,
    documented deterministic stream)."""

    def __init__(self, seed: int):
        self.s = (seed * 2654435 + 1) % _CLHS_M

    def nxt(self) -> int:
        self.s = (self.s * _CLHS_A) % _CLHS_M
        return self.s

    def uniform(self) -> float:
        return self.nxt() / _CLHS_M

    def range(self, n: int) -> int:
        return self.nxt() % n


def _clhs_hash(idx, seed):
    s = (idx + seed * 2654435 + 1) % _CLHS_M
    s = (s * _CLHS_A) % _CLHS_M
    s = (s * _CLHS_A) % _CLHS_M
    return s


def clhs_anneal(
    reservoir: list,
    quantiles: list,
    cormat: list,
    *,
    num_samples: int,
    max_iter: int,
    rng: "_Minstd",
    temp: float,
    temp_decay: float,
    anneal_cycle: int,
    rs_prob: float,
    weights=(1.0, 1.0, 1.0),
    o_thresh: float = -1e308,
) -> list:
    """The annealed resampling loop (conditioned_latin_hypercube
    main.rs:664-725), transcribed exactly — including the reference's
    worst-strata branch writing samples[ridx] with ridx drawn over the
    worst-index COUNT rather than samples[worst_indices[ridx]] (a real
    indexing bug, kept for parity). temp_decay is already (1 - decay)."""
    reservoir = list(reservoir)
    samples = reservoir[len(reservoir) - num_samples:]
    del reservoir[len(reservoir) - num_samples:]
    old_samples = list(samples)
    obj_old = float("inf")
    K = len(quantiles)
    for it in range(max_iter):
        counts = [[0] * len(q) for q in quantiles]
        for s in samples:
            counts[s["k"]][s["q"]] += 1
        # sample correlation matrix (main.rs:836-872, loop order kept)
        sc = [[1.0] * K for _ in range(K)]
        for a in range(K):
            a_s = [s for s in samples if s["k"] == a]
            if not a_s:
                for b in range(a + 1, K):
                    sc[a][b] = sc[b][a] = 0.0
                continue
            am = sum(s["v"] for s in a_s) / len(a_s)
            at = sum((s["v"] - am) ** 2 for s in a_s)
            for b in range(a + 1, K):
                b_s = [s for s in samples if s["k"] == b]
                if not b_s:
                    sc[a][b] = sc[b][a] = 0.0
                    continue
                bm = sum(s["v"] for s in b_s) / len(b_s)
                bt = sum((s["v"] - bm) ** 2 for s in b_s)
                pt = 0.0
                for i in range(min(len(a_s), len(b_s))):
                    pt += (a_s[i]["v"] - am) * (b_s[i]["v"] - bm)
                # Rust float semantics: 0/0 -> NaN (propagates through the
                # objective; every NaN comparison is false, so the
                # iteration reverts) — python raises, so guard explicitly
                den = math.sqrt(at * bt)
                sc[a][b] = sc[b][a] = pt / den if den != 0.0 else float("nan")
        o1 = sum(abs(c - 1) for k in range(K) for c in counts[k])
        o3 = sum(abs(cormat[i][j] - sc[i][j]) for i in range(K) for j in range(K))
        obj = weights[0] * o1 + weights[2] * o3
        if obj <= o_thresh:
            break
        worst_k = worst_q = 0
        mx = 0
        for k in range(K):
            for q in range(len(counts[k])):
                if counts[k][q] >= mx:
                    worst_k, worst_q, mx = k, q, counts[k][q]
        rand1 = rng.uniform()
        rand2 = rng.uniform()
        o_delta = obj - obj_old
        metro = math.exp(-o_delta / temp)
        if it % anneal_cycle == anneal_cycle - 1:
            temp *= temp_decay
        if o_delta < 0.0 or rand1 < metro:
            old_samples = list(samples)
        else:
            samples = list(old_samples)
        obj_old = obj
        if rand2 < rs_prob or mx <= 1:
            ridx = rng.range(len(samples))
            samples[ridx] = reservoir.pop()
        else:
            worst = [
                i for i in range(len(samples))
                if samples[i]["k"] == worst_k and samples[i]["q"] == worst_q
            ]
            ridx = rng.range(len(worst))
            samples[ridx] = reservoir.pop()  # reference bug kept: not worst[ridx]
    return samples


def conditioned_latin_hypercube(
    rasters: list,
    grid: GridSpec,
    *,
    num_samples: int,
    max_iter: int = 100,
    seed: int = 1,
    temp: float = 1.0,
    temp_decay: float = 0.05,
    anneal_cycle: int = 10,
    rs_prob: float = 0.5,
    num_bins: int = 25000,
) -> DataFrame:
    """conditioned_latin_hypercube plugin (whitebox-plugins/src/
    conditioned_latin_hypercube/main.rs): multidimensional stratified
    (latin hypercube) sampling by annealed resampling (continuous
    covariates).

    Distributed: per-raster 25000-bin histograms/min-max (one aggregate
    each), the population correlation matrix (pairwise cell joins with
    the algebraic Sxy - n*mx*my form: with integer-valued inputs every
    sum is exact, so the matrix is partition-order invariant — the
    reference's subtract-the-mean loop is mathematically identical), and
    the candidate-pool ordering (minstd hash per cell — the shuffle
    analog). Driver-side: quantile cutoffs from the collected histogram
    and the O(num_samples * max_iter) anneal loop — tiny by construction
    (n << N is the tool's own premise).

    rasters: list of (row, col, value) DataFrames on the same grid.
    -> (fid, x, y, value, source) sample points."""
    import numpy as np

    K = len(rasters)
    rng = _Minstd(seed)
    k_pool_f = [rng.uniform() for _ in range(K)]
    ksum = sum(k_pool_f)
    k_pool = [int(math.ceil(v / ksum * max_iter)) for v in k_pool_f]

    # distributed stats per raster
    quantiles = []
    pools = []
    stats = []
    for k, df in enumerate(rasters):
        v = df.filter(F.col("value").isNotNull())
        st = v.agg(
            F.min("value").alias("mn"), F.max("value").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        mn, mx, n = float(st.mn), float(st.mx), int(st.n)
        binsize = (mx - mn) / num_bins
        hist = (
            v.withColumn(
                "bin",
                F.least(
                    F.lit(num_bins - 1),
                    F.floor((F.col("value") - F.lit(mn)) / F.lit(binsize)).cast("long"),
                ),
            )
            .groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        hvec = np.zeros(num_bins)
        for r in hist:
            hvec[int(r.bin)] += r.c
        cdf = np.cumsum(hvec) / n
        qs = []
        for s in range(num_samples):
            stratum = (s + 1) / num_samples
            b = int(np.searchsorted(cdf, stratum, side="right") - 1)
            b = max(b, 0)
            # reference keeps the last bin with cdf <= stratum (rs:507-516)
            while b + 1 < num_bins and cdf[b + 1] <= stratum:
                b += 1
            if cdf[b] > stratum:
                b = 0
            qs.append(mn + b * binsize)
        quantiles.append(qs)
        stats.append((mn, mx, n))
        # candidate pool: minstd-hash order over valid cells
        take = num_samples + k_pool[k]
        pool = (
            v.withColumn("idx", F.col("row") * F.lit(grid.cols) + F.col("col"))
            .withColumn("h", _clhs_hash(F.col("idx"), F.lit(seed + k + 1)))
            .orderBy("h", "idx")
            .limit(take)
            .collect()
        )
        for r in pool:
            zs = float(r.value)
            qpos = next((i for i, q in enumerate(qs) if zs <= q), len(qs) - 1)
            pools.append(
                dict(
                    k=k,
                    x=grid.x_center(int(r.col)),
                    y=grid.y_center(int(r.row)),
                    q=qpos,
                    v=zs,
                )
            )

    # population correlation matrix (algebraic exact form)
    cormat = [[1.0] * K for _ in range(K)]
    for a in range(K):
        for b in range(a + 1, K):
            j = (
                rasters[a].select("row", "col", F.col("value").alias("va"))
                .join(rasters[b].select("row", "col", F.col("value").alias("vb")), ["row", "col"])
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("va").alias("sa"), F.sum("vb").alias("sb"),
                    F.sum(F.col("va") * F.col("va")).alias("saa"),
                    F.sum(F.col("vb") * F.col("vb")).alias("sbb"),
                    F.sum(F.col("va") * F.col("vb")).alias("sab"),
                )
                .collect()[0]
            )
            n = float(j.n)
            ma, mb = j.sa / n, j.sb / n
            ta = j.saa - n * ma * ma
            tb = j.sbb - n * mb * mb
            tab = j.sab - n * ma * mb
            cormat[a][b] = cormat[b][a] = tab / math.sqrt(ta * tb)

    samples = clhs_anneal(
        pools, quantiles, cormat,
        num_samples=num_samples, max_iter=max_iter, rng=rng,
        temp=temp, temp_decay=1.0 - temp_decay, anneal_cycle=anneal_cycle,
        rs_prob=rs_prob,
    )
    spark = rasters[0].sparkSession
    rows = [
        (i + 1, s["x"], s["y"], s["v"], s["k"]) for i, s in enumerate(samples)
    ]
    return spark.createDataFrame(
        rows, "fid int, x double, y double, value double, source int"
    )
