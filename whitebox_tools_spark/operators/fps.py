"""FeaturePreservingSmoothing (terrain_analysis/
feature_preserving_smoothing.rs:360-640, Sun et al. 2007 adapted to
rasters by Lindsay et al. 2019).

Three stages, all pure column expressions / gather joins:
  1. Horn (1981) plane normals per cell, stored as (a, b) with implicit
     c = 1 (fps.rs:425-445); nodata/off-grid neighbors take the center z.
  2. Normal-field smoothing over the filter_size^2 window: weight
     w = (cos_sim - cos(norm_diff))^2 for neighbors whose normal cosine
     similarity exceeds the threshold (fps.rs:500-530).
  3. num_iter elevation-update rounds: each cell moves toward the
     plane-predicted elevations of its 8 neighbors, weighted by the
     smoothed-normal similarity (fps.rs:595-635); reverts to the original
     z when |change| > max_z_diff or no neighbor passes the threshold.

Documented deviations: (a) the reference mutates the output raster
IN-PLACE during each update scan (Gauss-Seidel in row-major order — a
serial scan-order dependency); this engine runs the Jacobi form of the
same relaxation (every round reads the previous round's surface), which
is partition-invariant and deterministic. (b) f64 arithmetic throughout
(the reference degrades to f32). The DuckDB oracle runs the IDENTICAL
formula strings over the same contract, so engine and oracle cannot
diverge structurally.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

_DX = [1, 1, 1, 0, -1, -1, -1, 0]
_DY = [-1, 0, 1, 1, 1, 0, -1, -1]

# cosine similarity of two (a, b, 1) normals — shared engine/oracle text
_COS = (
    "({a1} * {a2} + {b1} * {b2} + 1.0)"
    " / sqrt(({a1} * {a1} + {b1} * {b1} + 1.0)"
    " * ({a2} * {a2} + {b2} * {b2} + 1.0))"
)


def _normal_exprs(grid: GridSpec, z_factor: float) -> tuple[str, str]:
    """Horn a/b formulas over v0..v7 (center-fallback gathered), as SQL
    text: a = -(v2 - v4 + 2(v1 - v5) + v0 - v6) * zf / 8resx, b likewise."""
    rx = f"CAST({8.0 * grid.res_x!r} AS DOUBLE)"
    ry = f"CAST({8.0 * grid.res_y!r} AS DOUBLE)"
    zf = f"CAST({float(z_factor)!r} AS DOUBLE)"
    a = f"-((v2 - v4 + 2.0 * (v1 - v5) + v0 - v6) * {zf}) / {rx}"
    b = f"-((v6 - v4 + 2.0 * (v7 - v3) + v0 - v2) * {zf}) / {ry}"
    return a, b


def _horn_normals(cells: DataFrame, grid: GridSpec, z_factor: float) -> DataFrame:
    """-> (row, col, value, na, nb)."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offs = spark.createDataFrame(
        [(i, _DX[i], _DY[i]) for i in range(8)], "i int, dx int, dy int"
    )
    sc = (
        src.crossJoin(F.broadcast(offs))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "i",
            F.col("value").alias("nz"),
        )
        .groupBy("row", "col")
        .agg(*[F.max(F.when(F.col("i") == i, F.col("nz"))).alias(f"v{i}")
               for i in range(8)])
    )
    g = src.join(sc, ["row", "col"], "left")
    for i in range(8):
        g = g.withColumn(f"v{i}", F.coalesce(F.col(f"v{i}"), F.col("value")))
    a, b = _normal_exprs(grid, z_factor)
    return g.select(
        "row", "col", "value", F.expr(a).alias("na"), F.expr(b).alias("nb")
    )


def _smooth_normals(
    normals: DataFrame, *, filter_size: int, threshold: float
) -> DataFrame:
    """-> (row, col, value, sa, sb): similarity-weighted window means."""
    spark = normals.sparkSession
    mid = filter_size // 2
    offs = spark.createDataFrame(
        [(c - mid, r - mid) for r in range(filter_size) for c in range(filter_size)],
        "dx int, dy int",
    )
    nb = normals.crossJoin(F.broadcast(offs)).select(
        (F.col("row") - F.col("dy")).alias("row"),
        (F.col("col") - F.col("dx")).alias("col"),
        F.col("na").alias("a2"), F.col("nb").alias("b2"),
    )
    cos = _COS.format(a1="na", a2="a2", b1="nb", b2="b2")
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    j = normals.join(nb, ["row", "col"]).withColumn("cos", F.expr(cos))
    w = F.expr(f"CASE WHEN cos > {thr} THEN (cos - {thr}) * (cos - {thr}) END")
    agg = (
        j.withColumn("w", w)
        .filter(F.col("w").isNotNull())
        .groupBy("row", "col")
        .agg(
            (F.sum(F.col("a2") * F.col("w")) / F.sum("w")).alias("sa"),
            (F.sum(F.col("b2") * F.col("w")) / F.sum("w")).alias("sb"),
        )
    )
    return normals.select("row", "col", "value").join(agg, ["row", "col"])


def feature_preserving_smoothing(
    cells: DataFrame,
    grid: GridSpec,
    *,
    filter_size: int = 11,
    norm_diff: float = 8.0,
    num_iter: int = 3,
    max_z_diff: float = float("inf"),
    z_factor: float = 1.0,
) -> DataFrame:
    """-> (row, col, value): the smoothed DEM (contract above)."""
    spark = cells.sparkSession
    threshold = math.cos(math.radians(min(float(norm_diff), 90.0)))
    nv = _horn_normals(cells, grid, z_factor)
    sm = _smooth_normals(
        nv, filter_size=max(int(filter_size), 3), threshold=threshold
    ).localCheckpoint(eager=True)

    offs = spark.createDataFrame(
        [
            (i, _DX[i], _DY[i], [-grid.res_x, -grid.res_x, -grid.res_x, 0.0,
                                 grid.res_x, grid.res_x, grid.res_x, 0.0][i],
             [-grid.res_y, 0.0, grid.res_y, grid.res_y,
              grid.res_y, 0.0, -grid.res_y, -grid.res_y][i])
            for i in range(8)
        ],
        "i int, dx int, dy int, xo double, yo double",
    )
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    cos = _COS.format(a1="sa", a2="a2", b1="sb", b2="b2")
    cur = sm.select("row", "col", F.col("value").alias("z0"),
                    F.col("value").alias("z"), "sa", "sb")
    for _ in range(int(num_iter)):
        nb = cur.crossJoin(F.broadcast(offs)).select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            F.col("sa").alias("a2"), F.col("sb").alias("b2"),
            F.col("z").alias("zn"), "xo", "yo",
        )
        j = cur.join(nb, ["row", "col"]).withColumn("cos", F.expr(cos))
        j = j.withColumn(
            "w",
            F.expr(f"CASE WHEN cos > {thr} THEN (cos - {thr}) * (cos - {thr}) END"),
        ).filter(F.col("w").isNotNull())
        upd = j.groupBy("row", "col").agg(
            (
                F.sum(-(F.col("a2") * F.col("xo") + F.col("b2") * F.col("yo")
                        - F.col("zn")) * F.col("w"))
                / F.sum("w")
            ).alias("znew")
        )
        cur = (
            cur.join(upd, ["row", "col"], "left")
            .withColumn(
                "z",
                F.when(
                    F.col("znew").isNotNull()
                    & (F.abs(F.col("znew") - F.col("z0")) <= F.lit(float(max_z_diff))),
                    F.col("znew"),
                ).otherwise(F.col("z0")),
            )
            .drop("znew")
        )
    return cur.select("row", "col", F.col("z").alias("value"))


# ---------------------------------------------------------------------------
# DuckDB oracle: the identical contract, formulas spliced from the same
# strings.
# ---------------------------------------------------------------------------
def fps_oracle_sql(
    source_sql: str,
    grid: GridSpec,
    *,
    filter_size: int = 11,
    norm_diff: float = 8.0,
    num_iter: int = 3,
    max_z_diff: float = float("inf"),
    z_factor: float = 1.0,
) -> str:
    threshold = math.cos(math.radians(min(float(norm_diff), 90.0)))
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    mid = max(int(filter_size), 3) // 2
    fs = max(int(filter_size), 3)
    a_e, b_e = _normal_exprs(grid, z_factor)
    dirs = ", ".join(f"({i}, {_DX[i]}, {_DY[i]})" for i in range(8))
    vs = ",\n".join(
        f"         max(CASE WHEN d.i = {i} THEN coalesce(n.value, c.value) END) AS v{i}"
        for i in range(8)
    )
    xs = [-grid.res_x, -grid.res_x, -grid.res_x, 0.0,
          grid.res_x, grid.res_x, grid.res_x, 0.0]
    ys = [-grid.res_y, 0.0, grid.res_y, grid.res_y,
          grid.res_y, 0.0, -grid.res_y, -grid.res_y]
    dirs_xy = ", ".join(
        f"({_DX[i]}, {_DY[i]}, CAST({xs[i]!r} AS DOUBLE), CAST({ys[i]!r} AS DOUBLE))"
        for i in range(8)
    )
    cos_sm = _COS.format(a1="a.na", a2="b.na", b1="a.nb", b2="b.nb")
    mzd = (
        "CAST('infinity' AS DOUBLE)"
        if math.isinf(float(max_z_diff))
        else f"CAST({float(max_z_diff)!r} AS DOUBLE)"
    )
    iters = []
    prev = "it0"
    for k in range(1, int(num_iter) + 1):
        cos_up = _COS.format(a1="a.sa", a2="b.sa", b1="a.sb", b2="b.sb")
        iters.append(f"""
it{k} AS (
  SELECT a.row, a.col, a.z0, a.sa, a.sb,
         CASE WHEN s.znew IS NOT NULL AND abs(s.znew - a.z0) <= {mzd}
              THEN s.znew ELSE a.z0 END AS z
  FROM {prev} a
  LEFT JOIN (
    SELECT a.row, a.col,
           SUM(-(b.sa * d.xo + b.sb * d.yo - b.z) * (({cos_up}) - {thr}) * (({cos_up}) - {thr}))
             / SUM((({cos_up}) - {thr}) * (({cos_up}) - {thr})) AS znew
    FROM {prev} a
    CROSS JOIN (VALUES {dirs_xy}) d(dx, dy, xo, yo)
    JOIN {prev} b ON b.row = a.row + d.dy AND b.col = a.col + d.dx
    WHERE {cos_up} > {thr}
    GROUP BY a.row, a.col
  ) s ON s.row = a.row AND s.col = a.col
)""")
        prev = f"it{k}"
    return f"""
WITH cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
nb AS (
  SELECT c.row, c.col, any_value(c.value) AS value,
{vs}
  FROM cells c
  CROSS JOIN (VALUES {dirs}) d(i, dx, dy)
  LEFT JOIN cells n ON n.row = c.row + d.dy AND n.col = c.col + d.dx
  GROUP BY c.row, c.col
),
nv AS MATERIALIZED (
  SELECT row, col, value, {a_e} AS na, {b_e} AS nb FROM nb
),
sm AS MATERIALIZED (
  SELECT a.row, a.col, any_value(a.value) AS z0,
         SUM(b.na * (({cos_sm}) - {thr}) * (({cos_sm}) - {thr})) / SUM((({cos_sm}) - {thr}) * (({cos_sm}) - {thr})) AS sa,
         SUM(b.nb * (({cos_sm}) - {thr}) * (({cos_sm}) - {thr})) / SUM((({cos_sm}) - {thr}) * (({cos_sm}) - {thr})) AS sb
  FROM nv a JOIN nv b
    ON b.row - a.row BETWEEN {-mid} AND {fs - 1 - mid}
   AND b.col - a.col BETWEEN {-mid} AND {fs - 1 - mid}
  WHERE {cos_sm} > {thr}
  GROUP BY a.row, a.col
),
it0 AS (SELECT row, col, z0, z0 AS z, sa, sb FROM sm),
{", ".join(s.strip() for s in iters)}
SELECT row, col, round(z, 6) AS value FROM {prev}
"""


# ---------------------------------------------------------------------------
# DrainagePreservingSmoothing (terrain_analysis/
# drainage_preserving_smoothing.rs): FPS with a PER-CELL normal-difference
# threshold driven by DFM = difference from the median binned elevation
# over a (2*filter_size+1)^2 window (dps.rs:358-530):
#   bin   = floor(z * 1000) - floor(min_z * 1000)
#   median= the floor(n/2)-th smallest window bin (1-indexed; the
#           reference's cumulative-histogram rule, incl. its n=1 -> bin 0
#           quirk), dfm = (bin - median) / 1000
#   angle = max_norm_diff * (1 - reduction * dfm / dfm_t)  for -dfm_t<dfm<0
#         = max_norm_diff * (1 - reduction)                for dfm <= -dfm_t
#         = max_norm_diff                                  otherwise
# so low-lying cells (ditches, gullies) smooth less. Same Jacobi deviation
# as feature_preserving_smoothing; f64 (the reference mixes f32/f64). The
# DFM window join is the semantic reference; a 100-TB deployment at large
# filter sizes would swap in the tiled running-histogram (the reference's
# own optimization), as multiscale.window_stats_tiled does for moments.
# ---------------------------------------------------------------------------
_DPS_THR = (
    "CASE WHEN dfm < 0.0 AND dfm > {ndt} THEN"
    " cos(radians({mnd} * (1.0 - {red} * dfm / {ndt})))"
    " WHEN dfm <= {ndt} THEN cos(radians({mnd} * (1.0 - {red})))"
    " ELSE {thr} END"
)


def _dps_thr_expr(norm_diff: float, reduction: float, dfm_threshold: float) -> str:
    mnd = min(float(norm_diff), 90.0)
    red = min(max(float(reduction), 1.0), 99.0) / 100.0
    return _DPS_THR.format(
        ndt=f"CAST({-abs(float(dfm_threshold))!r} AS DOUBLE)",
        mnd=f"CAST({mnd!r} AS DOUBLE)",
        red=f"CAST({red!r} AS DOUBLE)",
        thr=f"CAST({math.cos(math.radians(mnd))!r} AS DOUBLE)",
    )


def _dfm(cells: DataFrame, *, filter_size: int) -> DataFrame:
    """-> (row, col, dfm)."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    min_z = src.agg(F.min("value")).collect()[0][0]
    min_bin = math.floor(float(min_z) * 1000.0)
    binned = src.select(
        "row", "col",
        (F.floor(F.col("value") * 1000.0).cast("long") - F.lit(min_bin)).alias("bin"),
    )
    mid = int(filter_size)
    offs = spark.createDataFrame(
        [(dx, dy) for dx in range(-mid, mid + 1) for dy in range(-mid, mid + 1)],
        "dx int, dy int",
    )
    nb = binned.crossJoin(F.broadcast(offs)).select(
        (F.col("row") - F.col("dy")).alias("row"),
        (F.col("col") - F.col("dx")).alias("col"),
        F.col("bin").alias("nbin"),
    )
    med = (
        binned.join(nb, ["row", "col"])
        .groupBy("row", "col")
        .agg(
            F.any_value(F.col("bin")).alias("bin"),
            F.sort_array(F.collect_list("nbin")).alias("arr"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn(
            "median",
            F.expr("CASE WHEN n DIV 2 = 0 THEN 0 ELSE element_at(arr, CAST(n DIV 2 AS INT)) END"),
        )
    )
    return med.select(
        "row", "col",
        ((F.col("bin") - F.col("median")).cast("double") / 1000.0).alias("dfm"),
    )


def drainage_preserving_smoothing(
    cells: DataFrame,
    grid: GridSpec,
    *,
    filter_size: int = 11,
    norm_diff: float = 15.0,
    num_iter: int = 3,
    max_z_diff: float = float("inf"),
    reduction: float = 80.0,
    dfm_threshold: float = 0.15,
    z_factor: float = 1.0,
) -> DataFrame:
    """-> (row, col, value): the drainage-preserving smoothed DEM."""
    spark = cells.sparkSession
    fs = max(int(filter_size), 3)
    nv = _horn_normals(cells, grid, z_factor)
    thr_e = _dps_thr_expr(norm_diff, reduction, dfm_threshold)
    dfm = _dfm(cells, filter_size=fs)
    nv = nv.join(dfm, ["row", "col"]).withColumn("thr", F.expr(thr_e))

    # stage 2: smoothing with the CENTER cell's threshold
    mid = fs // 2
    offs = spark.createDataFrame(
        [(c - mid, r - mid) for r in range(fs) for c in range(fs)], "dx int, dy int"
    )
    nb = nv.crossJoin(F.broadcast(offs)).select(
        (F.col("row") - F.col("dy")).alias("row"),
        (F.col("col") - F.col("dx")).alias("col"),
        F.col("na").alias("a2"), F.col("nb").alias("b2"),
    )
    cos = _COS.format(a1="na", a2="a2", b1="nb", b2="b2")
    j = nv.join(nb, ["row", "col"]).withColumn("cos", F.expr(cos))
    j = j.withColumn(
        "w", F.expr("CASE WHEN cos > thr THEN (cos - thr) * (cos - thr) END")
    ).filter(F.col("w").isNotNull())
    sm = (
        j.groupBy("row", "col")
        .agg(
            (F.sum(F.col("a2") * F.col("w")) / F.sum("w")).alias("sa"),
            (F.sum(F.col("b2") * F.col("w")) / F.sum("w")).alias("sb"),
        )
        .join(nv.select("row", "col", "value", "thr"), ["row", "col"])
        .localCheckpoint(eager=True)
    )

    offs8 = spark.createDataFrame(
        [
            (i, _DX[i], _DY[i],
             [-grid.res_x, -grid.res_x, -grid.res_x, 0.0,
              grid.res_x, grid.res_x, grid.res_x, 0.0][i],
             [-grid.res_y, 0.0, grid.res_y, grid.res_y,
              grid.res_y, 0.0, -grid.res_y, -grid.res_y][i])
            for i in range(8)
        ],
        "i int, dx int, dy int, xo double, yo double",
    )
    cos_u = _COS.format(a1="sa", a2="a2", b1="sb", b2="b2")
    cur = sm.select("row", "col", F.col("value").alias("z0"),
                    F.col("value").alias("z"), "sa", "sb", "thr")
    for _ in range(int(num_iter)):
        nb2 = cur.crossJoin(F.broadcast(offs8)).select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            F.col("sa").alias("a2"), F.col("sb").alias("b2"),
            F.col("z").alias("zn"), "xo", "yo",
        )
        j2 = cur.join(nb2, ["row", "col"]).withColumn("cos", F.expr(cos_u))
        j2 = j2.withColumn(
            "w", F.expr("CASE WHEN cos > thr THEN (cos - thr) * (cos - thr) END")
        ).filter(F.col("w").isNotNull())
        upd = j2.groupBy("row", "col").agg(
            (
                F.sum(-(F.col("a2") * F.col("xo") + F.col("b2") * F.col("yo")
                        - F.col("zn")) * F.col("w"))
                / F.sum("w")
            ).alias("znew")
        )
        cur = (
            cur.join(upd, ["row", "col"], "left")
            .withColumn(
                "z",
                F.when(
                    F.col("znew").isNotNull()
                    & (F.abs(F.col("znew") - F.col("z0")) <= F.lit(float(max_z_diff))),
                    F.col("znew"),
                ).otherwise(F.col("z0")),
            )
            .drop("znew")
        )
    return cur.select("row", "col", F.col("z").alias("value"))


def dps_oracle_sql(
    source_sql: str,
    grid: GridSpec,
    *,
    filter_size: int = 11,
    norm_diff: float = 15.0,
    num_iter: int = 3,
    max_z_diff: float = float("inf"),
    reduction: float = 80.0,
    dfm_threshold: float = 0.15,
    z_factor: float = 1.0,
) -> str:
    fs = max(int(filter_size), 3)
    mid = fs // 2
    a_e, b_e = _normal_exprs(grid, z_factor)
    thr_e = _dps_thr_expr(norm_diff, reduction, dfm_threshold)
    dirs = ", ".join(f"({i}, {_DX[i]}, {_DY[i]})" for i in range(8))
    vs = ",\n".join(
        f"         max(CASE WHEN d.i = {i} THEN coalesce(n.value, c.value) END) AS v{i}"
        for i in range(8)
    )
    xs = [-grid.res_x, -grid.res_x, -grid.res_x, 0.0,
          grid.res_x, grid.res_x, grid.res_x, 0.0]
    ys = [-grid.res_y, 0.0, grid.res_y, grid.res_y,
          grid.res_y, 0.0, -grid.res_y, -grid.res_y]
    dirs_xy = ", ".join(
        f"({_DX[i]}, {_DY[i]}, CAST({xs[i]!r} AS DOUBLE), CAST({ys[i]!r} AS DOUBLE))"
        for i in range(8)
    )
    cos_sm = _COS.format(a1="a.na", a2="b.na", b1="a.nb", b2="b.nb")
    w_sm = f"(({cos_sm}) - a.thr) * (({cos_sm}) - a.thr)"
    mzd = (
        "CAST('infinity' AS DOUBLE)"
        if math.isinf(float(max_z_diff))
        else f"CAST({float(max_z_diff)!r} AS DOUBLE)"
    )
    iters = []
    prev = "it0"
    for k in range(1, int(num_iter) + 1):
        cos_up = _COS.format(a1="a.sa", a2="b.sa", b1="a.sb", b2="b.sb")
        w_up = f"(({cos_up}) - a.thr) * (({cos_up}) - a.thr)"
        iters.append(f"""
it{k} AS (
  SELECT a.row, a.col, a.z0, a.sa, a.sb, a.thr,
         CASE WHEN s.znew IS NOT NULL AND abs(s.znew - a.z0) <= {mzd}
              THEN s.znew ELSE a.z0 END AS z
  FROM {prev} a
  LEFT JOIN (
    SELECT a.row, a.col,
           SUM(-(b.sa * d.xo + b.sb * d.yo - b.z) * {w_up}) / SUM({w_up}) AS znew
    FROM {prev} a
    CROSS JOIN (VALUES {dirs_xy}) d(dx, dy, xo, yo)
    JOIN {prev} b ON b.row = a.row + d.dy AND b.col = a.col + d.dx
    WHERE {cos_up} > a.thr
    GROUP BY a.row, a.col
  ) s ON s.row = a.row AND s.col = a.col
)""")
        prev = f"it{k}"
    return f"""
WITH cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
binned AS MATERIALIZED (
  SELECT row, col, value,
         CAST(floor(value * 1000.0) AS BIGINT)
           - (SELECT CAST(floor(min(value) * 1000.0) AS BIGINT) FROM cells) AS bin
  FROM cells
),
dfm_t AS MATERIALIZED (
  SELECT a.row, a.col, any_value(a.bin) AS bin,
         list_sort(list(b.bin)) AS arr, count(*) AS n
  FROM binned a JOIN binned b
    ON b.row BETWEEN a.row - {fs} AND a.row + {fs}
   AND b.col BETWEEN a.col - {fs} AND a.col + {fs}
  GROUP BY a.row, a.col
),
dfm_v AS (
  SELECT row, col,
         CAST(bin - (CASE WHEN n // 2 = 0 THEN 0 ELSE arr[CAST(n // 2 AS INT)] END) AS DOUBLE)
           / 1000.0 AS dfm
  FROM dfm_t
),
nb AS (
  SELECT c.row, c.col, any_value(c.value) AS value,
{vs}
  FROM cells c
  CROSS JOIN (VALUES {dirs}) d(i, dx, dy)
  LEFT JOIN cells n ON n.row = c.row + d.dy AND n.col = c.col + d.dx
  GROUP BY c.row, c.col
),
nv AS MATERIALIZED (
  SELECT nb.row, nb.col, nb.value, {a_e} AS na, {b_e} AS nb,
         ({thr_e}) AS thr
  FROM nb JOIN dfm_v USING (row, col)
),
sm AS MATERIALIZED (
  SELECT a.row, a.col, any_value(a.value) AS z0, any_value(a.thr) AS thr,
         SUM(b.na * {w_sm}) / SUM({w_sm}) AS sa,
         SUM(b.nb * {w_sm}) / SUM({w_sm}) AS sb
  FROM nv a JOIN nv b
    ON b.row - a.row BETWEEN {-mid} AND {fs - 1 - mid}
   AND b.col - a.col BETWEEN {-mid} AND {fs - 1 - mid}
  WHERE {cos_sm} > a.thr
  GROUP BY a.row, a.col
),
it0 AS (SELECT row, col, z0, z0 AS z, sa, sb, thr FROM sm),
{", ".join(s.strip() for s in iters)}
SELECT row, col, round(z, 6) AS value FROM {prev}
"""


def edge_density(
    cells: DataFrame,
    grid: GridSpec,
    *,
    filter_size: int = 11,
    norm_diff: float = 5.0,
    z_factor: float = 1.0,
) -> DataFrame:
    """EdgeDensity (terrain_analysis/edge_density.rs:395-470): a cell is an
    EDGE when any 8-neighbor's Horn normal deviates from its own by more
    than norm_diff degrees (cosine similarity <= cos(norm_diff)); output =
    proportion of edge cells within the filter_size^2 window (valid cells
    only; the reference's integral images are the serial mechanics of the
    same window mean). -> (row, col, value)."""
    spark = cells.sparkSession
    fs = max(int(filter_size), 3)
    mid = fs // 2
    threshold = math.cos(math.radians(min(float(norm_diff), 90.0)))
    nv = _horn_normals(cells, grid, z_factor)
    offs8 = F.broadcast(spark.createDataFrame(
        [(i, _DX[i], _DY[i]) for i in range(8)], "i int, dx int, dy int"
    ))
    nb = nv.crossJoin(offs8).select(
        (F.col("row") - F.col("dy")).alias("row"),
        (F.col("col") - F.col("dx")).alias("col"),
        F.col("na").alias("a2"), F.col("nb").alias("b2"),
    )
    cos = _COS.format(a1="na", a2="a2", b1="nb", b2="b2")
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    flag = (
        nv.join(nb, ["row", "col"])
        .withColumn("cos", F.expr(cos))
        .groupBy("row", "col")
        .agg(
            F.max(
                F.expr(
                    f"CASE WHEN cos <= {thr} THEN CAST(1.0 AS DOUBLE) "
                    "ELSE CAST(0.0 AS DOUBLE) END"
                )
            ).alias("edge")
        )
    )
    offs_w = F.broadcast(spark.createDataFrame(
        [(dy, dx) for dy in range(-mid, mid + 1) for dx in range(-mid, mid + 1)],
        "dy int, dx int",
    ))
    sc = (
        flag.crossJoin(offs_w)
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "edge",
        )
        .groupBy("row", "col")
        .agg(F.sum("edge").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return flag.select("row", "col").join(sc, ["row", "col"]).select(
        "row", "col", (F.col("s") / F.col("n")).alias("value")
    )


def edge_density_oracle_sql(
    source_sql: str, grid: GridSpec, *, filter_size: int = 11,
    norm_diff: float = 5.0, z_factor: float = 1.0,
) -> str:
    fs = max(int(filter_size), 3)
    mid = fs // 2
    threshold = math.cos(math.radians(min(float(norm_diff), 90.0)))
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    a_e, b_e = _normal_exprs(grid, z_factor)
    dirs = ", ".join(f"({i}, {_DX[i]}, {_DY[i]})" for i in range(8))
    vs = ",\n".join(
        f"         max(CASE WHEN d.i = {i} THEN coalesce(n.value, c.value) END) AS v{i}"
        for i in range(8)
    )
    cos = _COS.format(a1="a.na", a2="b.na", b1="a.nb", b2="b.nb")
    return f"""
WITH cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
nb AS (
  SELECT c.row, c.col, any_value(c.value) AS value,
{vs}
  FROM cells c
  CROSS JOIN (VALUES {dirs}) d(i, dx, dy)
  LEFT JOIN cells n ON n.row = c.row + d.dy AND n.col = c.col + d.dx
  GROUP BY c.row, c.col
),
nv AS MATERIALIZED (SELECT row, col, {a_e} AS na, {b_e} AS nb FROM nb),
flag AS MATERIALIZED (
  SELECT a.row, a.col,
         max(CASE WHEN {cos} <= {thr} THEN 1.0 ELSE 0.0 END) AS edge
  FROM nv a JOIN nv b
    ON abs(b.row - a.row) <= 1 AND abs(b.col - a.col) <= 1
   AND NOT (b.row = a.row AND b.col = a.col)
  GROUP BY a.row, a.col
)
SELECT a.row, a.col, round(SUM(b.edge) / count(*), 6) AS value
FROM flag a JOIN flag b
  ON b.row BETWEEN a.row - {mid} AND a.row + {mid}
 AND b.col BETWEEN a.col - {mid} AND a.col + {mid}
GROUP BY a.row, a.col
"""
