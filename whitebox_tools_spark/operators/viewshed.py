"""Visibility operators (class ITR/FOC hybrid).

References (semantics; architecture is Spark-native):
  - Viewshed: terrain_analysis/viewshed.rs:345-380 — per-cell view angle
    dz/dist*1000 from the station, visibility by comparing against the max
    view angle along the sight line. The reference propagates max angles
    with the XDraw interpolated sweep (an approximation with sequential
    ring dependencies); this engine computes the EXACT R3 line-of-sight:
    a cell is visible iff its view angle is >= every angle sampled along
    the straight line to the station (nearest-cell stepping on the
    dominant axis). Embarrassingly parallel: one explode + one join + one
    aggregate — no sequential wavefront, so it distributes cleanly.
  - HorizonAngle: terrain_analysis/horizon_angle.rs — max vertical angle
    (degrees) toward any cell along a fixed-azimuth ray, ray-traced with
    an optional max search distance.

Scale shape: per-target work is O(path length); total O(n * diameter)
sampled-line rows flow through one shuffle. For planet-scale DEMs the
XDraw sweep (O(n) total but diameter-many supersteps) becomes preferable;
at the 10^8-cell tile sizes viewsheds are actually computed on, the
explode shape wins because it needs no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from whitebox_tools_spark.grid import GridSpec


def viewshed(
    cells: DataFrame,
    grid: GridSpec,
    *,
    station_row: int,
    station_col: int,
    station_height: float = 0.0,
) -> DataFrame:
    """-> (row, col, value): 1.0 where the cell center is visible from the
    station (placed station_height above the DEM surface), else 0.0.

    View angle metric mirrors viewshed.rs:361-364: (z - stn_z)/dist*1000
    with dist in map units. Sight-line sampling: L = max(|drow|,|dcol|)
    steps; sample t picks the nearest cell to the ideal point (floor(x+.5)
    rounding, mirrored exactly in the DuckDB oracle)."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    stn = src.filter(
        (F.col("row") == station_row) & (F.col("col") == station_col)
    ).select(F.col("value").alias("stn_z"))
    d = src.crossJoin(F.broadcast(stn))
    dr = F.col("row") - F.lit(station_row)
    dc = F.col("col") - F.lit(station_col)
    dist = F.sqrt(
        (dr * F.lit(grid.res_y)) * (dr * F.lit(grid.res_y))
        + (dc * F.lit(grid.res_x)) * (dc * F.lit(grid.res_x))
    )
    va = F.when(
        dist != 0.0,
        (F.col("value") + F.lit(0.0) - (F.col("stn_z") + F.lit(station_height)))
        / dist * 1000.0,
    ).otherwise(F.lit(0.0))
    t = d.withColumn("va", va).withColumn(
        "L", F.greatest(F.abs(dr), F.abs(dc)).cast("long")
    )
    # intermediate samples t=1..L-1 at the nearest cell to the ideal point
    steps = t.filter(F.col("L") >= 2).withColumn(
        "t", F.explode(F.sequence(F.lit(1), F.col("L") - 1))
    )
    srow = F.floor(
        F.lit(station_row)
        + (F.col("row") - F.lit(station_row)) * F.col("t") / F.col("L")
        + F.lit(0.5)
    ).cast("long")
    scol = F.floor(
        F.lit(station_col)
        + (F.col("col") - F.lit(station_col)) * F.col("t") / F.col("L")
        + F.lit(0.5)
    ).cast("long")
    samples = steps.select(
        "row", "col", "va", srow.alias("srow"), scol.alias("scol")
    )
    sva_src = t.select(
        F.col("row").alias("srow"), F.col("col").alias("scol"), F.col("va").alias("sva")
    )
    blocked = (
        samples.join(sva_src, ["srow", "scol"])
        .groupBy("row", "col")
        .agg(F.max("sva").alias("max_sva"))
    )
    out = t.join(blocked, ["row", "col"], "left").select(
        "row", "col",
        F.when(
            F.col("max_sva").isNull() | (F.col("va") >= F.col("max_sva")),
            F.lit(1.0),
        ).otherwise(F.lit(0.0)).alias("value"),
    )
    return out


def median_station(cells: DataFrame) -> tuple[int, int]:
    """Deterministic data-derived station: the populated cell at offset
    n//2 in (row, col) order. Keeps the sf0.001 fixture non-vacuous (a
    fixed literal station can fall off the populated region at small SF);
    the DuckDB oracle derives the SAME cell via OFFSET count//2."""
    src = cells.filter(F.col("value").isNotNull())
    n = src.count()
    r = (
        src.select("row", "col")
        .orderBy("row", "col")
        .offset(n // 2)
        .limit(1)
        .collect()[0]
    )
    return int(r["row"]), int(r["col"])


_MEDIAN_STN_SQL = (
    "SELECT row AS mrow, col AS mcol FROM src ORDER BY row, col "
    "OFFSET (SELECT count(*) // 2 FROM src) LIMIT 1"
)


def viewshed_oracle_sql(
    source_sql: str,
    grid: GridSpec,
    *,
    station_row: int | None = None,
    station_col: int | None = None,
    station_height: float = 0.0,
) -> str:
    if station_row is None:
        sr = f"(SELECT mrow FROM ({_MEDIAN_STN_SQL}))"
        sc = f"(SELECT mcol FROM ({_MEDIAN_STN_SQL}))"
    else:
        sr, sc = station_row, station_col
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
stn AS (SELECT value AS stn_z FROM src WHERE row = {sr} AND col = {sc}),
t AS (
  SELECT row, col,
         CASE WHEN sqrt((row - {sr}) * {grid.res_y!r} * ((row - {sr}) * {grid.res_y!r})
                      + (col - {sc}) * {grid.res_x!r} * ((col - {sc}) * {grid.res_x!r})) <> 0.0
              THEN (value + 0.0 - (stn_z + {station_height!r}))
                   / sqrt((row - {sr}) * {grid.res_y!r} * ((row - {sr}) * {grid.res_y!r})
                        + (col - {sc}) * {grid.res_x!r} * ((col - {sc}) * {grid.res_x!r})) * 1000.0
              ELSE 0.0 END AS va,
         greatest(abs(row - {sr}), abs(col - {sc})) AS L
  FROM src CROSS JOIN stn
),
steps AS (
  SELECT row, col, va,
         CAST(floor({sr} + (row - {sr}) * tt.t / L + 0.5) AS BIGINT) AS srow,
         CAST(floor({sc} + (col - {sc}) * tt.t / L + 0.5) AS BIGINT) AS scol
  FROM t CROSS JOIN LATERAL unnest(range(1, CAST(L AS BIGINT))) AS tt(t)
  WHERE L >= 2
),
blocked AS (
  SELECT s.row, s.col, max(v.va) AS max_sva
  FROM steps s JOIN t v ON v.row = s.srow AND v.col = s.scol
  GROUP BY s.row, s.col
)
SELECT t.row, t.col,
       CASE WHEN b.max_sva IS NULL OR t.va >= b.max_sva THEN 1.0 ELSE 0.0 END AS value
FROM t LEFT JOIN blocked b ON b.row = t.row AND b.col = t.col
"""


def horizon_angle_east(
    cells: DataFrame, grid: GridSpec, *, max_dist: float = float("inf")
) -> DataFrame:
    """HorizonAngle, east azimuth: per cell, the maximum vertical angle
    (degrees) to any cell further east in the same row within max_dist;
    cells with no eastern neighbor in range get 0 slope's floor -90? The
    reference leaves them at the flat horizon -> 0 tangent is wrong for
    pits, so this engine emits degrees(atan(max dz/dist)) and NULL when no
    candidate exists. -> (row, col, value)."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    east = src.select(
        F.col("row"), F.col("col").alias("ecol"), F.col("value").alias("ez")
    )
    pairs = src.join(east, "row").filter(F.col("ecol") > F.col("col"))
    dist = (F.col("ecol") - F.col("col")) * F.lit(grid.res_x)
    pairs = pairs.filter(dist <= F.lit(max_dist))
    ang = (F.col("ez") - F.col("value")) / dist
    agg = pairs.groupBy("row", "col").agg(F.max(ang).alias("mx"))
    return src.join(agg, ["row", "col"], "left").select(
        "row", "col", F.degrees(F.atan(F.col("mx"))).alias("value")
    )


def horizon_angle_east_oracle_sql(
    source_sql: str, grid: GridSpec, *, max_dist: float = 1e18
) -> str:
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
agg AS (
  SELECT a.row, a.col, max((b.value - a.value) / ((b.col - a.col) * {grid.res_x!r})) AS mx
  FROM src a JOIN src b ON b.row = a.row AND b.col > a.col
  WHERE (b.col - a.col) * {grid.res_x!r} <= {max_dist!r}
  GROUP BY a.row, a.col
)
SELECT s.row, s.col, degrees(atan(agg.mx)) AS value
FROM src s LEFT JOIN agg ON agg.row = s.row AND agg.col = s.col
"""


def directional_relief_east(
    cells: DataFrame, grid: GridSpec, *, max_dist: float = float("inf")
) -> DataFrame:
    """DirectionalRelief (terrain_analysis/directional_relief.rs), east
    azimuth (the exact-row case of the reference's interpolated ray walk):
    mean elevation of the valid cells east of the cell (within max_dist)
    minus the cell's own elevation; NULL when no eastern cell exists.
    -> (row, col, value)."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    east = src.select(
        F.col("row"), F.col("col").alias("ecol"), F.col("value").alias("ez")
    )
    pairs = src.join(east, "row").filter(F.col("ecol") > F.col("col"))
    dist = (F.col("ecol") - F.col("col")) * F.lit(grid.res_x)
    pairs = pairs.filter(dist <= F.lit(max_dist))
    agg = pairs.groupBy("row", "col").agg(F.avg("ez").alias("mz"))
    return src.join(agg, ["row", "col"], "left").select(
        "row", "col", (F.col("mz") - F.col("value")).alias("value")
    )


def directional_relief_east_oracle_sql(
    source_sql: str, grid: GridSpec, *, max_dist: float = 1e18
) -> str:
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
agg AS (
  SELECT a.row, a.col, avg(b.value) AS mz
  FROM src a JOIN src b ON b.row = a.row AND b.col > a.col
  WHERE (b.col - a.col) * {grid.res_x!r} <= {max_dist!r}
  GROUP BY a.row, a.col
)
SELECT s.row, s.col, agg.mz - s.value AS value
FROM src s LEFT JOIN agg ON agg.row = s.row AND agg.col = s.col
"""


def fetch_analysis_east(
    cells: DataFrame, grid: GridSpec, *, height_increment: float = 0.05
) -> DataFrame:
    """FetchAnalysis (terrain_analysis/fetch_analysis.rs:330-428), east
    azimuth: distance to the first eastern cell with
    z >= z_core + dist * height_increment; with no obstacle, minus the
    distance to the grid's east edge (the reference's negative edge-fetch
    convention, using the raster's max column). -> (row, col, value)."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    mc = src.agg(F.max("col").alias("maxc"))
    east = src.select(
        F.col("row"), F.col("col").alias("ecol"), F.col("value").alias("ez")
    )
    pairs = src.join(east, "row").filter(F.col("ecol") > F.col("col"))
    dist = (F.col("ecol") - F.col("col")).cast("double") * F.lit(grid.res_x)
    hits = pairs.filter(
        F.col("ez") >= F.col("value") + dist * F.lit(height_increment)
    ).groupBy("row", "col").agg(F.min(dist).alias("hit"))
    return (
        src.join(hits, ["row", "col"], "left")
        .crossJoin(F.broadcast(mc))
        .select(
            "row", "col",
            F.coalesce(
                F.col("hit"),
                -(F.col("maxc") - F.col("col")).cast("double") * F.lit(grid.res_x),
            ).alias("value"),
        )
    )


def fetch_analysis_east_oracle_sql(
    source_sql: str, grid: GridSpec, *, height_increment: float = 0.05
) -> str:
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
mc AS (SELECT max(col) AS maxc FROM src),
hits AS (
  SELECT a.row, a.col,
         min((b.col - a.col) * {grid.res_x!r}) AS hit
  FROM src a JOIN src b ON b.row = a.row AND b.col > a.col
  WHERE b.value >= a.value + (b.col - a.col) * {grid.res_x!r} * {height_increment!r}
  GROUP BY a.row, a.col
)
SELECT s.row, s.col,
       coalesce(h.hit, -CAST(mc.maxc - s.col AS DOUBLE) * {grid.res_x!r}) AS value
FROM src s CROSS JOIN mc
LEFT JOIN hits h ON h.row = s.row AND h.col = s.col
"""


def visibility_index(
    cells: DataFrame, grid: GridSpec, *, res_factor: int = 2,
    station_height: float = 2.0,
) -> DataFrame:
    """VisibilityIndex (terrain_analysis/visibility_index.rs): the
    proportion of sampled stations (every res_factor-th cell in both
    axes) that can see each cell; per-station visibility uses the same
    exact R3 line-of-sight as `viewshed`. One explode + join + aggregate
    per the whole station set — no per-station iteration.
    -> (row, col, value in [0, 1])."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    stn = src.filter(
        (F.col("row") % res_factor == 0) & (F.col("col") % res_factor == 0)
    ).select(
        F.col("row").alias("sr"), F.col("col").alias("sc"),
        F.col("value").alias("stn_z"),
    )
    d = src.crossJoin(stn)
    dr = F.col("row") - F.col("sr")
    dc = F.col("col") - F.col("sc")
    dist = F.sqrt(
        (dr * F.lit(grid.res_y)) * (dr * F.lit(grid.res_y))
        + (dc * F.lit(grid.res_x)) * (dc * F.lit(grid.res_x))
    )
    va = F.when(
        dist != 0.0,
        (F.col("value") - (F.col("stn_z") + F.lit(station_height))) / dist * 1000.0,
    ).otherwise(F.lit(0.0))
    t = d.withColumn("va", va).withColumn(
        "L", F.greatest(F.abs(dr), F.abs(dc)).cast("long")
    )
    steps = t.filter(F.col("L") >= 2).withColumn(
        "t", F.explode(F.sequence(F.lit(1), F.col("L") - 1))
    )
    srow = F.floor(
        F.col("sr") + (F.col("row") - F.col("sr")) * F.col("t") / F.col("L") + F.lit(0.5)
    ).cast("long")
    scol = F.floor(
        F.col("sc") + (F.col("col") - F.col("sc")) * F.col("t") / F.col("L") + F.lit(0.5)
    ).cast("long")
    samples = steps.select(
        "sr", "sc", "row", "col", "va", srow.alias("srow"), scol.alias("scol")
    )
    sva_src = t.select(
        F.col("sr").alias("sr"), F.col("sc").alias("sc"),
        F.col("row").alias("srow"), F.col("col").alias("scol"),
        F.col("va").alias("sva"),
    )
    blocked = (
        samples.join(sva_src, ["sr", "sc", "srow", "scol"])
        .groupBy("sr", "sc", "row", "col")
        .agg(F.max("sva").alias("max_sva"))
    )
    vis = t.join(blocked, ["sr", "sc", "row", "col"], "left").select(
        "row", "col",
        F.when(
            F.col("max_sva").isNull() | (F.col("va") >= F.col("max_sva")), 1.0
        ).otherwise(0.0).alias("v"),
    )
    return vis.groupBy("row", "col").agg(F.avg("v").alias("value"))


def visibility_index_oracle_sql(
    source_sql: str, grid: GridSpec, *, res_factor: int = 2,
    station_height: float = 2.0,
) -> str:
    ry, rx = grid.res_y, grid.res_x
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
stn AS (SELECT row AS sr, col AS sc, value AS stn_z FROM src
        WHERE row % {res_factor} = 0 AND col % {res_factor} = 0),
t AS (
  SELECT s.sr, s.sc, c.row, c.col,
         CASE WHEN sqrt((c.row - s.sr) * {ry!r} * ((c.row - s.sr) * {ry!r})
                      + (c.col - s.sc) * {rx!r} * ((c.col - s.sc) * {rx!r})) <> 0.0
              THEN (c.value - (s.stn_z + {station_height!r}))
                   / sqrt((c.row - s.sr) * {ry!r} * ((c.row - s.sr) * {ry!r})
                        + (c.col - s.sc) * {rx!r} * ((c.col - s.sc) * {rx!r})) * 1000.0
              ELSE 0.0 END AS va,
         greatest(abs(c.row - s.sr), abs(c.col - s.sc)) AS L
  FROM src c CROSS JOIN stn s
),
steps AS (
  SELECT sr, sc, row, col, va,
         CAST(floor(sr + (row - sr) * tt.t / L + 0.5) AS BIGINT) AS srow,
         CAST(floor(sc + (col - sc) * tt.t / L + 0.5) AS BIGINT) AS scol
  FROM t CROSS JOIN LATERAL unnest(range(1, CAST(L AS BIGINT))) AS tt(t)
  WHERE L >= 2
),
blocked AS (
  SELECT s.sr, s.sc, s.row, s.col, max(v.va) AS max_sva
  FROM steps s JOIN t v
    ON v.sr = s.sr AND v.sc = s.sc AND v.row = s.srow AND v.col = s.scol
  GROUP BY s.sr, s.sc, s.row, s.col
),
vis AS (
  SELECT t.row, t.col,
         CASE WHEN b.max_sva IS NULL OR t.va >= b.max_sva THEN 1.0 ELSE 0.0 END AS v
  FROM t LEFT JOIN blocked b
    ON b.sr = t.sr AND b.sc = t.sc AND b.row = t.row AND b.col = t.col
)
SELECT row, col, avg(v) AS value FROM vis GROUP BY row, col
"""
