"""TimeInDaylight (terrain_analysis/time_in_daylight.rs:430-1171).

value(cell) = 1 - (seconds the sun is up but behind the cell's horizon) /
(total daylight seconds), over a day-of-year and time-of-day window.

Three pieces, transcribed from the reference:

1. Solar almanac (time_in_daylight.rs:905-1020 + its embedded rust-sun /
   suncalc port, :1040-1171): sun azimuth/altitude sampled every 10 s
   (seconds 0,10,20,30,40 of each minute — the reference's
   `(0..=45).step_by(10)` quirk undercounts each minute by 1/6; kept) for
   every day of 2023. Each sample adds 10 s of duration to its azimuth
   bin when altitude >= -0.5 deg; each (day, bin) keeps the altitude/
   local-time of the sample closest to the bin azimuth (strict-< update
   = first minimum in time order, numpy argmin semantics). Vectorized
   numpy — 2.6M positions in milliseconds, driver-side, embedded as a
   tiny (bin, altitude, duration) table in BOTH engines.

2. Horizon angle per active azimuth (rs:621-775): the gated lattice
   scan. Offsets = horizontal + vertical grid-line crossings of the ray,
   sorted by distance (driver-computed once per azimuth, f64 — the
   reference computes them in f32; documented deviation). The reference
   only evaluates slope at STRICT prefix-max-elevation cells and stops
   early once a new max slope exceeds tan(80 deg) — both reproduced
   exactly with window functions: record rows are z > running max
   (exclusive), ha = running max slope at the first crossing of the
   early-stop threshold, else the final max. Nodata/off-grid pairs
   substitute the valid half; both-missing rows terminate the ray
   (monotone rays cannot re-enter the grid, so dropping them is the
   reference's `break`).

3. Shadow accounting (rs:791-860): per (cell, active bin), add the
   durations of in-window days whose representative altitude is below
   the cell's horizon angle; value = 1 - shadow/total_daylight.

Scale shape: one scatter of cells x (active bins x ray offsets) with two
neighbor equi-joins, two windows partitioned by (bin, cell), one
broadcast join against the almanac, one aggregate — all JVM expressions,
no Python in the distributed path, no driver loops over cells.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..grid import GridSpec

_OBLIQUITY = math.radians(23.4397)
_PERIHELION = math.radians(102.9372)


def _sun_pos(unix_ms: np.ndarray, lat: float, lon: float):
    """rust-sun/suncalc position (time_in_daylight.rs:1093-1171),
    vectorized. Returns (azimuth_deg, altitude_deg)."""
    lw = -math.radians(lon)
    phi = math.radians(lat)
    d = unix_ms / 86400000.0 - 0.5 + 2440588.0 - 2451545.0
    m = np.radians(357.5291 + 0.98560028 * d)
    c = np.radians(1.9148 * np.sin(m) + 0.02 * np.sin(2 * m) + 0.0003 * np.sin(3 * m))
    l = m + c + _PERIHELION + math.pi
    dec = np.arcsin(np.sin(0.0) * math.cos(_OBLIQUITY) + np.cos(0.0) * math.sin(_OBLIQUITY) * np.sin(l))
    ra = np.arctan2(np.sin(l) * math.cos(_OBLIQUITY) - np.tan(0.0) * math.sin(_OBLIQUITY), np.cos(l))
    h = np.radians(280.16 + 360.9856235 * d) - lw - ra
    alt = np.arcsin(math.sin(phi) * np.sin(dec) + math.cos(phi) * np.cos(dec) * np.cos(h))
    az = np.arctan2(np.sin(h), np.cos(h) * math.sin(phi) - np.tan(dec) * math.cos(phi)) + math.pi
    return np.degrees(az), np.degrees(alt)


@lru_cache(maxsize=8)
def generate_almanac(
    lat: float, lon: float, utc_offset: float, az_fraction: float
) -> list:
    """Per (day 1..365, bin) representative (altitude_deg, duration_s,
    time_s local seconds-of-day). Returns a list of dicts per day."""
    n_bins = int(math.ceil(360.0 / az_fraction))
    secs = np.array([0, 10, 20, 30, 40])
    sod = (
        np.arange(24)[:, None, None] * 3600
        + np.arange(60)[None, :, None] * 60
        + secs[None, None, :]
    ).ravel()  # local seconds of day, sample order = reference scan order
    epoch_2023 = 1672531200000  # 2023-01-01T00:00:00Z in ms
    out = []
    for doy in range(1, 366):
        # local midnight assume_offset(utc_offset): unix = local - offset
        base_ms = epoch_2023 + ((doy - 1) * 86400 - int(utc_offset) * 3600) * 1000
        ms = base_ms + sod * 1000
        az, alt = _sun_pos(ms.astype(np.float64), lat, lon)
        bins = np.floor(az / az_fraction + 0.5).astype(np.int64)  # round half-up
        bin_val = bins * az_fraction
        wrap = bin_val == 360.0
        bins = np.where(wrap, 0, bins)
        bin_val = np.where(wrap, 0.0, bin_val)
        diff = np.abs(bin_val - az)
        day = {"bins": {}}
        dur = np.where(alt >= -0.5, 10.0, 0.0)
        for b in range(n_bins):
            m = bins == b
            if not m.any():
                continue
            idx = np.flatnonzero(m)
            best = idx[np.argmin(diff[idx])]
            day["bins"][b] = {
                "altitude": float(np.float32(alt[best])),  # stored f32 (rs:585)
                "time_s": int(sod[best]),
                "duration": float(dur[idx].sum()),
            }
        out.append(day)
    return out


def almanac_tables(
    lat: float,
    lon: float,
    utc_offset: float,
    az_fraction: float,
    *,
    start_day: int = 1,
    end_day: int = 365,
    start_time: int = 0,
    end_time: int = 86399,
):
    """(alm_rows, active_bins, total_daylight): alm_rows = (bin, altitude,
    duration) for in-window daytime days; active bins have windowed
    daylight > 0 (rs:588-607)."""
    alm = generate_almanac(lat, lon, utc_offset, az_fraction)
    rows = []
    totals = {}
    for doy, day in enumerate(alm, start=1):
        for b, e in day["bins"].items():
            if start_day <= doy <= end_day and start_time <= e["time_s"] <= end_time:
                if e["duration"] > 0.0:
                    rows.append((b, e["altitude"], e["duration"]))
                    totals[b] = totals.get(b, 0.0) + e["duration"]
    active = sorted(b for b, t in totals.items() if t > 0.0)
    total_daylight = sum(totals.values())
    return rows, active, total_daylight


def ray_offsets(
    azimuth: float, cell_size_x: float, cell_size_y: float, max_dist: float
) -> list:
    """Lattice-crossing offsets for one azimuth (rs:634-712), sorted by
    distance: (x1, y1, x2, y2, weight, dist). f64 (reference: f32)."""
    if azimuth < 180.0:
        line_slope = math.tan(math.radians(90.0 - azimuth))
    else:
        line_slope = math.tan(math.radians(270.0 - azimuth))
    if 0.0 <= azimuth <= 90.0:
        x_step, y_step = 1, 1
    elif azimuth <= 180.0:
        x_step, y_step = 1, -1
    elif azimuth <= 270.0:
        x_step, y_step = -1, -1
    else:
        x_step, y_step = -1, 1
    offsets = []
    if line_slope != 0.0:
        y = 0.0
        while True:
            y += y_step
            x = y / line_slope
            dist = math.hypot(x * cell_size_x, -y * cell_size_y)
            if dist > max_dist:
                break
            x1 = math.floor(x)
            offsets.append((int(x1), int(-y), int(x1) + 1, int(-y), x - x1, dist))
    x = 0.0
    while True:
        x += x_step
        y = -(line_slope * x)
        dist = math.hypot(x * cell_size_x, y * cell_size_y)
        if dist > max_dist:
            break
        y1 = math.floor(y)
        offsets.append((int(x), int(y1), int(x), int(y1) + 1, y - y1, dist))
    offsets.sort(key=lambda o: o[5])
    return offsets


_EARLY_STOP = math.tan(math.radians(80.0))


def time_in_daylight(
    cells: DataFrame,
    grid: GridSpec,
    *,
    lat: float,
    lon: float,
    az_fraction: float = 10.0,
    max_dist: float = 100.0,
    utc_offset: float = 0.0,
    start_day: int = 1,
    end_day: int = 365,
    start_time: int = 0,
    end_time: int = 86399,
) -> DataFrame:
    """Dense (row, col, value) time-in-daylight proportion."""
    spark = cells.sparkSession
    alm_rows, active, total_daylight = almanac_tables(
        lat, lon, utc_offset, az_fraction,
        start_day=start_day, end_day=end_day,
        start_time=start_time, end_time=end_time,
    )
    if total_daylight <= 0.0:
        return cells.select("row", "col", F.lit(grid.nodata).alias("value")).limit(0)
    max_dist = min(
        max_dist,
        math.hypot(grid.rows * grid.res_y, grid.cols * grid.res_x),
    )
    offs = [
        (b, *o)
        for b in active
        for o in ray_offsets(b * az_fraction, grid.res_x, grid.res_y, max_dist)
    ]
    offs_df = F.broadcast(
        spark.createDataFrame(
            offs, "bin int, x1 int, y1 int, x2 int, y2 int, w double, dist double"
        )
    )
    alm_df = F.broadcast(
        spark.createDataFrame(alm_rows, "bin int, altitude double, duration double")
    )
    z0 = cells.select("row", "col", F.col("value").alias("z0"))
    nb1 = cells.select(
        F.col("row").alias("r1"), F.col("col").alias("c1"), F.col("value").alias("za")
    )
    nb2 = cells.select(
        F.col("row").alias("r2"), F.col("col").alias("c2"), F.col("value").alias("zb")
    )
    sc = (
        z0.crossJoin(offs_df)
        .withColumn("r1", F.col("row") + F.col("y1"))
        .withColumn("c1", F.col("col") + F.col("x1"))
        .withColumn("r2", F.col("row") + F.col("y2"))
        .withColumn("c2", F.col("col") + F.col("x2"))
        .join(nb1, ["r1", "c1"], "left")
        .join(nb2, ["r2", "c2"], "left")
        .filter(F.col("za").isNotNull() | F.col("zb").isNotNull())
        .withColumn("zA", F.coalesce("za", "zb"))
        .withColumn("zB", F.coalesce("zb", "za"))
        .withColumn("z", F.col("zA") + F.col("w") * (F.col("zB") - F.col("zA")))
        .withColumn("slope", (F.col("z") - F.col("z0")) / F.col("dist"))
    )
    wprev = (
        Window.partitionBy("bin", "row", "col")
        .orderBy("dist")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = sc.withColumn("pmax", F.max("z").over(wprev)).filter(
        F.col("pmax").isNull() | (F.col("z") > F.col("pmax"))
    )
    wrm = (
        Window.partitionBy("bin", "row", "col")
        .orderBy("dist")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rec = rec.withColumn("rm", F.max("slope").over(wrm))
    stop = rec.groupBy("bin", "row", "col").agg(
        F.min(F.when(F.col("rm") > F.lit(_EARLY_STOP), F.col("dist"))).alias("dstop")
    )
    ha = (
        rec.join(stop, ["bin", "row", "col"])
        .filter(F.col("dstop").isNull() | (F.col("dist") <= F.col("dstop")))
        .groupBy("bin", "row", "col")
        .agg(F.max("rm").alias("ha_slope"))
        .withColumn("ha", F.degrees(F.atan(F.col("ha_slope"))))
    )
    # zero-length scans (no valid offsets) -> ha = 0 (rs:766)
    base = z0.crossJoin(
        F.broadcast(spark.createDataFrame([(b,) for b in active], "bin int"))
    )
    ha_full = base.join(ha.select("bin", "row", "col", "ha"), ["bin", "row", "col"], "left").withColumn(
        "ha", F.coalesce("ha", F.lit(0.0))
    )
    shadow = (
        ha_full.join(alm_df, "bin")
        .filter(F.col("altitude") < F.col("ha"))
        .groupBy("row", "col")
        .agg(F.sum("duration").alias("shadow"))
    )
    return z0.join(shadow, ["row", "col"], "left").select(
        "row",
        "col",
        (F.lit(1.0) - F.coalesce("shadow", F.lit(0.0)) / F.lit(total_daylight)).alias("value"),
    )


def time_in_daylight_oracle_sql(
    dem_sql: str,
    grid: GridSpec,
    *,
    lat: float,
    lon: float,
    az_fraction: float = 10.0,
    max_dist: float = 100.0,
    utc_offset: float = 0.0,
    start_day: int = 1,
    end_day: int = 365,
    start_time: int = 0,
    end_time: int = 86399,
) -> str:
    """DuckDB mirror: identical offset/almanac literals, identical window
    formulation."""
    alm_rows, active, total_daylight = almanac_tables(
        lat, lon, utc_offset, az_fraction,
        start_day=start_day, end_day=end_day,
        start_time=start_time, end_time=end_time,
    )
    max_dist = min(
        max_dist,
        math.hypot(grid.rows * grid.res_y, grid.cols * grid.res_x),
    )
    offs = [
        (b, *o)
        for b in active
        for o in ray_offsets(b * az_fraction, grid.res_x, grid.res_y, max_dist)
    ]
    offs_vals = ", ".join(
        f"({b}, {x1}, {y1}, {x2}, {y2}, {w!r}, {dv!r})"
        for b, x1, y1, x2, y2, w, dv in offs
    )
    alm_vals = ", ".join(f"({b}, {a!r}, {dur!r})" for b, a, dur in alm_rows)
    bins_vals = ", ".join(f"({b})" for b in active)
    return f"""
WITH cells AS ({dem_sql}),
offs AS (SELECT * FROM (VALUES {offs_vals}) AS o(bin, x1, y1, x2, y2, w, dist)),
alm AS (SELECT * FROM (VALUES {alm_vals}) AS a(bin, altitude, duration)),
bins AS (SELECT * FROM (VALUES {bins_vals}) AS b(bin)),
sc AS (
  SELECT c.row, c.col, c.value AS z0, o.bin, o.w, o.dist,
         n1.value AS za, n2.value AS zb
  FROM cells c CROSS JOIN offs o
  LEFT JOIN cells n1 ON n1.row = c.row + o.y1 AND n1.col = c.col + o.x1
  LEFT JOIN cells n2 ON n2.row = c.row + o.y2 AND n2.col = c.col + o.x2
  WHERE n1.value IS NOT NULL OR n2.value IS NOT NULL
),
interp AS (
  SELECT row, col, bin, dist,
         (COALESCE(za, zb) + w * (COALESCE(zb, za) - COALESCE(za, zb))) AS z,
         ((COALESCE(za, zb) + w * (COALESCE(zb, za) - COALESCE(za, zb))) - z0) / dist AS slope
  FROM sc
),
rec0 AS (
  SELECT *, max(z) OVER (PARTITION BY bin, row, col ORDER BY dist
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM interp
),
rec AS (
  SELECT *, max(slope) OVER (PARTITION BY bin, row, col ORDER BY dist
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
  FROM rec0 WHERE pmax IS NULL OR z > pmax
),
stop AS (
  SELECT bin, row, col,
         min(CASE WHEN rm > {_EARLY_STOP!r} THEN dist END) AS dstop
  FROM rec GROUP BY bin, row, col
),
hacell AS (
  SELECT r.bin, r.row, r.col, degrees(atan(max(r.rm))) AS ha
  FROM rec r JOIN stop s ON r.bin = s.bin AND r.row = s.row AND r.col = s.col
  WHERE s.dstop IS NULL OR r.dist <= s.dstop
  GROUP BY r.bin, r.row, r.col
),
hafull AS (
  SELECT c.row, c.col, b.bin, COALESCE(h.ha, 0.0) AS ha
  FROM cells c CROSS JOIN bins b
  LEFT JOIN hacell h ON h.bin = b.bin AND h.row = c.row AND h.col = c.col
),
shadow AS (
  SELECT hf.row, hf.col, sum(a.duration) AS shadow
  FROM hafull hf JOIN alm a ON a.bin = hf.bin
  WHERE a.altitude < hf.ha
  GROUP BY hf.row, hf.col
)
SELECT c.row, c.col,
       1.0 - COALESCE(s.shadow, 0.0) / {total_daylight!r} AS value
FROM cells c LEFT JOIN shadow s ON s.row = c.row AND s.col = c.col
"""
