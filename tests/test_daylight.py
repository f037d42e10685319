"""TimeInDaylight — almanac + gated-horizon-scan pins against direct
serial transcriptions of the reference loops."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.operators.daylight import (
    _EARLY_STOP,
    _sun_pos,
    generate_almanac,
    ray_offsets,
    time_in_daylight,
)


def _pos_serial(unix_ms, lat, lon):
    """Scalar transcription of rust-sun pos() (time_in_daylight.rs:
    1093-1171), independent of the vectorized numpy path."""
    to_rad = math.pi / 180.0
    obliquity = 23.4397 * to_rad
    perihelion = 102.9372 * to_rad
    lw = -lon * to_rad
    phi = lat * to_rad
    d = unix_ms / 86400000.0 - 0.5 + 2440588.0 - 2451545.0
    m = (357.5291 + 0.98560028 * d) * to_rad
    c = (1.9148 * math.sin(m) + 0.02 * math.sin(2 * m) + 0.0003 * math.sin(3 * m)) * to_rad
    l = m + c + perihelion + math.pi
    dec = math.asin(math.cos(0.0) * math.sin(obliquity) * math.sin(l))
    ra = math.atan2(math.sin(l) * math.cos(obliquity), math.cos(l))
    h = (280.16 + 360.9856235 * d) * to_rad - lw - ra
    alt = math.asin(math.sin(phi) * math.sin(dec) + math.cos(phi) * math.cos(dec) * math.cos(h))
    az = math.atan2(math.sin(h), math.cos(h) * math.sin(phi) - math.tan(dec) * math.cos(phi)) + math.pi
    return math.degrees(az), math.degrees(alt)


def test_sun_pos_matches_scalar_transcription():
    for ms in [1672531200000, 1688212800000, 1700000000000]:
        az_v, alt_v = _sun_pos(np.array([float(ms)]), 43.545, -80.248)
        az_s, alt_s = _pos_serial(ms, 43.545, -80.248)
        assert abs(az_v[0] - az_s) < 1e-9
        assert abs(alt_v[0] - alt_s) < 1e-9


def test_almanac_sanity():
    alm = generate_almanac(43.545, -80.248, 0.0, 30.0)
    assert len(alm) == 365
    # summer solstice day has more daylight than winter
    dur = lambda day: sum(e["duration"] for e in alm[day]["bins"].values() if e["altitude"] >= -0.5)
    total_summer = sum(e["duration"] for e in alm[171]["bins"].values())
    total_winter = sum(e["duration"] for e in alm[354]["bins"].values())
    assert total_summer > total_winter > 0
    # durations are multiples of the 10 s sample interval
    for e in alm[100]["bins"].values():
        assert e["duration"] % 10.0 == 0.0


def test_gated_horizon_scan_matches_reference_loop(spark):
    """The window-function formulation (prefix-max gate + early stop)
    equals the reference's sequential scan (rs:721-775) cell-for-cell."""
    rng = np.random.RandomState(11)
    rows, cols, res = 12, 12, 5.0
    z = np.round(rng.uniform(0, 300, (rows, cols)), 1)
    grid = GridSpec(west=0.0, north=60.0, res_x=res, res_y=res, rows=rows, cols=cols)
    cells = spark.createDataFrame(
        [(r, c, float(z[r, c])) for r in range(rows) for c in range(cols)],
        "row long, col long, value double",
    )
    # drive through time_in_daylight with one active bin by checking the
    # full output against a serial transcription of the whole tool
    args = dict(lat=43.545, lon=-80.248, az_fraction=60.0, max_dist=40.0,
                utc_offset=0.0, start_day=150, end_day=170)
    out = {
        (r.row, r.col): r.value
        for r in time_in_daylight(cells, grid, **args).collect()
    }

    from whitebox_tools_spark.operators.daylight import almanac_tables

    alm_rows, active, total = almanac_tables(
        43.545, -80.248, 0.0, 60.0, start_day=150, end_day=170
    )

    def horizon(rr, cc, offsets):
        cur_max_slope = -9999999.0
        cur_max_elev = -9999999.0
        for (x1, y1, x2, y2, w, dist) in offsets:
            r1, c1 = rr + y1, cc + x1
            r2, c2 = rr + y2, cc + x2
            in1 = 0 <= r1 < rows and 0 <= c1 < cols
            in2 = 0 <= r2 < rows and 0 <= c2 < cols
            if not in1 and not in2:
                break
            z1 = z[r1, c1] if in1 else z[r2, c2]
            z2 = z[r2, c2] if in2 else z[r1, c1]
            zi = z1 + w * (z2 - z1)
            if zi > cur_max_elev:
                cur_max_elev = zi
                slope = (zi - z[rr, cc]) / dist
                if slope > cur_max_slope:
                    cur_max_slope = slope
                    if slope > _EARLY_STOP:
                        break
        return 0.0 if cur_max_slope == -9999999.0 else math.degrees(math.atan(cur_max_slope))

    for rr, cc in [(0, 0), (5, 5), (11, 3), (2, 10)]:
        shadow = 0.0
        for b in active:
            offsets = ray_offsets(b * 60.0, res, res, 40.0)
            ha = horizon(rr, cc, offsets)
            shadow += sum(dur for bb, alt, dur in alm_rows if bb == b and alt < ha)
        exp = 1.0 - shadow / total
        assert abs(out[(rr, cc)] - exp) < 1e-9, (rr, cc)
