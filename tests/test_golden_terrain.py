"""Golden-fixture independence tests for the shared-formula FOC/terrain
family.

The engine's slope/aspect/hillshade/curvature operators and their DuckDB
oracles run the SAME F.expr formula strings, so a transcription error
would pass both. These tests pin each operator against an INDEPENDENT
numpy re-implementation of the cited equations, transcribed directly from
the reference sources here (not from focal.py):

  - p, q:        terrain_analysis/slope.rs:311-317 (Florinsky 2016 p.117)
  - slope:       slope.rs:324-328 (atan(sqrt(p^2+q^2)))
  - aspect:      aspect.rs:287-293 (sign form)
  - hillshade:   hillshade.rs:355-380 (0.00017 floor, 32767 scale, round)
  - r, s, t:     plan_curvature.rs:335-344
  - plan:        plan_curvature.rs:360 ; profile: prof_curvature.rs:356 ;
    tangential:  tan_curvature.rs:367

A 16x16 deterministic pseudo-random DEM with an edge-clamped 5x5 gather
(missing neighbors fall back to the center z, the reference's nodata
rule) exercises interior AND border cells.
"""

import math

import numpy as np
import pytest

RES = 5.0
N = 16

OFFSETS = [
    (-2, -2), (-1, -2), (0, -2), (1, -2), (2, -2),
    (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
    (-2, 0), (-1, 0), (0, 0), (1, 0), (2, 0),
    (-2, 1), (-1, 1), (0, 1), (1, 1), (2, 1),
    (-2, 2), (-1, 2), (0, 2), (1, 2), (2, 2),
]


def _dem():
    rng = np.random.RandomState(99)
    return rng.rand(N, N) * 40.0 + np.fromfunction(
        lambda r, c: 0.8 * r * RES + 0.3 * c * RES, (N, N)
    )


def _z25(dem, row, col):
    z12 = dem[row, col]
    z = []
    for dx, dy in OFFSETS:
        r, c = row + dy, col + dx
        z.append(dem[r, c] if 0 <= r < N and 0 <= c < N else z12)
    return z


def _pq(z, res):
    p = 1.0 / (420.0 * res) * (
        44.0 * (z[3] + z[23] - z[1] - z[21])
        + 31.0 * (z[0] + z[20] - z[4] - z[24] + 2.0 * (z[8] + z[18] - z[6] - z[16]))
        + 17.0 * (z[14] - z[10] + 4.0 * (z[13] - z[11]))
        + 5.0 * (z[9] + z[19] - z[5] - z[15])
    )
    q = 1.0 / (420.0 * res) * (
        44.0 * (z[5] + z[9] - z[15] - z[19])
        + 31.0 * (z[20] + z[24] - z[0] - z[4] + 2.0 * (z[6] + z[8] - z[16] - z[18]))
        + 17.0 * (z[2] - z[22] + 4.0 * (z[7] - z[17]))
        + 5.0 * (z[1] + z[3] - z[21] - z[23])
    )
    return p, q


def _rst(z, res):
    r = 1.0 / (35.0 * res * res) * (
        2.0 * (z[0] + z[4] + z[5] + z[9] + z[10] + z[14] + z[15] + z[19] + z[20] + z[24])
        - 2.0 * (z[2] + z[7] + z[12] + z[17] + z[22])
        - z[1] - z[3] - z[6] - z[8] - z[11] - z[13] - z[16] - z[18] - z[21] - z[23]
    )
    t = 1.0 / (35.0 * res * res) * (
        2.0 * (z[0] + z[1] + z[2] + z[3] + z[4] + z[20] + z[21] + z[22] + z[23] + z[24])
        - 2.0 * (z[10] + z[11] + z[12] + z[13] + z[14])
        - z[5] - z[6] - z[7] - z[8] - z[9] - z[15] - z[16] - z[17] - z[18] - z[19]
    )
    s = 1.0 / (100.0 * res * res) * (
        z[8] + z[16] - z[6] - z[18]
        + 4.0 * (z[4] + z[20] - z[0] - z[24])
        + 2.0 * (z[3] + z[9] + z[15] + z[21] - z[1] - z[5] - z[19] - z[23])
    )
    return r, s, t


def _golden(dem):
    out = {}
    for row in range(N):
        for col in range(N):
            z = _z25(dem, row, col)
            p, q = _pq(z, RES)
            r, s, t = _rst(z, RES)
            slope = math.degrees(math.atan(math.sqrt(p * p + q * q)))
            if p != 0.0:
                sign_p = math.copysign(1.0, p) if p != 0 else 0.0
                sign_q = math.copysign(1.0, q) if q != 0 else 0.0
                aspect = (
                    -90.0 * (1.0 - sign_q) * (1.0 - abs(sign_p))
                    + 180.0 * (1.0 + sign_p)
                    - 180.0 / math.pi * sign_p * math.acos(-q / math.sqrt(p * p + q * q))
                )
            else:
                aspect = -1.0
            # hillshade, azimuth 315 altitude 30
            az = math.radians(315.0 - 90.0)
            alt = math.radians(30.0)
            tan_slope = max(math.sqrt(p * p + q * q), 0.00017)
            asp_hs = (
                math.pi - math.atan(q / p) + (math.pi / 2.0) * (p / abs(p))
                if p != 0.0
                else math.pi
            )
            term1 = tan_slope / math.sqrt(1.0 + tan_slope * tan_slope)
            term2 = math.sin(alt) / tan_slope
            term3 = math.cos(alt) * math.sin(az - asp_hs)
            hs = max(term1 * (term2 - term3) * 32767.0, 0.0)
            hs = round(hs)
            pq2 = p * p + q * q
            if abs(p + q) > 0.0:
                plan = -(q * q * r - 2.0 * p * q * s + p * p * t) / math.sqrt(pq2**3)
                prof = -(p * p * r + 2.0 * p * q * s + q * q * t) / (
                    pq2 * math.sqrt((1.0 + pq2) ** 3)
                )
                tanc = -(q * q * r - 2.0 * p * q * s + p * p * t) / (
                    pq2 * math.sqrt(1.0 + pq2)
                )
            else:
                plan = prof = tanc = 0.0
            out[(row, col)] = dict(
                slope=slope, aspect=aspect, hillshade=hs,
                plan=plan, profile=prof, tangential=tanc,
            )
    return out


@pytest.fixture(scope="module")
def fixture(spark):
    dem = _dem()
    recs = [
        (r, c, float(dem[r, c])) for r in range(N) for c in range(N)
    ]
    cells = spark.createDataFrame(recs, "row long, col long, value double")
    return cells.localCheckpoint(), _golden(dem)


def _collect(df):
    return {(r.row, r.col): r.value for r in df.collect()}


def test_slope_golden(fixture):
    from whitebox_tools_spark.operators.focal import slope

    cells, golden = fixture
    got = _collect(slope(cells, res=RES))
    for k, g in golden.items():
        assert got[k] == pytest.approx(g["slope"], abs=1e-9), k


def test_aspect_golden(fixture):
    from whitebox_tools_spark.operators.focal import aspect

    cells, golden = fixture
    got = _collect(aspect(cells, res=RES))
    for k, g in golden.items():
        assert got[k] == pytest.approx(g["aspect"], abs=1e-9), k


def test_hillshade_golden(fixture):
    from whitebox_tools_spark.operators.focal import hillshade

    cells, golden = fixture
    got = _collect(hillshade(cells, res=RES))
    for k, g in golden.items():
        assert got[k] == pytest.approx(g["hillshade"], abs=0.5), k


@pytest.mark.parametrize("which,key", [
    ("plan", "plan"), ("profile", "profile"), ("tangential", "tangential"),
])
def test_curvature_golden(fixture, which, key):
    from whitebox_tools_spark.operators.focal import curvature

    cells, golden = fixture
    got = _collect(curvature(cells, which, res=RES))
    for k, g in golden.items():
        assert got[k] == pytest.approx(g[key], abs=1e-9), k


def test_rtp_golden_integer_exact(fixture):
    """RelativeTopographicPosition vs an independent numpy oracle that
    mirrors the reference semantics (relative_topographic_position.rs:
    390-415: (z-mean)/(mean-min) below the mean, (z-mean)/(max-mean)
    above, 0 flat) computed in exact scaled-integer arithmetic.  The
    engine output must be BIT-IDENTICAL (== not approx): every value is
    q/1e6 for an integer q, so any engine/partitioning float drift is a
    hard failure."""
    from whitebox_tools_spark.operators.terrain import (
        relative_topographic_position,
    )

    cells, _ = fixture
    got = _collect(relative_topographic_position(cells, filterx=5, filtery=5))
    dem = _dem()
    zi = np.rint(dem * 1e6).astype(np.int64)
    for row in range(N):
        for col in range(N):
            mem = [
                zi[row + dy, col + dx]
                for dx, dy in OFFSETS
                if 0 <= row + dy < N and 0 <= col + dx < N
            ]
            s = int(sum(int(v) for v in mem))
            n = len(mem)
            z = int(zi[row, col])
            num = z * n - s
            if num < 0:
                den = s - int(min(mem)) * n
                q = (2 * 1000000 * (-num) + den) // (2 * den)
                want = -q / 1e6
            else:
                den = int(max(mem)) * n - s
                if den > 0:
                    q = (2 * 1000000 * num + den) // (2 * den)
                    want = q / 1e6
                else:
                    want = 0.0
            assert got[(row, col)] == want, (row, col)


def test_feature_preserving_smoothing_denoises_but_keeps_breaks(spark):
    """FPS on a noisy tilted plane with a cliff: noise RMS drops sharply,
    while the cliff magnitude survives (the defining property vs a mean
    filter)."""
    import numpy as np
    from pyspark.sql import functions as F

    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.operators.fps import feature_preserving_smoothing

    rng = np.random.default_rng(4)
    n = 24
    plane = 0.2 * np.arange(n)[None, :] + 0.1 * np.arange(n)[:, None]
    plane[:, n // 2:] += 50.0  # sharp break
    noisy = plane + rng.normal(0, 0.05, (n, n))
    df = spark.createDataFrame(
        [(r, c, float(noisy[r, c])) for r in range(n) for c in range(n)],
        "row long, col long, value double",
    )
    g = GridSpec(west=0.0, north=n * 1.0, res_x=1.0, res_y=1.0, rows=n, cols=n)
    out = {(r.row, r.col): r.value
           for r in feature_preserving_smoothing(
               df, g, filter_size=7, norm_diff=20.0, num_iter=3).collect()}
    assert len(out) == n * n
    sm = np.array([[out[(r, c)] for c in range(n)] for r in range(n)])
    core = (slice(3, n - 3), slice(3, n // 2 - 2))  # flat side, away from edges
    rms_before = float(np.sqrt(np.mean((noisy - plane)[core] ** 2)))
    rms_after = float(np.sqrt(np.mean((sm - plane)[core] ** 2)))
    assert rms_after < 0.5 * rms_before
    # the cliff is preserved within a 2-column span (the two face columns
    # meet mid-cliff; a 7x7 mean filter would smear it across 7 columns)
    jump = sm[:, n // 2 + 1] - sm[:, n // 2 - 2]
    assert float(np.median(jump)) > 45.0
    smear = sm[:, n // 2 + 3] - sm[:, n // 2 - 4]  # beyond the face columns
    assert float(np.median(np.abs(smear - 50.0))) < 2.0
