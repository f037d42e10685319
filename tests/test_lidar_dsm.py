"""LidarDigitalSurfaceModel / TophatTransform / LidarHillshade pins
against brute-force O(n^2) python oracles (independent of the binned
radius join and the shared SQL fragments)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec


def _cloud(spark, seed=3, n=120):
    rng = np.random.default_rng(seed)
    rows = [
        (i, float(rng.uniform(0, 100)), float(rng.uniform(0, 100)),
         float(rng.uniform(0, 5) + (30.0 if rng.random() < 0.15 else 0.0)))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "point_id long, x double, y double, z double")


def test_dsm_removal_rule_matches_bruteforce(spark):
    from whitebox_tools_spark.operators.lidar import _radius_pairs

    rows, df = _cloud(spark)
    radius, th = 12.0, math.tan(math.radians(60.0)) * 12.0
    pairs = _radius_pairs(df, radius, with_self=False)
    removed = set(
        r.point_id
        for r in pairs.filter(F.col("nz") - F.col("z") > th).select("point_id").distinct().collect()
    )
    want = set()
    for i, xi, yi, zi in rows:
        for j, xj, yj, zj in rows:
            if i != j and math.hypot(xi - xj, yi - yj) <= radius and zj - zi > th:
                want.add(i)
                break
    assert removed == want and want  # non-vacuous


def test_dsm_max_edge_leaves_void_nodata(spark):
    from whitebox_tools_spark.operators.tin import tin_gridding

    # two clusters separated by a 60-unit void: bridging triangles have
    # edges > 20 and must be skipped under max_edge
    pts = [(float(x), float(y), 1.0) for x in (0, 5, 10) for y in (0, 5, 10)]
    pts += [(float(x + 70), float(y), 2.0) for x in (0, 5, 10) for y in (0, 5, 10)]
    df = spark.createDataFrame(pts, "x double, y double, z double")
    g = GridSpec(west=0.0, north=10.0, res_x=2.0, res_y=2.0, rows=5, cols=40)
    full = {(r.row, r.col) for r in tin_gridding(df, g).collect()}
    cut = {(r.row, r.col) for r in tin_gridding(df, g, max_edge=20.0).collect()}
    # cluster hulls end at x=10 and start at x=70: any covered cell center
    # strictly between is interpolated by a bridging (long-edge) triangle
    gap = {(r, c) for (r, c) in full if 10 < c * 2.0 + 1.0 < 70}
    assert gap and gap.isdisjoint(cut)  # void cells dropped
    assert cut == full - gap  # everything else kept


def test_tophat_matches_bruteforce(spark):
    from whitebox_tools_spark.operators.lidar import tophat_transform

    rows, df = _cloud(spark, seed=9, n=80)
    radius = 15.0
    got = {r.point_id: r.z for r in tophat_transform(df, radius=radius).collect()}
    pts = {i: (x, y, z) for i, x, y, z in rows}
    nbrs = {
        i: [j for j in pts if math.hypot(pts[i][0] - pts[j][0], pts[i][1] - pts[j][1]) <= radius]
        for i in pts
    }
    ero = {i: min(pts[j][2] for j in nbrs[i]) for i in pts}
    for i in pts:
        want = pts[i][2] - max(ero[j] for j in nbrs[i])
        assert got[i] == pytest.approx(want, abs=1e-9), i


def test_hillshade_quantized_matches_bruteforce(spark):
    from whitebox_tools_spark.operators.lidar import lidar_hillshade

    rng = np.random.default_rng(17)
    # 3-decimal x/y and 5-decimal z so the quantization is exact
    rows = [
        (i, round(float(rng.uniform(0, 100)), 3), round(float(rng.uniform(0, 100)), 3),
         round(float(rng.uniform(0, 20)), 5))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    radius, az, alt = 15.0, 315.0, 30.0
    got = {r.point_id: r.hillshade
           for r in lidar_hillshade(df, radius=radius, azimuth=az, altitude=alt,
                                    quantize=(1e3, 1e3, 1e5)).collect()}
    azr = math.radians(az - 90.0)
    st, ct = math.sin(math.radians(alt)), math.cos(math.radians(alt))
    pts = {i: (x, y, z) for i, x, y, z in rows}
    for i, (x, y, z) in pts.items():
        nbs = [pts[j] for j in pts
               if (x - pts[j][0]) ** 2 + (y - pts[j][1]) ** 2 + (z - pts[j][2]) ** 2
               <= radius * radius]
        n = len(nbs)
        if n < 3:
            assert got[i] == 0
            continue
        dq = [(round(qx * 1e3) - round(x * 1e3), round(qy * 1e3) - round(y * 1e3),
               round(qz * 1e5) - round(z * 1e5)) for qx, qy, qz in nbs]
        sdx = sum(d[0] for d in dq); sdy = sum(d[1] for d in dq); sdz = sum(d[2] for d in dq)
        sdxx = sum(d[0] * d[0] for d in dq); sdxy = sum(d[0] * d[1] for d in dq)
        sdxz = sum(d[0] * d[2] for d in dq); sdyy = sum(d[1] * d[1] for d in dq)
        sdyz = sum(d[1] * d[2] for d in dq); sdzz = sum(d[2] * d[2] for d in dq)
        xx = sdxx / 1e6 - (sdx / 1e3) * (sdx / 1e3) / n
        xy = sdxy / 1e6 - (sdx / 1e3) * (sdy / 1e3) / n
        xz = sdxz / 1e8 - (sdx / 1e3) * (sdz / 1e5) / n
        yy = sdyy / 1e6 - (sdy / 1e3) * (sdy / 1e3) / n
        yz = sdyz / 1e8 - (sdy / 1e3) * (sdz / 1e5) / n
        zz = sdzz / 1e10 - (sdz / 1e5) * (sdz / 1e5) / n
        det_x, det_y, det_z = yy * zz - yz * yz, xx * zz - xz * xz, xx * yy - xy * xy
        if det_x >= det_y and det_x >= det_z:
            a, b, c = 1.0, (xz * yz - xy * zz) / det_x, (xy * yz - xz * yy) / det_x
        elif det_y >= det_z:
            a, b, c = (yz * xz - xy * zz) / det_y, 1.0, (xy * xz - yz * xx) / det_y
        else:
            a, b, c = (yz * xy - xz * yy) / det_z, (xz * xy - yz * xx) / det_z, 1.0
        if c == 0.0:
            want = 0
        else:
            fx, fy = -a / c, -b / c
            if fx == 0.0:
                want = 127
            else:
                ts = math.sqrt(fx * fx + fy * fy)
                aspect = math.radians(180.0 - math.degrees(math.atan(fy / fx))
                                      + 90.0 * (fx / abs(fx)))
                hs = (ts / math.sqrt(1.0 + ts * ts)) * (st / ts - ct * math.sin(azr - aspect))
                want = int(math.floor(min(max(hs * 255.0, 0.0), 65535.0)))
        assert got[i] == want, i


def test_ransac_planes_separates_plane_from_noise(spark):
    from whitebox_tools_spark.operators.lidar import lidar_ransac_planes

    rng = np.random.default_rng(3)
    rows = []
    pid = 0
    for _ in range(120):  # roof plane z = 10 + 0.02x + 0.01y (+tiny noise)
        x, y = rng.uniform(0, 50, 2)
        rows.append((pid, float(x), float(y),
                     float(10 + 0.02 * x + 0.01 * y + rng.normal(0, 0.01))))
        pid += 1
    veg_ids = []
    for _ in range(25):  # vegetation: random heights well off the plane
        x, y = rng.uniform(0, 50, 2)
        rows.append((pid, float(x), float(y), float(rng.uniform(13, 25))))
        veg_ids.append(pid)
        pid += 1
    df = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    out = lidar_ransac_planes(
        df, radius=30.0, num_iter=30, num_samples=5, threshold=0.1,
        model_size=20, max_slope=75.0, seed=4,
    )
    got = {r.point_id: r.is_planar for r in out.collect()}
    plane_flags = [got[i] for i in range(120)]
    assert sum(plane_flags) >= 110  # nearly all roof points planar
    assert sum(got[i] for i in veg_ids) <= 3  # vegetation rejected
    # determinism / partition invariance
    out2 = lidar_ransac_planes(
        df.repartition(7), radius=30.0, num_iter=30, num_samples=5,
        threshold=0.1, model_size=20, max_slope=75.0, seed=4,
    )
    got2 = {r.point_id: r.is_planar for r in out2.collect()}
    assert got == got2


def test_lidar_segmentation_splits_facets_and_volume(spark):
    from whitebox_tools_spark.operators.lidar import lidar_segmentation

    rng = np.random.default_rng(21)
    rows = []
    pid = 0
    for _ in range(80):  # facet A: z = 10 + 0.3x
        x, y = rng.uniform(0, 30, 2)
        rows.append((pid, float(x), float(y), float(10 + 0.3 * x))); pid += 1
    for _ in range(80):  # facet B: z = 19 - 0.3(x-60), x in [30, 60] meets A near 30
        x, y = rng.uniform(31, 60, 2)
        rows.append((pid, float(x), float(y), float(10 + 0.3 * 30 - 0.3 * (x - 30)))); pid += 1
    veg = []
    for _ in range(40):  # vegetation blob: random heights
        x, y = rng.uniform(80, 95, 2)
        rows.append((pid, float(x), float(y), float(rng.uniform(0, 30)))); veg.append(pid); pid += 1
    df = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    out = lidar_segmentation(
        df, radius=25.0, norm_diff=5.0, maxzdiff=100.0,
        num_iter=30, num_samples=4, threshold=0.05, model_size=15, seed=2,
    )
    got = {r.point_id: (r.segment_id, r.is_planar) for r in out.collect()}
    seg_a = {got[i][0] for i in range(80) if got[i][1]}
    seg_b = {got[i][0] for i in range(80, 160) if got[i][1]}
    # the two facets have ~33-degree normal difference -> distinct segments
    assert seg_a.isdisjoint(seg_b) and len(seg_a) >= 1 and len(seg_b) >= 1
    # vegetation is non-planar and in its own segment(s)
    assert all(not got[i][1] for i in veg)
    veg_segs = {got[i][0] for i in veg}
    assert veg_segs.isdisjoint(seg_a | seg_b)
    # partition invariance
    out2 = lidar_segmentation(
        df.repartition(9), radius=25.0, norm_diff=5.0, maxzdiff=100.0,
        num_iter=30, num_samples=4, threshold=0.05, model_size=15, seed=2,
    )
    got2 = {r.point_id: (r.segment_id, r.is_planar) for r in out2.collect()}
    assert got == got2


def test_segmentation_based_filter_ground_vs_buildings(spark):
    from whitebox_tools_spark.operators.lidar import segmentation_based_filter

    rng = np.random.default_rng(31)
    rows = []
    pid = 0
    ground_ids, bld_ids = [], []
    for _ in range(150):  # gently sloping ground
        x, y = rng.uniform(0, 100, 2)
        rows.append((pid, float(x), float(y), float(0.02 * x + 0.01 * y)))
        ground_ids.append(pid); pid += 1
    for _ in range(40):  # a building roof 8 m up, compact footprint
        x, y = rng.uniform(40, 55, 2)
        rows.append((pid, float(x), float(y), float(8.0 + 0.02 * x)))
        bld_ids.append(pid); pid += 1
    df = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    out = segmentation_based_filter(df, radius=25.0, norm_diff=10.0, maxzdiff=1.5)
    got = {r.point_id: r.is_ground for r in out.collect()}
    assert sum(got[i] for i in ground_ids) >= 140
    assert not any(got[i] for i in bld_ids)
    # partition invariance (normals from nid-sorted kernel)
    out2 = segmentation_based_filter(df.repartition(11), radius=25.0,
                                     norm_diff=10.0, maxzdiff=1.5)
    got2 = {r.point_id: r.is_ground for r in out2.collect()}
    assert got == got2
