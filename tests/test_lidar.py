"""Point-cloud operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import CellIndex, GridSpec
from whitebox_tools_spark.operators import lidar as L

GRID = GridSpec(west=0.0, north=100.0, res_x=25.0, res_y=25.0, rows=4, cols=4)
IDX = CellIndex(0.0, 0.0, 100.0, 3)


def _cloud(spark):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(200):
        x, y = rng.uniform(0, 100, 2)
        ground_z = 10.0 + 0.05 * x
        cls = 2 if i % 3 == 0 else 1
        z = ground_z if cls == 2 else ground_z + rng.uniform(1, 20)
        rows.append((i, float(x), float(y), float(z), int(cls)))
    return spark.createDataFrame(
        rows, "point_id long, x double, y double, z double, classification int"
    )


def test_shift_slice_filter(spark):
    pts = _cloud(spark)
    shifted = L.lidar_shift(pts, dx=5.0, dz=-1.0)
    a = pts.agg(F.sum("x"), F.sum("z")).collect()[0]
    b = shifted.agg(F.sum("x"), F.sum("z")).collect()[0]
    assert abs((b[0] - a[0]) - 5.0 * 200) < 1e-6
    assert abs((b[1] - a[1]) + 1.0 * 200) < 1e-6
    ground = L.filter_classes(pts, [2])
    assert ground.count() == 67
    sl = L.elevation_slice(pts, minz=0.0, maxz=12.0)
    assert 0 < sl.count() < 200


def test_point_stats_and_thin(spark):
    pts = _cloud(spark)
    stats = L.point_stats(pts, GRID)
    total = stats.agg(F.sum("n_points")).collect()[0][0]
    assert total == 200
    thin = L.lidar_thin(pts, GRID, method="lowest")
    assert thin.count() == stats.count()  # one per occupied cell
    # each kept point is the min z of its cell
    j = thin.join(stats, ["row", "col"])
    assert j.filter(F.col("z") != F.col("min_z")).count() == 0


def test_normalize_height(spark):
    pts = _cloud(spark)
    out = L.normalize_height(pts, IDX, GRID, ground_class=2, min_points=3)
    h = out.filter(F.col("classification") == 2).agg(F.avg(F.abs(F.col("height")))).collect()[0][0]
    # ground points sit near the interpolated ground surface
    assert h is not None and h < 2.0
    nonground = out.filter((F.col("classification") == 1)).agg(F.avg("height")).collect()[0][0]
    assert nonground > 2.0


def test_ground_point_filter_spike(spark):
    from whitebox_tools_spark.operators.lidar import ground_point_filter

    # flat 10m-grid plane with one 50m spike: only the spike is off-terrain
    rows = [(r * 10 + c, float(c * 10), float(r * 10), 1.0)
            for r in range(10) for c in range(10)]
    rows[55] = (rows[55][0], rows[55][1], rows[55][2], 50.0)
    pts = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    out = {r.point_id: r.is_off_terrain
           for r in ground_point_filter(pts, radius=15.0, slope_threshold=20.0,
                                        min_neighbours=3).collect()}
    assert out[rows[55][0]] is True
    assert sum(1 for v in out.values() if v) == 1


def test_ground_point_filter_knn_fallback(spark):
    from whitebox_tools_spark.operators.lidar import ground_point_filter

    # isolated high point with no radius neighbors: kNN fallback must still
    # compare against the distant flat cluster and flag it
    rows = [(i, float(i), 0.0, 1.0) for i in range(5)]
    rows.append((99, 500.0, 500.0, 400.0))
    pts = spark.createDataFrame(rows, "point_id long, x double, y double, z double")
    out = {r.point_id: r.is_off_terrain
           for r in ground_point_filter(pts, radius=10.0, slope_threshold=20.0,
                                        min_neighbours=3).collect()}
    assert out[99] is True
    assert out[0] is False


def test_las_roundtrip(spark, tmp_path):
    """LAS 1.2 format-0 write -> distributed binaryFile read round trip."""
    import numpy as np
    import pandas as pd

    from whitebox_tools_spark.lidar_io import decode_las, encode_las, read_las

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "x": rng.rand(500) * 1000.0,
            "y": rng.rand(500) * 1000.0,
            "z": rng.rand(500) * 80.0,
            "intensity": rng.randint(0, 255, 500),
            "return_number": rng.randint(1, 4, 500),
            "number_of_returns": rng.randint(1, 4, 500),
            "classification": rng.randint(0, 6, 500),
        }
    )
    # two tile files to exercise the distributed read path
    for i, part in enumerate((pdf.iloc[:250], pdf.iloc[250:])):
        with open(tmp_path / f"tile{i}.las", "wb") as fh:
            fh.write(encode_las(part.reset_index(drop=True)))
    # direct decode equality
    back = decode_las(encode_las(pdf))
    assert len(back) == 500
    assert np.allclose(back["x"], pdf["x"], atol=0.001)
    assert np.allclose(back["z"], pdf["z"], atol=0.001)
    assert (back["classification"].to_numpy() == pdf["classification"].to_numpy()).all()
    assert (back["return_number"].to_numpy() == pdf["return_number"].to_numpy()).all()
    # spark read
    df = read_las(spark, str(tmp_path) + "/*.las")
    assert df.count() == 500
    got = df.toPandas().sort_values(["x", "y"]).reset_index(drop=True)
    want = pdf.sort_values(["x", "y"]).reset_index(drop=True)
    assert np.allclose(got["x"], want["x"], atol=0.001)
    assert np.allclose(got["z"], want["z"], atol=0.001)
    assert (
        got["classification"].to_numpy() == want["classification"].to_numpy()
    ).all()


def test_height_above_ground(spark):
    """HAG vs brute-force nearest ground point."""
    import numpy as np

    from whitebox_tools_spark.grid import CellIndex
    from whitebox_tools_spark.operators.lidar import height_above_ground

    rng = np.random.RandomState(5)
    recs = []
    for i in range(300):
        recs.append(
            (i, float(rng.rand() * 1000), float(rng.rand() * 1000),
             float(rng.rand() * 50 + 10), 2 if i % 3 == 0 else 1)
        )
    cloud = spark.createDataFrame(
        recs, "point_id long, x double, y double, z double, classification int"
    )
    idx = CellIndex(0.0, 0.0, 1000.0, 5)
    out = {r.point_id: r.z for r in height_above_ground(cloud, idx).collect()}
    ground = [(x, y, z) for i, x, y, z, c in recs if c == 2]
    for i, x, y, z, c in recs:
        d2 = [(gx - x) ** 2 + (gy - y) ** 2 for gx, gy, _gz in ground]
        gz = ground[int(np.argmin(d2))][2]
        assert out[i] == pytest.approx(z - gz, abs=1e-9), i


def test_las_ascii_roundtrip(spark, tmp_path):
    from whitebox_tools_spark.lidar_io import (
        ascii_to_las,
        las_to_ascii,
        read_las,
        write_las,
    )

    pts = spark.createDataFrame(
        [(i, 10.0 + i, 20.0 + 2 * i, 5.0 + 0.125 * i, 2 if i % 3 == 0 else 1)
         for i in range(25)],
        "point_id long, x double, y double, z double, classification int",
    )
    las1 = str(tmp_path / "a.las")
    write_las(pts, las1)
    asc = str(tmp_path / "a.csv")
    las_to_ascii(spark, las1, asc)
    las2 = str(tmp_path / "b.las")
    ascii_to_las(spark, asc, las2)
    a = sorted((round(r.x, 3), round(r.y, 3), round(r.z, 3), r.classification)
               for r in read_las(spark, las1).collect())
    b = sorted((round(r.x, 3), round(r.y, 3), round(r.z, 3), r.classification)
               for r in read_las(spark, las2).collect())
    assert a == b and len(a) == 25


def test_las_point_formats_round_trip():
    """LAS 1.2 formats 0-3: GPS time (f64, formats 1/3) and RGB (u16x3,
    formats 2/3) survive encode->decode bit-exactly."""
    import numpy as np
    import pandas as pd

    from whitebox_tools_spark.lidar_io import decode_las, encode_las

    n = 100
    base = pd.DataFrame(
        {
            "x": np.round(np.arange(n) * 1.5, 3),
            "y": np.round(np.arange(n) * 0.25 + 7, 3),
            "z": np.round(np.sin(np.arange(n)) * 3, 3),
            "intensity": np.arange(n) % 1200,
            "return_number": np.arange(n) % 3 + 1,
            "number_of_returns": np.full(n, 3),
            "classification": np.arange(n) % 5,
        }
    )
    d0 = decode_las(encode_las(base))
    assert np.allclose(d0.x, base.x) and (d0.gps_time == 0).all() and (d0.red == 0).all()

    p1 = base.assign(gps_time=np.arange(n) * 0.123 + 400000.5)
    d1 = decode_las(encode_las(p1))
    assert np.array_equal(d1.gps_time, p1.gps_time)

    p2 = base.assign(
        red=np.arange(n) % 65535,
        green=(np.arange(n) * 7) % 65535,
        blue=(np.arange(n) * 13) % 65535,
    )
    d2 = decode_las(encode_las(p2))
    assert np.array_equal(d2.red, p2.red) and np.array_equal(d2.blue, p2.blue)

    p3 = p1.assign(red=p2.red, green=p2.green, blue=p2.blue)
    d3 = decode_las(encode_las(p3))
    assert np.array_equal(d3.gps_time, p3.gps_time)
    assert np.array_equal(d3.green, p3.green)
    assert np.array_equal(d3.intensity, base.intensity)
    assert np.array_equal(d3.classification, base.classification)
