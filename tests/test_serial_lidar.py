"""The lidar RANSAC-family serial transcriptions (serial_lidar.py) agree
with the distributed engine on the fixed query fixtures — the contract the
literal VALUES oracles in oracle_sql() rely on. The full value comparison
runs in the oracle harness (scripts/check_oracle.py); this pins the
engine-vs-serial equivalence directly plus the structural facts the
fixtures were designed around (separations, margins)."""

import pytest

from whitebox_tools_spark import serial_lidar as sl


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    s = get_spark(app_name="serial-lidar", cores=4, shuffle_partitions=4)
    yield s


def test_ransac_serial_matches_engine(spark):
    from whitebox_tools_spark.queries import q_lidar_ransac_planes

    eng = {
        r.point_id: r.is_planar
        for r in q_lidar_ransac_planes(spark, "").collect()
    }
    ser = sl.ransac_planes_serial(
        sl.ransac_cloud(), radius=400.0, num_iter=20, num_samples=5,
        threshold=0.5, model_size=20, seed=3,
    )
    assert eng == ser
    # the fixture's design intent: every plane point planar, outliers not
    assert all(ser[p] for p in range(1, 151))
    assert not any(ser[p] for p in range(1001, 1031))


def test_segmentation_serial_matches_engine(spark):
    from whitebox_tools_spark.queries import q_lidar_segmentation

    eng = {
        r.point_id: (r.segment_id, r.is_planar)
        for r in q_lidar_segmentation(spark, "").collect()
    }
    ser = sl.segmentation_serial(
        sl.seg_cloud(), radius=400.0, norm_diff=5.0, maxzdiff=150.0,
        num_iter=20, num_samples=5, threshold=0.5, model_size=20, seed=3,
    )
    assert eng == ser
    # planar points never share a segment with volume points
    planar_segs = {lab for lab, pl in ser.values() if pl}
    volume_segs = {lab for lab, pl in ser.values() if not pl}
    assert not planar_segs & volume_segs


def test_sbf_serial_matches_engine(spark):
    from whitebox_tools_spark.queries import q_lidar_segmentation_based_filter

    eng = {
        r.point_id: r.is_ground
        for r in q_lidar_segmentation_based_filter(spark, "").collect()
    }
    ser = sl.sbf_serial(
        sl.sbf_cloud(), radius=250.0, norm_diff=10.0, maxzdiff=20.0
    )
    assert eng == ser
    # ground plane recovered, elevated roof block rejected
    assert all(ser[p] for p in range(1, 151))
    assert not any(ser[p] for p in range(3001, 3041))


def test_rooftop_oracle_builder_structural():
    """The hybrid rooftop oracle builds (PIP via DuckDB + serial
    segmentation + exact aggregates) and no facet spans both roof planes
    (dz = 200 > maxzdiff = 150)."""
    import duckdb

    from whitebox_tools_spark.queries import _lidar_rooftop_sql

    rows = duckdb.sql(_lidar_rooftop_sql()).fetchall()
    assert rows, "rooftop oracle is empty"
    for b, s, n, zmin, zmax, cx, cy in rows:
        assert n >= 1
        assert zmax - zmin < 150.0, "a facet spans both roof planes"
