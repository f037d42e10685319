"""LidarRooftopAnalysis — facet separation + determinism."""


def test_rooftop_facets_separate_and_deterministic(spark):
    import __spark_entry__ as E
    from whitebox_tools_spark.operators.lidar import lidar_rooftop_analysis

    cloud = E._rooftop_cloud(spark)
    args = dict(radius=60.0, norm_diff=5.0, maxzdiff=150.0,
                num_iter=20, num_samples=5, threshold=0.5, model_size=5, seed=3)
    out = lidar_rooftop_analysis(cloud, E.PARTS, E.IDX, **args).collect()
    assert len(out) > 0
    # the two roof planes are 200 apart (> maxzdiff): no segment may span
    # both (z range within a segment stays < 200)
    for r in out:
        assert r.z_max - r.z_min < 200.0, r
    # both elevation bands appear across facets
    assert min(r.z_min for r in out) < 200.0 < max(r.z_max for r in out)

    out2 = lidar_rooftop_analysis(cloud.repartition(7), E.PARTS, E.IDX, **args).collect()
    key = lambda r: (r.building_id, r.segment_id, r.n_points, r.z_min, r.z_max)  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))
