"""Stream ordering / metric tools (hack, topological, tributary, main
stem, farthest head, total length, link length/slope, pruning, distance
to outlet) — cross-tool invariants on a small fishbone valley whose D8
network has real confluences.

Reference semantics: stream_network_analysis/{hack_order, topological_
stream_order, tributary_id, find_main_stem, farthest_channel_head,
total_length_channels, stream_link_length, stream_link_slope,
remove_short_streams, dist_to_outlet}.rs (exact per-cell equality vs the
DuckDB oracles is covered by the driver harness; these tests pin the
structural invariants that tie the tools together).
"""

from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

G9 = GridSpec(west=0.0, north=45.0, res_x=5.0, res_y=5.0, rows=9, cols=9)
T = 3.0


def _dem(spark, vals):
    rows = [
        (r, c, float(vals[r][c]))
        for r in range(len(vals))
        for c in range(len(vals[0]))
        if vals[r][c] is not None
    ]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _valley(spark):
    # main channel along row 4 draining east; every column slopes into it
    vals = [[50 - 5 * c + 10 * abs(r - 4) for c in range(9)] for r in range(9)]
    return _dem(spark, vals)


def _vals(df):
    return {(r.row, r.col): r.value for r in df.collect()}


def test_order_tools_share_stream_set_and_bounds(spark):
    from whitebox_tools_spark.operators.streams import (
        hack_order, topological_stream_order, strahler_order)

    dem = _valley(spark)
    hack = _vals(hack_order(dem, G9, threshold=T))
    topo = _vals(topological_stream_order(dem, G9, threshold=T))
    strah = _vals(strahler_order(dem, G9, threshold=T))
    assert set(hack) == set(topo) == set(strah) and len(hack) > 5
    for cell in hack:
        assert hack[cell] >= 1
        # hack only increments on side-tributary steps, topological on all
        assert hack[cell] <= topo[cell]


def test_main_stem_is_hack_order_one(spark):
    from whitebox_tools_spark.operators.streams import find_main_stem, hack_order

    dem = _valley(spark)
    stem = _vals(find_main_stem(dem, G9, threshold=T))
    hack = _vals(hack_order(dem, G9, threshold=T))
    assert set(stem) == set(hack)
    assert any(v == 1.0 for v in stem.values())
    for cell, v in stem.items():
        if v == 1.0:
            assert hack[cell] == 1


def test_farthest_head_equals_longest_path_at_outlet(spark):
    from whitebox_tools_spark.operators.streams import (
        distance_to_outlet, farthest_channel_head)

    dem = _valley(spark)
    far = _vals(farthest_channel_head(dem, G9, threshold=T))
    dto = _vals(distance_to_outlet(dem, G9, threshold=T))
    outlets = [c for c, v in dto.items() if v == 0.0]
    assert len(outlets) == 1
    # the farthest head seen AT the outlet is the longest head->outlet path
    assert abs(far[outlets[0]] - max(dto.values())) < 1e-6
    assert min(far.values()) == 0.0  # channel heads are at distance 0


def test_total_length_at_outlet_is_network_length(spark):
    from whitebox_tools_spark.operators.streams import (
        _edge_lengths, _stream_set, distance_to_outlet, total_length_channels)

    dem = _valley(spark)
    tot = _vals(total_length_channels(dem, G9, threshold=T))
    dto = _vals(distance_to_outlet(dem, G9, threshold=T))
    outlet = [c for c, v in dto.items() if v == 0.0][0]
    _, edges = _stream_set(dem, G9, T)
    network_len = (
        _edge_lengths(edges, G9).agg(F.sum("len").alias("s")).collect()[0].s
    )
    assert abs(tot[outlet] - network_len) < 1e-6


def test_tributary_count_matches_channel_heads(spark):
    from whitebox_tools_spark.operators.streams import (
        _stream_set, tributary_id)

    dem = _valley(spark)
    trib = _vals(tributary_id(dem, G9, threshold=T))
    sc, edges = _stream_set(dem, G9, T)
    targets = edges.select(
        F.col("trow").alias("row"), F.col("tcol").alias("col")
    ).distinct()
    n_heads = sc.join(targets, ["row", "col"], "left_anti").count()
    assert len(set(trib.values())) == n_heads
    assert min(trib.values()) == 1.0 and max(trib.values()) == float(n_heads)


def test_remove_short_streams_extremes(spark):
    from whitebox_tools_spark.operators.streams import remove_short_streams

    dem = _valley(spark)
    keep_all = _vals(remove_short_streams(dem, G9, threshold=T, min_length=0.0))
    assert set(keep_all.values()) == {1.0}
    keep_none = _vals(remove_short_streams(dem, G9, threshold=T, min_length=1e9))
    assert set(keep_none.values()) == {0.0}


def test_link_length_and_slope_consistency(spark):
    from whitebox_tools_spark.operators.streams import (
        stream_link_length, stream_link_slope)

    dem = _valley(spark)
    ll = _vals(stream_link_length(dem, G9, threshold=T))
    sl = _vals(stream_link_slope(dem, G9, threshold=T))
    assert set(ll) == set(sl)
    for cell in ll:
        assert ll[cell] >= 0.0 and sl[cell] >= 0.0
    # single-cell links that still flow out have length >= one cell size
    assert max(ll.values()) >= G9.res_x
