"""ESRI Shapefile codec: .shp/.shx/.dbf round trips (public spec layout),
winding-based hole recovery, distributed read."""

import numpy as np
import pandas as pd

from whitebox_tools_spark.shapefile_io import (
    SHAPE_MULTIPOINT,
    SHAPE_POINT,
    SHAPE_POLYGON,
    SHAPE_POLYLINE,
    decode_dbf,
    decode_shp,
    encode_dbf,
    encode_shp,
    read_shapefile,
    read_shapefile_attrs,
    write_shapefile,
)


def test_polygon_orientation_and_holes():
    shell = ([0.0, 10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 8.0, 8.0, 0.0])  # CCW input
    hole = ([2.0, 4.0, 4.0, 2.0, 2.0], [2.0, 2.0, 4.0, 4.0, 2.0])
    feats = [
        [(shell[0], shell[1], False), (hole[0], hole[1], True)],
        [([20.0, 25.0, 22.0, 20.0], [0.0, 0.0, 5.0, 0.0], False)],
    ]
    shp, shx = encode_shp(feats, SHAPE_POLYGON)
    dec = decode_shp(shp)
    assert list(dec["is_hole"]) == [False, True, False]
    # winding normalized on write; vertex multiset preserved
    assert sorted(dec["xs"].iloc[0]) == sorted(shell[0])
    assert len(shx) == 100 + 8 * 2


def test_polyline_point_multipoint_round_trip():
    pl = [[([0.0, 1.0, 2.0], [0.0, 1.0, 0.0])],
          [([5.0, 6.0], [5.0, 7.0]), ([8.0, 9.0], [8.0, 9.0])]]
    d = decode_shp(encode_shp(pl, SHAPE_POLYLINE)[0])
    assert len(d) == 3 and d["xs"].iloc[2] == [8.0, 9.0]
    assert not d["is_hole"].any()

    d = decode_shp(encode_shp([(1.5, 2.5), (3.5, 4.5)], SHAPE_POINT)[0])
    assert d["xs"].iloc[1] == [3.5] and d["ys"].iloc[0] == [2.5]

    d = decode_shp(encode_shp([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], SHAPE_MULTIPOINT)[0])
    assert d["xs"].iloc[0] == [1.0, 2.0, 3.0]


def test_dbf_round_trip():
    t = pd.DataFrame(
        {
            "name": ["a", "bb", "ccc"],
            "score": [1.5, 2.25, 3.125],
            "n": [1, 22, 333],
            "ok": [True, False, True],
        }
    )
    back = decode_dbf(encode_dbf(t))
    assert list(back["name"]) == ["a", "bb", "ccc"]
    assert list(back["n"]) == [1, 22, 333]
    assert list(back["ok"]) == [True, False, True]
    assert np.allclose(back["score"], t["score"])


def test_distributed_read_with_attrs(spark, tmp_path):
    feats = [
        [(list(map(float, [0, 5, 5, 0, 0])), list(map(float, [0, 0, 5, 5, 0])), False)]
        for _ in range(4)
    ]
    attrs = pd.DataFrame({"name": [f"f{i}" for i in range(4)], "v": [1.0, 2.0, 3.0, 4.0]})
    write_shapefile(feats, str(tmp_path / "layer"), attrs=attrs)
    shapes = read_shapefile(spark, str(tmp_path / "layer.shp"), file_offset_ids=False)
    table = read_shapefile_attrs(spark, str(tmp_path / "layer.dbf"))
    out = shapes.join(table, "fid").orderBy("fid").collect()
    assert [r["name"] for r in out] == ["f0", "f1", "f2", "f3"]
    assert all(len(r["xs"]) == 5 for r in out)


def test_multi_file_dbf_read_is_distributed(spark, tmp_path):
    # two .dbf files of one layer schema read through the mapInPandas path:
    # all records surfaced, dBase types preserved; file_offset_ids=False
    # gives raw per-file 1-based fids, the default gives collision-free
    # sorted-stem ordinal offsets (part0 -> 0, part1 -> 1 << 40)
    for j in range(2):
        attrs = pd.DataFrame(
            {"name": [f"t{j}_{i}" for i in range(3)], "v": [float(j * 10 + i) for i in range(3)]}
        )
        with open(tmp_path / f"part{j}.dbf", "wb") as fh:
            fh.write(encode_dbf(attrs))
    table = read_shapefile_attrs(spark, str(tmp_path / "*.dbf"), file_offset_ids=False)
    rows = table.orderBy("name").collect()
    assert [r["name"] for r in rows] == ["t0_0", "t0_1", "t0_2", "t1_0", "t1_1", "t1_2"]
    assert sorted(r["fid"] for r in rows) == [1, 1, 2, 2, 3, 3]
    assert table.schema["v"].dataType.simpleString() == "double"

    offset = read_shapefile_attrs(spark, str(tmp_path / "*.dbf"))
    fids = sorted(r["fid"] for r in offset.collect())
    assert fids == [1, 2, 3, (1 << 40) + 1, (1 << 40) + 2, (1 << 40) + 3]


def test_multi_file_layer_join_lines_up_per_tile(spark, tmp_path):
    # a two-tile layer: shapes and attrs read with DEFAULT offsets join on
    # fid with every record matched to its own tile's attribute row (the
    # round-4 20-bit path-hash scheme could silently collide across tiles)
    for j in range(2):
        feats = [
            [(list(map(float, [j, j + 1, j + 1, j])), list(map(float, [0, 0, 1, 0])), False)]
            for _ in range(2)
        ]
        attrs = pd.DataFrame({"name": [f"tile{j}_f{i}" for i in range(2)]})
        write_shapefile(feats, str(tmp_path / f"tile{j}"), attrs=attrs)
    shapes = read_shapefile(spark, str(tmp_path / "*.shp"))
    table = read_shapefile_attrs(spark, str(tmp_path / "*.dbf"))
    out = shapes.join(table, "fid").orderBy("name").collect()
    assert [r["name"] for r in out] == [
        "tile0_f0", "tile0_f1", "tile1_f0", "tile1_f1"
    ]
    # tile1's geometry (x in [1, 2]) must carry tile1's names
    assert all(min(r["xs"]) >= 1.0 for r in out if r["name"].startswith("tile1"))
    assert all(min(r["xs"]) <= 1.0 for r in out if r["name"].startswith("tile0"))


def test_dbf_numeric_field_with_decimals_decodes_as_double(spark, tmp_path):
    # externally produced .dbf: 'N' field with decimal_count > 0 must parse
    # as float (not crash int()), and surface as Spark double
    import struct

    fields = [("id", b"N", 6, 0), ("score", b"N", 10, 3)]
    rec_len = 1 + sum(w for _, _, w, _ in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 126, 1, 1, 2, hdr_len, rec_len)
    for name, ftype, width, dec in fields:
        out += name.encode()[:10].ljust(11, b"\x00") + ftype + b"\x00" * 4
        out += bytes([width, dec]) + b"\x00" * 14
    out += b"\x0d"
    for i, s in [(1, "12.500"), (2, "-3.250")]:
        out += b" " + str(i).rjust(6).encode() + s.rjust(10).encode()
    out += b"\x1a"
    pdf = decode_dbf(bytes(out))
    assert list(pdf["id"]) == [1, 2]
    assert list(pdf["score"]) == [12.5, -3.25]
    with open(tmp_path / "ext.dbf", "wb") as fh:
        fh.write(bytes(out))
    table = read_shapefile_attrs(spark, str(tmp_path / "ext.dbf"))
    assert table.schema["score"].dataType.simpleString() == "double"
    assert table.schema["id"].dataType.simpleString() == "bigint"
    assert sorted(r["score"] for r in table.collect()) == [-3.25, 12.5]


def test_unclosed_ring_winding_sign():
    # rings not explicitly closed: the shoelace sum must include the
    # wrap-around edge or the winding sign (hence shell/hole role) is wrong
    from whitebox_tools_spark.shapefile_io import _signed_area2

    ccw_closed = ([0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 3.0, 3.0, 0.0])
    ccw_open = ([0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0])
    a_closed = _signed_area2(*ccw_closed)
    a_open = _signed_area2(*ccw_open)
    assert a_closed == a_open == 24.0  # 2 x area, positive = CCW
    assert _signed_area2(*ccw_open[::-1]) == -24.0
