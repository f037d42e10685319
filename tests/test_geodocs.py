"""Geodoc generator + span decode + the per-row span invariant."""

import numpy as np
from pyspark.sql import functions as F

from whitebox_tools_spark import datagen
from whitebox_tools_spark.ingest import (
    assert_span_invariant,
    decode_points,
    decode_polygons,
    span_signature,
)


def test_generator_deterministic(tmp_path):
    a = datagen.generate_chunk(100, 50, 42)
    b = datagen.generate_chunk(100, 50, 42)
    assert a.equals(b)
    # chunk-independence: same docs from different chunk boundaries
    c = datagen.generate_chunk(0, 150, 42).slice(100, 50)
    assert c.to_pydict() == a.to_pydict()


def test_offsets_strictly_increasing(geodocs_path, spark):
    docs = spark.read.parquet(geodocs_path)
    bad = docs.select(
        F.exists(
            F.zip_with(
                F.col("spans"),
                F.slice(F.col("spans"), 2, F.size("spans")),
                lambda a, b: b.offset <= a.offset,
            ),
            lambda v: v,
        ).alias("bad")
    ).filter(F.col("bad"))
    assert bad.count() == 0


def test_decode_points_roundtrip(geodocs_path, spark):
    docs = spark.read.parquet(geodocs_path)
    pts = decode_points(docs)
    n_geom = docs.select(F.explode("spans").alias("s")).filter(
        F.col("s.kind").isin("point", "point_z")
    ).count()
    assert pts.count() == n_geom
    row = pts.filter(F.col("point_id") == 7).collect()[0]
    x, y, _ = datagen.doc_points(np.array([7]), 42)
    assert abs(row.x - round(float(x[0]), 9)) < 1e-9
    assert abs(row.y - round(float(y[0]), 9)) < 1e-9


def test_decode_polygons(geodocs_path, spark):
    docs = spark.read.parquet(geodocs_path)
    parts = decode_polygons(docs).collect()
    assert len(parts) >= 1  # docs 999, 1999 carry polygons
    for r in parts:
        assert r.xs[0] == r.xs[-1] and r.ys[0] == r.ys[-1]


def test_span_invariant_passthrough(geodocs_path, spark):
    docs = spark.read.parquet(geodocs_path)
    # a realistic pipeline: decode + rejoin must not disturb spans
    out = docs.withColumn("extra", F.size("spans")).drop("extra")
    assert_span_invariant(docs, out)
    # violation detected: drop one doc
    try:
        assert_span_invariant(docs, docs.filter(F.col("doc_id") != "doc-000000000005"))
    except AssertionError:
        pass
    else:
        raise AssertionError("expected span invariant violation to raise")


def test_span_signature_orders_by_offset(spark):
    rows = [
        (
            "d1",
            [
                {"kind": "b", "text": "2", "media_ref": "", "offset": 1},
                {"kind": "a", "text": "1", "media_ref": "", "offset": 0},
            ],
        )
    ]
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    df = spark.createDataFrame(rows, schema)
    sig = span_signature(df).collect()[0].sig
    assert sig.startswith("a\x011")


def test_decode_attrs(geodocs_path, spark):
    from whitebox_tools_spark.ingest import decode_attrs

    docs = spark.read.parquet(geodocs_path)
    attrs = decode_attrs(docs).collect()
    assert len(attrs) == 2  # docs 999 and 1999 (polygon docs) carry attrs
    for r in attrs:
        assert r.name == "category" and r.type == "int"
        assert r.value_num == float(r.value_str)


def test_decode_raster_cells(geodocs_path, spark):
    from whitebox_tools_spark.ingest import decode_raster_cells

    docs = spark.read.parquet(geodocs_path)
    meta, cells = decode_raster_cells(docs)
    m = meta.collect()
    assert len(m) == 1  # doc 17
    assert m[0].west == 0.0 and m[0].rows == 200 and m[0].nodata == -32768.0
    c = cells.collect()
    assert len(c) == 4  # one 2x2 tile
    rows = {(r.row, r.col) for r in c}
    assert len(rows) == 4
