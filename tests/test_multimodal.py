"""Multimodal plumbing: schema, batching, deterministic stub decode."""

import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        ("d0", "media://img/1", "image", None, None, None, 3000),
        ("d1", "media://img/2", "image", None, None, None, 500),
        ("d2", "media://img/1", "image", None, None, None, 0),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, media_ref string, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )


def test_feature_extraction_deterministic(spark):
    m = _media(spark)
    a = {r.doc_id: r.features for r in extract_media_features(m).collect()}
    b = {r.doc_id: r.features for r in extract_media_features(m).collect()}
    assert a == b
    assert len(a["d0"]) == FEATURE_DIM
    # same media_ref -> same features regardless of doc
    assert a["d0"] == a["d2"]
    assert a["d0"] != a["d1"]


def test_real_decode_is_stubbed(spark):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        extract_media_features(_media(spark), fake=False).collect()


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media(spark), every_ms=1000).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.frame_ts_ms)
    assert sorted(per_doc["d0"]) == [0, 1000, 2000]
    assert per_doc["d1"] == [0]
