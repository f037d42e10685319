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


def test_real_decode_rejects_compressed_formats(spark):
    # JPEG magic: no codec libraries in this environment -> honest raise
    rows = [("d0", "media://img/1", "image", bytearray(b"\xff\xd8\xff\xe0 fakejpeg"))]
    m = spark.createDataFrame(
        rows, "doc_id string, media_ref string, media_type string, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|not netpbm/WAVE"):
        extract_media_features(m, fake=False).collect()


def test_netpbm_round_trip():
    import numpy as np

    from whitebox_tools_spark.operators.multimodal import decode_netpbm, encode_netpbm

    g = ((np.arange(7)[:, None] * 13 + np.arange(9)[None, :]) % 251).astype(np.uint8)
    assert (decode_netpbm(encode_netpbm(g)) == g).all()
    rgb = (
        (np.arange(5)[:, None, None] + np.arange(6)[None, :, None] * 3
         + np.arange(3)[None, None, :] * 7) % 255
    ).astype(np.uint8)
    assert (decode_netpbm(encode_netpbm(rgb)) == rgb).all()
    # header comments + arbitrary whitespace are tolerated
    with_comment = b"P5\n# a comment\n9 7\n255\n" + g.tobytes()
    assert (decode_netpbm(with_comment) == g).all()


def test_wav_round_trip():
    import numpy as np

    from whitebox_tools_spark.operators.multimodal import decode_wav, encode_wav

    s = (np.round(2500 * np.sin(np.arange(80) * 0.2))).astype(np.int16)
    st = np.stack([s, -s], axis=1)
    arr, rate = decode_wav(encode_wav(st, 16000))
    assert rate == 16000
    assert (arr == st).all()


def test_real_features_distributed_match_local(spark):
    import __spark_entry__ as E
    from whitebox_tools_spark.operators.multimodal import media_feature_vector

    out = {
        r.doc_id: list(r.features)
        for r in extract_media_features(E._media_df(spark), fake=False).collect()
    }
    from whitebox_tools_spark.operators.multimodal import encode_netpbm, encode_wav

    for doc_id, ref, kind, arr, rate in E._media_arrays():
        payload = encode_wav(arr, rate) if kind == "audio" else encode_netpbm(arr)
        assert out[doc_id] == media_feature_vector(payload), doc_id


def test_resize_nn_matches_numpy_sampling(spark):
    import numpy as np

    import __spark_entry__ as E
    from whitebox_tools_spark.operators.multimodal import (
        decode_netpbm,
        resize_image_nn,
    )

    imgs = E._media_df(spark).filter("media_type = 'image'")
    got = {
        r.doc_id: decode_netpbm(bytes(r.payload))
        for r in resize_image_nn(imgs, out_w=7, out_h=6).collect()
    }
    for doc_id, ref, kind, arr, rate in E._media_arrays():
        if kind != "image":
            continue
        h, w = arr.shape[:2]
        ri = (np.arange(6) * h) // 6
        ci = (np.arange(7) * w) // 7
        assert (got[doc_id] == arr[np.ix_(ri, ci)]).all(), doc_id


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media(spark), every_ms=1000).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.frame_ts_ms)
    assert sorted(per_doc["d0"]) == [0, 1000, 2000]
    assert per_doc["d1"] == [0]


def test_media_exact_dedup_by_payload_digest(spark):
    import numpy as np

    from whitebox_tools_spark.operators.multimodal import (
        encode_netpbm, encode_wav, media_exact_dedup,
    )

    img = (np.arange(64, dtype=np.float64).reshape(8, 8) * 3) % 251
    img2 = (img + 1) % 251
    wav = (np.sin(np.arange(800) * 0.05) * 10000).astype(np.int16).reshape(-1, 1)
    rows = [
        ("d0", "m/a", bytes(encode_netpbm(img))),
        ("d1", "m/b", bytes(encode_netpbm(img))),   # byte-identical copy
        ("d2", "m/c", bytes(encode_netpbm(img2))),  # one pixel off
        ("d3", "m/d", bytes(encode_wav(wav, 16000))),
        ("d4", "m/e", bytes(encode_wav(wav, 16000))),  # copy
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_ref string, payload binary")
    out = {r.media_ref: r.asDict() for r in media_exact_dedup(df).collect()}
    assert out["m/a"]["is_dup"] == 0 and out["m/b"]["is_dup"] == 1
    assert out["m/b"]["canonical_ref"] == "m/a"
    assert out["m/c"]["is_dup"] == 0  # different bytes, not a dup
    assert out["m/d"]["is_dup"] == 0 and out["m/e"]["is_dup"] == 1
    assert out["m/e"]["canonical_ref"] == "m/d"
    assert out["m/a"]["digest"] == out["m/b"]["digest"] != out["m/c"]["digest"]


def test_media_near_dup_catches_jittered_copies(spark):
    import numpy as np

    from whitebox_tools_spark.operators.multimodal import (
        encode_netpbm, media_near_dup_pairs,
    )

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, size=(16, 16)).astype(np.float64)
    jitter = base.copy()
    jitter[0, 0] = (jitter[0, 0] + 1) % 255  # one-pixel change: not byte-equal
    far = rng.randint(0, 255, size=(16, 16)).astype(np.float64)
    rows = [
        ("d0", "m/base", bytes(encode_netpbm(base))),
        ("d1", "m/jit", bytes(encode_netpbm(jitter))),
        ("d2", "m/far", bytes(encode_netpbm(far))),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_ref string, payload binary")
    pairs = {
        tuple(sorted((r.id_a, r.id_b))): r.cosine
        for r in media_near_dup_pairs(df, threshold=0.999).collect()
    }
    assert ("m/base", "m/jit") in pairs  # perceptual dup survives the jitter
    assert all("m/far" not in p for p in pairs)  # unrelated image excluded
