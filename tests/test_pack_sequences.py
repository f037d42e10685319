"""pack_sequences: the bucketed parallel-prefix plan must reproduce the
naive single global running sum exactly (pure-python oracle over the same
portable hash order), at any bucket_bits and partitioning; the tape must
be gapless (every token covered exactly once) and zero-token docs must
sit outside it (seq_first = seq_last = -1)."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="pack-seq", cores=4, shuffle_partitions=4)


def _h60(doc_id, seed=7):
    return int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)


def _mkdocs(n=200):
    return [
        (i, " ".join(["tok"] * ((i * 7919) % 17)))  # includes zero-token docs
        for i in range(n)
    ]


def _naive(docs, L):
    order = sorted(docs, key=lambda r: (_h60(r[0]), r[0]))
    out, cum = {}, 0
    for did, text in order:
        nt = len(text.split()) if text.strip() else 0
        if nt > 0:
            out[did] = (nt, cum, cum // L, (cum + nt - 1) // L)
        else:
            out[did] = (0, cum, -1, -1)
        cum += nt
    return out


def _run(spark, docs, L, parts=4, **kw):
    from whitebox_tools_spark.operators.dedup import pack_sequences

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(parts)
    return {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(df, L, **kw).collect()
    }


def test_matches_naive_global_cumsum(spark):
    docs = _mkdocs()
    exp = _naive(docs, 64)
    for bits in (1, 5, 12):
        assert _run(spark, docs, 64, bucket_bits=bits) == exp, bits


def test_partition_invariance_and_gapless_tape(spark):
    docs = _mkdocs(150)
    a = _run(spark, docs, 32, parts=1)
    b = _run(spark, docs, 32, parts=16)
    assert a == b
    # gapless: offsets of token-bearing docs tile [0, total) exactly
    spans = sorted((v[1], v[1] + v[0]) for v in a.values() if v[0] > 0)
    pos = 0
    for s, e in spans:
        assert s == pos
        pos = e
    assert pos == sum(v[0] for v in a.values())
    # zero-token docs sit outside the tape
    assert all(v[2] == v[3] == -1 for v in a.values() if v[0] == 0)
