"""unigram_logprob_quality: every score must equal an independent
pure-python recomputation (math.log + the same 9-dp scaled-integer
quantization), be partition-invariant (the quantized sum is exact long
arithmetic), and rank common-token docs above rare-token docs."""

import math
from collections import Counter

import pytest


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="unigram-lp", cores=4, shuffle_partitions=4)


def _py_scores(docs):
    toks = {d: t.split() for d, t in docs if t.strip()}
    vocab = Counter(w for ws in toks.values() for w in ws)
    total = sum(vocab.values())
    lpi = {
        w: int(round(round(math.log(n / total), 9) * 1e9))
        for w, n in vocab.items()
    }
    out = {}
    for d, ws in toks.items():
        if ws:
            s = sum(lpi[w] for w in ws)
            out[d] = (len(ws), round(s / 1e9 / len(ws), 6))
    return out


def _run(spark, docs, parts=1):
    from whitebox_tools_spark.operators.text import unigram_logprob_quality

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(parts)
    return {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob_quality(df).collect()
    }


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "xylophone quetzal obsidian"),  # all-rare: lowest score
    (3, "the the the the"),             # most-common token only: highest
    (4, ""),                            # no tokens: omitted
    (5, "the cat and the dog"),
]


def test_matches_python_oracle_and_ranking(spark):
    got = _run(spark, DOCS)
    exp = _py_scores(DOCS)
    assert set(got) == set(exp) and 4 not in got
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert got[d][1] == pytest.approx(exp[d][1], abs=1e-9), d
    assert got[3][1] > got[0][1] > got[2][1]


def test_partition_invariance_exact(spark):
    a = _run(spark, DOCS, parts=1)
    b = _run(spark, DOCS, parts=13)
    assert a == b  # exact equality: the quantized sum is long arithmetic
