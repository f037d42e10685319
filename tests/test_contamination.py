"""contamination_check vs a hand-rolled set-arithmetic oracle, and the
broadcast vs shuffle join paths must agree exactly."""

import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.dedup import contamination_check

K = 3


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="contamination", cores=4, shuffle_partitions=4)


TRAIN = [
    (1, "a b c d e f"),          # grams: abc bcd cde def
    (2, "x y z a b c"),          # one gram (abc) hits eval via doc 1's text? no — eval below
    (3, "p q"),                  # < k tokens: omitted
    (4, "m m m m"),              # repeated tokens -> 1 distinct gram (m m m)
    (5, "u v w u v w u v w"),    # periodic: distinct grams uvw vwu wuv
]
EVAL = [
    (100, "c d e f g h"),        # shares cde, def with doc 1
    (101, "m m m"),              # exactly doc 4's single gram
]


def _expect():
    def grams(t):
        tok = t.split(" ")
        return {" ".join(tok[i:i + K]) for i in range(len(tok) - K + 1)}

    eg = set()
    for _, t in EVAL:
        eg |= grams(t)
    out = {}
    for d, t in TRAIN:
        g = grams(t)
        if not g:
            continue
        hit = len(g & eg)
        out[d] = (len(g), hit, round(hit / len(g), 6) + 0.0)
    return out


def _run(spark, broadcast_eval):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string").repartition(3)
    ev = spark.createDataFrame(EVAL, "doc_id long, text string").repartition(2)
    got = contamination_check(tr, ev, k=K, broadcast_eval=broadcast_eval)
    return {
        int(r.doc_id): (int(r.n_grams), int(r.n_contaminated), float(r.contamination))
        for r in got.collect()
    }


def test_contamination_matches_oracle_both_join_paths(spark):
    expect = _expect()
    assert 3 not in expect          # sub-k doc omitted
    assert expect[1][1] == 2        # cde, def hit
    assert expect[4] == (1, 1, 1.0)  # fully contaminated single-gram doc
    assert expect[2][1] == 0
    assert _run(spark, True) == expect
    assert _run(spark, False) == expect
