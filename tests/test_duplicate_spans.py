"""duplicate_text_spans vs a brute-force maximal-common-run oracle.

The brute force enumerates, for every doc pair and every diagonal, the
maximal runs of identical tokens (no grams involved — a completely
different construction than the engine's k-gram island merge), then keeps
runs >= min_len. Also pins: (a) the triangle-chunk cap does not change the
output (cap=2 forces multi-chunk hot grams on the templated corpus),
(b) k is the detection floor (a shared run of k-1 tokens is invisible),
(c) within-doc repeats are excluded while a doc pair sharing a span at two
different offsets reports both diagonals."""

import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.operators.dedup import duplicate_text_spans

K, MIN_LEN = 4, 6


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="dup-spans", cores=4, shuffle_partitions=4)


def _corpus():
    base = "the quick brown fox jumps over the lazy dog near the old stone bridge".split()
    plant = "alpha beta gamma delta epsilon zeta eta theta".split()  # 8 tokens
    short = "one two three".split()  # k-1 = 3 tokens, must stay invisible
    docs = {
        1: base[:6] + plant + base[6:],
        2: ["x1", "x2"] + plant + ["y1"] + short + ["y2"],
        3: short + ["z1", "z2", "z3", "z4", "z5"] + plant,
        # doc 4 contains the plant TWICE (two diagonals vs docs 1-3) and
        # also repeats it within itself (must NOT self-report)
        4: plant + ["mid"] + plant,
        # heavy boilerplate so cap=2 actually splits gram buckets
        5: plant + plant + plant,
        6: ["a"] * 12,
        7: ["a"] * 12,
    }
    return [(i, " ".join(t)) for i, t in sorted(docs.items())]


def _brute(docs, k, min_len):
    toks = {i: t.split(" ") for i, t in docs}
    out = set()
    ids = sorted(toks)
    for ia in range(len(ids)):
        for ib in range(ia + 1, len(ids)):
            a, b = toks[ids[ia]], toks[ids[ib]]
            for diag in range(-(len(b) - 1), len(a)):
                run = 0
                for pb in range(len(b) + 1):
                    pa = pb + diag
                    if pb < len(b) and 0 <= pa < len(a) and a[pa] == b[pb]:
                        run += 1
                        continue
                    if run >= min_len and run >= k:
                        out.add(
                            (ids[ia], ids[ib], pa - run, pb - run, run)
                        )
                    run = 0
    # 1-based positions like the engine
    return {(da, db, sa + 1, sb + 1, ln) for (da, db, sa, sb, ln) in out}


def _run(spark, docs, cap):
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    got = duplicate_text_spans(df, k=K, min_len=MIN_LEN, cap=cap)
    return {
        (int(r.doc_id_a), int(r.doc_id_b), int(r.a_start), int(r.b_start), int(r.span_len))
        for r in got.collect()
    }


def test_spans_match_bruteforce_and_cap_invariant(spark):
    docs = _corpus()
    expect = _brute(docs, K, MIN_LEN)
    assert expect, "fixture produced no spans"
    # the planted 8-token span must surface between docs 1 and 2
    assert any((e[0], e[1]) == (1, 2) for e in expect)
    # the k-1 short run must be invisible
    assert not any(e[4] < K for e in expect)
    # doc 4's internal repeat: spans vs doc 1 on TWO diagonals
    assert len({e[2] - e[3] for e in expect if (e[0], e[1]) == (1, 4)}) == 2
    # no self-pairs by construction of the output schema
    assert all(e[0] < e[1] for e in expect)

    got_big = _run(spark, docs, cap=1024)
    assert got_big == expect

    got_chunked = _run(spark, docs, cap=2)
    assert got_chunked == expect
