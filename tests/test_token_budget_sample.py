"""token_budget_sample: the two-phase bucket plan must reproduce the naive
per-stratum running-sum rule exactly (pure-python oracle), stay invariant
to partitioning and bucket_bits, nest in the budget, and handle zero /
over-total budgets and zero-token docs."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="token-budget", cores=4, shuffle_partitions=4)


def _h60(doc_id, seed=7):
    return int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)


def _mkdocs(n=120, n_sources=3):
    docs = []
    for i in range(n):
        s = f"s{i % n_sources}"
        n_tok = (i * 7919) % 13  # includes zero-token docs
        docs.append((i, s, " ".join(["tok"] * n_tok)))
    return docs


def _naive(docs, budgets, default=0):
    keep = set()
    by_src = {}
    for did, s, text in docs:
        by_src.setdefault(s, []).append((did, text))
    for s, rows in by_src.items():
        budget = budgets.get(s, default)
        cum = 0
        for did, text in sorted(rows, key=lambda r: (_h60(r[0]), r[0])):
            nt = len(text.split()) if text.strip() else 0
            if cum + nt <= budget:
                cum += nt
                keep.add(did)
            # naive rule: keep iff INCLUSIVE cum <= budget — once a doc
            # overflows, every later doc in hash order overflows too
            else:
                break
    return keep


def _run(spark, docs, budgets, default=0, **kw):
    from whitebox_tools_spark.operators.dedup import token_budget_sample

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = token_budget_sample(df, budgets, default=default, **kw)
    return {r["doc_id"] for r in out.select("doc_id").collect()}


def test_matches_naive_rule_across_bucket_bits(spark):
    docs = _mkdocs()
    budgets = {"s0": 60, "s1": 0, "s2": 10_000}  # partial / zero / over-total
    exp = _naive(docs, budgets)
    for bits in (1, 4, 12):
        assert _run(spark, docs, budgets, bucket_bits=bits) == exp, bits
    # over-total keeps every s2 doc, zero keeps no s1 doc with tokens
    s2 = {d for d, s, _ in docs if s == "s2"}
    assert s2 <= exp


def test_partition_invariance(spark):
    from whitebox_tools_spark.operators.dedup import token_budget_sample

    docs = _mkdocs(90, 2)
    budgets = {"s0": 45, "s1": 80}
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    a = {r["doc_id"] for r in token_budget_sample(df.coalesce(1), budgets).collect()}
    b = {r["doc_id"] for r in token_budget_sample(df.repartition(16), budgets).collect()}
    assert a == b == _naive(docs, budgets)


def test_budget_nestedness(spark):
    docs = _mkdocs(100, 2)
    small = _run(spark, docs, {"s0": 30, "s1": 50})
    big = _run(spark, docs, {"s0": 90, "s1": 120})
    assert small <= big
    assert len(big) > len(small)


def test_default_budget_applies_to_unlisted_sources(spark):
    docs = _mkdocs(60, 3)
    got = _run(spark, docs, {"s0": 10_000}, default=25)
    exp = _naive(docs, {"s0": 10_000}, default=25)
    assert got == exp
    assert any(s != "s0" for d, s, _ in docs if d in got)  # default kept some
