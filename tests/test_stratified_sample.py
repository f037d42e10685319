"""stratified_sample: selection must be a pure function of (doc_id, seed)
— partition-invariant, nested across fractions (the 25% sample of a stratum
is a subset of its 50% sample), exact vs an independent hashlib replay,
rate close to the quota, and default applied to unmapped strata."""

import hashlib

import pytest

from whitebox_tools_spark.operators.dedup import stratified_sample


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="strat-sample", cores=4, shuffle_partitions=4)


def _docs(spark, n=4000):
    rows = [(i, f"s{i % 4}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _h60(doc_id, seed):
    return int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)


def _ids(df):
    return {int(r.doc_id) for r in df.select("doc_id").collect()}


def test_deterministic_nested_and_exact(spark):
    d = _docs(spark)
    frac = {"s0": 0.5, "s1": 0.25}
    got = _ids(stratified_sample(d, frac, seed=7, default=0.1))
    # exact replay with an independent md5 implementation
    expect = {
        i for i in range(4000)
        if _h60(i, 7) < int({0: 0.5, 1: 0.25, 2: 0.1, 3: 0.1}[i % 4] * (1 << 60))
    }
    assert got == expect
    # partition invariance
    assert _ids(stratified_sample(d.repartition(13), frac, seed=7, default=0.1)) == expect
    # nested: raising s1's fraction only ADDS documents
    wider = _ids(stratified_sample(d, {"s0": 0.5, "s1": 0.6}, seed=7, default=0.1))
    assert got - wider == set()
    # rates near quota (1000 docs/stratum, ~1.5% tolerance at 3 sigma)
    s0 = sum(1 for i in expect if i % 4 == 0) / 1000
    assert abs(s0 - 0.5) < 0.05
    # different seed -> different (but same-law) selection
    other = _ids(stratified_sample(d, frac, seed=8, default=0.1))
    assert other != got
