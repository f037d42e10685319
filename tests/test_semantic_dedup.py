"""semantic_dedup_pairs (SemDeDup): within-cluster pairing must equal the
naive same-list all-pairs cosine filter (numpy oracle over the engine's
own list assignment), planted near-identical vectors must surface as
pairs, triangle-chunking (cap) must not change the pair set, and a
prebuilt quantizer must reproduce the identical output."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="semdedup", cores=4, shuffle_partitions=4)


DIM = 8


def _corpus():
    """4 well-separated gaussian blobs of 20 vectors + 6 planted
    near-duplicate pairs (one vector + tiny jitter) inside blobs."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, DIM)) * 10.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, (c + rng.standard_normal(DIM)).tolist()))
            vid += 1
    for k in range(6):  # planted dupes: copy of an existing vector + 1e-3 jitter
        base = np.array(rows[k * 13][1])
        rows.append((vid, (base + 1e-3 * rng.standard_normal(DIM)).tolist()))
        vid += 1
    return rows


def _pairs(spark, rows, **kw):
    from whitebox_tools_spark.operators.similarity import semantic_dedup_pairs

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_pairs(df, dim=DIM, **kw)
    return {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"] for r in out.collect()
    }


def _naive_within_list(spark, rows, nlist, tau):
    """Numpy cosine over pairs sharing the ENGINE's own list assignment."""
    from whitebox_tools_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = ivf_centroids(df, nlist, dim=DIM)
    inv = {r["vec_id"]: r["list_id"] for r in ivf_assign(df, cent).collect()}
    v = {i: np.array(x) for i, x in rows}
    exp = {}
    ids = sorted(v)
    for i in ids:
        for j in ids:
            if i < j and inv[i] == inv[j]:
                c = float(
                    v[i] @ v[j] / (np.linalg.norm(v[i]) * np.linalg.norm(v[j]))
                )
                if c >= tau:
                    exp[(i, j)] = c
    return exp


def test_matches_naive_within_list_and_finds_planted_dupes(spark):
    rows = _corpus()
    got = _pairs(spark, rows, nlist=4, tau=0.9)
    exp = _naive_within_list(spark, rows, 4, 0.9)
    assert set(got) == set(exp)
    for k in got:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)
    # every planted dupe pair (vec 80+k is a jittered copy of vec 13k)
    # surfaces — blob separation keeps copy and original in one cluster
    for k in range(6):
        assert (k * 13, 80 + k) in got, k


def test_cap_invariance(spark):
    rows = _corpus()
    a = _pairs(spark, rows, nlist=4, tau=0.9, cap=2)
    b = _pairs(spark, rows, nlist=4, tau=0.9, cap=1024)
    assert a == b and len(a) > 0


def test_prebuilt_centroids_bit_identical(spark):
    from whitebox_tools_spark.operators.similarity import ivf_centroids

    rows = _corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = ivf_centroids(df, 4, dim=DIM)
    a = _pairs(spark, rows, nlist=4, tau=0.9)
    b = _pairs(spark, rows, nlist=4, tau=0.9, centroids=cent)
    assert a == b
