"""ANN scale-default tests: auto plane count, multi-probe recall, and
hot-bucket salting invariance (VERDICT r3 item 10).

Reference parity note: the reference has no ANN operator — this is part of
the LLM-data-pipeline suite. Public construction: Charikar 2002 random
hyperplane LSH + multi-probe (Lv et al., VLDB'07) + standard skew salting.
"""

import numpy as np
from pyspark.sql import functions as F

from whitebox_tools_spark.operators import similarity as SIM


def test_auto_n_planes_scales_with_corpus():
    # mean bucket population pinned ~4096: fixed 8 planes up to ~1M docs,
    # log-growth beyond (28 planes at 10^12 -> 2.7e8 buckets).
    assert SIM.auto_n_planes(1_000) == 8
    assert SIM.auto_n_planes(1_000_000) == 8
    assert SIM.auto_n_planes(10**9) == 18
    assert SIM.auto_n_planes(10**12) == 28


def _clustered(spark, n_clusters=150, per_cluster=60, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per_cluster, axis=0) + 0.08 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    rows = [(int(i), [float(v) for v in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_recall_and_candidate_volume(spark):
    """On a clustered corpus (the shape where ANN is meaningful), the scale
    defaults (auto planes, 2 probes) must reach recall@5 >= 0.9 while
    scoring <10% of the exhaustive candidate volume."""
    corpus = _clustered(spark)
    n_corpus = corpus.count()
    q = corpus.filter(F.col("vec_id") % 600 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_q = q.count()
    exact = {
        (r.query_id, r.vec_id)
        for r in SIM.cosine_topk(corpus, q, 5, corpus_vec="embedding").collect()
    }
    cand = SIM.ann_candidate_pairs(corpus, q, dim=16, seed=3)
    n_cand = cand.count()
    ann = {
        (r.query_id, r.vec_id)
        for r in SIM.ann_topk_lsh(corpus, q, 5, dim=16, seed=3).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.3f} < 0.9"
    assert n_cand < 0.1 * n_corpus * n_q, (
        f"candidates {n_cand} not <10% of exhaustive {n_corpus * n_q}"
    )


def test_ann_salting_invariance(spark):
    """Forcing hot-bucket salting (bucket_cap=7 splits every bucket many
    ways) must not change the result set — identical candidate SET, only
    the shuffle key layout differs."""
    corpus = _clustered(spark, n_clusters=40, per_cluster=25)
    q = corpus.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base = {
        (r.query_id, r.vec_id, r.rank)
        for r in SIM.ann_topk_lsh(
            corpus, q, 5, dim=16, seed=3, bucket_cap=10**9
        ).collect()
    }
    salted = {
        (r.query_id, r.vec_id, r.rank)
        for r in SIM.ann_topk_lsh(
            corpus, q, 5, dim=16, seed=3, bucket_cap=7
        ).collect()
    }
    assert salted == base


def test_ivf_recall_and_probed_fraction(spark):
    """IVF-Flat on the clustered corpus: with nlist=32 and n_probe=4 the
    probed candidate volume is ~n_probe/nlist of exhaustive, and recall@5
    must still reach 0.9 (clusters >> nlist, so true neighbours share the
    query's coarse cell)."""
    corpus = _clustered(spark)
    n_corpus = corpus.count()
    q = corpus.filter(F.col("vec_id") % 600 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_q = q.count()
    exact = {
        (r.query_id, r.vec_id)
        for r in SIM.cosine_topk(corpus, q, 5, corpus_vec="embedding").collect()
    }
    cent = SIM.ivf_centroids(corpus, 32, dim=16, iters=3)
    inv = SIM.ivf_assign(corpus, cent)
    probes_frac = 4 / 32
    ivf = {
        (r.query_id, r.vec_id)
        for r in SIM.ivf_topk(
            corpus, q, 5, nlist=32, n_probe=4, dim=16,
            centroids=cent, inverted=inv,
        ).collect()
    }
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.3f} < 0.9"
    # probed volume: candidates live in exactly the probed lists
    cand = (
        SIM.ivf_topk(
            corpus, q, n_corpus, nlist=32, n_probe=4, dim=16,
            centroids=cent, inverted=inv,
        ).count()
    )
    assert cand < (probes_frac * 2.5) * n_corpus * n_q, (
        f"candidates {cand} not bounded by ~{probes_frac:.2f} of exhaustive"
    )


def test_ivf_prebuilt_reuse_identical(spark):
    """Building the quantizer/inverted lists once and reusing them (the
    100-TB materialization pattern) must give bit-identical results to the
    in-flight build."""
    corpus = _clustered(spark, n_clusters=30, per_cluster=20)
    q = corpus.filter(F.col("vec_id") % 150 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inflight = sorted(
        (r.query_id, r.vec_id, round(r.cosine, 9), r.rank)
        for r in SIM.ivf_topk(corpus, q, 5, nlist=8, n_probe=3, dim=16).collect()
    )
    cent = SIM.ivf_centroids(corpus, 8, dim=16, iters=3)
    inv = SIM.ivf_assign(corpus, cent)
    reused = sorted(
        (r.query_id, r.vec_id, round(r.cosine, 9), r.rank)
        for r in SIM.ivf_topk(
            corpus, q, 5, nlist=8, n_probe=3, dim=16, centroids=cent, inverted=inv
        ).collect()
    )
    assert inflight == reused


def test_ivf_lists_partition_corpus(spark):
    """Every corpus vector lands in exactly one inverted list, and each
    non-empty list's members are nearer (reduced score) to their own
    centroid than to any other — the argmin invariant."""
    corpus = _clustered(spark, n_clusters=12, per_cluster=15)
    cent = SIM.ivf_centroids(corpus, 6, dim=16, iters=3)
    inv = SIM.ivf_assign(corpus, cent)
    assert inv.count() == corpus.count()
    assert inv.select("vec_id").distinct().count() == corpus.count()
    cents = {r.list_id: np.array(r.cv) for r in cent.collect()}
    for r in inv.collect():
        v = np.array(r.cv)
        scores = {
            lid: float(np.dot(c, c) - 2.0 * np.dot(v, c)) for lid, c in cents.items()
        }
        best = min(scores, key=lambda lid: (scores[lid], lid))
        assert best == r.list_id


def test_pq_recall_codes_and_prebuilt_reuse(spark):
    """PQ/ADC path: on the clustered corpus, (a) codes are m small ints in
    [0, ksub) — the 100-TB memory claim is real (dim doubles -> m bytes);
    (b) recall@5 vs exact cosine >= 0.9 with rerank=12 — 60 reranked
    candidates of a 9000-vector corpus, 0.67% — (ADC is lossy by design;
    the exact-rerank stage is what the output carries; measured sweep:
    rerank 6 -> 0.747, 12 -> 0.973, 20 -> 0.987); (c) a
    prebuilt (codebooks, codes) pair replayed through pq_topk is
    bit-identical to the in-flight build; (d) repartitioning the corpus
    does not change the result (deterministic trajectory contract)."""
    corpus = _clustered(spark)
    q = corpus.filter(F.col("vec_id") % 600 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    m, ksub = 4, 16
    cb = SIM.pq_codebooks(corpus, m=m, ksub=ksub, iters=3, dim=16)
    codes = SIM.pq_encode(corpus, cb, m=m, dim=16)

    crows = codes.collect()
    assert all(len(r.codes) == m for r in crows)
    assert all(0 <= c < ksub for r in crows for c in r.codes)
    assert len(crows) == corpus.count()

    def key(df):
        return {(r.query_id, r.vec_id, r.cosine, r.rank) for r in df.collect()}

    inflight = key(SIM.pq_topk(corpus, q, 5, m=m, ksub=ksub, iters=3, dim=16, rerank=12))
    prebuilt = key(SIM.pq_topk(corpus, q, 5, m=m, ksub=ksub, iters=3, dim=16,
                               rerank=12, codebooks=cb, codes=codes))
    assert inflight == prebuilt

    repart = key(SIM.pq_topk(corpus.repartition(17), q, 5, m=m, ksub=ksub,
                             iters=3, dim=16, rerank=12))
    assert repart == inflight

    exact = {
        (r.query_id, r.vec_id)
        for r in SIM.cosine_topk(corpus, q, 5, corpus_vec="embedding").collect()
    }
    got = {(a, b) for (a, b, _, _) in inflight}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"PQ recall@5 {recall:.3f} < 0.9"
