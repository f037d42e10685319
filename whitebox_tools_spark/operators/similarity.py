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


def probe_subsets(n_probes: int, n_planes: int) -> list[tuple[int, ...]]:
    """Multi-probe flip sequence: subsets of RANKED bit positions (0 = the
    query's least-confident plane), ordered by flip cost sum(rank+1) then
    subset size — the static skeleton of Lv et al.'s query-directed probing
    ({}, {0}, {1}, {2}|{0,1}, ...). Returns the first n_probes subsets."""
    import itertools

    m = min(n_planes, 12)
    subs = []
    for r in (1, 2, 3):
        for comb in itertools.combinations(range(m), r):
            subs.append((sum(c + 1 for c in comb), r, comb))
    subs.sort()
    return ([()] + [c for _, _, c in subs])[:n_probes]


def auto_n_planes(corpus_count: int, *, target_bucket: int = 4096) -> int:
    """Scale plane count with the corpus so mean bucket population stays
    ~target_bucket: n_planes = max(8, ceil(log2(N / target_bucket))).
    8 planes (256 buckets) up to ~10^6 docs; 28 planes at 10^12."""
    import math

    n = max(int(corpus_count), 1)
    return max(8, math.ceil(math.log2(max(n / target_bucket, 2.0))))


def ann_candidate_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    n_planes: int | None = None,
    seed: int = 11,
    n_probes: int = 8,
    dim: int = 64,
    bucket_cap: int = 100_000,
    probe_mode: str = "adaptive",
) -> DataFrame:
    """Scored ANN candidate set (query_id, vec_id, cosine) — the bucket
    equi-join stage of ann_topk_lsh, exposed so recall/candidate-volume
    can be measured directly.

    probe_mode='adaptive' (default) is true multi-probe LSH (Lv et al.,
    VLDB'07): each extra probe flips the query's LEAST-CONFIDENT plane bit
    (smallest |dot(q, plane)|) — the bucket most likely to hold neighbours
    that landed just across a hyperplane. 'fixed' flips bit positions
    0,1,2,... (the legacy pattern; far lower recall per probe, kept for
    the SQL-mirror oracle of the original query).

    Scale controls (all on by default):
    - n_planes=None auto-scales with the corpus (one count() pass):
      max(8, ceil(log2(N/4096))) keeps mean bucket population ~4096 —
      fixed plane counts recreate the quadratic bucket join they exist
      to avoid once N >> 2^planes * k.
    - n_probes=8 adaptive probes (see probe_mode below) recover the
      recall the extra planes cost at a small constant candidate factor.
    - Hot buckets (population > bucket_cap) are salted: the corpus side
      splits a hot bucket into ceil(pop/cap) sub-keys by xxhash64(id),
      the query side fans its probe out over all sub-keys — identical
      candidate SET, but no single reducer sees more than ~cap corpus
      rows. The bucket->salt map is one tiny broadcast aggregate (at most
      min(2^n_planes, N) rows), and the inner join on it prunes probes
      into empty buckets for free.
    """
    if n_planes is None:
        n_planes = auto_n_planes(corpus.count())
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).cast("array<double>").alias("cv")
    ).withColumn("bucket", hyperplane_bucket_expr(F.col("cv"), n_planes=n_planes, seed=seed, dim=dim))
    if probe_mode not in ("adaptive", "fixed"):
        raise ValueError(f"unknown probe_mode {probe_mode!r}")
    planes = _planes(dim, n_planes, seed)
    dots = F.array(
        *[
            dot_expr(F.col("qv"), F.array(*[F.lit(float(v)) for v in p]))
            for p in planes
        ]
    )
    q = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).cast("array<double>").alias("qv"),
        )
        .withColumn("dots", dots)
        .withColumn(
            "bucket0",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.when(F.element_at("dots", i + 1) >= 0, F.pow(F.lit(2.0), i))
                .otherwise(F.lit(0.0))
                .cast("long"),
            ),
        )
        .withColumn(
            "fliporder",
            F.transform(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_planes - 1)),
                        lambda i: F.struct(
                            F.abs(F.element_at("dots", i + 1)).alias("a"),
                            i.alias("i"),
                        ),
                    )
                ),
                lambda s: s["i"],
            ),
        )
    )
    if probe_mode == "adaptive":
        probes = []
        for subset in probe_subsets(n_probes, n_planes):
            mask = F.lit(0).cast("long")
            for rank in subset:
                mask = mask + F.pow(
                    F.lit(2.0), F.element_at("fliporder", rank + 1)
                ).cast("long")
            probes.append(F.col("bucket0").bitwiseXOR(mask))
    else:
        probes = [F.col("bucket0")]
        for b in range(min(n_probes - 1, n_planes)):
            probes.append(F.col("bucket0").bitwiseXOR(F.lit(1 << b)))
    qp = q.withColumn("bucket", F.explode(F.array(*probes))).drop("dots", "fliporder")
    smap = (
        c.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("pop"))
        .select(
            "bucket",
            F.greatest(
                F.lit(1), F.ceil(F.col("pop") / F.lit(float(bucket_cap)))
            ).cast("int").alias("nsalt"),
        )
    )
    c2 = c.join(F.broadcast(smap), "bucket").withColumn(
        "salt", F.pmod(F.xxhash64("vec_id"), F.col("nsalt")).cast("int")
    )
    qp2 = qp.join(F.broadcast(smap), "bucket").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.col("nsalt") - 1))
    )
    return (
        qp2.join(c2, ["bucket", "salt"])
        .select(
            "query_id", "vec_id", cosine_expr(F.col("cv"), F.col("qv")).alias("cosine")
        )
        .distinct()
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    n_planes: int | None = None,
    seed: int = 11,
    n_probes: int = 8,
    dim: int = 64,
    bucket_cap: int = 100_000,
    probe_mode: str = "adaptive",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join (auto-scaled
    plane count, least-confident-bit multi-probe, hot-bucket salting —
    see ann_candidate_pairs), exact cosine within candidates.
    -> (query_id, vec_id, cosine, rank)."""
    scored = ann_candidate_pairs(
        corpus, queries,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        query_id=query_id, query_vec=query_vec,
        n_planes=n_planes, seed=seed, n_probes=n_probes, dim=dim,
        bucket_cap=bucket_cap, probe_mode=probe_mode,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _centroid_score_expr(v, cv):
    """Reduced squared L2 distance dot(c,c) - 2*dot(v,c): same argmin as
    the full squared distance (dot(v,v) is constant per row), ~1/3 the
    flops. Both engines (Spark here, DuckDB in the oracle mirror) compute
    THIS exact expression so list assignment decisions match."""
    return dot_expr(cv, cv) - 2.0 * dot_expr(v, cv)


def ivf_centroids(
    corpus: DataFrame,
    nlist: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    dim: int = 64,
    iters: int = 3,
) -> DataFrame:
    """Deterministic IVF coarse quantizer (IVFFlat's k-means stage; public
    construction: Sivic & Zisserman 2003 inverted files, Jegou et al. 2011
    IVFADC — the flat-list variant). Same reproducibility contract as
    ml.lloyd_kmeans: init = the nlist rows with the SMALLEST id, every
    centroid update rounded to 9 decimals so independent engines stay on
    the identical trajectory; assignment ties break on the smaller
    list_id.

    Each iteration is one broadcast crossJoin (nlist x dim centroid
    table, driver-tiny) + one hash aggregate over the corpus — no
    data-sized collect; the per-iteration cost is a single corpus scan.
    -> (list_id, cv: array<double>) after `iters` fixed iterations."""
    d = corpus.select(
        F.col(corpus_id).alias("_id"),
        F.col(corpus_vec).cast("array<double>").alias("v"),
    ).dropna()
    seed_rows = sorted(d.orderBy("_id").limit(nlist).collect(), key=lambda r: r["_id"])
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)],
        schema="list_id INT, cv ARRAY<DOUBLE>",
    )
    for _ in range(iters):
        assigned = (
            d.crossJoin(F.broadcast(cent))
            .withColumn("_s", _centroid_score_expr(F.col("v"), F.col("cv")))
            .groupBy("_id", "v")
            .agg(F.expr("min_by(list_id, struct(_s, list_id))").alias("list_id"))
        )
        cent = assigned.groupBy("list_id").agg(
            F.array(*[F.round(F.avg(F.col("v")[i]), 9) for i in range(dim)]).alias("cv")
        )
    return cent.select("list_id", "cv")


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest coarse centroid — the
    inverted lists. One broadcast crossJoin + min_by; at 100 TB this is
    the build pass you materialize (partitionBy list_id) and reuse across
    query batches. -> (list_id, vec_id, cv)."""
    d = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).cast("array<double>").alias("cv"),
    ).dropna()
    return (
        d.crossJoin(F.broadcast(centroids.select("list_id", F.col("cv").alias("_cent"))))
        .withColumn("_s", _centroid_score_expr(F.col("cv"), F.col("_cent")))
        .groupBy("vec_id", "cv")
        .agg(F.expr("min_by(list_id, struct(_s, list_id))").alias("list_id"))
        .select("list_id", "vec_id", "cv")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    nlist: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    dim: int = 64,
    centroids: DataFrame | None = None,
    inverted: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k (the second ANN scale path named by the
    task brief alongside LSH): corpus vectors are binned into nlist
    inverted lists by a deterministic k-means coarse quantizer; each query
    scores only the lists of its n_probe nearest centroids, then exact
    cosine within candidates.

    Scale shape: the centroid table is nlist x dim (driver-tiny,
    broadcast); the probe stage is queries x nlist (broadcast crossJoin +
    per-query top-n_probe window over nlist rows); the candidate stage is
    an equi-join on list_id touching ~n_probe/nlist of the corpus. At
    10^12 docs pick nlist ~ sqrt(N) (standard IVF sizing) so each list
    holds ~sqrt(N) rows and the probed fraction stays n_probe/sqrt(N);
    pre-materialize ivf_assign partitioned by list_id so query batches
    never rescan or re-shuffle the corpus. Skewed lists (dense embedding
    regions) are bounded the same way as LSH hot buckets — split a hot
    list into id-hash sub-keys and fan the probe over them (see
    dedup.bucket_pair_candidates for the shared idiom).

    Pass centroids= and/or inverted= to reuse a pre-built quantizer /
    pre-assigned corpus (the 100-TB pattern); by default both are built
    in-flight. -> (query_id, vec_id, cosine, rank)."""
    cent = centroids if centroids is not None else ivf_centroids(
        corpus, nlist, corpus_id=corpus_id, corpus_vec=corpus_vec, dim=dim, iters=iters
    )
    inv = inverted if inverted is not None else ivf_assign(
        corpus, cent, corpus_id=corpus_id, corpus_vec=corpus_vec
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("qv"),
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.col("_s").asc(), F.col("list_id").asc())
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("_s", _centroid_score_expr(F.col("qv"), F.col("cv")))
        .withColumn("_rk", F.row_number().over(wprobe))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "qv", "list_id")
    )
    scored = probes.join(inv, "list_id").select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("cv"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ivf_inv_parts(nlist: int, iters: int, dim: int) -> list[str]:
    """Shared CTE chain for the deterministic IVF quantizer mirror: the
    k-means trajectory unrolled (fixed iteration count, 9-dp rounded
    centroids — the lloyd_kmeans_oracle_sql trick) ending in `inv`
    (vec_id, v, list_id): every corpus vector's inverted-list assignment
    via the identical reduced score list_dot_product(c,c) -
    2*list_dot_product(v,c) with list_id tie-break."""
    score = "(list_dot_product(c.cv, c.cv) - 2 * list_dot_product(d.v, c.cv))"
    avg_arr = "[" + ", ".join(f"round(avg(v[{i + 1}]), 9)" for i in range(dim)) + "]"
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id, v AS cv "
        f"FROM (SELECT * FROM e ORDER BY vec_id LIMIT {nlist}))",
    ]
    prev = "c0"
    for t in range(iters):
        parts.append(
            f"a{t} AS (SELECT _id, v, list_id FROM ("
            "SELECT d.vec_id AS _id, d.v, c.list_id, "
            f"row_number() OVER (PARTITION BY d.vec_id ORDER BY {score} ASC, c.list_id ASC) AS _rk "
            f"FROM e d CROSS JOIN {prev} c) WHERE _rk = 1)"
        )
        parts.append(
            f"c{t + 1} AS (SELECT list_id, {avg_arr} AS cv FROM a{t} GROUP BY list_id)"
        )
        prev = f"c{t + 1}"
    parts.append(
        "inv AS (SELECT _id AS vec_id, v, list_id FROM ("
        "SELECT d.vec_id AS _id, d.v, c.list_id, "
        f"row_number() OVER (PARTITION BY d.vec_id ORDER BY {score} ASC, c.list_id ASC) AS _rk "
        f"FROM e d CROSS JOIN {prev} c) WHERE _rk = 1)"
    )
    return parts


def ivf_topk_oracle_sql(
    k: int,
    *,
    nlist: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB mirror of ivf_topk over the `embeddings` view: the k-means
    trajectory is unrolled as chained CTEs (fixed iteration count, rounded
    centroids — the lloyd_kmeans_oracle_sql trick), assignment/probe
    argmins use the identical reduced score list_dot_product(c,c) -
    2*list_dot_product(v,c) with list_id tie-break, so the whole IVF
    pipeline is value-checked end-to-end."""
    parts = _ivf_inv_parts(nlist, iters, dim)
    prev = f"c{iters}"
    cos = (
        "list_dot_product(inv.v, p.qv) / "
        "(sqrt(list_dot_product(inv.v, inv.v)) * sqrt(list_dot_product(p.qv, p.qv)))"
    )
    parts.append(
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE {query_pred})"
    )
    parts.append(
        "p AS (SELECT query_id, qv, list_id FROM ("
        "SELECT d.query_id, d.qv, c.list_id, "
        "row_number() OVER (PARTITION BY d.query_id ORDER BY "
        "(list_dot_product(c.cv, c.cv) - 2 * list_dot_product(d.qv, c.cv)) ASC, c.list_id ASC) AS _rk "
        f"FROM q d CROSS JOIN {prev} c) WHERE _rk <= {n_probe})"
    )
    parts.append(
        f"scored AS (SELECT p.query_id, inv.vec_id, {cos} AS cos "
        "FROM p JOIN inv USING (list_id))"
    )
    parts.append(
        "rk AS (SELECT query_id, vec_id, cos, "
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT query_id, vec_id, round(cos, 5) + 0.0 AS cosine, rank FROM rk WHERE rank <= {k}"
    )


def pq_codebooks(
    corpus: DataFrame,
    *,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Deterministic Product-Quantization codebooks (Jegou, Douze &
    Schmid 2011, "Product Quantization for Nearest Neighbor Search"):
    the vector splits into m contiguous subspaces of dim/m dims; each
    subspace trains its own ksub-centroid k-means under the repo's
    reproducibility contract (init = the ksub smallest-id subvectors,
    every centroid update rounded to 9 decimals, argmin ties to the
    smaller code) so independent engines replay the identical trajectory.

    Each iteration per subspace is one broadcast crossJoin (ksub x dim/m,
    driver-tiny) + one hash aggregate; at 100 TB you train on a bounded
    sample (codebooks are statistics, not data) and the build cost
    vanishes next to the encode pass. -> (sub_id, code, cv) with cv of
    length dim/m."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    spark = corpus.sparkSession
    d = corpus.select(
        F.col(corpus_id).alias("_id"),
        F.col(corpus_vec).cast("array<double>").alias("v"),
    ).dropna()
    seed_rows = sorted(d.orderBy("_id").limit(ksub).collect(), key=lambda r: r["_id"])
    books = []
    for j in range(m):
        sub = d.select("_id", F.slice("v", j * dsub + 1, dsub).alias("v"))
        cent = spark.createDataFrame(
            [
                (code, [float(x) for x in r["v"][j * dsub: (j + 1) * dsub]])
                for code, r in enumerate(seed_rows)
            ],
            schema="code INT, cv ARRAY<DOUBLE>",
        )
        for _ in range(iters):
            assigned = (
                sub.crossJoin(F.broadcast(cent))
                .withColumn("_s", _centroid_score_expr(F.col("v"), F.col("cv")))
                .groupBy("_id", "v")
                .agg(F.expr("min_by(code, struct(_s, code))").alias("code"))
            )
            cent = assigned.groupBy("code").agg(
                F.array(
                    *[F.round(F.avg(F.col("v")[i]), 9) for i in range(dsub)]
                ).alias("cv")
            )
        books.append(cent.select(F.lit(j).alias("sub_id"), "code", "cv"))
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    *,
    m: int = 4,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """PQ-encode the corpus: per subspace, code = argmin squared distance
    to the codebook (ties to the smaller code). THIS is the memory story
    at 10^12 vectors: a 64-dim float64 vector (512 B) becomes m one-byte
    codes — the encoded corpus fits in RAM where the raw vectors cannot.
    One broadcast crossJoin + per-(vec, sub) min_by + one collect_list
    regroup. -> (vec_id, codes array<int> ordered by sub_id)."""
    dsub = dim // m
    d = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).cast("array<double>").alias("v"),
    ).dropna()
    sub = d.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("sub_id"),
                    F.slice("v", j * dsub + 1, dsub).alias("sv"),
                )
                for j in range(m)
            ])
        ).alias("s"),
    ).select("vec_id", F.col("s.sub_id").alias("sub_id"), F.col("s.sv").alias("sv"))
    coded = (
        sub.join(F.broadcast(codebooks), "sub_id")
        .withColumn("_s", _centroid_score_expr(F.col("sv"), F.col("cv")))
        .groupBy("vec_id", "sub_id")
        .agg(F.expr("min_by(code, struct(_s, code))").alias("code"))
    )
    return coded.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_id", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    rerank: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation (ADC,
    Jegou et al. 2011) + exact rerank — the third ANN scale path
    (memory-bound regime) beside hyperplane LSH and IVF-Flat.

    Per query a lookup table is precomputed: for every (sub_id, code),
    the partial dot <q_j, c_{j,code}> and the centroid's squared norm.
    The encoded corpus then scores WITHOUT touching any original vector:
    approx_cos(q, x) = sum_j lut.pdot[code_j] /
    (||q|| * sqrt(sum_j lut.cnorm2[code_j])), folded in fixed sub_id
    order via F.aggregate (left-to-right, so the DuckDB oracle replays
    the float arithmetic bit-for-bit) and rounded to 9 dp before ranking
    (rank ties to the smaller vec_id). The top rerank*k candidates per
    query are reranked by exact cosine against the original vectors; the
    exact value is what the output carries.

    Scale shape: codebooks and the per-query LUT are driver-tiny
    broadcasts (queries x m x ksub rows); the corpus-side cost is ONE
    scan of the (vec_id, codes) table per query batch with the score in
    whole-stage codegen, then an equi-join of rerank*k*|Q| ids back to
    the raw vectors. Compose with ivf_assign lists to prune the scan
    (IVFADC) when even the encoded scan is too much.
    -> (query_id, vec_id, cosine, rank) — cosine is the EXACT value."""
    cb = codebooks if codebooks is not None else pq_codebooks(
        corpus, m=m, ksub=ksub, iters=iters, dim=dim,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
    )
    enc = codes if codes is not None else pq_encode(
        corpus, cb, m=m, dim=dim, corpus_id=corpus_id, corpus_vec=corpus_vec
    )
    dsub = dim // m
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("qv"),
    )
    lut = (
        q.crossJoin(F.broadcast(cb))
        .select(
            "query_id",
            "qv",
            (F.col("sub_id") * F.lit(ksub) + F.col("code")).alias("slot"),
            dot_expr(
                F.slice("qv", F.col("sub_id") * dsub + 1, dsub), F.col("cv")
            ).alias("pdot"),
            dot_expr(F.col("cv"), F.col("cv")).alias("cnorm2"),
        )
        .groupBy("query_id")
        .agg(
            F.first("qv").alias("qv"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "pdot", "cnorm2"))),
                lambda s: F.struct(s["pdot"].alias("pdot"), s["cnorm2"].alias("cnorm2")),
            ).alias("lut"),
        )
    )
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    num = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, j: acc
        + F.col("lut")[j * F.lit(ksub) + F.col("codes")[j]]["pdot"],
    )
    rn2 = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, j: acc
        + F.col("lut")[j * F.lit(ksub) + F.col("codes")[j]]["cnorm2"],
    )
    approx = F.round(num / (F.sqrt(dot_expr(F.col("qv"), F.col("qv"))) * F.sqrt(rn2)), 9)
    wc = Window.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("vec_id"))
    cand = (
        enc.crossJoin(F.broadcast(lut))
        .withColumn("approx", approx)
        .withColumn("_rk", F.row_number().over(wc))
        .filter(F.col("_rk") <= rerank * k)
        .select("query_id", "qv", "vec_id")
    )
    raw = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).cast("array<double>").alias("v"),
    )
    scored = cand.join(raw, "vec_id").select(
        "query_id", "vec_id", cosine_expr(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_topk_oracle_sql(
    k: int,
    *,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    dim: int = 64,
    rerank: int = 4,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB mirror of pq_topk over the `embeddings` view: per-subspace
    k-means trajectories unrolled as chained CTEs (rounded centroids, the
    ivf_topk_oracle_sql trick), codes by the same reduced-score argmin,
    and the ADC fold written as the explicit left-to-right sum
    (0.0 + p0 + p1 + ...) so the float arithmetic replays the engine's
    F.aggregate fold bit-for-bit; approx scores rounded to 9 dp before
    the rerank cutoff on both sides."""
    dsub = dim // m
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
    ]
    finals = []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        sub = f"s{j}"
        parts.append(
            f"{sub} AS (SELECT vec_id, v[{lo}:{hi}] AS sv FROM e)"
        )
        parts.append(
            f"c{j}_0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, sv AS cv "
            f"FROM (SELECT * FROM {sub} ORDER BY vec_id LIMIT {ksub}))"
        )
        score = "(list_dot_product(c.cv, c.cv) - 2 * list_dot_product(d.sv, c.cv))"
        avg_arr = "[" + ", ".join(f"round(avg(sv[{i + 1}]), 9)" for i in range(dsub)) + "]"
        prev = f"c{j}_0"
        for t in range(iters):
            parts.append(
                f"a{j}_{t} AS (SELECT vec_id, sv, code FROM ("
                "SELECT d.vec_id, d.sv, c.code, "
                f"row_number() OVER (PARTITION BY d.vec_id ORDER BY {score} ASC, c.code ASC) AS _rk "
                f"FROM {sub} d CROSS JOIN {prev} c) WHERE _rk = 1)"
            )
            parts.append(
                f"c{j}_{t + 1} AS (SELECT code, {avg_arr} AS cv FROM a{j}_{t} GROUP BY code)"
            )
            prev = f"c{j}_{t + 1}"
        parts.append(
            f"code{j} AS (SELECT vec_id, code FROM ("
            "SELECT d.vec_id, c.code, "
            f"row_number() OVER (PARTITION BY d.vec_id ORDER BY {score} ASC, c.code ASC) AS _rk "
            f"FROM {sub} d CROSS JOIN {prev} c) WHERE _rk = 1)"
        )
        finals.append((f"code{j}", prev, lo, hi))
    parts.append(
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE {query_pred})"
    )
    for j, (_, cb, lo, hi) in enumerate(finals):
        parts.append(
            f"lut{j} AS (SELECT q.query_id, c.code, "
            f"list_dot_product(q.qv[{lo}:{hi}], c.cv) AS pdot, "
            f"list_dot_product(c.cv, c.cv) AS cnorm2 FROM q CROSS JOIN {cb} c)"
        )
    code_joins = " ".join(
        f"JOIN code{j} ON code{j}.vec_id = e.vec_id" for j in range(m)
    )
    lut_joins = " ".join(
        f"JOIN lut{j} ON lut{j}.query_id = q.query_id AND lut{j}.code = code{j}.code"
        for j in range(m)
    )
    num = "0.0 " + " ".join(f"+ lut{j}.pdot" for j in range(m))
    rn2 = "0.0 " + " ".join(f"+ lut{j}.cnorm2" for j in range(m))
    parts.append(
        "approx AS (SELECT q.query_id, e.vec_id, "
        f"round(({num}) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt({rn2})), 9) AS ap "
        f"FROM e {code_joins} CROSS JOIN q {lut_joins})"
    )
    parts.append(
        "cand AS (SELECT query_id, vec_id FROM ("
        "SELECT query_id, vec_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY ap DESC, vec_id) AS _rk "
        f"FROM approx) WHERE _rk <= {rerank * k})"
    )
    cos = (
        "list_dot_product(e.v, q.qv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    parts.append(
        f"scored AS (SELECT cand.query_id, cand.vec_id, {cos} AS cos "
        "FROM cand JOIN e ON e.vec_id = cand.vec_id "
        "JOIN q ON q.query_id = cand.query_id)"
    )
    parts.append(
        "rk AS (SELECT query_id, vec_id, cos, "
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT query_id, vec_id, round(cos, 5) + 0.0 AS cosine, rank FROM rk WHERE rank <= {k}"
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    *,
    nlist: int = 16,
    tau: float = 0.95,
    iters: int = 3,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroids: DataFrame | None = None,
    cap: int = 1024,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication" — public paper): semantic
    near-duplicate PAIRS found cluster-locally. Vectors are assigned to a
    deterministic IVF coarse quantizer's inverted lists, and cosine
    similarity is evaluated only WITHIN each list — the paper's design:
    k-means confines the quadratic comparison to cluster-sized buckets,
    so the corpus-level cost is sum(cluster^2), never N^2.

    Scale shape: quantizer build + assignment are broadcast crossJoins +
    one aggregate per iteration (ivf_centroids/ivf_assign, the same build
    pass IVF ANN materializes); within-cluster pairing goes through
    bucket_pair_candidates, so a skewed hot cluster triangle-chunks across
    executors instead of serializing one task. Pairs are exact cosines —
    no LSH approximation inside the cluster; the only recall loss vs
    all-pairs is near-dups split across cluster boundaries (the paper
    accepts this; raise nlist iters or lower nlist to trade).
    -> (vec_id_a, vec_id_b, cosine) with cosine >= tau, vec_id_a < vec_id_b.
    """
    from whitebox_tools_spark.operators.dedup import bucket_pair_candidates

    cent = (
        centroids
        if centroids is not None
        else ivf_centroids(
            corpus, nlist, corpus_id=corpus_id, corpus_vec=corpus_vec,
            dim=dim, iters=iters,
        )
    )
    inv = ivf_assign(corpus, cent, corpus_id=corpus_id, corpus_vec=corpus_vec)
    cand = bucket_pair_candidates(
        inv, ["list_id"], "vec_id", payload=["cv"], cap=cap,
        out_a="vec_id_a", out_b="vec_id_b",
    )
    cos = cosine_expr(F.col("cv_a"), F.col("cv_b"))
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(float(tau)))
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def semantic_dedup_pairs_oracle_sql(
    *, nlist: int = 16, tau: float = 0.95, iters: int = 3, dim: int = 64
) -> str:
    """DuckDB mirror of semantic_dedup_pairs over the `embeddings` view:
    the shared unrolled IVF trajectory (bit-identical assignment) + a
    naive within-list self-join with the identical float cosine — the
    engine's triangle-chunked pairing must reproduce exactly this set."""
    parts = _ivf_inv_parts(nlist, iters, dim)
    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    parts.append(
        f"pr AS (SELECT a.vec_id AS doc_id_a, b.vec_id AS doc_id_b, {cos} AS cos "
        "FROM inv a JOIN inv b ON a.list_id = b.list_id AND a.vec_id < b.vec_id)"
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT doc_id_a, doc_id_b FROM pr WHERE cos >= {float(tau)!r}"
    )
