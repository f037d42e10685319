"""Multivariate STAT operators backed by Spark ML (class STAT).

References:
  - PrincipalComponentAnalysis: /root/reference/whitebox-tools-app/src/tools/
    math_stat_analysis/principal_component_analysis.rs:178 — PCA over a
    multi-band stack (correlation-matrix based; standardized option).
  - KMeansClustering: image_analysis/k_means_clustering.rs — k-means over
    multi-band pixels, fixed max iterations, seeded initial centers.

Spark ML supplies the distributed linear algebra (RowMatrix SVD / Lloyd
iterations); these wrappers adapt the engine's long/wide cell tables to
ML vectors and back. Determinism: fixed seed; k-means assignment output is
deterministic given the seed."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_vectors(wide: DataFrame, feature_cols: list[str]):
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=feature_cols, outputCol="features")
    return asm.transform(wide.dropna(subset=feature_cols))


def pca_components(
    wide: DataFrame, feature_cols: list[str], k: int, *, standardized: bool = True
):
    """-> (scores DataFrame with pc1..pck, explained variance list).
    Standardized=True mirrors the reference's correlation-matrix PCA."""
    from pyspark.ml.feature import PCA, StandardScaler

    df = _to_vectors(wide, feature_cols)
    col = "features"
    if standardized:
        scaler = StandardScaler(
            inputCol="features", outputCol="scaled", withMean=True, withStd=True
        ).fit(df)
        df = scaler.transform(df)
        col = "scaled"
    model = PCA(k=k, inputCol=col, outputCol="pc").fit(df)
    scores = model.transform(df).withColumn("pc_arr", vector_to_array_expr("pc"))
    for i in range(k):
        scores = scores.withColumn(f"pc{i + 1}", F.col("pc_arr")[i])
    keep = [c for c in wide.columns] + [f"pc{i + 1}" for i in range(k)]
    return scores.select(*keep), [float(v) for v in model.explainedVariance]


def kmeans_clusters(
    wide: DataFrame, feature_cols: list[str], k: int, *, max_iter: int = 20, seed: int = 42
):
    """-> input rows + cluster column (deterministic for a fixed seed)."""
    from pyspark.ml.clustering import KMeans

    df = _to_vectors(wide, feature_cols)
    model = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="features").fit(df)
    out = model.transform(df).withColumnRenamed("prediction", "cluster")
    return out.select(*wide.columns, "cluster"), [
        [float(x) for x in c] for c in model.clusterCenters()
    ]


def vector_to_array_expr(col: str):
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(F.col(col))


def lloyd_kmeans(
    wide: DataFrame,
    feature_cols: list[str],
    k: int,
    *,
    id_col: str,
    iters: int = 8,
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means (the reference's
    image_analysis/k_means_clustering.rs is also plain Lloyd with seeded
    init; this engine pins init to the k rows with the SMALLEST id so any
    engine reproduces it bit-for-bit).

    Each iteration is one broadcast join (k x d centroid table) + one
    hash aggregate — the canonical scale shape; no data-sized collect.
    Centroids are rounded to 9 decimals per update so independent engines
    (different float summation orders) stay on the identical trajectory.
    -> (id, cluster) after `iters` fixed iterations."""
    d = wide.select(F.col(id_col).alias("_id"), *feature_cols).dropna()
    # init = k smallest ids via distributed take-ordered (no global window);
    # re-rank the tiny k-row result locally
    seed_rows = d.orderBy("_id").limit(k)
    spark = wide.sparkSession
    cent = spark.createDataFrame(
        [
            (i, *[float(r[c]) for c in feature_cols])
            for i, r in enumerate(sorted(seed_rows.collect(), key=lambda r: r["_id"]))
        ],
        ["cluster"] + [f"_c_{c}" for c in feature_cols],
    )
    for _ in range(iters):
        dist = sum(
            (F.col(c) - F.col(f"_c_{c}")) * (F.col(c) - F.col(f"_c_{c}"))
            for c in feature_cols
        )
        assigned = (
            d.crossJoin(F.broadcast(cent))
            .withColumn("_dist", dist)
            .groupBy("_id", *feature_cols)
            .agg(F.expr("min_by(cluster, struct(_dist, cluster))").alias("cluster"))
        )
        cent = assigned.groupBy("cluster").agg(
            *[F.round(F.avg(c), 9).alias(f"_c_{c}") for c in feature_cols]
        )
    dist = sum(
        (F.col(c) - F.col(f"_c_{c}")) * (F.col(c) - F.col(f"_c_{c}"))
        for c in feature_cols
    )
    final = (
        d.crossJoin(F.broadcast(cent))
        .withColumn("_dist", dist)
        .groupBy("_id")
        .agg(F.expr("min_by(cluster, struct(_dist, cluster))").alias("cluster"))
    )
    return final.select(F.col("_id").alias(id_col), "cluster")


def lloyd_kmeans_oracle_sql(
    source_sql: str,
    feature_cols: list[str],
    k: int,
    *,
    id_col: str,
    iters: int = 8,
) -> str:
    """DuckDB mirror of lloyd_kmeans: same init, same rounded-centroid
    trajectory, unrolled as chained CTEs (aggregates are not allowed in a
    recursive term, but a FIXED iteration count needs no recursion)."""
    fc = feature_cols
    dist = " + ".join(f"(d.{c} - c.c_{c}) * (d.{c} - c.c_{c})" for c in fc)
    def assign(prev: str, keep_features: bool) -> str:
        inner_feats = (", " + ", ".join("d." + c for c in fc)) if keep_features else ""
        outer_feats = (", " + ", ".join(fc)) if keep_features else ""
        return (
            f"SELECT _id{outer_feats}, cluster FROM ("
            f"SELECT d._id{inner_feats}, c.cluster, "
            f"row_number() OVER (PARTITION BY d._id ORDER BY ({dist}) ASC, c.cluster ASC) AS _rk "
            f"FROM d CROSS JOIN {prev} c) WHERE _rk = 1"
        )

    parts = [
        f"d AS MATERIALIZED (SELECT {id_col} AS _id, {', '.join(fc)} FROM ({source_sql}))",
        "init AS (SELECT row_number() OVER (ORDER BY _id) - 1 AS cluster, "
        + ", ".join(f"{c} AS c_{c}" for c in fc)
        + f" FROM (SELECT * FROM d ORDER BY _id LIMIT {k}))",
    ]
    prev = "init"
    for t in range(iters):
        parts.append(f"a{t} AS ({assign(prev, keep_features=True)})")
        parts.append(
            f"c{t} AS (SELECT cluster, "
            + ", ".join(f"round(avg({c}), 9) AS c_{c}" for c in fc)
            + f" FROM a{t} GROUP BY cluster)"
        )
        prev = f"c{t}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT _id AS {id_col}, cluster FROM ({assign(prev, keep_features=False)})"
    )


def modified_kmeans(
    wide: DataFrame,
    feature_cols: list[str],
    *,
    id_col: str,
    start_clusters: int = 25,
    merge_dist: float = 10.0,
    iters: int = 8,
) -> DataFrame:
    """ModifiedKMeansClustering (image_analysis/
    modified_k_means_clustering.rs): Lloyd's k-means that starts with an
    overspecified cluster count and, after every centroid update, MERGES
    clusters whose centres are closer than merge_dist (so the class count
    only shrinks). Deterministic contract shared with lloyd_kmeans:
    min-id seeding, 9-dp-rounded centroid updates, lexicographic
    assignment ties; merging is a union-find over the tiny k x k centroid
    table (driver-side — k rows, never data), merged labels take the
    smallest member id and merged centres the count-weighted mean (9 dp).
    -> (id, cluster)."""
    d = wide.select(F.col(id_col).alias("_id"), *feature_cols).dropna()
    seed_rows = d.orderBy("_id").limit(int(start_clusters))
    spark = wide.sparkSession
    cent_rows = [
        (i, 1.0, *[float(r[c]) for c in feature_cols])
        for i, r in enumerate(sorted(seed_rows.collect(), key=lambda r: r["_id"]))
    ]
    cent = spark.createDataFrame(
        cent_rows, ["cluster", "_n"] + [f"_c_{c}" for c in feature_cols]
    )

    def merge_centroids(rows):
        rows = sorted(rows, key=lambda r: r[0])
        parent = {r[0]: r[0] for r in rows}

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        md2 = float(merge_dist) ** 2
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d2 = sum((rows[i][2 + k] - rows[j][2 + k]) ** 2
                         for k in range(len(feature_cols)))
                if d2 < md2:
                    ra, rb = find(rows[i][0]), find(rows[j][0])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for r in rows:
            groups.setdefault(find(r[0]), []).append(r)
        out = []
        for gid in sorted(groups):
            mem = groups[gid]
            tot = sum(m[1] for m in mem)
            c = [round(sum(m[1] * m[2 + k] for m in mem) / tot, 9)
                 for k in range(len(feature_cols))]
            out.append((min(m[0] for m in mem), float(tot), *c))
        return out

    for _ in range(int(iters)):
        dist = sum(
            (F.col(c) - F.col(f"_c_{c}")) * (F.col(c) - F.col(f"_c_{c}"))
            for c in feature_cols
        )
        assigned = (
            d.crossJoin(F.broadcast(cent.drop("_n")))
            .withColumn("_dist", dist)
            .groupBy("_id", *feature_cols)
            .agg(F.expr("min_by(cluster, struct(_dist, cluster))").alias("cluster"))
        )
        newc = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            *[F.round(F.avg(c), 9).alias(f"_c_{c}") for c in feature_cols],
        )
        rows = [(int(r["cluster"]), float(r["_n"]),
                 *[float(r[f"_c_{c}"]) for c in feature_cols])
                for r in newc.collect()]
        cent = spark.createDataFrame(
            merge_centroids(rows), ["cluster", "_n"] + [f"_c_{c}" for c in feature_cols]
        )
    dist = sum(
        (F.col(c) - F.col(f"_c_{c}")) * (F.col(c) - F.col(f"_c_{c}"))
        for c in feature_cols
    )
    final = (
        d.crossJoin(F.broadcast(cent.drop("_n")))
        .withColumn("_dist", dist)
        .groupBy("_id")
        .agg(F.expr("min_by(cluster, struct(_dist, cluster))").alias("cluster"))
    )
    return final.select(F.col("_id").alias(id_col), "cluster")


def modified_kmeans_oracle_sql(
    source_sql: str,
    feature_cols: list[str],
    *,
    id_col: str,
    start_clusters: int = 25,
    merge_dist: float = 10.0,
    iters: int = 8,
) -> str:
    """DuckDB mirror of modified_kmeans: the lloyd_kmeans unrolled-CTE
    trajectory plus, per iteration, the centre-merge as min-label
    propagation over the < merge_dist centroid graph (start_clusters
    steps >= the graph diameter, so the labels equal the union-find
    components; merged centre = count-weighted mean rounded to 9 dp,
    merged label = smallest member — the engine's documented rule)."""
    fc = feature_cols
    k = int(start_clusters)
    dist = " + ".join(f"(d.{c} - c.c_{c}) * (d.{c} - c.c_{c})" for c in fc)

    def assign(prev: str, keep_features: bool) -> str:
        inner_feats = (", " + ", ".join("d." + c for c in fc)) if keep_features else ""
        outer_feats = (", " + ", ".join(fc)) if keep_features else ""
        return (
            f"SELECT _id{outer_feats}, cluster FROM ("
            f"SELECT d._id{inner_feats}, c.cluster, "
            f"row_number() OVER (PARTITION BY d._id ORDER BY ({dist}) ASC, c.cluster ASC) AS _rk "
            f"FROM d CROSS JOIN {prev} c) WHERE _rk = 1"
        )

    parts = [
        f"d AS MATERIALIZED (SELECT {id_col} AS _id, {', '.join(fc)} FROM ({source_sql}))",
        "init AS (SELECT row_number() OVER (ORDER BY _id) - 1 AS cluster, "
        "CAST(1.0 AS DOUBLE) AS _n, "
        + ", ".join(f"{c} AS c_{c}" for c in fc)
        + f" FROM (SELECT * FROM d ORDER BY _id LIMIT {k}))",
    ]
    prev = "init"
    md2 = float(merge_dist) ** 2
    for t in range(int(iters)):
        parts.append(f"a{t} AS MATERIALIZED ({assign(prev, keep_features=True)})")
        parts.append(
            f"n{t} AS MATERIALIZED (SELECT cluster, CAST(count(*) AS DOUBLE) AS _n, "
            + ", ".join(f"round(avg({c}), 9) AS c_{c}" for c in fc)
            + f" FROM a{t} GROUP BY cluster)"
        )
        d2 = " + ".join(f"(x.c_{c} - y.c_{c}) * (x.c_{c} - y.c_{c})" for c in fc)
        parts.append(
            f"e{t} AS MATERIALIZED (SELECT x.cluster AS u, y.cluster AS v FROM n{t} x JOIN n{t} y "
            f"ON x.cluster = y.cluster OR ({d2}) < {md2!r})"
        )
        parts.append(f"l{t}_0 AS MATERIALIZED (SELECT cluster, cluster AS lbl FROM n{t})")
        for s in range(k):
            parts.append(
                f"l{t}_{s + 1} AS MATERIALIZED (SELECT e.v AS cluster, min(l.lbl) AS lbl "
                f"FROM e{t} e JOIN l{t}_{s} l ON l.cluster = e.u GROUP BY e.v)"
            )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT l.lbl AS cluster, sum(n._n) AS _n, "
            + ", ".join(
                f"round(sum(n._n * n.c_{c}) / sum(n._n), 9) AS c_{c}" for c in fc
            )
            + f" FROM n{t} n JOIN l{t}_{k} l ON l.cluster = n.cluster GROUP BY l.lbl)"
        )
        prev = f"m{t}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT _id AS {id_col}, cluster FROM ({assign(prev, keep_features=False)})"
    )


def pca_scores_deterministic(
    wide: DataFrame, feature_cols: list[str], k: int, *, id_col: str
) -> DataFrame:
    """PrincipalComponentAnalysis (math_stat_analysis/
    principal_component_analysis.rs — the reference eigendecomposes the
    correlation matrix and projects standardized data), made fully
    deterministic so an independent solver reproduces it: components are
    ordered by descending eigenvalue and SIGN-CANONICALIZED (the loading
    with the largest magnitude — smallest index on ties — is made
    positive), removing the eigenvector sign indeterminacy that kept the
    Spark-ML path rows-only.

    Scale shape: ONE aggregate computes means/stds + the p*(p+1)/2
    standardized cross moments (partial+final combine — only p^2 scalars
    reach the driver), numpy eigh solves the tiny p x p system on the
    driver, and scores are pure column expressions. No data-sized collect,
    no UDFs; scales to any row count unchanged. -> (id, pc1..pck)."""
    import numpy as np

    p = len(feature_cols)
    d = wide.select(F.col(id_col).alias("_id"), *feature_cols).dropna()
    st = d.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.avg(c).alias(f"m_{c}") for c in feature_cols],
        *[F.stddev_samp(c).alias(f"s_{c}") for c in feature_cols],
    ).collect()[0]
    n = int(st["_n"])
    mu = {c: float(st[f"m_{c}"]) for c in feature_cols}
    sd = {c: float(st[f"s_{c}"]) for c in feature_cols}
    z = {c: (F.col(c) - F.lit(mu[c])) / F.lit(sd[c]) for c in feature_cols}
    prods = []
    for i in range(p):
        for j in range(i, p):
            prods.append(
                F.sum(z[feature_cols[i]] * z[feature_cols[j]]).alias(f"x_{i}_{j}")
            )
    row = d.agg(*prods).collect()[0]
    R = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            R[i, j] = R[j, i] = row[f"x_{i}_{j}"] / (n - 1)
    w, V = np.linalg.eigh(R)
    order = np.argsort(-w)[:k]
    cols = [F.col("_id").alias(id_col)]
    for out_i, ev_i in enumerate(order):
        v = V[:, ev_i]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        expr = None
        for ci, c in enumerate(feature_cols):
            term = z[c] * F.lit(float(v[ci]))
            expr = term if expr is None else expr + term
        cols.append(expr.alias(f"pc{out_i + 1}"))
    return d.select(*cols)
