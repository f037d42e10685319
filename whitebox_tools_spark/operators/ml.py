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
