"""Point-cloud operators over the flat point table
(file_id, point_id, x, y, z, intensity, return_num, num_returns,
classification, ...) — SURVEY.md section 1.3.

References:
  - LidarShift: /root/reference/whitebox-plugins/src/lidar_shift/main.rs —
    constant offsets on x/y/z. Pure expressions.
  - NormalizeLidar: whitebox-plugins/src/normalize_lidar/main.rs — z minus
    an interpolated ground surface -> height above ground; here composed
    from the engine's own IDW/NN gridding over ground-classified points.
  - LidarElevationSlice: whitebox-tools-app/src/tools/lidar_analysis/
    lidar_elevation_slice.rs — keep points with minz <= z <= maxz.
  - FilterLidarClasses: lidar_analysis/filter_lidar_classes.rs.
  - LidarPointStats: lidar_analysis/lidar_point_stats.rs — per-cell point
    counts / z stats.
  - LidarThin: lidar_analysis/lidar_thin.rs — keep one point per grid cell
    (lowest/highest/first by scan order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import CellIndex, GridSpec


def lidar_shift(points: DataFrame, *, dx: float = 0.0, dy: float = 0.0, dz: float = 0.0) -> DataFrame:
    return (
        points.withColumn("x", F.col("x") + F.lit(dx))
        .withColumn("y", F.col("y") + F.lit(dy))
        .withColumn("z", F.col("z") + F.lit(dz))
    )


def elevation_slice(points: DataFrame, *, minz: float, maxz: float) -> DataFrame:
    return points.filter((F.col("z") >= minz) & (F.col("z") <= maxz))


def filter_classes(points: DataFrame, keep: list[int]) -> DataFrame:
    return points.filter(F.col("classification").isin(keep))


def point_stats(points: DataFrame, grid: GridSpec) -> DataFrame:
    """Per-cell point count / min / max / mean z (LidarPointStats)."""
    return (
        points.withColumn("col", grid.col_expr(F.col("x")))
        .withColumn("row", grid.row_expr(F.col("y")))
        .filter(grid.in_grid_expr(F.col("row"), F.col("col")))
        .groupBy("row", "col")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
            F.avg("z").alias("mean_z"),
        )
    )


def lidar_thin(points: DataFrame, grid: GridSpec, *, method: str = "lowest") -> DataFrame:
    """One point per occupied cell: lowest/highest z (ties by point_id)."""
    asc = method == "lowest"
    order = [F.col("z").asc() if asc else F.col("z").desc(), F.col("point_id")]
    w = Window.partitionBy("row", "col").orderBy(*order)
    return (
        points.withColumn("col", grid.col_expr(F.col("x")))
        .withColumn("row", grid.row_expr(F.col("y")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def normalize_height(
    points: DataFrame,
    index: CellIndex,
    grid: GridSpec,
    *,
    ground_class: int = 2,
    min_points: int = 4,
) -> DataFrame:
    """Height above ground: interpolate a ground surface (IDW over
    ground-classified points) and subtract it from every point's z —
    the engine's composition of NormalizeLidar."""
    from whitebox_tools_spark.operators.knn import idw_gridding

    ground = points.filter(F.col("classification") == ground_class)
    surface = idw_gridding(
        ground, grid, index, weight=2.0, radius=0.0, min_points=min_points
    ).withColumnRenamed("value", "ground_z")
    p = (
        points.withColumn("col", grid.col_expr(F.col("x")))
        .withColumn("row", grid.row_expr(F.col("y")))
    )
    return (
        p.join(surface, ["row", "col"], "left")
        .withColumn(
            "height",
            F.when(
                F.col("ground_z") != grid.nodata, F.col("z") - F.col("ground_z")
            ),
        )
        .drop("ground_z")
    )
