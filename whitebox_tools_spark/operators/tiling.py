"""Deterministic tiling / gridding (class TILE).

Cell/tile assignment is always a pure column expression (whole-stage
codegen), followed by groupBy(tile) aggregation or a partitioned write —
this is the reference's LidarTile / BlockMaximumGridding / AggregateRaster
re-expressed as one-shuffle DataFrame plans.

References:
  - LidarTile grid math: /root/reference/whitebox-tools-app/src/tools/
    lidar_analysis/lidar_tile.rs:300-325 (floor-anchored tile ids).
  - BlockMaximumGridding / BlockMinimumGridding: gis_analysis/
    block_maximum.rs:147 (max of point values per output cell).
  - AggregateRaster: gis_analysis/aggregate_raster.rs:142 (agg_factor
    downsample, mean/min/max/sum of the covered fine cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec, lidar_tile_exprs


def assign_tiles(
    points: DataFrame,
    *,
    x: str = "x",
    y: str = "y",
    width: float,
    height: float,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    min_x: float,
    min_y: float,
    max_x: float,
    max_y: float,
) -> DataFrame:
    """Append (tile_col, tile_row, tile) per lidar_tile.rs:322-325."""
    tcol, trow, tile = lidar_tile_exprs(
        F.col(x),
        F.col(y),
        width=width,
        height=height,
        origin_x=origin_x,
        origin_y=origin_y,
        min_x=min_x,
        min_y=min_y,
        max_x=max_x,
        max_y=max_y,
    )
    return points.withColumn("tile_col", tcol).withColumn("tile_row", trow).withColumn("tile", tile)


def tile_counts(tiled: DataFrame, *, min_points: int = 0) -> DataFrame:
    """Tiles with their point counts; tiles under min_points dropped
    (lidar_tile.rs: tiles with < min_points are not written)."""
    out = tiled.groupBy("tile").agg(F.count(F.lit(1)).alias("n_points"))
    if min_points > 0:
        out = out.filter(F.col("n_points") >= min_points)
    return out


def write_tiles(tiled: DataFrame, path: str, *, n_buckets: int | None = None) -> None:
    """Materialize tiles as a partitioned parquet layout. repartitionByRange
    keeps each tile's rows contiguous (one writer per tile range) — the
    distributed equivalent of the reference writing one LAS file per tile."""
    df = tiled
    if n_buckets:
        df = df.repartitionByRange(n_buckets, "tile")
    df.write.mode("overwrite").partitionBy("tile").parquet(path)


def block_gridding(
    points: DataFrame,
    grid: GridSpec,
    *,
    x: str = "x",
    y: str = "y",
    value: str = "z",
    agg: str = "max",
) -> DataFrame:
    """BlockMaximum/MinimumGridding: assign each point to its output cell by
    the floor formulas and take max/min of the value per cell. Cells with no
    points are nodata (= absent rows here; densify with a grid range join
    only when a dense raster is required)."""
    fn = {"max": F.max, "min": F.min, "mean": F.avg, "sum": F.sum, "count": F.count}[agg]
    return (
        points.withColumn("col", grid.col_expr(F.col(x)))
        .withColumn("row", grid.row_expr(F.col(y)))
        .filter(grid.in_grid_expr(F.col("row"), F.col("col")))
        .groupBy("row", "col")
        .agg(fn(F.col(value)).alias("value"))
    )


def aggregate_raster(
    cells: DataFrame,
    *,
    agg_factor: int,
    agg: str = "mean",
) -> DataFrame:
    """AggregateRaster: downsample a (row, col, value) cell table by
    agg_factor — coarse cell = (row div f, col div f); one hash aggregate."""
    fn = {"mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum}[agg]
    f = F.lit(agg_factor).cast("long")
    return (
        cells.filter(F.col("value").isNotNull())
        .groupBy(
            F.floor(F.col("row") / f).alias("row"),
            F.floor(F.col("col") / f).alias("col"),
        )
        .agg(fn("value").alias("value"))
    )
