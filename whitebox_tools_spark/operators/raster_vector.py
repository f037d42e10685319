"""Raster <-> vector conversion (classes PIP and CC).

VectorPolygonsToRaster (/root/reference/whitebox-tools-app/src/tools/
data_tools/vector_polygons_to_raster.rs:151,476-573): per record in order,
rasterize holes into a mask then set shell-covered cell centers to the
record's value; later records overwrite earlier ones. Re-expressed: PIP of
all cell centers against the polygon set (cell-cover broadcast join + exact
refine, which already applies the per-record hole logic in part order), then
last-record-wins = max_by(poly_id) per cell.

Clump / connected components (gis_analysis/clump.rs, BFS flood fill,
8-connectivity): re-expressed as iterative min-label propagation over the
neighbor graph — each cell starts with label = row*C+col, repeatedly takes
the min label among its (present) neighbors until fixpoint, then labels are
renumbered densely in scan order (min(row*C+col) per component), matching
the reference's scan-order clump ids. Iterations are logarithmic in
component diameter (min-label hops double); localCheckpoint truncates
lineage each round.

RasterToVectorPoints (data_tools/raster_to_vector_points.rs:126): cell
centers of non-nodata cells -> points. Pure expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import CellIndex, GridSpec
from whitebox_tools_spark.operators.pip import points_in_polygons


def polygons_to_raster(
    spark,
    polys_parts: list,
    grid: GridSpec,
    index: CellIndex,
    *,
    value_from_fid: bool = True,
) -> DataFrame:
    """-> (row, col, value): FID (= poly_id + 1, vector_polygons_to_raster.rs
    record_num+1 convention) of the last covering record per cell center;
    uncovered cells absent (nodata)."""
    centers = (
        spark.range(grid.rows * grid.cols)
        .select(
            (F.col("id") / grid.cols).cast("long").alias("row"),
            (F.col("id") % grid.cols).alias("col"),
            F.col("id").alias("point_id"),
        )
        .withColumn("x", grid.x_center_expr(F.col("col")))
        .withColumn("y", grid.y_center_expr(F.col("row")))
    )
    hits = points_in_polygons(centers, polys_parts, index)
    win = hits.groupBy("point_id").agg(F.max("poly_id").alias("poly_id"))
    out = win.select(
        (F.col("point_id") / grid.cols).cast("long").alias("row"),
        (F.col("point_id") % grid.cols).alias("col"),
        (F.col("poly_id") + 1).cast("double").alias("value"),
    )
    return out


def raster_to_vector_points(cells: DataFrame, grid: GridSpec) -> DataFrame:
    """Non-nodata cells -> point features at cell centers."""
    return cells.filter(F.col("value").isNotNull()).select(
        (F.col("row") * grid.cols + F.col("col")).alias("fid"),
        grid.x_center_expr(F.col("col")).alias("x"),
        grid.y_center_expr(F.col("row")).alias("y"),
        F.col("value"),
    )


def clump(
    cells: DataFrame,
    *,
    diagonals: bool = True,
    max_iterations: int = 64,
) -> DataFrame:
    """Connected components of equal-valued, non-null cells
    (8-connectivity when diagonals=True) -> (row, col, value, clump_id) with
    clump ids 1..n densely numbered in scan order (raster scan of the
    component's minimum row*BIG+col), matching clump.rs scan-order ids.
    """
    base = (
        cells.filter(F.col("value").isNotNull())
        .select("row", "col", "value")
        .withColumn("label", F.col("row") * F.lit(1 << 31) + F.col("col"))
        .localCheckpoint(eager=True)
    )
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if diagonals:
        offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]

    cur = base
    for _ in range(max_iterations):
        nb = None
        right = cur.select(
            F.col("row").alias("r2"), F.col("col").alias("c2"),
            F.col("value").alias("v2"), F.col("label").alias("l2"),
        )
        # one join per pass: explode neighbor coordinates
        exploded = cur.withColumn(
            "nbr",
            F.explode(
                F.array(*[F.struct(
                    (F.col("row") + F.lit(dr)).alias("r2"),
                    (F.col("col") + F.lit(dc)).alias("c2"),
                ) for dr, dc in offsets])
            ),
        ).select("row", "col", "value", "label", F.col("nbr.r2").alias("r2"), F.col("nbr.c2").alias("c2"))
        nb = (
            exploded.join(right, ["r2", "c2"])
            .filter(F.col("value") == F.col("v2"))
            .groupBy("row", "col")
            .agg(F.min("l2").alias("nbl"))
        )
        nxt = (
            cur.join(nb, ["row", "col"], "left")
            .withColumn("new_label", F.least(F.col("label"), F.coalesce(F.col("nbl"), F.col("label"))))
            .select("row", "col", "value", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = nxt.join(
            cur.select("row", "col", F.col("label").alias("old")), ["row", "col"]
        ).filter(F.col("label") != F.col("old")).limit(1).count()
        cur = nxt
        if changed == 0:
            break

    # dense renumbering in scan order of component minimum (row-major)
    comp = cur.groupBy("label").agg(F.min(F.col("row") * F.lit(1 << 31) + F.col("col")).alias("scan"))
    from pyspark.sql import Window

    w = Window.orderBy("scan")
    ids = comp.withColumn("clump_id", F.row_number().over(w)).select("label", "clump_id")
    return cur.join(F.broadcast(ids), "label").select("row", "col", "value", "clump_id")
