"""Point-in-polygon spatial join (class PIP — the core of the engine).

Re-answers the reference's Clip point case / VectorPointsInPolygon
(/root/reference/whitebox-tools-app/src/tools/gis_analysis/clip.rs:299-370):
for each point, parts of each candidate polygon are tested in order with the
even-odd winding test (poly_ops.rs:41-72); a containing shell keeps the
point, a containing hole drops it, later parts win; boundary points are
outside.

Spark plan (designed for 10^12 points x broadcastable polygon set):

  1. cell-cover build (driver, tiny): each polygon's bbox cover at the index
     zoom -> (cell_id, poly_id, bbox, part geometry) rows. This is the
     sargable version of the reference's bbox prefilter (clip.rs:315-316).
  2. points get cell_id as a pure column expression (whole-stage codegen).
  3. broadcast hash join points.cell_id == cover.cell_id — no shuffle of the
     big side, ever.
  4. bbox filter as a column expression (cheap rejection).
  5. exact winding-number refinement:
       method="expr" (default): the winding loop runs as a built-in
         F.aggregate over the polygon's broadcast edge arrays — pure JVM
         whole-stage codegen, zero Python, zero shuffle. (Benchmarked: the
         Arrow/Python exchange was the scalability ceiling on many-core
         executors; the expression path removed it.)
       method="pandas": vectorized numpy kernel in mapInPandas — for
         polygon sets with very large vertex counts where a codegen'd
         per-row edge loop loses to Arrow batch transfer.

Both methods implement the identical crossing rules; tests pin equality.
For polygon sets too large to broadcast, pass broadcast=False to shuffle on
cell_id instead (both sides partitioned by cell — co-located equi-join).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark import geometry as G
from whitebox_tools_spark.grid import CellIndex


def _cover_rows(polys_parts, index: CellIndex):
    """(cell_id, poly_id, xmin, ymin, xmax, ymax) bbox-cover rows."""
    rows = []
    for poly_id, parts in polys_parts:
        xs = np.concatenate([p[0] for p in parts])
        ys = np.concatenate([p[1] for p in parts])
        xmin, ymin, xmax, ymax = float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())
        for cid in index.cover_bbox(xmin, ymin, xmax, ymax):
            rows.append((cid, poly_id, xmin, ymin, xmax, ymax))
    return rows


def _cover_rows_with_geom(polys_parts, index: CellIndex):
    """Cover rows carrying the polygon geometry as nested edge arrays:
    (cell_id, poly_id, bbox..., parts: array<struct<idx, hole, edges>>)."""
    rows = []
    for poly_id, parts in polys_parts:
        xs = np.concatenate([p[0] for p in parts])
        ys = np.concatenate([p[1] for p in parts])
        xmin, ymin, xmax, ymax = float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())
        pstructs = []
        for k, (pxs, pys, hole) in enumerate(parts):
            edges = [
                (float(pxs[i]), float(pys[i]), float(pxs[i + 1]), float(pys[i + 1]))
                for i in range(len(pxs) - 1)
            ]
            pstructs.append((k, bool(hole), edges))
        for cid in index.cover_bbox(xmin, ymin, xmax, ymax):
            rows.append((cid, poly_id, xmin, ymin, xmax, ymax, pstructs))
    return rows


_COVER_GEOM_SCHEMA = (
    "cell_id long, poly_id long, xmin double, ymin double, xmax double, ymax double, "
    "parts array<struct<idx:int, hole:boolean, "
    "edges:array<struct<x0:double, y0:double, x1:double, y1:double>>>>"
)


def _inside_expr(part, x, y):
    """Even-odd winding containment of (x, y) in one part's edge array —
    verbatim crossing rules from poly_ops.rs:41-72 as an F.aggregate."""

    def step(acc, e):
        is_left = (e["x1"] - e["x0"]) * (y - e["y0"]) - (x - e["x0"]) * (e["y1"] - e["y0"])
        return acc + (
            F.when((e["y0"] <= y) & (e["y1"] > y) & (is_left > 0), F.lit(1))
            .when((e["y0"] > y) & (e["y1"] <= y) & (is_left < 0), F.lit(-1))
            .otherwise(F.lit(0))
        )

    wn = F.aggregate(part["edges"], F.lit(0), step)
    return (wn % 2) != 0


def points_in_polygons(
    points: DataFrame,
    polys_parts: list,
    index: CellIndex,
    *,
    point_id: str = "point_id",
    x: str = "x",
    y: str = "y",
    broadcast: bool = True,
    carry_cols: list[str] | None = None,
    method: str = "expr",
) -> DataFrame:
    """Containment join -> DataFrame(point_id, poly_id[, carry_cols...]).

    polys_parts: [(poly_id, [(xs, ys, is_hole), ...]), ...] — the decoded
    polygon side (small / broadcastable). carry_cols are passed through the
    join and refine untouched (e.g. a precomputed tile id; also what keeps
    streaming plans single-stream — no self-join to re-attach attributes).
    """
    if method == "pandas":
        return _points_in_polygons_pandas(
            points, polys_parts, index,
            point_id=point_id, x=x, y=y, broadcast=broadcast, carry_cols=carry_cols,
        )

    spark = points.sparkSession
    cover = spark.createDataFrame(
        _cover_rows_with_geom(polys_parts, index), _COVER_GEOM_SCHEMA
    )
    if broadcast:
        cover = F.broadcast(cover)

    carry = carry_cols or []
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(x).alias("x"),
        F.col(y).alias("y"),
        index.cell_of_xy_expr(F.col(x), F.col(y)).alias("cell_id"),
        *[F.col(c) for c in carry],
    )
    cand = pts.join(cover, "cell_id").filter(
        (F.col("x") >= F.col("xmin"))
        & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin"))
        & (F.col("y") <= F.col("ymax"))
    )

    px, py = F.col("x"), F.col("y")
    # parts containing the point; the LAST containing part (max idx) decides
    # (clip.rs:317-321): keep iff it is a shell
    containing = F.filter(
        F.transform(
            F.col("parts"),
            lambda part: F.struct(
                part["idx"].alias("idx"),
                part["hole"].alias("hole"),
                _inside_expr(part, px, py).alias("inside"),
            ),
        ),
        lambda s: s["inside"],
    )
    winner = F.array_max(
        F.transform(containing, lambda s: F.struct(s["idx"].alias("idx"), s["hole"].alias("hole")))
    )
    keep = (F.size(containing) > 0) & (~winner["hole"])
    return cand.filter(keep).select("point_id", "poly_id", *carry)


def _points_in_polygons_pandas(
    points: DataFrame,
    polys_parts: list,
    index: CellIndex,
    *,
    point_id: str = "point_id",
    x: str = "x",
    y: str = "y",
    broadcast: bool = True,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Arrow/numpy refine path (see module docstring)."""
    spark = points.sparkSession
    cover = spark.createDataFrame(
        _cover_rows(polys_parts, index),
        "cell_id long, poly_id long, xmin double, ymin double, xmax double, ymax double",
    )
    if broadcast:
        cover = F.broadcast(cover)

    carry = carry_cols or []
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(x).alias("x"),
        F.col(y).alias("y"),
        index.cell_of_xy_expr(F.col(x), F.col(y)).alias("cell_id"),
        *[F.col(c) for c in carry],
    )
    cand = (
        pts.join(cover, "cell_id")
        .filter(
            (F.col("x") >= F.col("xmin"))
            & (F.col("x") <= F.col("xmax"))
            & (F.col("y") >= F.col("ymin"))
            & (F.col("y") <= F.col("ymax"))
        )
        .select("point_id", "x", "y", "poly_id", *carry)
    )

    # broadcast the polygon geometry once per executor (not per task)
    bc = spark.sparkContext.broadcast(
        {pid: [(np.asarray(xs), np.asarray(ys), bool(h)) for xs, ys, h in parts]
         for pid, parts in polys_parts}
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep_frames = []
            out_cols = ["point_id", "poly_id"] + carry
            for pid, grp in pdf.groupby("poly_id", sort=False):
                keep = G.point_in_parts(
                    grp["x"].to_numpy(), grp["y"].to_numpy(), lookup[int(pid)]
                )
                if keep.any():
                    keep_frames.append(grp.loc[keep, out_cols])
            if keep_frames:
                yield pd.concat(keep_frames, ignore_index=True)

    carry_schema = "".join(f", {c} {dict(points.dtypes)[c]}" for c in carry)
    return cand.mapInPandas(refine, schema="point_id long, poly_id long" + carry_schema)


def clip_points(
    points: DataFrame,
    polys_parts: list,
    index: CellIndex,
    *,
    point_id: str = "point_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Clip, point case (gis_analysis/clip.rs:299-370): keep input points
    contained in ANY clip polygon (per-polygon hole/part order already
    applied by the refine). Input record order preserved (sort on point_id);
    FID renumbered sequentially from 1 (clip.rs:345-360) via the
    distributed range-partition + offset pattern — no single-partition
    global window. Left-semi join."""
    from whitebox_tools_spark.distributed import with_global_seq

    hits = points_in_polygons(
        points, polys_parts, index, point_id=point_id, x=x, y=y
    ).select("point_id").distinct()
    kept = points.join(
        hits.withColumnRenamed("point_id", point_id), point_id, "left_semi"
    )
    return with_global_seq(kept, [point_id], out_col="FID")


def erase_points(
    points: DataFrame,
    polys_parts: list,
    index: CellIndex,
    *,
    point_id: str = "point_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Erase, point case (gis_analysis/erase.rs): drop points contained in
    any erase polygon — the anti-join dual of clip_points. FID renumbering
    uses the same distributed sequence pattern as clip_points."""
    from whitebox_tools_spark.distributed import with_global_seq

    hits = points_in_polygons(
        points, polys_parts, index, point_id=point_id, x=x, y=y
    ).select("point_id").distinct()
    kept = points.join(
        hits.withColumnRenamed("point_id", point_id), point_id, "left_anti"
    )
    return with_global_seq(kept, [point_id], out_col="FID")


def clip_lidar_to_polygon(points, polys_parts, index, *, erase: bool = False):
    """ClipLidarToPolygon / ErasePolygonFromLidar (lidar_analysis/
    clip_lidar_to_polygon.rs, erase_polygon_from_lidar.rs): the point
    clip/erase machinery over a cloud (all columns pass through)."""
    keep = clip_points(
        points.select("point_id", "x", "y"), polys_parts, index
    ) if not erase else erase_points(
        points.select("point_id", "x", "y"), polys_parts, index
    )
    return points.join(keep.select("point_id"), "point_id", "semi")


def select_tiles_by_polygon(tiles, polys_parts, index, *, cx: str = "cx", cy: str = "cy"):
    """SelectTilesByPolygon (lidar_analysis/select_tiles_by_polygon.rs):
    keep tiles whose center point falls inside any polygon."""
    from pyspark.sql import functions as F

    pts = tiles.select(
        F.col("tile").alias("point_id"), F.col(cx).alias("x"), F.col(cy).alias("y")
    )
    keep = clip_points(pts, polys_parts, index)
    return tiles.join(
        keep.select(F.col("point_id").alias("tile")), "tile", "semi"
    )
