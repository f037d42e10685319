"""Multiscale terrain signatures (class FOC).

Re-answers the reference's scale-sweep family, all built on the same
Spark shape as max_elev_deviation (focal.py): per-scale windowed stats by
offset scatter + hash aggregate, scales unioned, per-cell argmax by a
struct max — no window function, no iteration, one shuffle per scale.

  - MaxDifferenceFromMean (terrain_analysis/max_diff_from_mean.rs):
    (z - mean) with the largest |diff| across scales + winning scale.
  - MultiscaleElevationPercentile (terrain_analysis/
    multiscale_elev_percentile.rs:477-585): EP = % of window cells below
    the center, argmax |EP - 50| across scales (first scale wins ties).
    Deviation: the reference quantizes values into a running histogram
    (num_sig_digits) as a speed optimization; this engine compares exact
    values.
  - MaxAnisotropyDev (terrain_analysis/max_anisotropy_dev.rs:370-620):
    per scale, DEV over the full window and over 4 directional panes
    (N-S, E-W, NE-SW, NW-SE; pane half-width = (2m+1)/6); anisotropy =
    sqrt(mean of squared (pane DEV - full DEV))); argmax by squared
    magnitude. Cells whose full window leaves the data extent get no
    value at that scale (the reference's edge restriction).
  - MultiscaleRoughness (terrain_analysis/multiscale_roughness.rs):
    per scale, smooth the DEM with the (2m+1) box mean, compare cell
    normals (a = -(v2-v4+2(v1-v5)+v0-v6), b = -(v6-v4+2(v7-v3)+v0-v2),
    c = 8*res; nodata neighbors fall back to the center z) between the
    raw and smoothed surfaces (degrees), box-average the angular
    deviation over the same window; argmax across scales.
  - MultiscaleTopographicPositionImage (terrain_analysis/
    multiscale_topographic_position_image.rs:384-396): three DEVmax
    rasters (local/meso/broad) -> logistic byte mapping
    floor(512/(1+exp(-cutoff*|dev|)))-256 clamped to [0,255] ->
    blue/green/red components.
  - MaxElevDevSignature / MaxAnisotropyDevSignature /
    MultiscaleRoughnessSignature: the same per-scale values sampled at
    given points, one row per (point, scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

D8_DX = [1, 1, 1, 0, -1, -1, -1, 0]
D8_DY = [-1, 0, 1, 1, 1, 0, -1, -1]


def _offsets_df(spark, offsets):
    return F.broadcast(
        spark.createDataFrame([(int(dy), int(dx)) for dy, dx in offsets], "dy int, dx int")
    )


def _window_stats(cells: DataFrame, offsets, *, out_prefix: str) -> DataFrame:
    """(row, col, {p}n, {p}sum, {p}sumsq) over the given offsets (valid
    neighbors only) — scatter-explode + one hash aggregate."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    sc = (
        src.crossJoin(_offsets_df(spark, offsets))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            F.col("value").alias("nz"),
        )
        .groupBy("row", "col")
        .agg(
            F.count(F.lit(1)).alias(f"{out_prefix}n"),
            F.sum("nz").alias(f"{out_prefix}sum"),
            F.sum(F.col("nz") * F.col("nz")).alias(f"{out_prefix}sumsq"),
        )
    )
    return sc


def _full_offsets(m: int):
    return [(dy, dx) for dy in range(-m, m + 1) for dx in range(-m, m + 1)]


# ---------------------------------------------------------------------------
# Tiled integral-image window stats (the large-radius scale path)
# ---------------------------------------------------------------------------
# The offset scatter shuffles (2r+1)^2 rows per cell per scale — correct and
# one-shuffle at the fixture radii, but a 10^3-10^5x shuffle amplification at
# the r = 50-500 the reference's own implementations target with integral
# images / running histograms (multiscale_elev_percentile.rs:477-585).  Here
# each cell ships to <= 4 (tile + r halo) blocks (duplication ~ (T+2r)^2/T^2),
# and per-block 2-D prefix sums answer every axis-aligned-rectangle window in
# O(1) per cell — flat in r.  Any offset set that decomposes into rectangles
# (full windows, the 4 anisotropy panes) is supported.
#
# Precision note: prefix-sum accumulation orders float adds differently from
# the hash aggregate (whose own order is partition-dependent), so sums agree
# to ~1e-12 relative, not bitwise; counts are exact.  Downstream comparators
# round to 6 dp, which absorbs this (pytest-pinned in
# tests/test_multiscale_tiled.py).


def _rects_full(m: int):
    return [(-m, m, -m, m)]


def _rects_panes(m: int):
    """Rectangle decomposition of _pane_offsets (inclusive dy0,dy1,dx0,dx1)."""
    mpr = (2 * m + 1) // 6
    return {
        "ns": [(-m, m, -mpr, mpr)],
        "ew": [(-mpr, mpr, -m, m)],
        "ne": [(-m, -mpr - 1, mpr + 1, m), (-mpr, mpr, -mpr, mpr),
               (mpr + 1, m, -m, -mpr - 1)],
        "nw": [(-m, -mpr - 1, -m, -mpr - 1), (-mpr, mpr, -mpr, mpr),
               (mpr + 1, m, mpr + 1, m)],
    }


def window_stats_tiled(
    cells: DataFrame, rect_sets: dict, *, tile: int = 256
) -> DataFrame:
    """(row, col, {p}n, {p}sum, {p}sumsq) for each prefix p in rect_sets
    (prefix -> list of inclusive (dy0, dy1, dx0, dx1) rectangles), computed
    with per-tile integral images. Emits one row per PRESENT cell (callers
    join onto the source, so absent-target rows of the scatter variant are
    irrelevant); empty windows emit n = 0 (the scatter's missing row /
    null-stat behavior is equivalent under every downstream n-guard)."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    halo = max(
        max(abs(v) for v in r) for rects in rect_sets.values() for r in rects
    )
    T, H = int(tile), int(halo)
    e1 = src.select(
        "row", "col", "value",
        F.explode(
            F.sequence(F.floor((F.col("row") - H) / T), F.floor((F.col("row") + H) / T))
        ).alias("tr"),
    )
    e2 = e1.select(
        "row", "col", "value", "tr",
        F.explode(
            F.sequence(F.floor((F.col("col") - H) / T), F.floor((F.col("col") + H) / T))
        ).alias("tc"),
    )
    prefixes = list(rect_sets)

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        t_r = int(pdf["tr"].iloc[0])
        t_c = int(pdf["tc"].iloc[0])
        r0, c0 = t_r * T - H, t_c * T - H
        side = T + 2 * H
        z = np.zeros((side, side))
        mk = np.zeros((side, side))
        rr = pdf["row"].to_numpy() - r0
        cc = pdf["col"].to_numpy() - c0
        vals = pdf["value"].to_numpy()
        z[rr, cc] = vals
        mk[rr, cc] = 1.0

        def integral(a):
            out = np.zeros((side + 1, side + 1))
            np.cumsum(a, axis=0, out=out[1:, 1:])
            np.cumsum(out[1:, 1:], axis=1, out=out[1:, 1:])
            return out

        iz, iz2, im = integral(z), integral(z * z), integral(mk)
        core = (rr >= H) & (rr < T + H) & (cc >= H) & (cc < T + H)
        crow, ccol = rr[core], cc[core]

        def rect(a, dy0, dy1, dx0, dx1):
            return (
                a[crow + dy1 + 1, ccol + dx1 + 1]
                - a[crow + dy0, ccol + dx1 + 1]
                - a[crow + dy1 + 1, ccol + dx0]
                + a[crow + dy0, ccol + dx0]
            )

        out = {"row": crow + r0, "col": ccol + c0}
        for p, rects in rect_sets.items():
            n = s = s2 = 0.0
            for rc in rects:
                n = n + rect(im, *rc)
                s = s + rect(iz, *rc)
                s2 = s2 + rect(iz2, *rc)
            out[f"{p}n"] = np.rint(n).astype("int64")
            out[f"{p}sum"] = s
            out[f"{p}sumsq"] = s2
        return pd.DataFrame(out)

    schema = "row long, col long, " + ", ".join(
        f"{p}n long, {p}sum double, {p}sumsq double" for p in prefixes
    )
    return e2.groupBy("tr", "tc").applyInPandas(
        lambda key, pdf: kernel(pdf), schema=schema
    )


def _full_stats(cells, m, out_prefix, tiled, tile=256):
    """Full-(2m+1)-window stats: offset scatter at small m, integral-image
    tiles at large m. The 'auto' crossover is calibrated from the bench
    radius sweep (512^2 cells, local[32]): scatter cost grows with the
    (2m+1)^2 shuffled rows/cell (r10 = 441/cell = 1.5 s) while the tiled
    path is ~flat (~2.5 s job overhead, r10 = 2.6 s, r40 = 1.2 s) — they
    cross near m ~= 13 (~700 rows/cell). Larger grids amortize the tiled
    overhead and move the crossover lower, so 'auto' at m > 12 is the
    conservative choice for the small-grid end; callers at cluster scale
    pass tiled=True explicitly."""
    if tiled is True or (tiled == "auto" and m > 12):
        return window_stats_tiled(cells, {out_prefix: _rects_full(m)}, tile=tile)
    return _window_stats(cells, _full_offsets(m), out_prefix=out_prefix)


def _pane_offsets(m: int):
    """The 4 directional pane offset sets of max_anisotropy_dev.rs."""
    mpr = (2 * m + 1) // 6
    ns = [(dy, dx) for dy in range(-m, m + 1) for dx in range(-mpr, mpr + 1)]
    ew = [(dy, dx) for dy in range(-mpr, mpr + 1) for dx in range(-m, m + 1)]
    center = [(dy, dx) for dy in range(-mpr, mpr + 1) for dx in range(-mpr, mpr + 1)]
    ne = (
        [(dy, dx) for dy in range(-m, -mpr) for dx in range(mpr + 1, m + 1)]
        + center
        + [(dy, dx) for dy in range(mpr + 1, m + 1) for dx in range(-m, -mpr)]
    )
    nw = (
        [(dy, dx) for dy in range(-m, -mpr) for dx in range(-m, -mpr)]
        + center
        + [(dy, dx) for dy in range(mpr + 1, m + 1) for dx in range(mpr + 1, m + 1)]
    )
    return {"ns": ns, "ew": ew, "ne": ne, "nw": nw}


def _dev_expr(prefix: str):
    n = F.col(f"{prefix}n")
    s = F.col(f"{prefix}sum")
    s2 = F.col(f"{prefix}sumsq")
    v = (s2 - (s * s) / n) / n
    mean = s / n
    return (
        F.when((n > 3) & (v > 0.0), (F.col("value") - mean) / F.sqrt(v)),
        v,
        n,
    )


def max_difference_from_mean(
    cells: DataFrame, *, scales=(2, 3, 4), tiled="auto", tile=256
) -> DataFrame:
    """-> (row, col, magnitude, scale): diff = z - window mean, argmax
    |diff| across (2m+1) windows, smallest scale on ties."""
    parts = []
    for m in scales:
        st = _full_stats(cells, m, "w", tiled, tile)
        src = cells.filter(F.col("value").isNotNull()).join(st, ["row", "col"])
        diff = F.col("value") - F.col("wsum") / F.col("wn")
        parts.append(
            src.select(
                "row", "col", diff.alias("d"), F.lit(int(m)).alias("scale")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pick = u.groupBy("row", "col").agg(
        F.max(
            F.struct(
                F.abs("d").alias("a"), (-F.col("scale")).alias("ns"),
                F.col("d").alias("d"), F.col("scale").alias("scale"),
            )
        ).alias("w")
    )
    return pick.select(
        "row", "col", F.col("w.d").alias("magnitude"),
        F.col("w.scale").cast("long").alias("scale"),
    )


def multiscale_elev_percentile(cells: DataFrame, *, scales=(2, 3, 4)) -> DataFrame:
    """-> (row, col, magnitude, scale): EP per (2m+1) window, argmax
    |EP - 50| (first/smallest scale keeps ties)."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    parts = []
    for m in scales:
        offs = _full_offsets(m)
        sc = (
            src.crossJoin(_offsets_df(spark, offs))
            .select(
                (F.col("row") - F.col("dy")).alias("row"),
                (F.col("col") - F.col("dx")).alias("col"),
                F.col("value").alias("nz"),
            )
        )
        j = src.join(sc, ["row", "col"]).groupBy("row", "col").agg(
            (
                F.sum(F.when(F.col("nz") < F.col("value"), 1.0).otherwise(0.0))
                / F.count(F.lit(1)) * 100.0
            ).alias("ep")
        )
        parts.append(j.select("row", "col", "ep", F.lit(int(m)).alias("scale")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pick = u.groupBy("row", "col").agg(
        F.max(
            F.struct(
                F.abs(F.col("ep") - 50.0).alias("a"), (-F.col("scale")).alias("ns"),
                F.col("ep").alias("ep"), F.col("scale").alias("scale"),
            )
        ).alias("w")
    )
    return pick.select(
        "row", "col", F.col("w.ep").alias("magnitude"),
        F.col("w.scale").cast("long").alias("scale"),
    )


def _anisotropy_per_scale(
    cells: DataFrame, m: int, tiled="auto", tile=256
) -> DataFrame:
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    st = src.agg(
        F.min("row").alias("r0"), F.max("row").alias("r1"),
        F.min("col").alias("c0"), F.max("col").alias("c1"),
    ).collect()[0]
    panes = _pane_offsets(m)
    if tiled is True or (tiled == "auto" and m > 7):
        # full window + all 4 panes from ONE tiling pass (5 stat triples)
        rect_sets = {"w": _rects_full(m), **_rects_panes(m)}
        j = src.join(window_stats_tiled(cells, rect_sets, tile=tile), ["row", "col"])
        # n = 0 panes must read as "no stats" like the scatter's missing row
        for key in panes:
            for suffix in ("sum", "sumsq"):
                j = j.withColumn(
                    f"{key}{suffix}",
                    F.when(F.col(f"{key}n") > 0, F.col(f"{key}{suffix}")),
                )
    else:
        full = _window_stats(cells, _full_offsets(m), out_prefix="w")
        j = src.join(full, ["row", "col"])
        for key, offs in panes.items():
            j = j.join(
                _window_stats(cells, offs, out_prefix=key), ["row", "col"], "left"
            )
    dev0, v0, n0 = _dev_expr("w")
    j = j.withColumn("dev0", dev0).filter(F.col("dev0").isNotNull())
    # the reference's edge restriction: full window inside the data extent
    j = j.filter(
        (F.col("row") - m >= st.r0) & (F.col("row") + m <= st.r1)
        & (F.col("col") - m >= st.c0) & (F.col("col") + m <= st.c1)
    )
    sq_terms = []
    valid_terms = []
    for key in panes:
        d, v, n = _dev_expr(key)
        pane_dev = F.when(d.isNotNull(), d - F.col("dev0"))
        sq_terms.append(F.coalesce(pane_dev * pane_dev, F.lit(0.0)))
        valid_terms.append(F.when(d.isNotNull(), 1.0).otherwise(0.0))
    total_sq = sq_terms[0]
    for t in sq_terms[1:]:
        total_sq = total_sq + t
    nvalid = valid_terms[0]
    for t in valid_terms[1:]:
        nvalid = nvalid + t
    return j.select(
        "row", "col",
        F.when(nvalid > 0.0, F.sqrt(total_sq / nvalid)).alias("aniso"),
        F.lit(int(m)).alias("scale"),
    ).filter(F.col("aniso").isNotNull())


def max_anisotropy_dev(
    cells: DataFrame, *, scales=(2, 3, 4), tiled="auto", tile=256
) -> DataFrame:
    """-> (row, col, magnitude, scale)."""
    parts = [_anisotropy_per_scale(cells, m, tiled, tile) for m in scales]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pick = u.groupBy("row", "col").agg(
        F.max(
            F.struct(
                (F.col("aniso") * F.col("aniso")).alias("a"),
                (-F.col("scale")).alias("ns"),
                F.col("aniso").alias("aniso"), F.col("scale").alias("scale"),
            )
        ).alias("w")
    )
    return pick.select(
        "row", "col", F.col("w.aniso").alias("magnitude"),
        F.col("w.scale").cast("long").alias("scale"),
    )


def _normals(cells: DataFrame, grid: GridSpec) -> DataFrame:
    """-> (row, col, na, nb, nc): multiscale_roughness.rs:295-345 normals
    with center-z fallback for missing neighbors."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offs = spark.createDataFrame(
        [(i, D8_DX[i], D8_DY[i]) for i in range(8)], "i int, dx int, dy int"
    )
    sc = (
        src.crossJoin(F.broadcast(offs))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "i",
            F.col("value").alias("nz"),
        )
        .groupBy("row", "col")
        .agg(*[F.max(F.when(F.col("i") == i, F.col("nz"))).alias(f"v{i}") for i in range(8)])
    )
    g = src.join(sc, ["row", "col"], "left")
    v = [F.coalesce(F.col(f"v{i}"), F.col("value")) for i in range(8)]
    a = -(v[2] - v[4] + 2.0 * (v[1] - v[5]) + v[0] - v[6])
    b = -(v[6] - v[4] + 2.0 * (v[7] - v[3]) + v[0] - v[2])
    return g.select(
        "row", "col", "value",
        a.alias("na"), b.alias("nb"), F.lit(8.0 * grid.res_x).alias("nc"),
    )


def _roughness_per_scale(
    cells: DataFrame, grid: GridSpec, m: int, tiled="auto", tile=256
) -> DataFrame:
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    # (2m+1) box mean smoothing over valid cells
    st = _full_stats(cells, m, "w", tiled, tile)
    smoothed = src.join(st, ["row", "col"]).select(
        "row", "col", (F.col("wsum") / F.col("wn")).alias("value")
    )
    n_raw = _normals(src, grid).select(
        "row", "col",
        F.col("na").alias("a1"), F.col("nb").alias("b1"), F.col("nc").alias("c1"),
    )
    n_sm = _normals(smoothed, grid).select(
        "row", "col",
        F.col("na").alias("a2"), F.col("nb").alias("b2"), F.col("nc").alias("c2"),
    )
    dot = F.col("a1") * F.col("a2") + F.col("b1") * F.col("b2") + F.col("c1") * F.col("c2")
    mag = F.sqrt(
        (F.col("a1") * F.col("a1") + F.col("b1") * F.col("b1") + F.col("c1") * F.col("c1"))
        * (F.col("a2") * F.col("a2") + F.col("b2") * F.col("b2") + F.col("c2") * F.col("c2"))
    )
    cosang = F.least(F.greatest(dot / mag, F.lit(-1.0)), F.lit(1.0))
    diff = n_raw.join(n_sm, ["row", "col"]).select(
        "row", "col", (F.degrees(F.acos(cosang))).alias("value")
    )
    rough = _full_stats(diff, m, "r", tiled, tile)
    return src.join(rough, ["row", "col"]).select(
        "row", "col",
        (F.col("rsum") / F.col("rn")).alias("rough"),
        F.lit(int(m)).alias("scale"),
    )


def multiscale_roughness(
    cells: DataFrame, grid: GridSpec, *, scales=(2, 3, 4), tiled="auto", tile=256
) -> DataFrame:
    """-> (row, col, magnitude, scale)."""
    parts = [_roughness_per_scale(cells, grid, m, tiled, tile) for m in scales]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pick = u.groupBy("row", "col").agg(
        F.max(
            F.struct(
                F.col("rough").alias("a"), (-F.col("scale")).alias("ns"),
                F.col("rough").alias("rough"), F.col("scale").alias("scale"),
            )
        ).alias("w")
    )
    return pick.select(
        "row", "col", F.col("w.rough").alias("magnitude"),
        F.col("w.scale").cast("long").alias("scale"),
    )


def mtpi_image(
    local_dev: DataFrame, meso_dev: DataFrame, broad_dev: DataFrame,
    *, cutoff: float = 1.2,
) -> DataFrame:
    """MultiscaleTopographicPositionImage: three DEVmax magnitude rasters
    -> (row, col, red, green, blue) with the logistic byte mapping."""
    def byte(col):
        val = F.floor(512.0 / (1.0 + F.exp(-cutoff * F.abs(col)))) - 256.0
        return F.least(F.greatest(val, F.lit(0.0)), F.lit(255.0)).cast("long")

    b = local_dev.select("row", "col", F.col("magnitude").alias("lv"))
    g = meso_dev.select("row", "col", F.col("magnitude").alias("mv"))
    r = broad_dev.select("row", "col", F.col("magnitude").alias("bv"))
    return (
        b.join(g, ["row", "col"]).join(r, ["row", "col"])
        .select(
            "row", "col",
            byte(F.col("bv")).alias("red"),
            byte(F.col("mv")).alias("green"),
            byte(F.col("lv")).alias("blue"),
        )
    )


def signature_at_points(
    per_scale: DataFrame, points: DataFrame
) -> DataFrame:
    """Signature variant shared by MaxElevDevSignature /
    MaxAnisotropyDevSignature / MultiscaleRoughnessSignature: sample the
    per-scale raster values at point cells. per_scale: (row, col, value,
    scale); points: (point_id, row, col). -> (point_id, scale, value)."""
    return points.join(per_scale, ["row", "col"]).select(
        "point_id", "scale", "value"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------
def _members_sql(source_sql: str, m: int, offsets=None) -> str:
    cond = (
        f"abs(b.row - a.row) <= {m} AND abs(b.col - a.col) <= {m}"
        if offsets is None
        else "(b.row - a.row, b.col - a.col) IN ("
        + ", ".join(f"({dy},{dx})" for dy, dx in offsets)
        + ")"
    )
    return f"""
cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
mem AS (SELECT a.row, a.col, a.value, b.value AS nz
        FROM cells a JOIN cells b ON {cond})
"""


def max_diff_from_mean_oracle_sql(source_sql: str, *, scales=(2, 3, 4)) -> str:
    unions = "\nUNION ALL\n".join(
        f"""SELECT row, col, any_value(value) - avg(nz) AS d, {int(m)} AS scale
FROM (WITH {_members_sql(source_sql, m)} SELECT * FROM mem) GROUP BY row, col"""
        for m in scales
    )
    return f"""
WITH u AS ({unions}),
pick AS (SELECT row, col,
         max(struct_pack(a := abs(d), ns := -scale, d := d, scale := scale)) AS w
         FROM u GROUP BY row, col)
SELECT row, col, round((w).d, 6) AS magnitude, CAST((w).scale AS BIGINT) AS scale
FROM pick
"""


def multiscale_ep_oracle_sql(source_sql: str, *, scales=(2, 3, 4)) -> str:
    unions = "\nUNION ALL\n".join(
        f"""SELECT row, col,
       SUM(CASE WHEN nz < value THEN 1.0 ELSE 0.0 END) / count(*) * 100.0 AS ep,
       {int(m)} AS scale
FROM (WITH {_members_sql(source_sql, m)} SELECT * FROM mem) GROUP BY row, col, value"""
        for m in scales
    )
    return f"""
WITH u AS ({unions}),
pick AS (SELECT row, col,
         max(struct_pack(a := abs(ep - 50.0), ns := -scale, ep := ep, scale := scale)) AS w
         FROM u GROUP BY row, col)
SELECT row, col, round((w).ep, 6) AS magnitude, CAST((w).scale AS BIGINT) AS scale
FROM pick
"""


def max_anisotropy_dev_oracle_sql(source_sql: str, *, scales=(2, 3, 4)) -> str:
    per_scale = []
    for m in scales:
        panes = _pane_offsets(m)
        pane_sel = []
        for key, offs in panes.items():
            inlist = ", ".join(f"({dy},{dx})" for dy, dx in offs)
            pane_sel.append(f"""
{key} AS (
  SELECT a.row, a.col,
         count(*) AS n, SUM(b.value) AS s, SUM(b.value * b.value) AS s2
  FROM cells a JOIN cells b
    ON (b.row - a.row, b.col - a.col) IN ({inlist})
  GROUP BY a.row, a.col
)""")
        dev = lambda p: (  # noqa: E731
            f"CASE WHEN {p}.n > 3 AND ({p}.s2 - {p}.s * {p}.s / {p}.n) / {p}.n > 0 "
            f"THEN (c.value - {p}.s / {p}.n) / sqrt(({p}.s2 - {p}.s * {p}.s / {p}.n) / {p}.n) END"
        )
        pane_dev_cols = ",\n".join(
            f"       ({dev(k)}) - dev0 AS d_{k}" for k in panes
        )
        per_scale.append(f"""
SELECT row, col, sqrt((coalesce(d_ns*d_ns,0) + coalesce(d_ew*d_ew,0)
                     + coalesce(d_ne*d_ne,0) + coalesce(d_nw*d_nw,0))
       / (CASE WHEN d_ns IS NULL THEN 0 ELSE 1 END + CASE WHEN d_ew IS NULL THEN 0 ELSE 1 END
        + CASE WHEN d_ne IS NULL THEN 0 ELSE 1 END + CASE WHEN d_nw IS NULL THEN 0 ELSE 1 END)) AS aniso,
       {int(m)} AS scale
FROM (
  WITH cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
  bnd AS (SELECT min(row) AS r0, max(row) AS r1, min(col) AS c0, max(col) AS c1 FROM cells),
  w AS (
    SELECT a.row, a.col, count(*) AS n, SUM(b.value) AS s, SUM(b.value * b.value) AS s2
    FROM cells a JOIN cells b ON abs(b.row - a.row) <= {m} AND abs(b.col - a.col) <= {m}
    GROUP BY a.row, a.col
  ),
  {", ".join(s.strip() for s in pane_sel)}
  SELECT c.row, c.col,
         ({dev('w')}) AS dev0,
{pane_dev_cols}
  FROM cells c
  JOIN w ON w.row = c.row AND w.col = c.col
  CROSS JOIN bnd
  LEFT JOIN ns ON ns.row = c.row AND ns.col = c.col
  LEFT JOIN ew ON ew.row = c.row AND ew.col = c.col
  LEFT JOIN ne ON ne.row = c.row AND ne.col = c.col
  LEFT JOIN nw ON nw.row = c.row AND nw.col = c.col
  WHERE c.row - {m} >= bnd.r0 AND c.row + {m} <= bnd.r1
    AND c.col - {m} >= bnd.c0 AND c.col + {m} <= bnd.c1
)
WHERE dev0 IS NOT NULL
  AND (CASE WHEN d_ns IS NULL THEN 0 ELSE 1 END + CASE WHEN d_ew IS NULL THEN 0 ELSE 1 END
     + CASE WHEN d_ne IS NULL THEN 0 ELSE 1 END + CASE WHEN d_nw IS NULL THEN 0 ELSE 1 END) > 0""")
    unions = "\nUNION ALL\n".join(per_scale)
    return f"""
WITH u AS ({unions}),
pick AS (SELECT row, col,
         max(struct_pack(a := aniso * aniso, ns := -scale, aniso := aniso, scale := scale)) AS w
         FROM u GROUP BY row, col)
SELECT row, col, round((w).aniso, 6) AS magnitude, CAST((w).scale AS BIGINT) AS scale
FROM pick
"""


def multiscale_roughness_oracle_sql(
    source_sql: str, grid: GridSpec, *, scales=(2, 3, 4)
) -> str:
    dirs = ", ".join(
        f"({i}, {D8_DX[i]}, {D8_DY[i]})" for i in range(8)
    )
    res8 = 8.0 * grid.res_x

    def normals_cte(src: str, name: str) -> str:
        vs = ",\n".join(
            f"         max(CASE WHEN d.i = {i} THEN n.value END) AS v{i}"
            for i in range(8)
        )
        return f"""
{name}_nb AS (
  SELECT c.row, c.col, any_value(c.value) AS z,
{vs}
  FROM {src} c
  CROSS JOIN (VALUES {dirs}) d(i, dx, dy)
  LEFT JOIN {src} n ON n.row = c.row + d.dy AND n.col = c.col + d.dx
  GROUP BY c.row, c.col
),
{name} AS (
  SELECT row, col,
         -( coalesce(v2, z) - coalesce(v4, z) + 2.0 * (coalesce(v1, z) - coalesce(v5, z))
          + coalesce(v0, z) - coalesce(v6, z)) AS na,
         -( coalesce(v6, z) - coalesce(v4, z) + 2.0 * (coalesce(v7, z) - coalesce(v3, z))
          + coalesce(v0, z) - coalesce(v2, z)) AS nb,
         {res8!r} AS nc
  FROM {name}_nb
)"""

    per_scale = []
    for m in scales:
        per_scale.append(f"""
SELECT row, col, rough, {int(m)} AS scale FROM (
  WITH cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
  sm AS (
    SELECT a.row, a.col, SUM(b.value) / count(*) AS value
    FROM cells a JOIN cells b ON abs(b.row - a.row) <= {m} AND abs(b.col - a.col) <= {m}
    GROUP BY a.row, a.col
  ),
  {normals_cte('cells', 'n1').lstrip()},
  {normals_cte('sm', 'n2').lstrip()},
  diff AS (
    SELECT a.row, a.col,
           degrees(acos(least(greatest(
             (a.na * b.na + a.nb * b.nb + a.nc * b.nc)
             / sqrt((a.na * a.na + a.nb * a.nb + a.nc * a.nc)
                  * (b.na * b.na + b.nb * b.nb + b.nc * b.nc)), -1.0), 1.0))) AS value
    FROM n1 a JOIN n2 b ON a.row = b.row AND a.col = b.col
  )
  SELECT a.row, a.col, SUM(b.value) / count(*) AS rough
  FROM cells a JOIN diff b ON abs(b.row - a.row) <= {m} AND abs(b.col - a.col) <= {m}
  GROUP BY a.row, a.col
)""")
    unions = "\nUNION ALL\n".join(per_scale)
    return f"""
WITH u AS ({unions}),
pick AS (SELECT row, col,
         max(struct_pack(a := rough, ns := -scale, rough := rough, scale := scale)) AS w
         FROM u GROUP BY row, col)
SELECT row, col, round((w).rough, 6) AS magnitude, CAST((w).scale AS BIGINT) AS scale
FROM pick
"""


def _quirk_gaussian_offsets(filter_size: int):
    """The ANVAD/SSDN gaussian smoothing table
    (terrain_analysis/average_normal_vector_angular_deviation.rs:256-306,
    spherical_std_dev_of_normals.rs same block): sigma = (midpoint+0.5)/3;
    support radius from the 0.001 weight cutoff; offsets are built with
    midpoint_smoothed = floor(fs_smooth/2) + 1 over a filter_size^2 loop —
    the reference's asymmetric window is mirrored verbatim."""
    if filter_size % 2 == 0:
        filter_size += 1
    midpoint = filter_size // 2
    sigma = max((midpoint + 0.5) / 3.0, 1.0)
    if sigma >= 1.8:
        raise ValueError(
            "filter sizes >= 11 switch the reference to fast-almost-gaussian "
            "smoothing; use fast_almost_gaussian_filter for those"
        )
    recip = 1.0 / (math.sqrt(2.0 * math.pi) * sigma)
    two_sig2 = 2.0 * sigma * sigma
    fs_smooth = 0
    for i in range(250):
        if recip * math.exp(-(i * i) / two_sig2) <= 0.001:
            fs_smooth = i * 2 + 1
            break
    if fs_smooth % 2 == 0:
        fs_smooth += 1
    fs_smooth = max(fs_smooth, 3)
    mps = fs_smooth // 2 + 1
    out = []
    for r in range(filter_size):
        for c in range(filter_size):
            x, y = c - mps, r - mps
            w = recip * math.exp(-(x * x + y * y) / two_sig2)
            out.append((y, x, w))
    return midpoint, out


def _quirk_gaussian_smooth(cells: DataFrame, filter_size: int) -> DataFrame:
    spark = cells.sparkSession
    _mid, offs = _quirk_gaussian_offsets(filter_size)
    odf = F.broadcast(
        spark.createDataFrame(offs, "dy int, dx int, w double")
    )
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    sc = (
        src.crossJoin(odf)
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            (F.col("w") * F.col("value")).alias("wz"),
            F.col("w").alias("w"),
        )
        .groupBy("row", "col")
        .agg(F.sum("wz").alias("swz"), F.sum("w").alias("sw"))
    )
    return src.join(sc, ["row", "col"]).select(
        "row", "col", (F.col("swz") / F.col("sw")).alias("value")
    )


def _quirk_gaussian_smooth_sql(source_sql: str, filter_size: int) -> str:
    _mid, offs = _quirk_gaussian_offsets(filter_size)
    vals = ", ".join(f"({dy},{dx},{w!r})" for dy, dx, w in offs)
    return f"""
SELECT a.row, a.col, SUM(o.w * b.value) / SUM(o.w) AS value
FROM (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL) a
CROSS JOIN (VALUES {vals}) o(dy, dx, w)
JOIN (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL) b
  ON b.row = a.row + o.dy AND b.col = a.col + o.dx
GROUP BY a.row, a.col
"""


def average_normal_vector_angular_deviation(
    cells: DataFrame, grid: GridSpec, *, filter_size: int = 9
) -> DataFrame:
    """AverageNormalVectorAngularDeviation (terrain_analysis/
    average_normal_vector_angular_deviation.rs, Ko et al. 2016): angular
    deviation (degrees) between raw and gaussian-smoothed surface normals,
    box-averaged over the filter window. -> (row, col, value)."""
    midpoint = (filter_size if filter_size % 2 else filter_size + 1) // 2
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    smoothed = _quirk_gaussian_smooth(src, filter_size)
    n_raw = _normals(src, grid).select(
        "row", "col",
        F.col("na").alias("a1"), F.col("nb").alias("b1"), F.col("nc").alias("c1"),
    )
    n_sm = _normals(smoothed, grid).select(
        "row", "col",
        F.col("na").alias("a2"), F.col("nb").alias("b2"), F.col("nc").alias("c2"),
    )
    dot = F.col("a1") * F.col("a2") + F.col("b1") * F.col("b2") + F.col("c1") * F.col("c2")
    mag = F.sqrt(
        (F.col("a1") * F.col("a1") + F.col("b1") * F.col("b1") + F.col("c1") * F.col("c1"))
        * (F.col("a2") * F.col("a2") + F.col("b2") * F.col("b2") + F.col("c2") * F.col("c2"))
    )
    cosang = F.least(F.greatest(dot / mag, F.lit(-1.0)), F.lit(1.0))
    diff = n_raw.join(n_sm, ["row", "col"]).select(
        "row", "col", F.degrees(F.acos(cosang)).alias("value")
    )
    st = _window_stats(diff, _full_offsets(midpoint), out_prefix="r")
    return src.join(st, ["row", "col"]).select(
        "row", "col", (F.col("rsum") / F.col("rn")).alias("value")
    )


def anvad_oracle_sql(
    source_sql: str, grid: GridSpec, *, filter_size: int = 9
) -> str:
    midpoint = (filter_size if filter_size % 2 else filter_size + 1) // 2
    res8 = 8.0 * grid.res_x
    dirs = ", ".join(f"({i}, {D8_DX[i]}, {D8_DY[i]})" for i in range(8))

    def normals_cte(src: str, name: str) -> str:
        vs = ",\n".join(
            f"         max(CASE WHEN d.i = {i} THEN n.value END) AS v{i}"
            for i in range(8)
        )
        return f"""
{name}_nb AS (
  SELECT c.row, c.col, any_value(c.value) AS z,
{vs}
  FROM {src} c
  CROSS JOIN (VALUES {dirs}) d(i, dx, dy)
  LEFT JOIN {src} n ON n.row = c.row + d.dy AND n.col = c.col + d.dx
  GROUP BY c.row, c.col
),
{name} AS (
  SELECT row, col,
         -( coalesce(v2, z) - coalesce(v4, z) + 2.0 * (coalesce(v1, z) - coalesce(v5, z))
          + coalesce(v0, z) - coalesce(v6, z)) AS na,
         -( coalesce(v6, z) - coalesce(v4, z) + 2.0 * (coalesce(v7, z) - coalesce(v3, z))
          + coalesce(v0, z) - coalesce(v2, z)) AS nb,
         {res8!r} AS nc
  FROM {name}_nb
)"""

    return f"""
WITH cells AS MATERIALIZED (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
sm AS MATERIALIZED ({_quirk_gaussian_smooth_sql(source_sql, filter_size)}),
{normals_cte('cells', 'n1').lstrip()},
{normals_cte('sm', 'n2').lstrip()},
diff AS (
  SELECT a.row, a.col,
         degrees(acos(least(greatest(
           (a.na * b.na + a.nb * b.nb + a.nc * b.nc)
           / sqrt((a.na * a.na + a.nb * a.nb + a.nc * a.nc)
                * (b.na * b.na + b.nb * b.nb + b.nc * b.nc)), -1.0), 1.0))) AS value
  FROM n1 a JOIN n2 b ON a.row = b.row AND a.col = b.col
)
SELECT a.row, a.col, SUM(b.value) / count(*) AS value
FROM cells a JOIN diff b
  ON abs(b.row - a.row) <= {midpoint} AND abs(b.col - a.col) <= {midpoint}
GROUP BY a.row, a.col
"""


def spherical_std_dev_of_normals(
    cells: DataFrame, grid: GridSpec, *, filter_size: int = 9
) -> DataFrame:
    """SphericalStdDevOfNormals (terrain_analysis/
    spherical_std_dev_of_normals.rs:520-710, Lindsay et al. 2019):
    gaussian-smooth, unit normals ((-fx,-fy,1)/|.|, fx=(...)/8resx), box
    sums of the components, s = sqrt(-2 ln(R/N)) degrees."""
    midpoint = (filter_size if filter_size % 2 else filter_size + 1) // 2
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    smoothed = _quirk_gaussian_smooth(src, filter_size)
    g = _normals(smoothed, grid)
    fx = -F.col("na") / F.lit(8.0 * grid.res_x)
    fy = -F.col("nb") / F.lit(8.0 * grid.res_y)
    # _normals returns a = -(...), b = -(...); the SSDN fx has no leading
    # minus, so undo it here
    mag = F.sqrt(fx * fx + fy * fy + 1.0)
    flat = (fx == 0.0) & (fy == 0.0)
    comp = g.select(
        "row", "col",
        F.when(flat, 0.0).otherwise(-fx / mag).alias("ux"),
        F.when(flat, 0.0).otherwise(-fy / mag).alias("uy"),
        F.when(flat, 1.0).otherwise(1.0 / mag).alias("uz"),
    )
    spark = cells.sparkSession
    offs = _offsets_df(spark, _full_offsets(midpoint))
    sc = (
        comp.crossJoin(offs)
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "ux", "uy", "uz",
        )
        .groupBy("row", "col")
        .agg(
            F.sum("ux").alias("sx"), F.sum("uy").alias("sy"),
            F.sum("uz").alias("sz"), F.count(F.lit(1)).alias("n"),
        )
    )
    mean = F.least(
        F.sqrt(F.col("sx") * F.col("sx") + F.col("sy") * F.col("sy") + F.col("sz") * F.col("sz"))
        / F.col("n"),
        F.lit(1.0),
    )
    # output domain = cells with a smoothed value (the reference leaves
    # cells whose quirk-gaussian window found no valid neighbor as nodata)
    return comp.select("row", "col").join(sc, ["row", "col"]).select(
        "row", "col",
        F.degrees(F.sqrt(-2.0 * F.log(mean))).alias("value"),
    )


def ssdn_oracle_sql(
    source_sql: str, grid: GridSpec, *, filter_size: int = 9
) -> str:
    midpoint = (filter_size if filter_size % 2 else filter_size + 1) // 2
    dirs = ", ".join(f"({i}, {D8_DX[i]}, {D8_DY[i]})" for i in range(8))
    vs = ",\n".join(
        f"         max(CASE WHEN d.i = {i} THEN n.value END) AS v{i}"
        for i in range(8)
    )
    return f"""
WITH sm AS MATERIALIZED ({_quirk_gaussian_smooth_sql(source_sql, filter_size)}),
nb AS (
  SELECT c.row, c.col, any_value(c.value) AS z,
{vs}
  FROM sm c
  CROSS JOIN (VALUES {dirs}) d(i, dx, dy)
  LEFT JOIN sm n ON n.row = c.row + d.dy AND n.col = c.col + d.dx
  GROUP BY c.row, c.col
),
comp AS (
  SELECT row, col,
         CASE WHEN fx = 0.0 AND fy = 0.0 THEN 0.0
              ELSE -fx / sqrt(fx * fx + fy * fy + 1.0) END AS ux,
         CASE WHEN fx = 0.0 AND fy = 0.0 THEN 0.0
              ELSE -fy / sqrt(fx * fx + fy * fy + 1.0) END AS uy,
         CASE WHEN fx = 0.0 AND fy = 0.0 THEN 1.0
              ELSE 1.0 / sqrt(fx * fx + fy * fy + 1.0) END AS uz
  FROM (
    SELECT row, col,
           (coalesce(v2, z) - coalesce(v4, z) + 2.0 * (coalesce(v1, z) - coalesce(v5, z))
          + coalesce(v0, z) - coalesce(v6, z)) / {8.0 * grid.res_x!r} AS fx,
           (coalesce(v6, z) - coalesce(v4, z) + 2.0 * (coalesce(v7, z) - coalesce(v3, z))
          + coalesce(v0, z) - coalesce(v2, z)) / {8.0 * grid.res_y!r} AS fy
    FROM nb
  )
)
SELECT a.row, a.col,
       degrees(sqrt(-2.0 * ln(least(
         sqrt(SUM(b.ux) * SUM(b.ux) + SUM(b.uy) * SUM(b.uy) + SUM(b.uz) * SUM(b.uz))
         / count(*), 1.0)))) AS value
FROM comp a JOIN comp b
  ON abs(b.row - a.row) <= {midpoint} AND abs(b.col - a.col) <= {midpoint}
GROUP BY a.row, a.col
"""


def multiscale_std_dev_normals(
    cells: DataFrame, grid: GridSpec, *, filters=(5, 7, 9)
) -> DataFrame:
    """MultiscaleStdDevNormals (terrain_analysis/
    multiscale_std_dev_normals.rs): SphericalStdDevOfNormals swept across
    filter scales, per-cell argmax magnitude + winning scale (this engine
    sweeps the gaussian-branch filter sizes; the reference's large-filter
    branch swaps in a fast-almost-gaussian smoother)."""
    parts = []
    for fs in filters:
        parts.append(
            spherical_std_dev_of_normals(cells, grid, filter_size=fs).select(
                "row", "col", F.col("value").alias("s"),
                F.lit(int(fs)).alias("scale"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # 9-dp quantized comparator: SSDN magnitudes differ at ulp level
    # between engines (summation order), which would flip near-tie argmaxes
    pick = u.groupBy("row", "col").agg(
        F.max(
            F.struct(
                F.round(F.col("s"), 9).alias("a"), (-F.col("scale")).alias("ns"),
                F.col("s").alias("s"), F.col("scale").alias("scale"),
            )
        ).alias("w")
    )
    return pick.select(
        "row", "col", F.col("w.s").alias("magnitude"),
        F.col("w.scale").cast("long").alias("scale"),
    )


def msdn_oracle_sql(source_sql: str, grid: GridSpec, *, filters=(5, 7, 9)) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT row, col, value AS s, {int(fs)} AS scale FROM ("
        + ssdn_oracle_sql(source_sql, grid, filter_size=fs)
        + ") t"
        for fs in filters
    )
    return f"""
WITH u AS ({unions}),
pick AS (SELECT row, col,
         max(struct_pack(a := round(s, 9), ns := -scale, s := s, scale := scale)) AS w
         FROM u GROUP BY row, col)
SELECT row, col, round((w).s, 6) AS magnitude, CAST((w).scale AS BIGINT) AS scale
FROM pick
"""


# ---------------------------------------------------------------------------
# gaussian_scale_space plugin
# ---------------------------------------------------------------------------
def _gss_scales(sigma_i: float, step: float, num_steps: int):
    """Admissible (sigma, sigma_actual, buffer, fast_params) per scale
    (gaussian_scale_space main.rs:429-437, 565-586, 656-661): sigma < 0.5
    collapses to 0; scales that discretize to the previous sigma_actual
    are skipped; sigma >= 3 uses the 6-box fast-gaussian whose actual
    sigma comes from the integer box widths."""
    out = []
    sigma_prev = -1.0
    for s in range(num_steps):
        sigma = sigma_i + step * s
        if sigma < 0.5:
            sigma = 0.0
        sigma_actual = sigma
        fast = None
        buffer = 0
        filter_size = 0
        if sigma == 0.0:
            pass
        elif sigma < 3.0:
            pass
        else:
            n = 6
            w_ideal = math.sqrt(12.0 * sigma * sigma / n + 1.0)
            wl = int(math.floor(w_ideal))
            if wl % 2 == 0:
                wl -= 1
            wu = wl + 2
            filter_size = wu
            m = int(round(
                (12.0 * sigma * sigma - n * wl * wl - 4 * n * wl - 3 * n)
                / (-4.0 * wl - 4.0)
            ))
            sigma_actual = math.sqrt((m * wl * wl + (n - m) * wu * wu - n) / 12.0)
            fast = (n, m, wl, wu)
            buffer = filter_size + 1
        if sigma_actual == sigma_prev:
            continue
        out.append(dict(sigma=sigma, sigma_actual=sigma_actual, fast=fast, buffer=buffer))
        sigma_prev = sigma_actual
    return out


def _gauss_weights(sigma: float):
    """Standard-gaussian kernel (main.rs:471-520): 0.001 cutoff radius,
    row-major (dy, dx) order, normalized."""
    rr = 1.0 / (math.sqrt(2.0 * math.pi) * sigma)
    ts = 2.0 * sigma * sigma
    filter_size = 0
    for i in range(250):
        if rr * math.exp(-(i * i) / ts) <= 0.001:
            filter_size = i * 2 + 1
            break
    if filter_size % 2 == 0:
        filter_size += 1
    if filter_size < 3:
        filter_size = 3
    mid = int(math.floor(filter_size / 2.0))
    ws = []
    g_sum = 0.0
    for r in range(filter_size):
        for c in range(filter_size):
            x, y = c - mid, r - mid
            w = rr * math.exp(-(x * x + y * y) / ts)
            ws.append((len(ws), x, y, w))
            g_sum += w
    return [(n, x, y, w / g_sum) for n, x, y, w in ws]


_GSS_LSP = {
    # n0..n7 = E-start clockwise ring, n8 = center (main.rs:1193-1198)
    "slope": (
        "sqrt(POWFY * POWFY + POWFX * POWFX) * 100.0"
        .replace("POWFY", "((n6 - n4 + 2.0*(n7 - n3) + n0 - n2) / (8.0 * RES))")
        .replace("POWFX", "((n2 - n4 + 2.0*(n1 - n5) + n0 - n6) / (8.0 * RES))")
    ),
    "total_curvature": (
        "(ZXX * ZXX + 2.0 * ZXY * ZXY + ZYY * ZYY) * 100.0"
        .replace("ZXX", "((n1 - 2.0*n8 + n5) / (RES * RES))")
        .replace("ZYY", "((n7 - 2.0*n8 + n3) / (RES * RES))")
        .replace("ZXY", "((-n6 + n0 + n4 - n2) / (4.0 * RES * RES))")
    ),
    "elevation": "n8",
}


def gaussian_scale_space(
    cells: DataFrame,
    grid: GridSpec,
    *,
    sigma: float = 0.5,
    step: float = 0.5,
    num_steps: int = 10,
    lsp: str = "slope",
    z_factor: float = 1.0,
) -> DataFrame:
    """gaussian_scale_space plugin (whitebox-plugins/src/
    gaussian_scale_space/main.rs:429-830, Newman et al. 2018): per scale,
    smooth the DEM (identity at sigma 0; exact gaussian kernel below
    sigma 3 — a deterministic left-to-right HOF fold over the row-major
    kernel order so the sum matches a serial transcription bit-for-bit;
    the 6-box fast-gaussian above, as separable running-sum prefix scans
    with the reference's clamped-index rect sums and per-iteration
    integral rebuilds), compute the 3x3 LSP inside the edge buffer,
    z-score it against the scale's own population, and keep per cell the
    scale with the maximum |z| (strictly-greater updates keep the
    earliest scale on ties). -> (row, col, v_opt, z_opt, g_opt).

    Scale shape: smoothing is prefix scans/one scatter per scale; the
    cross-scale argmax is a single union + aggregate. Scales are a small
    driver-side list (the reference's own loop)."""
    from pyspark.sql import Window as _W

    spark = cells.sparkSession
    res = grid.res_x
    lsp_expr = _GSS_LSP[lsp].replace("RES", repr(res))
    scales = _gss_scales(sigma, step, num_steps)
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    per_scale = []
    for si, sc in enumerate(scales):
        if sc["fast"] is None and sc["sigma"] == 0.0:
            sm = src
        elif sc["fast"] is None:
            ws = _gauss_weights(sc["sigma"])
            offs = spark.createDataFrame(ws, "n int, dx int, dy int, w double")
            gathered = (
                src.crossJoin(F.broadcast(offs))
                .select(
                    (F.col("row") - F.col("dy")).alias("row"),
                    (F.col("col") - F.col("dx")).alias("col"),
                    "n", "w", F.col("value").alias("zn"),
                )
                .groupBy("row", "col")
                .agg(F.sort_array(F.collect_list(F.struct("n", "w", "zn"))).alias("nb"))
            )
            sm = src.join(gathered, ["row", "col"]).select(
                "row", "col",
                F.expr(
                    "aggregate(nb, named_struct('s', cast(0.0 as double), 'z', cast(0.0 as double)), "
                    "(acc, e) -> named_struct('s', acc.s + e.w, 'z', acc.z + e.w * e.zn), "
                    "acc -> acc.z / acc.s)"
                ).alias("value"),
            )
        else:
            n_boxes, m, wl, wu = sc["fast"]
            sm = src
            for it in range(n_boxes):
                mid = int(math.floor((wl if it <= m else wu) / 2.0))
                wcol = _W.partitionBy("row").orderBy("col").rowsBetween(_W.unboundedPreceding, 0)
                wrow = _W.partitionBy("col").orderBy("row").rowsBetween(_W.unboundedPreceding, 0)
                integ = (
                    sm.withColumn("rs", F.sum("value").over(wcol))
                    .withColumn("I", F.sum("rs").over(wrow))
                    .select("row", "col", "I")
                )
                ninteg = (
                    src.withColumn("one", F.lit(1.0))
                    .withColumn("rs", F.sum("one").over(wcol))
                    .withColumn("In", F.sum("rs").over(wrow))
                    .select("row", "col", "In")
                )

                def rect(df, valcol, outcol):
                    y1 = F.greatest(F.col("row") - mid - 1, F.lit(0))
                    y2 = F.least(F.col("row") + mid, F.lit(grid.rows - 1))
                    x1 = F.greatest(F.col("col") - mid - 1, F.lit(0))
                    x2 = F.least(F.col("col") + mid, F.lit(grid.cols - 1))
                    base = src.select("row", "col").withColumn("y1", y1).withColumn("y2", y2).withColumn("x1", x1).withColumn("x2", x2)
                    j = lambda yy, xx, alias: df.select(  # noqa: E731
                        F.col("row").alias("jr"), F.col("col").alias("jc"),
                        F.col(valcol).alias(alias),
                    )
                    return (
                        base.join(j("y2", "x2", "a"), (F.col("y2") == F.col("jr")) & (F.col("x2") == F.col("jc"))).drop("jr", "jc")
                        .join(j("y1", "x2", "b"), (F.col("y1") == F.col("jr")) & (F.col("x2") == F.col("jc"))).drop("jr", "jc")
                        .join(j("y2", "x1", "c"), (F.col("y2") == F.col("jr")) & (F.col("x1") == F.col("jc"))).drop("jr", "jc")
                        .join(j("y1", "x1", "d"), (F.col("y1") == F.col("jr")) & (F.col("x1") == F.col("jc"))).drop("jr", "jc")
                        .select(
                            "row", "col",
                            (F.col("a") - F.col("b") - F.col("c") + F.col("d")).alias(outcol),
                        )
                    )

                s_ = rect(integ, "I", "S")
                n_ = rect(ninteg, "In", "N")
                sm = s_.join(n_, ["row", "col"]).select(
                    "row", "col", (F.col("S") / F.col("N")).alias("value")
                ).localCheckpoint(eager=True)
        buf = sc["buffer"]
        inner = sm.filter(
            (F.col("row") >= buf) & (F.col("row") < grid.rows - buf)
            & (F.col("col") >= buf) & (F.col("col") < grid.cols - buf)
        )
        # 3x3 gather with center substitution for missing neighbors
        ring = [(1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1)]
        offs3 = spark.createDataFrame(
            [(i, dx, dy) for i, (dx, dy) in enumerate(ring)], "n int, dx int, dy int"
        )
        g3 = (
            sm.crossJoin(F.broadcast(offs3))
            .select(
                (F.col("row") - F.col("dy")).alias("row"),
                (F.col("col") - F.col("dx")).alias("col"),
                "n", F.col("value").alias("zn"),
            )
            .groupBy("row", "col")
            .agg(*[F.max(F.when(F.col("n") == i, F.col("zn"))).alias(f"n{i}") for i in range(8)])
        )
        lspd = inner.withColumnRenamed("value", "n8").join(g3, ["row", "col"], "left")
        for i in range(8):
            lspd = lspd.withColumn(f"n{i}", F.coalesce(F.col(f"n{i}"), F.col("n8")) * F.lit(z_factor))
        lspd = lspd.withColumn("n8", F.col("n8") * F.lit(z_factor))
        lspd = lspd.select("row", "col", F.expr(lsp_expr).alias("lsp"))
        st = lspd.agg(
            F.count(F.lit(1)).alias("n"), F.sum("lsp").alias("s"), F.sum(F.col("lsp") ** 2).alias("sq")
        )
        z = (
            lspd.crossJoin(F.broadcast(st))
            .withColumn("mean", F.col("s") / F.col("n"))
            .withColumn("sd", F.sqrt(F.col("sq") / F.col("n") - F.col("mean") ** 2))
            .select(
                "row", "col", "lsp",
                ((F.col("lsp") - F.col("mean")) / F.col("sd")).alias("z"),
                F.lit(si).alias("si"),
                F.lit(sc["sigma_actual"]).alias("g"),
            )
        )
        per_scale.append(z.localCheckpoint(eager=True))
    allz = per_scale[0]
    for p in per_scale[1:]:
        allz = allz.unionByName(p)
    w = _W.partitionBy("row", "col").orderBy(F.desc(F.abs(F.col("z"))), F.asc("si"))
    return (
        allz.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("row", "col", F.col("lsp").alias("v_opt"), F.col("z").alias("z_opt"), F.col("g").alias("g_opt"))
    )
