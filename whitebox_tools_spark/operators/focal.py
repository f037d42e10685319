"""Focal / neighborhood operators (class FOC): slope, aspect, hillshade,
k x k filters over long-form cell tables.

Reference semantics (all 5x5 Florinsky windows, constants verbatim):
  - Slope: /root/reference/whitebox-tools-app/src/tools/terrain_analysis/
    slope.rs:268-331 — p, q partial derivatives (Florinsky 2016 eq., 25-cell
    window, res = (res_x + res_y)/2), slope = atan(sqrt(p^2+q^2)); nodata or
    out-of-grid neighbors take the center value (slope.rs:297-305).
  - Aspect: terrain_analysis/aspect.rs:262-295 — sign-based formula, -1 for
    flat (p == 0).
  - Hillshade: terrain_analysis/hillshade.rs:293-296,329-381 — azimuth-90
    rotation, tan_slope floor 0.00017, val*32767 clamped at 0 and rounded.
  - MeanFilter: image_analysis/mean_filter.rs — mean of non-nodata cells in
    the clamped window. (The reference's integral-image implementation drops
    row/col 0 contributions for windows touching the grid edge — a boundary
    quirk we do NOT reproduce; we use the literal window definition.)

Spark plan: neighborhood gather as ONE scatter-shuffle — each cell is
exploded over the 25 window offsets toward the target cell it serves, then
a single hash aggregate pivots the window into z0..z24 columns. The p/q and
output formulas are plain arithmetic SQL strings evaluated with F.expr —
the DuckDB oracle runs the IDENTICAL strings, so engine and oracle cannot
diverge. (A tiled mapInPandas+halo variant is the planned fast path for
large dense rasters; this gather is the semantic reference and is already
one-shuffle.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (dx, dy) in the reference's window order (slope.rs:285-291); neighbor n of
# output cell (row, col) is input cell (row + dy, col + dx); z12 = center.
OFFSETS25 = [
    (-2, -2), (-1, -2), (0, -2), (1, -2), (2, -2),
    (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
    (-2, 0), (-1, 0), (0, 0), (1, 0), (2, 0),
    (-2, 1), (-1, 1), (0, 1), (1, 1), (2, 1),
    (-2, 2), (-1, 2), (0, 2), (1, 2), (2, 2),
]

# Florinsky (2016) derivatives, transcribed from slope.rs:307-317 with the
# same grouping/order of float operations. {recip} = the Python-precomputed
# double 1.0/(420.0*res) — embedded as a literal because Spark SQL parses
# bare float literals as DECIMAL, and a constant-only decimal division
# (1.0/2100.0) truncates at ~11 digits before promotion to double. Embedding
# the exact reciprocal keeps both engines (and the Rust reference, which
# multiplies by the same reciprocal) bit-identical.
P_FORMULA = (
    "{recip} * (44.0*(z3+z23-z1-z21) + 31.0*(z0+z20-z4-z24 "
    "+ 2.0*(z8+z18-z6-z16)) + 17.0*(z14-z10+4.0*(z13-z11)) "
    "+ 5.0*(z9+z19-z5-z15))"
)
Q_FORMULA = (
    "{recip} * (44.0*(z5+z9-z15-z19) + 31.0*(z20+z24-z0-z4 "
    "+ 2.0*(z6+z8-z16-z18)) + 17.0*(z2-z22+4.0*(z7-z17)) "
    "+ 5.0*(z1+z3-z21-z23))"
)


def _recip(res: float) -> str:
    return repr(1.0 / (420.0 * res))
SLOPE_FORMULAS = {
    "degrees": "degrees(atan(sqrt(p*p + q*q)))",
    "radians": "atan(sqrt(p*p + q*q))",
    "percent": "sqrt(p*p + q*q) * 100.0",
}
ASPECT_FORMULA = (
    "CASE WHEN p <> 0.0 THEN "
    "-90.0*(1.0 - sign(q))*(1.0 - abs(sign(p))) + 180.0*(1.0 + sign(p)) "
    "- 180.0/pi() * sign(p) * acos(-q / sqrt(p*p + q*q)) "
    "ELSE -1.0 END"
)


def hillshade_formula(azimuth: float, altitude: float) -> str:
    az = math.radians(azimuth - 90.0)
    sin_t = math.sin(math.radians(altitude))
    cos_t = math.cos(math.radians(altitude))
    return (
        "round(greatest((ts/sqrt(1.0 + ts*ts)) * "
        f"({sin_t!r}/ts - {cos_t!r}*sin({az!r} - asp)), 0.0) * 32767.0)"
    ).replace(
        "ts", "greatest(sqrt(p*p + q*q), 0.00017)"
    ).replace(
        "asp",
        "(CASE WHEN p <> 0.0 THEN pi() - atan(q/p) + (pi()/2.0)*(p/abs(p)) ELSE pi() END)",
    )


def gather25(cells: DataFrame, *, z_factor: float = 1.0) -> DataFrame:
    """-> (row, col, value, z0..z24) for every non-null cell; missing/nodata
    neighbors coalesce to the center value, all scaled by z_factor
    (slope.rs:297-305). One scatter-explode + one hash aggregate."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offsets = spark.createDataFrame(
        [(n, dx, dy) for n, (dx, dy) in enumerate(OFFSETS25)], "n int, dx int, dy int"
    )
    scattered = (
        src.crossJoin(F.broadcast(offsets))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "n",
            "value",
        )
        .groupBy("row", "col")
        .agg(*[F.max(F.when(F.col("n") == i, F.col("value"))).alias(f"_z{i}") for i in range(25)])
    )
    out = src.join(scattered, ["row", "col"], "left")
    for i in range(25):
        out = out.withColumn(
            f"z{i}", F.coalesce(F.col(f"_z{i}"), F.col("value")) * F.lit(z_factor)
        )
    return out.drop(*[f"_z{i}" for i in range(25)])


def gather25_tiled(
    cells: DataFrame, *, z_factor: float = 1.0, tile: int = 256
) -> DataFrame:
    """Tiled-with-halo variant of gather25 (SURVEY 2.1 FOC idiom b) —
    BIT-IDENTICAL output.

    gather25 amplifies every cell 25x through the shuffle; at a 100-TB
    raster that is 25x shuffle volume. Here each cell is exploded only to
    the <=4 tiles whose (tile+2-halo) region contains it (duplication
    factor ~ (T+4)^2/T^2 ~ 1.03 at T=256), grouped per tile, and the 25
    window slots are gathered by a numpy kernel per dense block. The kernel
    only MOVES values (and multiplies by z_factor, same single IEEE
    multiply as the scatter path), so z0..z24 are bit-identical and every
    downstream formula (slope/aspect/hillshade/curvature) stays in the same
    JVM whole-stage-codegen expressions.
    """
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    T = tile
    tr = F.explode(
        F.sequence(F.floor((F.col("row") - 2) / T), F.floor((F.col("row") + 2) / T))
    ).alias("tr")
    e1 = src.select("row", "col", "value", tr)
    tc = F.explode(
        F.sequence(F.floor((F.col("col") - 2) / T), F.floor((F.col("col") + 2) / T))
    ).alias("tc")
    e2 = e1.select("row", "col", "value", "tr", tc)

    zf = float(z_factor)
    n_off = list(enumerate(OFFSETS25))

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        t_r = int(pdf["tr"].iloc[0])
        t_c = int(pdf["tc"].iloc[0])
        r0, c0 = t_r * T - 2, t_c * T - 2
        dense = np.full((T + 4, T + 4), np.nan)
        rr = pdf["row"].to_numpy() - r0
        cc = pdf["col"].to_numpy() - c0
        vals = pdf["value"].to_numpy()
        dense[rr, cc] = vals
        core = (rr >= 2) & (rr < T + 2) & (cc >= 2) & (cc < T + 2)
        crow, ccol, cval = rr[core], cc[core], vals[core]
        out = {
            "row": crow + r0,
            "col": ccol + c0,
            "value": cval,
        }
        for n, (dx, dy) in n_off:
            zn = dense[crow + dy, ccol + dx]
            out[f"z{n}"] = np.where(np.isnan(zn), cval, zn) * zf
        return pd.DataFrame(out)

    schema = "row long, col long, value double, " + ", ".join(
        f"z{i} double" for i in range(25)
    )
    return e2.groupBy("tr", "tc").applyInPandas(
        lambda key, pdf: kernel(pdf), schema=schema
    )


def _pq(df: DataFrame, res: float) -> DataFrame:
    return df.withColumn("p", F.expr(P_FORMULA.format(recip=_recip(res)))).withColumn(
        "q", F.expr(Q_FORMULA.format(recip=_recip(res)))
    )


def _gather(cells: DataFrame, z_factor: float, tiled: bool, tile: int) -> DataFrame:
    if tiled:
        return gather25_tiled(cells, z_factor=z_factor, tile=tile)
    return gather25(cells, z_factor=z_factor)


def slope(
    cells: DataFrame, *, res: float, z_factor: float = 1.0, units: str = "degrees",
    tiled: bool = False, tile: int = 256,
) -> DataFrame:
    g = _pq(_gather(cells, z_factor, tiled, tile), res)
    return g.select("row", "col", F.expr(SLOPE_FORMULAS[units]).alias("value"))


def aspect(
    cells: DataFrame, *, res: float, z_factor: float = 1.0,
    tiled: bool = False, tile: int = 256,
) -> DataFrame:
    g = _pq(_gather(cells, z_factor, tiled, tile), res)
    return g.select("row", "col", F.expr(ASPECT_FORMULA).alias("value"))


def hillshade(
    cells: DataFrame,
    *,
    res: float,
    azimuth: float = 315.0,
    altitude: float = 30.0,
    z_factor: float = 1.0,
    tiled: bool = False,
    tile: int = 256,
) -> DataFrame:
    g = _pq(_gather(cells, z_factor, tiled, tile), res)
    return g.select(
        "row", "col", F.expr(hillshade_formula(azimuth, altitude)).alias("value")
    )


# ---------------------------------------------------------------------------
# Curvature family (terrain_analysis/{plan,prof,tan,total,mean,gaussian,
# minimal,maximal}_curvature.rs) — same gather25 + Florinsky second
# derivatives r, s, t (plan_curvature.rs:340-356); every output formula is
# one shared SQL string evaluated identically by Spark and the DuckDB
# oracle. powi(3) is spelled X*X*X (not power()) so both engines use plain
# multiplication, bit-identical to the reference's powi.
# ---------------------------------------------------------------------------
R_FORMULA = (
    "{recip2} * (2.0*(z0+z4+z5+z9+z10+z14+z15+z19+z20+z24) "
    "- 2.0*(z2+z7+z12+z17+z22) - z1-z3-z6-z8-z11-z13-z16-z18-z21-z23)"
)
T_FORMULA = (
    "{recip2} * (2.0*(z0+z1+z2+z3+z4+z20+z21+z22+z23+z24) "
    "- 2.0*(z10+z11+z12+z13+z14) - z5-z6-z7-z8-z9-z15-z16-z17-z18-z19)"
)
S_FORMULA = (
    "{recip100} * (z8+z16-z6-z18 + 4.0*(z4+z20-z0-z24) "
    "+ 2.0*(z3+z9+z15+z21-z1-z5-z19-z23))"
)

_PQ3 = "((p*p + q*q) * (p*p + q*q) * (p*p + q*q))"          # (p^2+q^2)^3
_W = "(1.0 + p*p + q*q)"
_W3 = f"({_W} * {_W} * {_W})"
_MEAN_C = f"(-((1.0 + q*q)*r - 2.0*p*q*s + (1.0 + p*p)*t) / (2.0 * sqrt({_W3})))"
_GAUSS_C = f"((r*t - s*s) / ({_W} * {_W}))"

CURVATURE_FORMULAS = {
    # plan_curvature.rs:359 (flat guard :357-365)
    "plan": (
        "CASE WHEN abs(p + q) > 0.0 THEN "
        f"-(q*q*r - 2.0*p*q*s + p*p*t) / sqrt({_PQ3}) ELSE 0.0 END"
    ),
    # prof_curvature.rs:356
    "profile": (
        "CASE WHEN abs(p + q) > 0.0 THEN "
        f"-(p*p*r + 2.0*p*q*s + q*q*t) / ((p*p + q*q) * sqrt({_W3})) ELSE 0.0 END"
    ),
    # tan_curvature.rs:367
    "tangential": (
        "CASE WHEN abs(p + q) > 0.0 THEN "
        f"-(q*q*r - 2.0*p*q*s + p*p*t) / ((p*p + q*q) * sqrt({_W})) ELSE 0.0 END"
    ),
    # total_curvature.rs:344
    "total": "r*r + 2.0*s*s + t*t",
    # mean_curvature.rs:357
    "mean": _MEAN_C,
    # gaussian_curvature.rs:354
    "gaussian": _GAUSS_C,
    # minimal_curvature.rs:357-359 / maximal_curvature.rs
    "minimal": f"{_MEAN_C} - sqrt({_MEAN_C}*{_MEAN_C} - {_GAUSS_C})",
    "maximal": f"{_MEAN_C} + sqrt({_MEAN_C}*{_MEAN_C} - {_GAUSS_C})",
}


def _rst_sql(res: float) -> tuple[str, str, str]:
    recip2 = repr(1.0 / (35.0 * res * res))
    recip100 = repr(1.0 / (100.0 * res * res))
    return (
        R_FORMULA.format(recip2=recip2),
        S_FORMULA.format(recip100=recip100),
        T_FORMULA.format(recip2=recip2),
    )


def _log_wrap(expr: str, log_transform: bool, log_multiplier: float) -> str:
    if not log_transform:
        return expr
    # Florinsky (2016) pg. 244 eq. 8.1 (plan_curvature.rs:362)
    return f"sign({expr}) * ln(1.0 + {log_multiplier!r} * abs({expr}))"


def curvature(
    cells: DataFrame,
    which: str,
    *,
    res: float,
    z_factor: float = 1.0,
    log_transform: bool = False,
    log_multiplier: float = 1e6,
    tiled: bool = False,
    tile: int = 256,
) -> DataFrame:
    """Any of the 8 Florinsky curvature rasters over a long cell table."""
    g = _pq(_gather(cells, z_factor, tiled, tile), res)
    r, s, t = _rst_sql(res)
    g = (
        g.withColumn("r", F.expr(r))
        .withColumn("s", F.expr(s))
        .withColumn("t", F.expr(t))
    )
    expr = _log_wrap(CURVATURE_FORMULAS[which], log_transform, log_multiplier)
    return g.select("row", "col", F.expr(expr).alias("value"))


def curvature_oracle_sql(
    source_sql: str,
    which: str,
    *,
    res: float,
    z_factor: float = 1.0,
    log_transform: bool = False,
    log_multiplier: float = 1e6,
) -> str:
    r, s, t = _rst_sql(res)
    p = P_FORMULA.format(recip=_recip(res))
    q = Q_FORMULA.format(recip=_recip(res))
    expr = _log_wrap(CURVATURE_FORMULAS[which], log_transform, log_multiplier)
    return (
        _gather25_sql(source_sql, z_factor)
        + f""", pq AS (SELECT row, col, {p} AS p, {q} AS q, {r} AS r, {s} AS s, {t} AS t FROM g)
SELECT row, col, {expr} AS value FROM pq"""
    )


def mean_filter(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """Mean of non-null cells in the (filterx x filtery) window around each
    non-null cell (window clamped at grid edges by cell existence)."""
    spark = cells.sparkSession
    mx, my = filterx // 2, filtery // 2
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in range(-mx, mx + 1) for dy in range(-my, my + 1)],
        "dx int, dy int",
    )
    scattered = (
        src.crossJoin(F.broadcast(offsets))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "value",
        )
        .groupBy("row", "col")
        .agg(F.avg("value").alias("_mean"))
    )
    return (
        src.join(scattered, ["row", "col"], "left")
        .select("row", "col", F.col("_mean").alias("value"))
    )


# ---------------------------------------------------------------------------
# oracle SQL builders (the same formula strings, same gather shape)
# ---------------------------------------------------------------------------
def _gather25_sql(source_sql: str, z_factor: float = 1.0) -> str:
    offs = ", ".join(f"({n}, {dx}, {dy})" for n, (dx, dy) in enumerate(OFFSETS25))
    zcols = ", ".join(
        f"coalesce(max(CASE WHEN o.n = {i} THEN s.value END), any_value(c.value)) * {z_factor!r} AS z{i}"
        for i in range(25)
    )
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(n, dx, dy) AS (VALUES {offs}),
g AS (
  SELECT c.row, c.col, {zcols}
  FROM src c
  LEFT JOIN (src s CROSS JOIN offs o)
    ON c.row = s.row - o.dy AND c.col = s.col - o.dx
  GROUP BY c.row, c.col
)
"""


def slope_oracle_sql(source_sql: str, *, res: float, units: str = "degrees", z_factor: float = 1.0) -> str:
    return (
        _gather25_sql(source_sql, z_factor)
        + f", pq AS ({_pq_select_sql(res)}) SELECT row, col, {SLOPE_FORMULAS[units]} AS value FROM pq"
    )


def _pq_select_sql(res: float) -> str:
    p = P_FORMULA.format(recip=_recip(res))
    q = Q_FORMULA.format(recip=_recip(res))
    return f"SELECT row, col, {p} AS p, {q} AS q FROM g"


def aspect_oracle_sql(source_sql: str, *, res: float, z_factor: float = 1.0) -> str:
    return (
        _gather25_sql(source_sql, z_factor)
        + f", pq AS ({_pq_select_sql(res)}) SELECT row, col, {ASPECT_FORMULA} AS value FROM pq"
    )


def hillshade_oracle_sql(
    source_sql: str, *, res: float, azimuth: float = 315.0, altitude: float = 30.0, z_factor: float = 1.0
) -> str:
    return (
        _gather25_sql(source_sql, z_factor)
        + f", pq AS ({_pq_select_sql(res)}) SELECT row, col, {hillshade_formula(azimuth, altitude)} AS value FROM pq"
    )


def mean_filter_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    mx, my = filterx // 2, filtery // 2
    offs = ", ".join(
        f"({dx}, {dy})" for dx in range(-mx, mx + 1) for dy in range(-my, my + 1)
    )
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(dx, dy) AS (VALUES {offs}),
m AS (
  SELECT s.row - o.dy AS row, s.col - o.dx AS col, avg(s.value) AS value
  FROM src s CROSS JOIN offs o
  GROUP BY 1, 2
)
SELECT c.row, c.col, m.value FROM src c LEFT JOIN m ON c.row = m.row AND c.col = m.col
"""


_FILTER_AGGS = {
    "min": "min(value)",
    "max": "max(value)",
    "range": "max(value) - min(value)",
    "mean": "avg(value)",
    "median": "percentile(value, 0.5)",
    "sd": "stddev_samp(value)",
    "sum": "sum(value)",
    "count": "count(value)",
    # DiversityFilter (image_analysis/diversity_filter.rs): number of
    # distinct values in the window
    "diversity": "count(DISTINCT value)",
}


def stat_filter(cells: DataFrame, stat: str, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """Generic k x k neighborhood statistic filter over non-null cells —
    covers the reference's Minimum/Maximum/Range/Mean/Median/Total filter
    tools (image_analysis/{minimum,maximum,range,median,total}_filter.rs).
    NOTE: the reference's MedianFilter/PercentileFilter use binned
    histograms (approximate for continuous data); this engine computes the
    exact order statistic. -> (row, col, value)."""
    expr = _FILTER_AGGS[stat]
    spark = cells.sparkSession
    mx, my = filterx // 2, filtery // 2
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in range(-mx, mx + 1) for dy in range(-my, my + 1)],
        "dx int, dy int",
    )
    scattered = (
        src.crossJoin(F.broadcast(offsets))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "value",
        )
        .groupBy("row", "col")
        .agg(F.expr(expr).alias("_stat"))
    )
    return src.join(scattered, ["row", "col"], "left").select(
        "row", "col", F.col("_stat").alias("value")
    )


def stat_filter_oracle_sql(
    source_sql: str, stat: str, *, filterx: int = 3, filtery: int = 3
) -> str:
    """DuckDB mirror of stat_filter (quantile_cont for the exact median)."""
    expr = {**_FILTER_AGGS, "median": "quantile_cont(value, 0.5)"}[stat]
    mx, my = filterx // 2, filtery // 2
    offs = ", ".join(
        f"({dx}, {dy})" for dx in range(-mx, mx + 1) for dy in range(-my, my + 1)
    )
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(dx, dy) AS (VALUES {offs}),
m AS (
  SELECT s.row - o.dy AS row, s.col - o.dx AS col, {expr} AS value
  FROM src s CROSS JOIN offs o
  GROUP BY 1, 2
)
SELECT c.row, c.col, m.value FROM src c LEFT JOIN m ON c.row = m.row AND c.col = m.col
"""


# ---------------------------------------------------------------------------
# Generic convolution filter bank (image_analysis/{sobel,emboss,laplacian,
# gaussian}_filter.rs): out = sum(w_i * z_i) over a k x k window with
# nodata/out-of-grid neighbors replaced by the center value
# (sobel_filter.rs:323-327) — the same gather as slope, arbitrary weights.
# ---------------------------------------------------------------------------
def gather_offsets(cells: DataFrame, offsets: list[tuple[int, int]]) -> DataFrame:
    """-> (row, col, value, z0..zN) for the given (dx, dy) offsets; missing
    neighbors coalesce to the center value. One scatter + hash aggregate."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    off = spark.createDataFrame(
        [(i, dx, dy) for i, (dx, dy) in enumerate(offsets)], "n int, dx int, dy int"
    )
    scattered = (
        src.crossJoin(F.broadcast(off))
        .select(
            (F.col("row") - F.col("dy")).alias("row"),
            (F.col("col") - F.col("dx")).alias("col"),
            "n",
            "value",
        )
        .groupBy("row", "col")
        .agg(*[
            F.max(F.when(F.col("n") == i, F.col("value"))).alias(f"_z{i}")
            for i in range(len(offsets))
        ])
    )
    out = src.join(scattered, ["row", "col"], "left")
    for i in range(len(offsets)):
        out = out.withColumn(f"z{i}", F.coalesce(F.col(f"_z{i}"), F.col("value")))
    return out.drop(*[f"_z{i}" for i in range(len(offsets))])


def _kernel_offsets(kernel: list[list[float]]) -> list[tuple[int, int, float]]:
    ky, kx = len(kernel), len(kernel[0])
    my, mx = ky // 2, kx // 2
    return [
        (dx - mx, dy - my, float(kernel[dy][dx]))
        for dy in range(ky) for dx in range(kx)
    ]


def conv_filter(cells: DataFrame, kernel: list[list[float]]) -> DataFrame:
    """Single-kernel convolution -> (row, col, value)."""
    items = _kernel_offsets(kernel)
    g = gather_offsets(cells, [(dx, dy) for dx, dy, _ in items])
    expr = None
    for i, (_, _, w) in enumerate(items):
        term = F.col(f"z{i}") * F.lit(w)
        expr = term if expr is None else expr + term
    return g.select("row", "col", expr.alias("value"))


# 3x3 Sobel masks in (dy, dx) raster order (sobel_filter.rs variant 3x3)
SOBEL_X = [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]
SOBEL_Y = [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]
EMBOSS = [[-1.0, -1.0, 0.0], [-1.0, 0.0, 1.0], [0.0, 1.0, 1.0]]
LAPLACIAN = [[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]]


def sobel_filter(cells: DataFrame) -> DataFrame:
    """SobelFilter (image_analysis/sobel_filter.rs:316-331):
    sqrt(gx^2 + gy^2) of the two 3x3 Sobel responses."""
    items = _kernel_offsets(SOBEL_X)
    g = gather_offsets(cells, [(dx, dy) for dx, dy, _ in items])
    gx = gy = None
    flat_y = [w for row_ in SOBEL_Y for w in row_]
    for i, (_, _, wx) in enumerate(items):
        tx_ = F.col(f"z{i}") * F.lit(wx)
        ty_ = F.col(f"z{i}") * F.lit(flat_y[i])
        gx = tx_ if gx is None else gx + tx_
        gy = ty_ if gy is None else gy + ty_
    return g.select("row", "col", F.sqrt(gx * gx + gy * gy).alias("value"))


def gaussian_kernel(sigma: float, radius: int | None = None) -> list[list[float]]:
    """Normalized Gaussian weights (gaussian_filter.rs)."""
    import math as _math

    if radius is None:
        radius = max(1, int(_math.ceil(2.0 * sigma)))
    size = 2 * radius + 1
    w = [
        [
            _math.exp(-((dx - radius) ** 2 + (dy - radius) ** 2) / (2.0 * sigma * sigma))
            for dx in range(size)
        ]
        for dy in range(size)
    ]
    s = sum(sum(r) for r in w)
    return [[v / s for v in r] for r in w]


def conv_filter_oracle_sql(source_sql: str, kernel: list[list[float]]) -> str:
    """DuckDB mirror of conv_filter (same gather + weight sum)."""
    items = _kernel_offsets(kernel)
    offs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy, _) in enumerate(items))
    zsum = " + ".join(
        f"coalesce(max(CASE WHEN o.n = {i} THEN s.value END), any_value(c.value)) * {w!r}"
        for i, (_, _, w) in enumerate(items)
    )
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(n, dx, dy) AS (VALUES {offs}),
g AS (
  SELECT c.row, c.col, {zsum} AS value
  FROM src c
  LEFT JOIN (src s CROSS JOIN offs o)
    ON c.row = s.row - o.dy AND c.col = s.col - o.dx
  GROUP BY c.row, c.col
)
SELECT row, col, value FROM g
"""


def sobel_oracle_sql(source_sql: str) -> str:
    items = _kernel_offsets(SOBEL_X)
    flat_y = [w for row_ in SOBEL_Y for w in row_]
    offs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy, _) in enumerate(items))
    z = lambda i: f"coalesce(max(CASE WHEN o.n = {i} THEN s.value END), any_value(c.value))"  # noqa: E731
    gx = " + ".join(f"{z(i)} * {w!r}" for i, (_, _, w) in enumerate(items))
    gy = " + ".join(f"{z(i)} * {flat_y[i]!r}" for i in range(len(items)))
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(n, dx, dy) AS (VALUES {offs}),
g AS (
  SELECT c.row, c.col, ({gx}) AS gx, ({gy}) AS gy
  FROM src c
  LEFT JOIN (src s CROSS JOIN offs o)
    ON c.row = s.row - o.dy AND c.col = s.col - o.dx
  GROUP BY c.row, c.col
)
SELECT row, col, sqrt(gx * gx + gy * gy) AS value FROM g
"""


# ---------------------------------------------------------------------------
# Local topographic position + morphology family. All are one scatter-shuffle
# joined back to the center cell, entirely in pyspark.sql.functions — the
# same single-exchange shape as stat_filter, so they inherit its 100-TB
# story (and the tiled mapInPandas path applies if ever needed).
# ---------------------------------------------------------------------------
def _scatter_with_center(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, exclude_center: bool = False
) -> DataFrame:
    """Window members attached to their center cell:
    -> (row, col, center, value) with one row per (center cell, valid window
    member). Off-grid / nodata neighbors are simply absent (reference
    convention for the window-statistic tools, unlike the convolution bank's
    coalesce-to-center)."""
    spark = cells.sparkSession
    mx, my = filterx // 2, filtery // 2
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offs = [
        (dx, dy)
        for dx in range(-mx, mx + 1)
        for dy in range(-my, my + 1)
        if not (exclude_center and dx == 0 and dy == 0)
    ]
    offsets = spark.createDataFrame(offs, "dx int, dy int")
    scattered = src.crossJoin(F.broadcast(offsets)).select(
        (F.col("row") - F.col("dy")).alias("row"),
        (F.col("col") - F.col("dx")).alias("col"),
        "value",
    )
    return scattered.join(
        src.withColumnRenamed("value", "center"), ["row", "col"]
    ).select("row", "col", "center", "value")


def _member_cte(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, exclude_center: bool = False
) -> str:
    mx, my = filterx // 2, filtery // 2
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-mx, mx + 1)
        for dy in range(-my, my + 1)
        if not (exclude_center and dx == 0 and dy == 0)
    )
    return f"""
src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(dx, dy) AS (VALUES {offs}),
m AS (
  SELECT c.row, c.col, c.value AS center, s.value
  FROM src c JOIN (SELECT s0.row - o.dy AS row, s0.col - o.dx AS col, s0.value
                   FROM src s0 CROSS JOIN offs o) s
    ON c.row = s.row AND c.col = s.col
)"""


def elev_percentile(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """ElevPercentile (terrain_analysis/elev_percentile.rs:450-470:
    n_less_than / n * 100 over the window, center included in n). The
    reference bins values into a histogram first (approximate for
    continuous data); this computes the exact count. -> (row, col, value)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    return m.groupBy("row", "col").agg(
        (
            F.sum(F.when(F.col("value") < F.col("center"), 1).otherwise(0))
            / F.count(F.lit(1))
            * 100.0
        ).alias("value")
    )


def elev_percentile_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col,
       sum(CASE WHEN value < center THEN 1 ELSE 0 END)::DOUBLE / count(*) * 100.0 AS value
FROM m GROUP BY row, col
"""


def ruggedness_index(cells: DataFrame) -> DataFrame:
    """Riley et al. (1999) TRI (terrain_analysis/ruggedness_index.rs:270-281):
    sqrt(mean((z_n - z)^2)) over the valid 8-neighborhood (center excluded);
    cells with no valid neighbor yield NULL. -> (row, col, value)."""
    m = _scatter_with_center(cells, exclude_center=True)
    out = m.groupBy("row", "col").agg(
        F.sqrt(F.avg(F.pow(F.col("value") - F.col("center"), 2))).alias("value")
    )
    src = cells.filter(F.col("value").isNotNull()).select("row", "col")
    return src.join(out, ["row", "col"], "left").select("row", "col", "value")


def ruggedness_oracle_sql(source_sql: str) -> str:
    return f"""
WITH {_member_cte(source_sql, exclude_center=True)},
g AS (
  SELECT row, col, sqrt(avg((value - center) * (value - center))) AS value
  FROM m GROUP BY row, col
)
SELECT c.row, c.col, g.value FROM src c LEFT JOIN g ON c.row = g.row AND c.col = g.col
"""


def diff_from_mean(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """DiffFromMeanElev (terrain_analysis/diff_from_mean_elev.rs:440-445:
    z - mean(window), a high-pass filter). -> (row, col, value)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    return m.groupBy("row", "col").agg(
        (F.first("center") - F.avg("value")).alias("value")
    )


def diff_from_mean_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col, any_value(center) - avg(value) AS value FROM m GROUP BY row, col
"""


def dev_from_mean(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """DevFromMeanElev (terrain_analysis/dev_from_mean_elev.rs:449-466):
    (z - mean) / s with the POPULATION standard deviation of the window;
    0 where the window variance is 0. -> (row, col, value)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    sd = F.stddev_pop("value")
    return m.groupBy("row", "col").agg(
        F.when(sd > 0, (F.first("center") - F.avg("value")) / sd)
        .otherwise(F.lit(0.0))
        .alias("value")
    )


def dev_from_mean_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col,
       CASE WHEN stddev_pop(value) > 0
            THEN (any_value(center) - avg(value)) / stddev_pop(value)
            ELSE 0.0 END AS value
FROM m GROUP BY row, col
"""


def majority_filter(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """MajorityFilter (image_analysis/majority_filter.rs:329-366): modal
    value of the window. The reference leaves ties order-dependent; this
    engine breaks ties deterministically toward the SMALLEST value (needed
    for reproducibility under re-partitioning). -> (row, col, value)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    counts = m.groupBy("row", "col", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("row", "col").orderBy(F.desc("cnt"), F.asc("value"))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("row", "col", "value")
    )


def majority_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)},
cnts AS (SELECT row, col, value, count(*) AS cnt FROM m GROUP BY row, col, value),
rk AS (SELECT row, col, value,
              row_number() OVER (PARTITION BY row, col ORDER BY cnt DESC, value ASC) AS _rk
       FROM cnts)
SELECT row, col, value FROM rk WHERE _rk = 1
"""


def morphology(cells: DataFrame, op: str, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """Grayscale morphology (image_analysis/{opening,closing,tophat}.rs):
    opening = dilate(erode(x)), closing = erode(dilate(x)),
    tophat = x - opening (white top-hat). Two chained stat_filter passes —
    two scatter-shuffles, still all-JVM. -> (row, col, value)."""
    kw = dict(filterx=filterx, filtery=filtery)
    if op == "opening":
        return stat_filter(stat_filter(cells, "min", **kw), "max", **kw)
    if op == "closing":
        return stat_filter(stat_filter(cells, "max", **kw), "min", **kw)
    if op == "tophat":
        opened = morphology(cells, "opening", **kw).withColumnRenamed("value", "opened")
        return (
            cells.filter(F.col("value").isNotNull())
            .join(opened, ["row", "col"])
            .select("row", "col", (F.col("value") - F.col("opened")).alias("value"))
        )
    raise ValueError(op)


def morphology_oracle_sql(source_sql: str, op: str, *, filterx: int = 3, filtery: int = 3) -> str:
    kw = dict(filterx=filterx, filtery=filtery)
    opening = stat_filter_oracle_sql(
        stat_filter_oracle_sql(source_sql, "min", **kw), "max", **kw
    )
    if op == "opening":
        return opening
    if op == "closing":
        return stat_filter_oracle_sql(
            stat_filter_oracle_sql(source_sql, "max", **kw), "min", **kw
        )
    if op == "tophat":
        return f"""
SELECT c.row, c.col, c.value - o.value AS value
FROM ({source_sql}) c JOIN ({opening}) o ON c.row = o.row AND c.col = o.col
WHERE c.value IS NOT NULL
"""
    raise ValueError(op)


def percent_elev_range(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """PercentElevRange (terrain_analysis/percent_elev_range.rs:375-385):
    (z - min) / (max - min) * 100 over the window; 0 where the window is
    flat. -> (row, col, value)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    rng = F.max("value") - F.min("value")
    return m.groupBy("row", "col").agg(
        F.when(rng > 0.0, (F.first("center") - F.min("value")) / rng * 100.0)
        .otherwise(F.lit(0.0))
        .alias("value")
    )


def percent_elev_range_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col,
       CASE WHEN max(value) - min(value) > 0.0
            THEN (any_value(center) - min(value)) / (max(value) - min(value)) * 100.0
            ELSE 0.0 END AS value
FROM m GROUP BY row, col
"""


def olympic_filter(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """OlympicFilter (image_analysis/olympic_filter.rs:388-410): window mean
    after dropping one min and one max. -> (row, col, value)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    return m.groupBy("row", "col").agg(
        (
            (F.sum("value") - F.min("value") - F.max("value"))
            / (F.count(F.lit(1)) - 2)
        ).alias("value")
    )


def olympic_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col,
       (sum(value) - min(value) - max(value)) / (count(*) - 2) AS value
FROM m GROUP BY row, col
"""


def highpass_filter(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """HighPassFilter (image_analysis/highpass_filter.rs): z - window mean."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    return m.groupBy("row", "col").agg(
        (F.first("center") - F.avg("value")).alias("value")
    )


def highpass_oracle_sql(source_sql: str, *, filterx: int = 3, filtery: int = 3) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col, any_value(center) - avg(value) AS value FROM m GROUP BY row, col
"""


def conservative_smoothing(cells: DataFrame, *, filterx: int = 3, filtery: int = 3) -> DataFrame:
    """ConservativeSmoothingFilter (image_analysis/
    conservative_smoothing_filter.rs:380-400): clamp the center into the
    [min, max] of its neighbors (center excluded)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery, exclude_center=True)
    agg = m.groupBy("row", "col").agg(
        F.first("center").alias("center"),
        F.min("value").alias("mn"), F.max("value").alias("mx"),
    )
    out = agg.select(
        "row", "col",
        F.when(F.col("center") > F.col("mx"), F.col("mx"))
        .when(F.col("center") < F.col("mn"), F.col("mn"))
        .otherwise(F.col("center"))
        .alias("value"),
    )
    # isolated cells (no neighbors) keep their value
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    return (
        src.join(out.withColumnRenamed("value", "sm"), ["row", "col"], "left")
        .select("row", "col", F.coalesce(F.col("sm"), F.col("value")).alias("value"))
    )


def conservative_smoothing_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3
) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery, exclude_center=True)},
agg AS (
  SELECT row, col, any_value(center) AS center, min(value) AS mn, max(value) AS mx
  FROM m GROUP BY row, col
)
SELECT s.row, s.col,
       coalesce(CASE WHEN a.center > a.mx THEN a.mx
                     WHEN a.center < a.mn THEN a.mn
                     ELSE a.center END, s.value) AS value
FROM src s LEFT JOIN agg a ON a.row = s.row AND a.col = s.col
"""


# ---------------------------------------------------------------------------
# Gradient / edge-detection convolution family (image_analysis). All share
# the single scatter-shuffle of gather_offsets with the reference's
# nodata->center substitution, entirely in codegen expressions.
# ---------------------------------------------------------------------------
# 3x3 masks in (dy, dx) raster order, transcribed from the reference's
# flat (dx, dy, mask) arrays.
PREWITT_X = [[-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0]]
PREWITT_Y = [[-1.0, -1.0, -1.0], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
SCHARR_X = [[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]]
SCHARR_Y = [[3.0, 10.0, 3.0], [0.0, 0.0, 0.0], [-3.0, -10.0, -3.0]]
# line_detection_filter.rs:309-317 variants (row-major over dy=-1..1, dx=-1..1)
LINE_DETECTION_KERNELS = {
    "vertical": [[-1.0, 2.0, -1.0], [-1.0, 2.0, -1.0], [-1.0, 2.0, -1.0]],
    "horizontal": [[-1.0, -1.0, -1.0], [2.0, 2.0, 2.0], [-1.0, -1.0, -1.0]],
    "45": [[2.0, -1.0, -1.0], [-1.0, 2.0, -1.0], [-1.0, -1.0, 2.0]],
    "135": [[-1.0, -1.0, 2.0], [-1.0, 2.0, -1.0], [2.0, -1.0, -1.0]],
}


def gradient_magnitude_filter(
    cells: DataFrame, kernel_x: list[list[float]], kernel_y: list[list[float]]
) -> DataFrame:
    """sqrt(gx^2 + gy^2) of two convolution responses sharing one gather
    (prewitt_filter.rs:287-309 / scharr_filter.rs:288-309 shape)."""
    items = _kernel_offsets(kernel_x)
    g = gather_offsets(cells, [(dx, dy) for dx, dy, _ in items])
    flat_y = [w for row_ in kernel_y for w in row_]
    gx = gy = None
    for i, (_, _, wx) in enumerate(items):
        tx_ = F.col(f"z{i}") * F.lit(wx)
        ty_ = F.col(f"z{i}") * F.lit(flat_y[i])
        gx = tx_ if gx is None else gx + tx_
        gy = ty_ if gy is None else gy + ty_
    return g.select("row", "col", F.sqrt(gx * gx + gy * gy).alias("value"))


def gradient_magnitude_oracle_sql(
    source_sql: str, kernel_x: list[list[float]], kernel_y: list[list[float]]
) -> str:
    items = _kernel_offsets(kernel_x)
    flat_y = [w for row_ in kernel_y for w in row_]
    offs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy, _) in enumerate(items))
    z = lambda i: f"coalesce(max(CASE WHEN o.n = {i} THEN s.value END), any_value(c.value))"  # noqa: E731
    gx = " + ".join(f"{z(i)} * {w!r}" for i, (_, _, w) in enumerate(items))
    gy = " + ".join(f"{z(i)} * {flat_y[i]!r}" for i in range(len(items)))
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(n, dx, dy) AS (VALUES {offs}),
g AS (
  SELECT c.row, c.col, ({gx}) AS gx, ({gy}) AS gy
  FROM src c
  LEFT JOIN (src s CROSS JOIN offs o)
    ON c.row = s.row - o.dy AND c.col = s.col - o.dx
  GROUP BY c.row, c.col
)
SELECT row, col, sqrt(gx * gx + gy * gy) AS value FROM g
"""


def prewitt_filter(cells: DataFrame) -> DataFrame:
    """PrewittFilter (image_analysis/prewitt_filter.rs:287-309)."""
    return gradient_magnitude_filter(cells, PREWITT_X, PREWITT_Y)


def scharr_filter(cells: DataFrame) -> DataFrame:
    """ScharrFilter (image_analysis/scharr_filter.rs:288-309)."""
    return gradient_magnitude_filter(cells, SCHARR_X, SCHARR_Y)


def roberts_filter(cells: DataFrame) -> DataFrame:
    """RobertsCrossFilter (image_analysis/roberts_filter.rs:295-316):
    |z1 - z4| + |z2 - z3| over the 2x2 window anchored at the cell
    (z1=center, z2=E, z3=S, z4=SE), nodata neighbors -> z1."""
    g = gather_offsets(cells, [(1, 0), (0, 1), (1, 1)])
    return g.select(
        "row", "col",
        (
            F.abs(F.col("value") - F.col("z2")) + F.abs(F.col("z0") - F.col("z1"))
        ).alias("value"),
    )


def roberts_oracle_sql(source_sql: str) -> str:
    z = lambda i: f"coalesce(max(CASE WHEN o.n = {i} THEN s.value END), any_value(c.value))"  # noqa: E731
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(n, dx, dy) AS (VALUES (0, 1, 0), (1, 0, 1), (2, 1, 1)),
g AS (
  SELECT c.row, c.col, any_value(c.value) AS z1,
         {z(0)} AS z2, {z(1)} AS z3, {z(2)} AS z4
  FROM src c
  LEFT JOIN (src s CROSS JOIN offs o)
    ON c.row = s.row - o.dy AND c.col = s.col - o.dx
  GROUP BY c.row, c.col
)
SELECT row, col, abs(z1 - z4) + abs(z2 - z3) AS value FROM g
"""


def line_detection_filter(cells: DataFrame, *, variant: str = "vertical") -> DataFrame:
    """LineDetectionFilter (image_analysis/line_detection_filter.rs:309-335):
    plain 3x3 convolution with the variant's template kernel."""
    return conv_filter(cells, LINE_DETECTION_KERNELS[variant])


def log_kernel(sigma: float) -> list[list[float]]:
    """Laplacian-of-Gaussian weights (image_analysis/log_filter.rs:251-269):
    w = -1/(pi*sigma^4) * (1 - d2/(2 sigma^2)) * exp(-d2/(2 sigma^2)), filter
    size from the reference's 0.001 weight cutoff, normalized by the total
    kernel sum (the reference divides the response by the sum of the valid
    weights — identical for full windows; at edges this engine substitutes
    the center value instead of renormalizing)."""
    import math as _math

    recip = 1.0 / (_math.sqrt(2.0 * _math.pi) * sigma)
    ts = 2.0 * sigma * sigma
    size = 3
    for i in range(250):
        if recip * _math.exp(-i * i / ts) <= 0.001:
            size = i * 2 + 1
            break
    if size % 2 == 0:
        size += 1
    size = max(size, 3)
    half = size // 2
    t1 = -1.0 / (_math.pi * sigma ** 4)
    w = [
        [
            t1 * (1.0 - (x * x + y * y) / ts) * _math.exp(-(x * x + y * y) / ts)
            for x in range(-half, half + 1)
        ]
        for y in range(-half, half + 1)
    ]
    s = sum(sum(r) for r in w)
    return [[v / s for v in r] for r in w]


def dog_kernel(sigma1: float, sigma2: float) -> list[list[float]]:
    """Difference-of-Gaussians weights (image_analysis/dog_filter.rs):
    each Gaussian normalized to unit sum (the reference divides each
    response by its own valid-weight sum), then differenced into ONE kernel
    so the whole filter is a single convolution pass."""
    g1 = gaussian_kernel(sigma1)
    g2 = gaussian_kernel(sigma2)
    n1, n2 = len(g1), len(g2)
    n = max(n1, n2)
    pad1, pad2 = (n - n1) // 2, (n - n2) // 2
    out = [[0.0] * n for _ in range(n)]
    for i in range(n1):
        for j in range(n1):
            out[i + pad1][j + pad1] += g1[i][j]
    for i in range(n2):
        for j in range(n2):
            out[i + pad2][j + pad2] -= g2[i][j]
    return out


def unsharp_masking(
    cells: DataFrame, *, sigma: float = 2.0, amount: float = 100.0, threshold: float = 0.0
) -> DataFrame:
    """UnsharpMasking (image_analysis/unsharp_masking.rs:257,400-414):
    blurred = Gaussian(sigma); diff = z - blurred; out = z + diff * (1 +
    amount/100) when diff > |threshold| else z (the reference's one-sided
    threshold test is mirrored verbatim)."""
    g = gaussian_kernel(sigma)
    blurred = conv_filter(cells, g).withColumnRenamed("value", "blur")
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    amt = amount / 100.0 + 1.0
    j = src.join(blurred, ["row", "col"])
    diff = F.col("value") - F.col("blur")
    return j.select(
        "row", "col",
        F.when(diff > abs(threshold), F.col("value") + diff * F.lit(amt))
        .otherwise(F.col("value"))
        .alias("value"),
    )


def unsharp_oracle_sql(
    source_sql: str, *, sigma: float = 2.0, amount: float = 100.0, threshold: float = 0.0
) -> str:
    g = gaussian_kernel(sigma)
    amt = amount / 100.0 + 1.0
    return f"""
WITH blur AS ({conv_filter_oracle_sql(source_sql, g)}),
src2 AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL)
SELECT s.row, s.col,
       CASE WHEN s.value - b.value > {abs(threshold)!r}
            THEN s.value + (s.value - b.value) * {amt!r}
            ELSE s.value END AS value
FROM src2 s JOIN blur b ON b.row = s.row AND b.col = s.col
"""


def percentile_filter(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, sig_digits: int = 2
) -> DataFrame:
    """PercentileFilter (image_analysis/percentile_filter.rs:315-455):
    per cell, 100 * (# window cells whose binned value < the center's
    binned value) / n, binning = floor(z * 10^sig_digits) (the reference's
    histogram bins), center included in n."""
    mult = float(10 ** sig_digits)
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    binned = m.select(
        "row", "col",
        F.floor(F.col("center") * mult).alias("cb"),
        F.floor(F.col("value") * mult).alias("vb"),
    )
    return binned.groupBy("row", "col").agg(
        (
            F.sum(F.when(F.col("vb") < F.col("cb"), 1).otherwise(0))
            / F.count(F.lit(1))
            * 100.0
        ).alias("value")
    )


def percentile_filter_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, sig_digits: int = 2
) -> str:
    mult = float(10 ** sig_digits)
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col,
       sum(CASE WHEN floor(value * {mult!r}) < floor(center * {mult!r})
                THEN 1 ELSE 0 END)::DOUBLE / count(*) * 100.0 AS value
FROM m GROUP BY row, col
"""


MULTI_HS_AZIMUTHS = (225.0, 270.0, 315.0, 360.0)
MULTI_HS_WEIGHTS = (0.1, 0.4, 0.4, 0.1)


def multidirectional_hillshade_formula(altitude: float = 45.0) -> str:
    """MultidirectionalHillshade (terrain_analysis/
    multidirectional_hillshade.rs:343-420, non-360 mode): weighted sum of
    the four azimuth responses (225/270/315/360 at 0.1/0.4/0.4/0.1),
    clamped at zero AFTER the sum (unlike the single-azimuth tool) and
    scaled by 32767."""
    sin_t = math.sin(math.radians(altitude))
    cos_t = math.cos(math.radians(altitude))
    terms = []
    for az, w in zip(MULTI_HS_AZIMUTHS, MULTI_HS_WEIGHTS):
        azr = math.radians(az - 90.0)
        terms.append(
            f"{w!r} * (ts/sqrt(1.0 + ts*ts)) * "
            f"({sin_t!r}/ts - {cos_t!r}*sin({azr!r} - asp))"
        )
    return (
        f"round(greatest(({' + '.join(terms)}), 0.0) * 32767.0)"
    ).replace(
        "ts", "greatest(sqrt(p*p + q*q), 0.00017)"
    ).replace(
        "asp",
        "(CASE WHEN p <> 0.0 THEN pi() - atan(q/p) + (pi()/2.0)*(p/abs(p)) ELSE pi() END)",
    )


def multidirectional_hillshade(
    cells: DataFrame, *, res: float, altitude: float = 45.0, z_factor: float = 1.0,
    tiled: bool = False, tile: int = 256,
) -> DataFrame:
    g = _pq(_gather(cells, z_factor, tiled, tile), res)
    return g.select(
        "row", "col",
        F.expr(multidirectional_hillshade_formula(altitude)).alias("value"),
    )


def multidirectional_hillshade_oracle_sql(
    source_sql: str, *, res: float, altitude: float = 45.0, z_factor: float = 1.0
) -> str:
    return (
        _gather25_sql(source_sql, z_factor)
        + f", pq AS ({_pq_select_sql(res)}) SELECT row, col, "
        + multidirectional_hillshade_formula(altitude)
        + " AS value FROM pq"
    )


# ---------------------------------------------------------------------------
# Value-weighted / adaptive focal family (image_analysis). One
# scatter-shuffle each via _scatter_with_center (window membership, center
# included), with all weighting math in codegen expressions.
# ---------------------------------------------------------------------------
def _scatter_with_center_w(
    cells: DataFrame, offsets: list[tuple[int, int, float]]
) -> DataFrame:
    """Like _scatter_with_center but each (dx, dy) carries a weight column.
    -> (row, col, center, value, wd)."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offs = spark.createDataFrame(offsets, "dx int, dy int, wd double")
    scattered = src.crossJoin(F.broadcast(offs)).select(
        (F.col("row") - F.col("dy")).alias("row"),
        (F.col("col") - F.col("dx")).alias("col"),
        "value",
        "wd",
    )
    return scattered.join(
        src.withColumnRenamed("value", "center"), ["row", "col"]
    ).select("row", "col", "center", "value", "wd")


def bilateral_offsets(sigma_dist: float) -> list[tuple[int, int, float]]:
    """Distance-kernel offsets and weights (bilateral_filter.rs): w_d =
    1/(sqrt(2 pi) sigma_d) * exp(-d^2 / (2 sigma_d^2)), symmetric square
    window sized by the reference's 0.001 weight cutoff."""
    import math as _math

    recip = 1.0 / (_math.sqrt(2.0 * _math.pi) * sigma_dist)
    ts = 2.0 * sigma_dist * sigma_dist
    size = 3
    for i in range(250):
        if recip * _math.exp(-i * i / ts) <= 0.001:
            size = i * 2 + 1
            break
    if size % 2 == 0:
        size += 1
    size = max(size, 3)
    half = size // 2
    return [
        (dx, dy, recip * _math.exp(-(dx * dx + dy * dy) / ts))
        for dx in range(-half, half + 1)
        for dy in range(-half, half + 1)
    ]


def bilateral_filter(
    cells: DataFrame, *, sigma_dist: float = 0.75, sigma_int: float = 1.0
) -> DataFrame:
    """BilateralFilter (image_analysis/bilateral_filter.rs): edge-preserving
    blur, w = w_d(dx,dy) * 1/(sqrt(2 pi) sigma_i) exp(-(zn-z)^2 /
    (2 sigma_i^2)); out = sum(w*zn)/sum(w) over valid window members."""
    import math as _math

    m = _scatter_with_center_w(cells, bilateral_offsets(sigma_dist))
    recip_i = 1.0 / (_math.sqrt(2.0 * _math.pi) * sigma_int)
    wi = F.lit(recip_i) * F.exp(
        -(F.col("value") - F.col("center")) ** 2 / F.lit(2.0 * sigma_int * sigma_int)
    )
    w = F.col("wd") * wi
    return m.groupBy("row", "col").agg(
        (F.sum(w * F.col("value")) / F.sum(w)).alias("value")
    )


def bilateral_oracle_sql(
    source_sql: str, *, sigma_dist: float = 0.75, sigma_int: float = 1.0
) -> str:
    import math as _math

    offs = ", ".join(
        f"({dx}, {dy}, {wd!r})" for dx, dy, wd in bilateral_offsets(sigma_dist)
    )
    recip_i = 1.0 / (_math.sqrt(2.0 * _math.pi) * sigma_int)
    wi = (
        f"{recip_i!r} * exp(-(value - center) * (value - center)"
        f" / {2.0 * sigma_int * sigma_int!r})"
    )
    return f"""
WITH src AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL),
offs(dx, dy, wd) AS (VALUES {offs}),
m AS (
  SELECT c.row, c.col, c.value AS center, s.value, s.wd
  FROM src c JOIN (SELECT s0.row - o.dy AS row, s0.col - o.dx AS col,
                          s0.value, o.wd
                   FROM src s0 CROSS JOIN offs o) s
    ON c.row = s.row AND c.col = s.col
)
SELECT row, col, sum(wd * ({wi}) * value) / sum(wd * ({wi})) AS value
FROM m GROUP BY row, col
"""


def adaptive_filter(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, threshold: float = 2.0
) -> DataFrame:
    """AdaptiveFilter (image_analysis/adaptive_filter.rs): window mean and
    POPULATION sd over valid members (center included); out = mean when
    |z - mean| / s > threshold (an outlier) else z."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    agg = m.groupBy("row", "col").agg(
        F.any_value(F.col("center")).alias("z"),
        F.avg("value").alias("mean"),
        F.stddev_pop("value").alias("s"),
    )
    return agg.select(
        "row", "col",
        F.when(
            (F.col("s") > 0.0)
            & (F.abs((F.col("z") - F.col("mean")) / F.col("s")) > threshold),
            F.col("mean"),
        ).otherwise(F.col("z")).alias("value"),
    )


def adaptive_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, threshold: float = 2.0
) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)},
agg AS (
  SELECT row, col, any_value(center) AS z, avg(value) AS mean,
         stddev_pop(value) AS s
  FROM m GROUP BY row, col
)
SELECT row, col,
       CASE WHEN s > 0.0 AND abs((z - mean) / s) > {threshold!r}
            THEN mean ELSE z END AS value
FROM agg
"""


def lee_filter(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, sigma: float = 10.0,
    min_n: float = 5.0,
) -> DataFrame:
    """LeeSigmaFilter (image_analysis/lee_filter.rs:379-420): mean of window
    members within z +/- sigma when more than min_n qualify, else the mean
    of the valid 8-neighbors."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    in_band = (F.col("value") >= F.col("center") - sigma) & (
        F.col("value") <= F.col("center") + sigma
    )
    agg = m.groupBy("row", "col").agg(
        F.sum(F.when(in_band, 1.0).otherwise(0.0)).alias("n"),
        F.sum(F.when(in_band, F.col("value")).otherwise(0.0)).alias("s"),
    )
    fb = _scatter_with_center(cells, exclude_center=True)
    fallback = fb.groupBy("row", "col").agg(F.avg("value").alias("fbv"))
    out = agg.join(fallback, ["row", "col"], "left")
    return out.select(
        "row", "col",
        F.when(F.col("n") > min_n, F.col("s") / F.col("n"))
        .otherwise(F.col("fbv"))
        .alias("value"),
    )


def lee_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, sigma: float = 10.0,
    min_n: float = 5.0,
) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)},
agg AS (
  SELECT row, col,
         sum(CASE WHEN value >= center - {sigma!r} AND value <= center + {sigma!r}
                  THEN 1.0 ELSE 0.0 END) AS n,
         sum(CASE WHEN value >= center - {sigma!r} AND value <= center + {sigma!r}
                  THEN value ELSE 0.0 END) AS s
  FROM m GROUP BY row, col
),
nb AS (
  SELECT c.row, c.col, avg(s.value) AS fbv
  FROM src c JOIN (SELECT s0.row - o.dy AS row, s0.col - o.dx AS col, s0.value
                   FROM src s0 CROSS JOIN (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),
                                                  (1,0),(-1,1),(0,1),(1,1)) o(dx, dy)) s
    ON c.row = s.row AND c.col = s.col
  GROUP BY c.row, c.col
)
SELECT a.row, a.col,
       CASE WHEN a.n > {min_n!r} THEN a.s / a.n ELSE nb.fbv END AS value
FROM agg a LEFT JOIN nb ON nb.row = a.row AND nb.col = a.col
"""


def k_nearest_mean_filter(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, k: int = 5
) -> DataFrame:
    """KNearestMeanFilter (image_analysis/k_nearest_mean_filter.rs): mean of
    the k window members (center included) closest in value to the center;
    value ties sort ascending (the reference keeps scan order — documented
    deviation on exact ties)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    pair = F.struct(
        ((F.col("value") - F.col("center")) ** 2).alias("d2"),
        F.col("value").alias("v"),
    )
    agg = m.groupBy("row", "col").agg(F.collect_list(pair).alias("ps"))
    topk = F.slice(F.array_sort(F.col("ps")), 1, k)
    return agg.select(
        "row", "col",
        F.aggregate(
            topk, F.lit(0.0), lambda acc, x: acc + x.getField("v")
        ).alias("s"),
        F.size(topk).alias("n"),
    ).select(
        "row", "col", (F.col("s") / F.col("n")).alias("value")
    )


def k_nearest_mean_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, k: int = 5
) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)},
ranked AS (
  SELECT row, col, value,
         row_number() OVER (PARTITION BY row, col
                            ORDER BY (value - center) * (value - center), value) AS rk
  FROM m
)
SELECT row, col, avg(value) AS value FROM ranked WHERE rk <= {k} GROUP BY row, col
"""


def edge_preserving_mean_filter(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, threshold: float = 15.0
) -> DataFrame:
    """EdgePreservingMeanFilter (image_analysis/
    edge_preserving_mean_filter.rs): mean of window members with
    |zn - z| <= threshold (center always qualifies)."""
    m = _scatter_with_center(cells, filterx=filterx, filtery=filtery)
    ok = F.abs(F.col("value") - F.col("center")) <= threshold
    return m.groupBy("row", "col").agg(
        (
            F.sum(F.when(ok, F.col("value")).otherwise(0.0))
            / F.sum(F.when(ok, 1.0).otherwise(0.0))
        ).alias("value")
    )


def edge_preserving_mean_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, threshold: float = 15.0
) -> str:
    return f"""
WITH {_member_cte(source_sql, filterx=filterx, filtery=filtery)}
SELECT row, col,
       sum(CASE WHEN abs(value - center) <= {threshold!r} THEN value ELSE 0.0 END)
       / sum(CASE WHEN abs(value - center) <= {threshold!r} THEN 1.0 ELSE 0.0 END) AS value
FROM m GROUP BY row, col
"""


def highpass_median_filter(
    cells: DataFrame, *, filterx: int = 3, filtery: int = 3, sig_digits: int = 2
) -> DataFrame:
    """HighPassMedianFilter (image_analysis/highpass_median_filter.rs):
    z minus the window median; the reference medians over
    floor(z*10^sig_digits) bins, mirrored here on the binned values
    (interpolated between the two middle bins for even counts, matching the
    repo's exact median convention on the binned scale, then unscaled)."""
    mult = float(10 ** sig_digits)
    binned = cells.filter(F.col("value").isNotNull()).select(
        "row", "col", "value", F.floor(F.col("value") * mult).alias("bv")
    )
    m = _scatter_with_center(
        binned.select("row", "col", F.col("bv").cast("double").alias("value")),
        filterx=filterx, filtery=filtery,
    )
    med = m.groupBy("row", "col").agg(
        F.median("value").alias("medb")
    )
    return binned.join(med, ["row", "col"]).select(
        "row", "col",
        (F.col("value") - F.col("medb") / F.lit(mult)).alias("value"),
    )


def highpass_median_oracle_sql(
    source_sql: str, *, filterx: int = 3, filtery: int = 3, sig_digits: int = 2
) -> str:
    mult = float(10 ** sig_digits)
    binned_src = (
        f"SELECT row, col, CAST(floor(value * {mult!r}) AS DOUBLE) AS value "
        f"FROM ({source_sql}) WHERE value IS NOT NULL"
    )
    return f"""
WITH {_member_cte(binned_src, filterx=filterx, filtery=filtery)},
med AS (SELECT row, col, median(value) AS medb FROM m GROUP BY row, col),
orig AS (SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL)
SELECT o.row, o.col, o.value - med.medb / {mult!r} AS value
FROM orig o JOIN med ON med.row = o.row AND med.col = o.col
"""


def max_elev_deviation(
    cells: DataFrame, *, scales: list[int] = (3, 5, 9)
) -> DataFrame:
    """MaxElevationDeviation (terrain_analysis/max_elev_deviation.rs):
    across the given square window sizes, the DEV value with the largest
    |DEV| per cell plus the winning scale (|DEV| ties break to the
    smallest scale). -> (row, col, magnitude, scale)."""
    parts = []
    for s in scales:
        parts.append(
            dev_from_mean(cells, filterx=s, filtery=s).select(
                "row", "col", F.col("value").alias("dev"),
                F.lit(int(s)).alias("scale"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pick = u.groupBy("row", "col").agg(
        F.max(
            F.struct(
                F.abs(F.col("dev")).alias("a"), (-F.col("scale")).alias("ns"),
                F.col("dev").alias("dev"), F.col("scale").alias("scale"),
            )
        ).alias("w")
    )
    return pick.select(
        "row", "col", F.col("w.dev").alias("magnitude"),
        F.col("w.scale").cast("long").alias("scale"),
    )


def max_elev_deviation_oracle_sql(
    source_sql: str, *, scales: list[int] = (3, 5, 9)
) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT row, col, value AS dev, {int(s)} AS scale FROM ("
        + dev_from_mean_oracle_sql(source_sql, filterx=s, filtery=s)
        + ") t"
        for s in scales
    )
    return f"""
WITH u AS ({unions}),
pick AS (
  SELECT row, col,
         max(struct_pack(a := abs(dev), ns := -scale, dev := dev, scale := scale)) AS w
  FROM u GROUP BY row, col
)
SELECT row, col, (w).dev AS magnitude, CAST((w).scale AS BIGINT) AS scale
FROM pick
"""
