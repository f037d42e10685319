"""ImpoundmentSizeIndex / InsertDams (hydro_analysis/impoundment_index.rs,
insert_dams.rs, Lindsay 2015).

Stage 1 — dam crest elevation (impoundment_index.rs:370-500): for each cell
and each of the 4 profile directions (E-W, N-S, NE-SW, SE-NW), every
dam_length window that covers the cell is 1-D depression-filled
(filled[i] = min(prefix-max, suffix-max)) and the cell takes the MAX over
all covering windows and all directions. Closed form used here:
  crest(c, d) = max over splits s in [0, 2h] of
                min( max z over [c-s, c],  max z over [c, c+(2h-s)] )
computed per 1-D line with incrementally grown running-max arrays
(O(h) vector passes per line); off-grid / nodata profile slots are -inf,
exactly the reference's NEG_INFINITY padding.

Stage 2 — flow forest: the reference takes flow directions from its
priority-flood backlinks (heap-order-dependent); this engine uses the
deterministic (filled W, plateau-hops, lex) steepest-descent forest of
breach.breach_pointers — the same "every cell drains" forest with a
documented tie rule.

Stage 3 — index (impoundment_index.rs:690-760): the reference propagates
upslope-elevation lists downstream, filtering at each hop by the max
downstream crest (cutoff = filled_dem). cutoff(n) = max crest over the
path from the outlet to n, so it is non-increasing downstream and always
>= crest(n); therefore a cell u is counted at n iff u is strictly
upstream of n and z(u) < crest(n) — the cutoff filter never changes the
outputs. Hence:
  area(n)       = grid_area * #{u strictly upstream : z_u < crest_n}
  volume(n)     = grid_area * sum(crest_n - z_u) over that set
  max_depth(n)  = max(crest_n - z_u) over that set (0 if empty)
  dam_height(n) = crest_n - z_n
Upstream pairs come from a pointer-doubling path closure (O(log path)
rounds; the pair volume equals the total flow-path length — the same
asymptotic cost as the reference's own list propagation, which carries
full upslope elevation vectors downstream).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.distributed import loop_checkpoint
from whitebox_tools_spark.grid import GridSpec

# direction name -> ((line key, position) exprs, (drow, dcol) profile step)
_DIRS = [
    ("ew", lambda r, c: (r, c), (0, 1)),
    ("ns", lambda r, c: (c, r), (1, 0)),
    ("nesw", lambda r, c: (r + c, c), (-1, 1)),  # row+col constant
    ("senw", lambda r, c: (r - c, c), (1, 1)),   # row-col constant
]


def _crest_line_kernel(pdf: pd.DataFrame, h: int) -> pd.DataFrame:
    p = pdf["__pos"].to_numpy(np.int64)
    z = pdf["value"].to_numpy(np.float64)
    p0, p1 = int(p.min()), int(p.max())
    npos = p1 - p0 + 1
    n = npos + 4 * h
    prof = np.full(n, -np.inf)
    prof[p - p0 + 2 * h] = z
    # Rs[t][i] = max prof[i .. i+t], grown incrementally
    rs = [prof.copy()]
    for t in range(1, 2 * h + 1):
        sh = np.full(n, -np.inf)
        sh[:-t] = prof[t:]
        rs.append(np.maximum(rs[-1], sh))
    crest = np.full(n, -np.inf)
    lw = prof.copy()  # L_s[i] = max prof[i-s .. i]
    for s in range(0, 2 * h + 1):
        if s > 0:
            sh = np.full(n, -np.inf)
            sh[s:] = prof[:-s]
            lw = np.maximum(lw, sh)
        crest = np.maximum(crest, np.minimum(lw, rs[2 * h - s]))
    core = slice(2 * h, 2 * h + npos)
    keep = np.isfinite(prof[core])
    return pd.DataFrame({
        "__line": pdf["__line"].iloc[0],
        "__pos": np.arange(p0, p1 + 1)[keep],
        "crest": crest[core][keep],
    })


def _crest_one_dir(src: DataFrame, name: str, key, h: int) -> DataFrame:
    lk, pos = key(F.col("row"), F.col("col"))
    lined = src.select("row", "col", "value", lk.alias("__line"), pos.alias("__pos"))
    agg = lined.groupBy("__line").applyInPandas(
        lambda k, pdf: _crest_line_kernel(pdf, h),
        "__line long, __pos long, crest double",
    )
    return lined.join(agg, ["__line", "__pos"]).select(
        "row", "col", F.col("crest").alias(f"crest_{name}")
    )


def dam_crest_elevation(
    cells: DataFrame, *, dam_length: float = 111.0, per_direction: bool = False
) -> DataFrame:
    """-> (row, col, value, crest) — stage-1 crest elevations (per-direction
    columns crest_ew/ns/nesw/senw kept when per_direction)."""
    h = int(math.floor(float(dam_length) / 2.0))
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    j = src
    for name, key, _step in _DIRS:
        j = j.join(_crest_one_dir(src, name, key, h), ["row", "col"])
    out = j.withColumn(
        "crest", F.greatest(*[F.col(f"crest_{d[0]}") for d in _DIRS])
    )
    if per_direction:
        return out
    return out.select("row", "col", "value", "crest")


def impoundment_size_index(
    cells: DataFrame,
    grid: GridSpec,
    *,
    dam_length: float = 111.0,
    block: int = 256,
    max_rounds: int = 48,
) -> DataFrame:
    """-> (row, col, dam_height, area, volume, max_depth). Contract in the
    module docstring."""
    from whitebox_tools_spark.operators.breach import breach_pointers
    from whitebox_tools_spark.operators.flow_stitch import fill_depressions_tiled

    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    crest = dam_crest_elevation(src, dam_length=dam_length).localCheckpoint(
        eager=True
    )
    filled = fill_depressions_tiled(src, block=block).localCheckpoint(eager=True)
    ptr = breach_pointers(src, filled).filter(F.col("trow").isNotNull())
    key = lambda r, c: r * F.lit(1 << 31) + c  # noqa: E731
    edges = ptr.select(
        key(F.col("row"), F.col("col")).alias("u"),
        key(F.col("trow"), F.col("tcol")).alias("n"),
    ).localCheckpoint(eager=True)
    # pointer-doubling path closure: all (u, downstream node) pairs
    closure = edges
    hop = edges  # current 2^k-step parent map (functional: one n per u)
    for _ in range(max_rounds):
        # new pairs first: u -> nodes 2^k+1 .. 2^(k+1) steps away
        add = (
            hop.alias("a")
            .join(closure.alias("b"), F.col("a.n") == F.col("b.u"))
            .select(F.col("a.u").alias("u"), F.col("b.n").alias("n"))
        )
        closure = closure.unionByName(add).distinct().transform(loop_checkpoint)
        hop = (
            hop.alias("a")
            .join(hop.alias("b"), F.col("a.n") == F.col("b.u"))
            .select(F.col("a.u").alias("u"), F.col("b.n").alias("n"))
            .transform(loop_checkpoint)
        )
        if hop.limit(1).isEmpty():
            break
    up = closure.select(
        F.expr("u DIV 2147483648").alias("urow"),
        (F.col("u") % (1 << 31)).alias("ucol"),
        F.expr("n DIV 2147483648").alias("row"),
        (F.col("n") % (1 << 31)).alias("col"),
    )
    uz = src.select(
        F.col("row").alias("urow"), F.col("col").alias("ucol"),
        F.col("value").alias("uz"),
    )
    ga = grid.res_x * grid.res_y
    agg = (
        up.join(uz, ["urow", "ucol"])
        .join(crest.select("row", "col", "crest"), ["row", "col"])
        .filter(F.col("uz") < F.col("crest"))
        .groupBy("row", "col")
        .agg(
            (F.count(F.lit(1)).cast("double") * F.lit(ga)).alias("area"),
            (F.sum(F.col("crest") - F.col("uz")) * F.lit(ga)).alias("volume"),
            F.max(F.col("crest") - F.col("uz")).alias("max_depth"),
        )
    )
    return (
        crest.join(agg, ["row", "col"], "left")
        .select(
            "row", "col",
            (F.col("crest") - F.col("value")).alias("dam_height"),
            F.coalesce("area", F.lit(0.0)).alias("area"),
            F.coalesce("volume", F.lit(0.0)).alias("volume"),
            F.coalesce("max_depth", F.lit(0.0)).alias("max_depth"),
        )
    )


def insert_dams(
    cells: DataFrame, dams: DataFrame, *, dam_length: float = 111.0
) -> DataFrame:
    """InsertDams (hydro_analysis/insert_dams.rs): raise the DEM along the
    best (highest-crest) dam profile through each dam point: the winning
    direction is the one whose stage-1 crest at the point is largest
    (ties keep the first of E-W, N-S, NE-SW, SE-NW — the reference's
    direction loop order), and the dam_length profile cells centred on the
    point are raised to that crest where lower. dams: (row, col).
    -> (row, col, value)."""
    h = int(math.floor(float(dam_length) / 2.0))
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    crs = dam_crest_elevation(src, dam_length=dam_length, per_direction=True)
    dpts = dams.select("row", "col").distinct().join(crs, ["row", "col"])
    raises = []
    names = [d[0] for d in _DIRS]
    steps = {d[0]: d[2] for d in _DIRS}
    for idx, name in enumerate(names):
        pick = dpts.filter(F.col("crest") == F.col(f"crest_{name}"))
        for prev in names[:idx]:
            pick = pick.filter(F.col("crest") != F.col(f"crest_{prev}"))
        dr, dc = steps[name]
        raises.append(
            pick.select(
                "row", "col", "crest",
                F.explode(F.sequence(F.lit(-h), F.lit(h))).alias("k"),
            ).select(
                (F.col("row") + F.col("k") * dr).alias("row"),
                (F.col("col") + F.col("k") * dc).alias("col"),
                "crest",
            )
        )
    allr = raises[0]
    for r in raises[1:]:
        allr = allr.unionByName(r)
    lift = allr.groupBy("row", "col").agg(F.max("crest").alias("lift"))
    return src.join(lift, ["row", "col"], "left").select(
        "row", "col",
        F.greatest(F.col("value"), F.coalesce("lift", F.col("value"))).alias("value"),
    )


def isi_oracle_sql(
    source_sql: str, grid: GridSpec, *, dam_length: float = 111.0
) -> str:
    """Full DuckDB mirror: window-split crest (exact max/min of raw z),
    the shared deterministic fill/plateau/pointer CTEs (breach.
    fill_ptr_ctes), a recursive walk closure for the strict-upstream
    pairs, and the area/volume/max_depth aggregate."""
    from whitebox_tools_spark.operators.breach import fill_ptr_ctes

    h = int(math.floor(float(dam_length) / 2.0))
    offs = []
    for di, (_name, _key, (dr, dc)) in enumerate(_DIRS):
        for k in range(-2 * h, 2 * h + 1):
            offs.append(f"({di}, {k}, {k * dr}, {k * dc})")
    splits = ", ".join(f"({s})" for s in range(0, 2 * h + 1))
    ga = grid.res_x * grid.res_y
    return f"""
WITH RECURSIVE {fill_ptr_ctes(source_sql)},
offs(dir, k, dr, dc) AS (VALUES {", ".join(offs)}),
splits(s) AS (VALUES {splits}),
mem AS MATERIALIZED (
  SELECT c.row, c.col, o.dir, o.k, coalesce(b.value, -1e308) AS nz
  FROM cells c CROSS JOIN offs o
  LEFT JOIN cells b ON b.row = c.row + o.dr AND b.col = c.col + o.dc
),
arm AS (
  SELECT m.row, m.col, m.dir, s.s,
         max(CASE WHEN m.k BETWEEN -s.s AND 0 THEN m.nz END) AS l,
         max(CASE WHEN m.k BETWEEN 0 AND {2 * h} - s.s THEN m.nz END) AS r
  FROM mem m CROSS JOIN splits s
  GROUP BY m.row, m.col, m.dir, s.s
),
crest AS MATERIALIZED (
  SELECT row, col, max(least(l, r)) AS crest FROM arm GROUP BY row, col
),
walk(urow, ucol, row, col) AS (
  SELECT row, col, trow, tcol FROM ptr
  UNION
  SELECT wk.urow, wk.ucol, p.trow, p.tcol
  FROM walk wk JOIN ptr p ON p.row = wk.row AND p.col = wk.col
),
agg AS (
  SELECT w.row, w.col,
         CAST(count(*) AS DOUBLE) * {ga!r} AS area,
         SUM(cr.crest - u.value) * {ga!r} AS volume,
         max(cr.crest - u.value) AS max_depth
  FROM walk w
  JOIN cells u ON u.row = w.urow AND u.col = w.ucol
  JOIN crest cr ON cr.row = w.row AND cr.col = w.col
  WHERE u.value < cr.crest
  GROUP BY w.row, w.col
)
SELECT c.row, c.col,
       round(cr.crest - c.value, 6) AS dam_height,
       round(coalesce(a.area, 0.0), 6) AS area,
       round(coalesce(a.volume, 0.0), 6) AS volume,
       round(coalesce(a.max_depth, 0.0), 6) AS max_depth
FROM cells c
JOIN crest cr ON cr.row = c.row AND cr.col = c.col
LEFT JOIN agg a ON a.row = c.row AND a.col = c.col
"""
