"""BreachDepressions (hydro_analysis/breach_depressions.rs, Lindsay 2016
hybrid breaching, unconstrained mode).

Reference semantics: a priority flood from the data edges builds a
spanning forest over ORIGINAL elevations; whenever a newly discovered cell
is lower than its discoverer (+ small_num) the back path is carved so the
cell gains a strictly descending exit (z_target decremented by small_num
per step, stopping at the first already-lower cell;
breach_depressions.rs:445-498). Because the early stop is exactly the
running minimum, the carved surface is

    z'(x) = min(z(x),  min over tree-descendants n of  z(n) - s * d(n, x))

with d the tree distance — a min-plus accumulation over the flood forest.

Spark formulation (documented deviation: tie order): the reference's
forest depends on its binary-heap pop order, which is unspecified on
ties. This engine uses the deterministic forest 'steepest descent of
(W, H, row, col)' where W = filled elevation (fill_depressions semantics)
and H = hop distance to a lower-W cell within a W-plateau. Every non-
outlet cell has a strictly smaller (W, H, row, col) neighbor (fill leaves
no local minima; plateaus drain to their pour cells), so the pointer
graph is a forest rooted at the outlets that crosses flats toward the
pour points — the same trench routes the reference carves, with a
documented deterministic tie rule. The carve itself is
flow_stitch.solve_min (hierarchical tile stitch, O(log n) supersteps).

small_num default mirrors breach_depressions.rs:316-322:
ceil(diag_res) / 10^(6 - digits(max_elev)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.distributed import loop_checkpoint

_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _small_num(grid: GridSpec, max_elev: float) -> float:
    diag = math.sqrt(grid.res_x * grid.res_x + grid.res_y * grid.res_y)
    digits = len(str(int(max_elev)))
    return math.ceil(diag) / (10.0 ** (6 - digits))


def plateau_hops(
    filled: DataFrame, *, max_iterations: int = 10_000
) -> DataFrame:
    """-> (row, col, hops): BFS distance to the nearest lower-W cell within
    each equal-W plateau; 0 where a lower-W 8-neighbor (or the outlet
    itself) exists. Rounds = largest plateau DIAMETER (a local property of
    flats/lakes, not the DEM size)."""
    spark = filled.sparkSession
    offsets = spark.createDataFrame(_N8, "dy int, dx int")
    src = filled.select("row", "col", F.col("value").alias("w"))
    nb = (
        src.crossJoin(F.broadcast(offsets))
        .select(
            (F.col("row") + F.col("dy")).alias("row"),
            (F.col("col") + F.col("dx")).alias("col"),
            F.col("w").alias("nw"),
        )
        .groupBy("row", "col")
        .agg(F.min("nw").alias("min_nw"), F.count(F.lit(1)).alias("__n"))
    )
    st = src.agg(
        F.min("row").alias("r0"), F.max("row").alias("r1"),
        F.min("col").alias("c0"), F.max("col").alias("c1"),
    ).collect()[0]
    border = (
        (F.col("row") == st.r0) | (F.col("row") == st.r1)
        | (F.col("col") == st.c0) | (F.col("col") == st.c1)
    )
    cur = (
        src.join(nb, ["row", "col"], "left")
        .withColumn(
            "hops",
            F.when(
                border
                | (F.coalesce(F.col("__n"), F.lit(0)) < 8)
                | (F.col("min_nw") < F.col("w")),
                F.lit(0.0),
            ).otherwise(F.lit(float("inf"))),
        )
        .select("row", "col", "w", "hops")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        relax = (
            cur.crossJoin(F.broadcast(offsets))
            .select(
                (F.col("row") + F.col("dy")).alias("rr"),
                (F.col("col") + F.col("dx")).alias("cc"),
                F.col("w").alias("nw"),
                (F.col("hops") + 1.0).alias("cand"),
            )
            .groupBy("rr", "cc", "nw")
            .agg(F.min("cand").alias("cand"))
        )
        nxt = (
            cur.join(
                relax,
                (F.col("row") == F.col("rr"))
                & (F.col("col") == F.col("cc"))
                & (F.col("w") == F.col("nw")),
                "left",
            )
            .select(
                "row", "col", "w",
                F.least(
                    F.col("hops"), F.coalesce(F.col("cand"), F.col("hops"))
                ).alias("h2"),
                F.col("hops").alias("h1"),
            )
        )
        done = nxt.filter(F.col("h2") != F.col("h1")).limit(1).isEmpty()
        cur = nxt.select("row", "col", "w", F.col("h2").alias("hops")).transform(
            loop_checkpoint
        )
        if done:
            break
    return cur.select(
        "row", "col",
        F.when(F.col("hops") == float("inf"), F.lit(float(2**62)))
        .otherwise(F.col("hops"))
        .cast("long")
        .alias("hops"),
    )


def breach_pointers(cells: DataFrame, filled: DataFrame) -> DataFrame:
    """-> (row, col, trow, tcol): each non-outlet cell points at its
    steepest-descent neighbor under the (W, hops, row, col) key; outlets
    (no smaller key) are roots (trow/tcol NULL)."""
    spark = cells.sparkSession
    hops = plateau_hops(filled)
    keyd = (
        filled.select("row", "col", F.col("value").alias("w"))
        .join(hops, ["row", "col"])
    )
    offsets = spark.createDataFrame(_N8, "dy int, dx int")
    nb = keyd.crossJoin(F.broadcast(offsets)).select(
        (F.col("row") + F.col("dy")).alias("row"),
        (F.col("col") + F.col("dx")).alias("col"),
        F.struct(
            F.col("w").alias("w"),
            F.col("hops").alias("hops"),
            (F.col("row")).alias("trow"),
            (F.col("col")).alias("tcol"),
        ).alias("cand"),
    )
    best = nb.groupBy("row", "col").agg(F.min("cand").alias("best"))
    own = keyd.join(best, ["row", "col"], "left")
    lower = (
        (F.col("best.w") < F.col("w"))
        | ((F.col("best.w") == F.col("w")) & (F.col("best.hops") < F.col("hops")))
        | (
            (F.col("best.w") == F.col("w"))
            & (F.col("best.hops") == F.col("hops"))
            & (
                (F.col("best.trow") < F.col("row"))
                | (
                    (F.col("best.trow") == F.col("row"))
                    & (F.col("best.tcol") < F.col("col"))
                )
            )
        )
    )
    return own.select(
        "row", "col",
        F.when(lower, F.col("best.trow")).alias("trow"),
        F.when(lower, F.col("best.tcol")).alias("tcol"),
    )


def breach_depressions(
    cells: DataFrame,
    grid: GridSpec,
    *,
    flat_increment: float | None = None,
    block: int = 256,
) -> DataFrame:
    """-> (row, col, value): the breached DEM (carved trenches, original
    elevations elsewhere). See module docstring for the exact contract."""
    from whitebox_tools_spark.operators.flow_stitch import (
        fill_depressions_tiled,
        solve_min,
    )

    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    if flat_increment is None:
        mx = src.agg(F.max("value")).collect()[0][0]
        s = _small_num(grid, float(mx))
    else:
        s = float(flat_increment)
    filled = fill_depressions_tiled(src, block=block).localCheckpoint(eager=True)
    ptr = breach_pointers(src, filled)
    nodes = src.join(ptr, ["row", "col"], "left").select(
        "row", "col",
        F.col("value").alias("v0"),
        F.lit(0).cast("long").alias("steps"),
        F.col("trow").alias("nrow"),
        F.col("tcol").alias("ncol"),
        F.lit(1).cast("long").alias("len"),
    )
    out = solve_min(nodes, s, block=block)
    return out.select("row", "col", F.col("fa").alias("value"))


def fill_ptr_ctes(source_sql: str) -> str:
    """Shared recursive-CTE text: minimax fill (wtab) -> plateau BFS (hmin)
    -> lexicographic steepest-descent pointers (ptr) — the deterministic
    flood forest used by breach_depressions AND impoundment_size_index.
    Returns the CTE body from `cells` through `ptr` (caller supplies
    WITH RECURSIVE and everything after)."""
    return _FILL_PTR_CTES.format(source_sql=source_sql)


def breach_oracle_sql(source_sql: str, grid: GridSpec) -> str:
    """Independent DuckDB mirror of the SAME deterministic contract:
    recursive-CTE minimax fill -> plateau BFS -> lexicographic steepest-
    descent pointers -> carve walk accumulating z(origin) - s * depth
    (canonical one-multiply form, matching _minplus_kernel)."""
    diag_ceil = math.ceil(math.sqrt(grid.res_x * grid.res_x + grid.res_y * grid.res_y))
    return f"""
WITH RECURSIVE cells AS MATERIALIZED (
  SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL
),
adj AS MATERIALIZED (
  SELECT a.row AS ur, a.col AS uc, b.row AS vr, b.col AS vc, b.value AS vz
  FROM cells a JOIN cells b
    ON abs(b.row - a.row) <= 1 AND abs(b.col - a.col) <= 1
   AND NOT (b.row = a.row AND b.col = a.col)
),
bounds AS (SELECT min(row) AS r0, max(row) AS r1, min(col) AS c0, max(col) AS c1 FROM cells),
deg AS (SELECT ur AS row, uc AS col, count(*) AS n FROM adj GROUP BY 1, 2),
outlets AS (
  SELECT c.row, c.col, c.value
  FROM cells c CROSS JOIN bounds b
  LEFT JOIN deg d ON d.row = c.row AND d.col = c.col
  WHERE c.row = b.r0 OR c.row = b.r1 OR c.col = b.c0 OR c.col = b.c1
     OR coalesce(d.n, 0) < 8
),
f(row, col, w) AS (
  SELECT row, col, value FROM outlets
  UNION
  SELECT e.vr, e.vc, greatest(e.vz, f.w)
  FROM f JOIN adj e ON e.ur = f.row AND e.uc = f.col
),
wtab AS MATERIALIZED (SELECT row, col, min(w) AS w FROM f GROUP BY 1, 2),
smax AS (
  SELECT {diag_ceil} / pow(10, 6 - length(CAST(CAST(max(value) AS BIGINT) AS VARCHAR))) AS s
  FROM cells
),
nn AS (SELECT count(*) AS n FROM cells),
h(row, col, hops) AS (
  SELECT w1.row, w1.col, 0
  FROM wtab w1
  LEFT JOIN outlets o ON o.row = w1.row AND o.col = w1.col
  WHERE o.row IS NOT NULL OR EXISTS (
    SELECT 1 FROM adj a JOIN wtab w2 ON w2.row = a.vr AND w2.col = a.vc
    WHERE a.ur = w1.row AND a.uc = w1.col AND w2.w < w1.w
  )
  UNION
  SELECT a.vr, a.vc, h.hops + 1
  FROM h
  JOIN adj a ON a.ur = h.row AND a.uc = h.col
  JOIN wtab w1 ON w1.row = h.row AND w1.col = h.col
  JOIN wtab w2 ON w2.row = a.vr AND w2.col = a.vc
  CROSS JOIN nn
  WHERE w2.w = w1.w AND h.hops + 1 < nn.n
),
hmin AS MATERIALIZED (SELECT row, col, min(hops) AS hops FROM h GROUP BY 1, 2),
k AS MATERIALIZED (
  SELECT w.row, w.col, w.w, coalesce(hm.hops, 4611686018427387904) AS hops
  FROM wtab w LEFT JOIN hmin hm ON hm.row = w.row AND hm.col = w.col
),
ptr AS MATERIALIZED (
  SELECT row, col, trow, tcol FROM (
    SELECT k1.row, k1.col, a.vr AS trow, a.vc AS tcol,
           row_number() OVER (
             PARTITION BY k1.row, k1.col
             ORDER BY k2.w, k2.hops, a.vr, a.vc
           ) AS rn
    FROM k k1
    JOIN adj a ON a.ur = k1.row AND a.uc = k1.col
    JOIN k k2 ON k2.row = a.vr AND k2.col = a.vc
    WHERE (k2.w, k2.hops, a.vr, a.vc) < (k1.w, k1.hops, k1.row, k1.col)
  ) WHERE rn = 1
),
walk(srow, scol, row, col, d) AS (
  SELECT row, col, row, col, 0 FROM cells
  UNION
  SELECT wk.srow, wk.scol, p.trow, p.tcol, wk.d + 1
  FROM walk wk JOIN ptr p ON p.row = wk.row AND p.col = wk.col
)
SELECT wk.row, wk.col, round(min(cs.value - sm.s * wk.d), 6) AS value
FROM walk wk
JOIN cells cs ON cs.row = wk.srow AND cs.col = wk.scol
CROSS JOIN smax sm
GROUP BY wk.row, wk.col
"""


# ---------------------------------------------------------------------------
# BreachDepressionsLeastCost
# (hydro_analysis/breach_depressions_least_cost.rs:235+, Lindsay & Dhun 2015)
# ---------------------------------------------------------------------------
# Reference semantics: (1) every interior pit (all 8 neighbors present and
# none strictly lower) is raised to min(neighbors) - s, with
# s = ceil(diag_res) / 10^(9 - digits(max_elev))
# (breach_depressions_least_cost.rs:380-385,427); (2) for each pit, a
# least-cost search radiates outward — the cost of entering a cell at path
# length L is cost2 = z - (z_pit - L*s); with min_dist the edge weight is
# (cost1+cost2)/2 * grid_dist, else cost2 alone
# (rs:530-537) — until the first cell with z <= z_pit - L*s (or nodata) is
# found (rs:546), whereupon the back path is carved down to the ramp
# z_pit - L*s wherever it is higher (rs:550-560); pushes are gated at
# path length <= dist, so targets may sit at Chebyshev radius dist+1;
# (3) searches exceeding max_cost are abandoned and (with --fill) resolved
# by depression filling (rs:601+).
#
# Documented deviations (deterministic, partition-invariant):
#   * the reference processes pits serially lowest-to-highest so later pits
#     may reuse earlier channels; this engine breaches every original pit
#     INDEPENDENTLY against the pit-raised surface and min-combines the
#     carves. Each carved path still descends strictly into its target
#     under the min-combine (a path cell lowered further by another carve
#     is followed by that carve's even lower continuation), so the combined
#     surface is drainable wherever the serial one is.
#   * heap ties pop in (cost, row, col) order (the reference's BinaryHeap
#     tie order is unspecified); neighbor scan order is the reference's
#     clockwise-from-NE order (rs:356-357).
#   * --fill uses the engine's minimax priority-flood fill (flat fill, same
#     contract as fill_depressions) over the breached surface, which raises
#     exactly the cells of unbreached depressions.

_DX_LC = [1, 1, 1, 0, -1, -1, -1, 0]
_DY_LC = [-1, 0, 1, 1, 1, 0, -1, -1]


def _small_num_lc(grid: GridSpec, max_elev: float) -> float:
    diag = math.sqrt(grid.res_x * grid.res_x + grid.res_y * grid.res_y)
    digits = len(str(int(max_elev)))
    return math.ceil(diag) / (10.0 ** (9 - digits))


def raise_pits(cells: DataFrame, s: float) -> DataFrame:
    """-> (row, col, value, pit): interior no-lower-neighbor cells raised to
    min(neighbor) - s (rs:393-433). One offset scatter + hash aggregate."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select("row", "col", "value")
    offsets = spark.createDataFrame(list(zip(_DY_LC, _DX_LC)), "dy int, dx int")
    nb = (
        src.crossJoin(F.broadcast(offsets))
        .select(
            (F.col("row") + F.col("dy")).alias("row"),
            (F.col("col") + F.col("dx")).alias("col"),
            F.col("value").alias("zn"),
        )
        .groupBy("row", "col")
        .agg(F.min("zn").alias("min_nb"), F.count(F.lit(1)).alias("__n"))
    )
    return (
        src.join(nb, ["row", "col"], "left")
        .withColumn(
            "pit",
            (F.coalesce(F.col("__n"), F.lit(0)) == 8)
            & (F.col("min_nb") >= F.col("value")),
        )
        .select(
            "row", "col",
            F.when(F.col("pit"), F.col("min_nb") - F.lit(s))
            .otherwise(F.col("value"))
            .alias("value"),
            "pit",
        )
    )


def breach_depressions_least_cost(
    cells: DataFrame,
    grid: GridSpec,
    *,
    dist: int = 20,
    max_cost: float | None = None,
    min_dist: bool = True,
    fill: bool = True,
    flat_increment: float | None = None,
    tile: int = 256,
) -> DataFrame:
    """-> (row, col, value): least-cost-breached DEM. See contract above.

    Scale shape: pit raise = one scatter aggregate; the per-pit Dijkstra is
    local to a (tile + dist+1 halo) dense block (search is bounded at
    Chebyshev radius dist+1 by construction), shipped once per tile via
    applyInPandas; carves min-combine in one hash aggregate; the optional
    fill is the O(log n) tiled priority-flood. No driver-side iteration."""
    from whitebox_tools_spark.operators.flow_stitch import fill_depressions_tiled

    if flat_increment is None:
        mx = cells.agg(F.max("value")).collect()[0][0]
        s = _small_num_lc(grid, float(mx))
    else:
        s = float(flat_increment)
    raised = raise_pits(cells, s).localCheckpoint(eager=True)

    T, H = int(tile), int(dist) + 1
    e1 = raised.select(
        "row", "col", "value", "pit",
        F.explode(
            F.sequence(F.floor((F.col("row") - H) / T), F.floor((F.col("row") + H) / T))
        ).alias("tr"),
    )
    e2 = e1.select(
        "row", "col", "value", "pit", "tr",
        F.explode(
            F.sequence(F.floor((F.col("col") - H) / T), F.floor((F.col("col") + H) / T))
        ).alias("tc"),
    )

    mc = float("inf") if max_cost is None else float(max_cost)
    md = bool(min_dist)
    rx, ry = float(grid.res_x), float(grid.res_y)
    diag = math.sqrt(rx * rx + ry * ry)
    cdist = [diag, rx, diag, ry, diag, rx, diag, ry]
    max_len = int(dist)

    def kernel(pdf):
        import heapq

        import numpy as np
        import pandas as pd

        t_r = int(pdf["tr"].iloc[0])
        t_c = int(pdf["tc"].iloc[0])
        r0, c0 = t_r * T - H, t_c * T - H
        side = T + 2 * H
        dense = np.full((side, side), np.nan)
        rr = pdf["row"].to_numpy() - r0
        cc = pdf["col"].to_numpy() - c0
        dense[rr, cc] = pdf["value"].to_numpy()
        core = (rr >= H) & (rr < T + H) & (cc >= H) & (cc < T + H)
        pit_mask = pdf["pit"].to_numpy() & core
        prs, pcs = rr[pit_mask], cc[pit_mask]
        out_r, out_c, out_v = [], [], []
        order = np.lexsort((pcs, prs))
        for pr, pc in zip(prs[order], pcs[order]):
            z = dense[pr, pc]
            heap = [(0.0, int(pr), int(pc))]
            enc = {(int(pr), int(pc))}
            plen = {(int(pr), int(pc)): 0}
            back: dict = {}
            solved = False
            while heap and not solved:
                accum, r, c = heapq.heappop(heap)
                if accum > mc:
                    break
                L = plen[(r, c)]
                zc = dense[r, c] if 0 <= r < side and 0 <= c < side else np.nan
                cost1 = zc - z + L * s
                for n in range(8):
                    rn, cn = r + _DY_LC[n], c + _DX_LC[n]
                    if (rn, cn) in enc:
                        continue
                    Ln = L + 1
                    plen[(rn, cn)] = Ln
                    back[(rn, cn)] = (r, c)
                    inb = 0 <= rn < side and 0 <= cn < side
                    zn = dense[rn, cn] if inb else np.nan
                    zout = z - Ln * s
                    if not np.isnan(zn) and zn > zout:
                        enc.add((rn, cn))
                        cost2 = zn - zout
                        if Ln <= max_len:
                            w = (cost1 + cost2) / 2.0 * cdist[n] if md else cost2
                            heapq.heappush(heap, (accum + w, rn, cn))
                    else:
                        # breach target found: carve the back path
                        br, bc = rn, cn
                        while (br, bc) in back:
                            br, bc = back[(br, bc)]
                            Lb = plen[(br, bc)]
                            zb = z - Lb * s
                            if dense[br, bc] > zb:
                                out_r.append(br + r0)
                                out_c.append(bc + c0)
                                out_v.append(zb)
                        solved = True
                        break
        return pd.DataFrame(
            {"row": np.array(out_r, dtype="int64"),
             "col": np.array(out_c, dtype="int64"),
             "value": np.array(out_v, dtype="float64")}
        )

    carves = (
        e2.groupBy("tr", "tc")
        .applyInPandas(lambda key, pdf: kernel(pdf), "row long, col long, value double")
        .groupBy("row", "col")
        .agg(F.min("value").alias("carve"))
    )
    breached = (
        raised.join(carves, ["row", "col"], "left")
        .select(
            "row", "col",
            F.least(F.col("value"), F.coalesce(F.col("carve"), F.col("value"))).alias(
                "value"
            ),
        )
    )
    if not fill:
        return breached
    return fill_depressions_tiled(breached, block=tile).select("row", "col", "value")


_FILL_PTR_CTES = """cells AS MATERIALIZED (
  SELECT row, col, value FROM ({source_sql}) WHERE value IS NOT NULL
),
adj AS MATERIALIZED (
  SELECT a.row AS ur, a.col AS uc, b.row AS vr, b.col AS vc, b.value AS vz
  FROM cells a JOIN cells b
    ON abs(b.row - a.row) <= 1 AND abs(b.col - a.col) <= 1
   AND NOT (b.row = a.row AND b.col = a.col)
),
bounds AS (SELECT min(row) AS r0, max(row) AS r1, min(col) AS c0, max(col) AS c1 FROM cells),
deg AS (SELECT ur AS row, uc AS col, count(*) AS n FROM adj GROUP BY 1, 2),
outlets AS (
  SELECT c.row, c.col, c.value
  FROM cells c CROSS JOIN bounds b
  LEFT JOIN deg d ON d.row = c.row AND d.col = c.col
  WHERE c.row = b.r0 OR c.row = b.r1 OR c.col = b.c0 OR c.col = b.c1
     OR coalesce(d.n, 0) < 8
),
f(row, col, w) AS (
  SELECT row, col, value FROM outlets
  UNION
  SELECT e.vr, e.vc, greatest(e.vz, f.w)
  FROM f JOIN adj e ON e.ur = f.row AND e.uc = f.col
),
wtab AS MATERIALIZED (SELECT row, col, min(w) AS w FROM f GROUP BY 1, 2),
nn AS (SELECT count(*) AS n FROM cells),
h(row, col, hops) AS (
  SELECT w1.row, w1.col, 0
  FROM wtab w1
  LEFT JOIN outlets o ON o.row = w1.row AND o.col = w1.col
  WHERE o.row IS NOT NULL OR EXISTS (
    SELECT 1 FROM adj a JOIN wtab w2 ON w2.row = a.vr AND w2.col = a.vc
    WHERE a.ur = w1.row AND a.uc = w1.col AND w2.w < w1.w
  )
  UNION
  SELECT a.vr, a.vc, h.hops + 1
  FROM h
  JOIN adj a ON a.ur = h.row AND a.uc = h.col
  JOIN wtab w1 ON w1.row = h.row AND w1.col = h.col
  JOIN wtab w2 ON w2.row = a.vr AND w2.col = a.vc
  CROSS JOIN nn
  WHERE w2.w = w1.w AND h.hops + 1 < nn.n
),
hmin AS MATERIALIZED (SELECT row, col, min(hops) AS hops FROM h GROUP BY 1, 2),
k AS MATERIALIZED (
  SELECT w.row, w.col, w.w, coalesce(hm.hops, 4611686018427387904) AS hops
  FROM wtab w LEFT JOIN hmin hm ON hm.row = w.row AND hm.col = w.col
),
ptr AS MATERIALIZED (
  SELECT row, col, trow, tcol FROM (
    SELECT k1.row, k1.col, a.vr AS trow, a.vc AS tcol,
           row_number() OVER (
             PARTITION BY k1.row, k1.col
             ORDER BY k2.w, k2.hops, a.vr, a.vc
           ) AS rn
    FROM k k1
    JOIN adj a ON a.ur = k1.row AND a.uc = k1.col
    JOIN k k2 ON k2.row = a.vr AND k2.col = a.vc
    WHERE (k2.w, k2.hops, a.vr, a.vc) < (k1.w, k1.hops, k1.row, k1.col)
  ) WHERE rn = 1
)"""
