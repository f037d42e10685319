"""Tile-stitched iterative hydrology (class ITR, scale path).

The superstep-peel formulations of D8 flow accumulation and depression
filling are exact but need O(longest-flow-path) Spark rounds — wall-clock
death on a continental DEM even though each round is cheap. This module
re-answers the same two tools with a HIERARCHICAL tile decomposition whose
driver-visible superstep count is O(log n):

1. ``solve_fa`` — accumulation over a functional flow graph (out-degree
   <= 1, a DAG: exactly the D8 pointer graph,
   hydro_analysis/d8_flow_accum.rs:525-570). Per spatial tile, one
   Arrow-batched numpy kernel resolves all in-tile flow (topological
   accumulate + path-exit mapping). Flow that crosses tiles reduces to the
   SAME problem on the much smaller inlet graph (nodes = cells receiving
   cross-tile flow, next = the cross-edge their in-tile path exits
   through), which recurses with 8x coarser blocks until the graph fits a
   single kernel task. Unwinding re-runs each tile kernel once with the
   solved external inflows injected at the inlets. Supersteps per level:
   O(1); levels: O(log_8 of tile count). The result is exactly the
   reference's accumulation (integer flows in f64 are order-independent).

2. ``fill_depressions_tiled`` — R. Barnes, "Parallel non-blocking
   deterministic algorithm for priority-flood depression filling"
   (2016, public paper): per tile, a multi-source priority flood from the
   tile perimeter labels every cell with its best outlet and the fill
   level relative to it; adjacent-label spill elevations form a tiny graph
   over perimeter seeds whose minimax distance to the real DEM border
   gives each seed's global water level; one final per-tile pass takes
   max(local fill, seed level). Matches the Planchon-Darboux fixpoint
   (hydro.fill_depressions) bit-for-bit — pytest-pinned.

Both kernels run inside applyInPandas tasks: the per-tile work is
single-pass numpy over <= tile^2 cells, no Python-per-row in any shuffle.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

_FA_SCHEMA = (
    "row long, col long, fa double, xrow long, xcol long, erow long, ecol long"
)
# xrow/xcol: node's OWN next when it leaves the group (a direct cross edge)
# erow/ecol: target of the cross edge the node's downstream PATH exits by


def _fa_kernel(pdf: pd.DataFrame, op: str = "sum") -> pd.DataFrame:
    """Per-group accumulation over a functional graph in the (op, identity)
    monoid — op='sum' (flow accumulation) or 'max' (max-upslope
    propagation; identity is the seed itself).

    Input columns: row, col, w, nrow, ncol (next pointers; NaN = terminal).
    In-group edges are resolved positionally; edges leaving the group are
    reported as cross edges. Returns fa (in-group accumulation of w) and
    the path-exit mapping for every node."""
    n = len(pdf)
    row = pdf["row"].to_numpy(np.int64)
    col = pdf["col"].to_numpy(np.int64)
    w = pdf["w"].to_numpy(np.float64)
    nrow = pdf["nrow"].to_numpy(np.float64)
    ncol = pdf["ncol"].to_numpy(np.float64)
    has_next = ~np.isnan(nrow)

    # map next -> in-group index (row-major key hash via sorted search)
    key = row * np.int64(1 << 32) + col
    order = np.argsort(key, kind="stable")
    skey = key[order]
    nr = nrow[has_next].astype(np.int64)
    nc = ncol[has_next].astype(np.int64)
    nkey = nr * np.int64(1 << 32) + nc
    pos = np.searchsorted(skey, nkey)
    pos_c = np.clip(pos, 0, n - 1)
    in_group = skey[pos_c] == nkey
    nxt = np.full(n, -1, np.int64)
    idx_has = np.flatnonzero(has_next)
    nxt[idx_has[in_group]] = order[pos_c[in_group]]
    # direct cross edges: node has a next but it is not in this group
    cross = np.zeros(n, bool)
    cross[idx_has[~in_group]] = True

    # Kahn topological accumulate (frontier chunks saved for the reverse
    # exit-propagation pass); loop count = in-group DAG depth, numpy-only
    fa = w.copy()
    indeg = np.bincount(nxt[nxt >= 0], minlength=n)
    frontier = np.flatnonzero(indeg == 0)
    chunks = []
    while frontier.size:
        chunks.append(frontier)
        t = nxt[frontier]
        valid = t >= 0
        tv = t[valid]
        if op == "sum":
            np.add.at(fa, tv, fa[frontier[valid]])
        else:
            np.maximum.at(fa, tv, fa[frontier[valid]])
        indeg -= np.bincount(tv, minlength=n)
        cand = np.unique(tv)
        frontier = cand[indeg[cand] == 0]

    # exit propagation in reverse topological order: a node's path-exit is
    # its own cross edge, else its in-group next's path-exit
    erow = np.full(n, -1, np.int64)
    ecol = np.full(n, -1, np.int64)
    has_exit = np.zeros(n, bool)
    xr = np.where(cross, nrow, np.nan)
    xc = np.where(cross, ncol, np.nan)
    for ch in reversed(chunks):
        c_cross = ch[cross[ch]]
        erow[c_cross] = xr[c_cross].astype(np.int64)
        ecol[c_cross] = xc[c_cross].astype(np.int64)
        has_exit[c_cross] = True
        c_in = ch[nxt[ch] >= 0]
        t = nxt[c_in]
        erow[c_in] = erow[t]
        ecol[c_in] = ecol[t]
        has_exit[c_in] = has_exit[t]

    out = pd.DataFrame(
        {
            "row": row,
            "col": col,
            "fa": fa,
            "xrow": np.where(cross, nrow, np.nan),
            "xcol": np.where(cross, ncol, np.nan),
            "erow": np.where(has_exit, erow, np.nan).astype("float64"),
            "ecol": np.where(has_exit, ecol, np.nan).astype("float64"),
        }
    )
    out["xrow"] = out["xrow"].astype("Int64")
    out["xcol"] = out["xcol"].astype("Int64")
    out["erow"] = out["erow"].astype("Int64")
    out["ecol"] = out["ecol"].astype("Int64")
    return out


def _grouped_fa(nodes: DataFrame, block: int, op: str = "sum") -> DataFrame:
    """Run the per-tile kernel grouped by spatial block."""
    keyed = nodes.withColumn("gr", F.floor(F.col("row") / F.lit(block))).withColumn(
        "gc", F.floor(F.col("col") / F.lit(block))
    )
    return keyed.groupBy("gr", "gc").applyInPandas(
        lambda pdf: _fa_kernel(pdf, op), _FA_SCHEMA
    )


def solve_fa(
    nodes: DataFrame,
    *,
    block: int = 256,
    scale: int = 8,
    direct_threshold: int = 200_000,
    max_levels: int = 12,
    op: str = "sum",
) -> DataFrame:
    """Accumulate ``w`` over a functional flow graph.

    nodes: (row, col, w, nrow, ncol) with (nrow, ncol) the unique downslope
    target (NULL = terminal). Returns (row, col, fa) with
    fa(c) = sum of w(a) over every node a whose flow path passes through c
    (a = c included) — the reference's flow-accumulation semantics.

    Recursion: tile kernels solve everything in-tile; the inlet graph
    (one node per cell that receives cross-tile flow) recurses at 8x
    coarser blocks. Each level adds O(1) Spark jobs, so the whole solve is
    O(log) supersteps instead of O(longest flow path).
    """
    n = nodes.count()
    if n == 0:
        return nodes.sparkSession.createDataFrame([], "row long, col long, fa double")
    if n <= direct_threshold:
        # single kernel task solves the whole graph
        one = nodes.withColumn("gr", F.lit(0)).withColumn("gc", F.lit(0))
        solved = one.groupBy("gr", "gc").applyInPandas(
            lambda pdf: _fa_kernel(pdf, op), _FA_SCHEMA
        )
        return solved.select("row", "col", "fa")

    local = _grouped_fa(nodes, block, op).localCheckpoint(eager=True)

    # cross edges u -> v: flow = fa_local(u)
    cross = local.filter(F.col("xrow").isNotNull()).select(
        F.col("xrow").alias("row"), F.col("xcol").alias("col"), F.col("fa").alias("flow")
    )
    agg_fn = F.sum if op == "sum" else F.max
    base = cross.groupBy("row", "col").agg(agg_fn("flow").alias("w"))
    if max_levels <= 1:
        raise RuntimeError("solve_fa: recursion limit hit (graph too deep)")
    # sub-graph over inlets: next = target of the cross edge the inlet's
    # path exits through (itself an inlet, or terminal)
    sub_nodes = base.join(
        local.select("row", "col", F.col("erow").alias("nrow"), F.col("ecol").alias("ncol")),
        ["row", "col"],
        "left",
    )
    sub_fa = solve_fa(
        sub_nodes,
        block=block * scale,
        scale=scale,
        direct_threshold=direct_threshold,
        max_levels=max_levels - 1,
        op=op,
    )

    # unwind: inject solved external inflow at the inlets and re-run tiles
    seeded = nodes.join(
        sub_fa.select("row", "col", F.col("fa").alias("__in")), ["row", "col"], "left"
    )
    if op == "sum":
        seeded = seeded.withColumn(
            "w", F.col("w") + F.coalesce(F.col("__in"), F.lit(0.0))
        )
    else:
        seeded = seeded.withColumn(
            "w", F.greatest(F.col("w"), F.coalesce(F.col("__in"), F.col("w")))
        )
    seeded = seeded.drop("__in")
    final = _grouped_fa(seeded, block, op)
    return final.select("row", "col", "fa")


def d8_flow_accumulation_tiled(
    cells: DataFrame, grid: GridSpec, *, block: int = 256
) -> DataFrame:
    """D8FlowAccumulation (hydro_analysis/d8_flow_accum.rs:525-570) via the
    hierarchical tile stitch — exact same output as the superstep peel
    (pytest-pinned bit-match), O(log n) Spark rounds."""
    from whitebox_tools_spark.operators.hydro import _flow_edges

    src = cells.filter(F.col("value").isNotNull()).select("row", "col")
    edges = _flow_edges(cells, grid)
    nodes = src.join(edges, ["row", "col"], "left").select(
        "row",
        "col",
        F.lit(1.0).alias("w"),
        F.col("trow").alias("nrow"),
        F.col("tcol").alias("ncol"),
    )
    return solve_fa(nodes, block=block).select(
        "row", "col", F.col("fa").alias("value")
    )


# ---------------------------------------------------------------------------
# min-plus variant: carve propagation for BreachDepressions
# ---------------------------------------------------------------------------
_MIN_SCHEMA = (
    "row long, col long, fa double, v0 double, steps long, "
    "xrow long, xcol long, xlen long, erow long, ecol long, elen long"
)


def _minplus_kernel(pdf: pd.DataFrame, s: float) -> pd.DataFrame:
    """Per-group min-plus accumulation over a functional graph.

    Propagates the best (origin value v0, step count) pair along next
    pointers; every comparison and the emitted fa use the CANONICAL form
    v0 - s * steps (one multiply, one subtract), so the result is
    bit-identical no matter how the path is chunked across stitch levels —
    required for exact agreement with the SQL oracle, which computes
    z(origin) - s * depth directly. Input: row, col, v0, steps, nrow,
    ncol, len. Emits the in-group best per node, the direct cross edge
    (xrow/xcol/xlen) and the path-exit target + step count (erow/ecol/
    elen)."""
    n = len(pdf)
    row = pdf["row"].to_numpy(np.int64)
    col = pdf["col"].to_numpy(np.int64)
    v0 = pdf["v0"].to_numpy(np.float64)
    steps = pdf["steps"].to_numpy(np.int64)
    nrow = pdf["nrow"].to_numpy(np.float64)
    ncol = pdf["ncol"].to_numpy(np.float64)
    elen = pdf["len"].to_numpy(np.float64)
    has_next = ~np.isnan(nrow)

    key = row * np.int64(1 << 32) + col
    order = np.argsort(key, kind="stable")
    skey = key[order]
    nr = nrow[has_next].astype(np.int64)
    nc = ncol[has_next].astype(np.int64)
    nkey = nr * np.int64(1 << 32) + nc
    pos = np.searchsorted(skey, nkey)
    pos_c = np.clip(pos, 0, n - 1)
    in_group = skey[pos_c] == nkey
    nxt = np.full(n, -1, np.int64)
    idx_has = np.flatnonzero(has_next)
    nxt[idx_has[in_group]] = order[pos_c[in_group]]
    cross = np.zeros(n, bool)
    cross[idx_has[~in_group]] = True

    best_v0 = v0.copy()
    best_st = steps.copy()

    def canon(v, k):
        return v - s * k

    indeg = np.bincount(nxt[nxt >= 0], minlength=n)
    frontier = np.flatnonzero(indeg == 0)
    chunks = []
    while frontier.size:
        chunks.append(frontier)
        t = nxt[frontier]
        valid = t >= 0
        fu = frontier[valid]
        tv = t[valid]
        if tv.size == 0:
            break
        c_v0 = best_v0[fu]
        c_st = best_st[fu] + elen[fu].astype(np.int64)
        cand = canon(c_v0, c_st)
        # grouped argmin over shared targets (ties: lower v0 then steps)
        srt = np.lexsort((c_st, c_v0, cand, tv))
        tv_s = tv[srt]
        first = np.flatnonzero(np.r_[True, tv_s[1:] != tv_s[:-1]])
        pick = srt[first]
        tgt = tv[pick]
        better = canon(c_v0[pick], c_st[pick]) < canon(best_v0[tgt], best_st[tgt])
        upd = tgt[better]
        best_v0[upd] = c_v0[pick][better]
        best_st[upd] = c_st[pick][better]
        indeg -= np.bincount(tv, minlength=n)
        frontier = tgt[indeg[tgt] == 0]

    erow = np.full(n, -1, np.int64)
    ecol = np.full(n, -1, np.int64)
    elen_out = np.zeros(n, np.int64)
    has_exit = np.zeros(n, bool)
    for ch in reversed(chunks):
        c_cross = ch[cross[ch]]
        erow[c_cross] = nrow[c_cross].astype(np.int64)
        ecol[c_cross] = ncol[c_cross].astype(np.int64)
        elen_out[c_cross] = elen[c_cross].astype(np.int64)
        has_exit[c_cross] = True
        c_in = ch[nxt[ch] >= 0]
        t = nxt[c_in]
        erow[c_in] = erow[t]
        ecol[c_in] = ecol[t]
        elen_out[c_in] = elen[c_in].astype(np.int64) + elen_out[t]
        has_exit[c_in] = has_exit[t]

    out = pd.DataFrame(
        {
            "row": row,
            "col": col,
            "fa": canon(best_v0, best_st),
            "v0": best_v0,
            "steps": best_st,
            "xrow": np.where(cross, nrow, np.nan),
            "xcol": np.where(cross, ncol, np.nan),
            "xlen": np.where(cross, elen, np.nan),
            "erow": np.where(has_exit, erow, np.nan).astype("float64"),
            "ecol": np.where(has_exit, ecol, np.nan).astype("float64"),
            "elen": np.where(has_exit, elen_out, np.nan).astype("float64"),
        }
    )
    for c in ("xrow", "xcol", "xlen", "erow", "ecol", "elen"):
        out[c] = out[c].astype("Int64")
    return out


def solve_min(
    nodes: DataFrame,
    s: float,
    *,
    block: int = 256,
    scale: int = 8,
    direct_threshold: int = 200_000,
    max_levels: int = 12,
) -> DataFrame:
    """Min-plus accumulation over a functional flow graph: returns
    fa(c) = min over every node a whose pointer path passes through c of
    (v0(a) - s * (steps(a) + pathlen(a -> c))), evaluated canonically.
    nodes: (row, col, v0, steps, nrow, ncol, len); top-level callers pass
    steps = 0 and len = 1. Same hierarchical tile recursion as solve_fa —
    O(log) supersteps."""
    n = nodes.count()
    if n == 0:
        return nodes.sparkSession.createDataFrame(
            [], "row long, col long, fa double, v0 double, steps long"
        )
    if n <= direct_threshold:
        one = nodes.withColumn("gr", F.lit(0)).withColumn("gc", F.lit(0))
        solved = one.groupBy("gr", "gc").applyInPandas(
            lambda pdf: _minplus_kernel(pdf, s), _MIN_SCHEMA
        )
        return solved.select("row", "col", "fa", "v0", "steps")

    def grouped(nd):
        keyed = nd.withColumn("gr", F.floor(F.col("row") / F.lit(block))).withColumn(
            "gc", F.floor(F.col("col") / F.lit(block))
        )
        return keyed.groupBy("gr", "gc").applyInPandas(
            lambda pdf: _minplus_kernel(pdf, s), _MIN_SCHEMA
        )

    local = grouped(nodes).localCheckpoint(eager=True)
    # cross edges carry the best (v0, steps) across the boundary; argmin
    # per target by the canonical value (min_by on a canonical/v0/steps
    # struct keeps the comparison form identical everywhere)
    cross = local.filter(F.col("xrow").isNotNull()).select(
        F.col("xrow").alias("row"),
        F.col("xcol").alias("col"),
        F.col("v0"),
        (F.col("steps") + F.col("xlen")).alias("steps"),
    ).withColumn("cval", F.col("v0") - F.lit(s) * F.col("steps"))
    base = cross.groupBy("row", "col").agg(
        F.min(F.struct("cval", "v0", "steps")).alias("b")
    ).select("row", "col", F.col("b.v0").alias("v0"), F.col("b.steps").alias("steps"))
    if max_levels <= 1:
        raise RuntimeError("solve_min: recursion limit hit (graph too deep)")
    sub_nodes = base.join(
        local.select(
            "row", "col",
            F.col("erow").alias("nrow"), F.col("ecol").alias("ncol"),
            F.col("elen").alias("len"),
        ),
        ["row", "col"],
        "left",
    )
    sub = solve_min(
        sub_nodes.select("row", "col", "v0", "steps", "nrow", "ncol", "len"),
        s,
        block=block * scale,
        scale=scale,
        direct_threshold=direct_threshold,
        max_levels=max_levels - 1,
    )
    seeded = (
        nodes.join(
            sub.select(
                "row", "col",
                F.col("v0").alias("__v0"), F.col("steps").alias("__st"),
                F.col("fa").alias("__c"),
            ),
            ["row", "col"],
            "left",
        )
        .withColumn(
            "__own", F.col("v0") - F.lit(s) * F.col("steps")
        )
        .withColumn(
            "__take",
            F.col("__c").isNotNull() & (F.col("__c") < F.col("__own")),
        )
        .select(
            "row", "col",
            F.when(F.col("__take"), F.col("__v0")).otherwise(F.col("v0")).alias("v0"),
            F.when(F.col("__take"), F.col("__st")).otherwise(F.col("steps")).alias("steps"),
            "nrow", "ncol", "len",
        )
    )
    return grouped(seeded).select("row", "col", "fa", "v0", "steps")


# ---------------------------------------------------------------------------
# Parallel priority-flood depression filling (Barnes 2016)
# ---------------------------------------------------------------------------
_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]

# union schema: kind 0 = cell rows (row/col/z/fill/seed), kind 1 = spill
# edge rows (a/b/lvl over seed ids; -2 = the virtual ocean)
_PF_SCHEMA = (
    "kind int, row long, col long, z double, fill double, seed long, "
    "a long, b long, lvl double"
)


def _pf_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-tile multi-source priority flood.

    Input: row, col, z, outlet(bool: cell is a GLOBAL outlet — DEM border
    or nodata-adjacent), sid(long: globally unique seed id for perimeter
    seeds and outlets; -1 for interior cells).
    Emits per-cell local fill level + owning seed, and the in-tile spill
    graph over seeds (seed id -2 = the virtual ocean). Tie order in the
    flood can vary the LABEL but never the filled level: if a cell is
    reachable from two seeds at the same level, the spill graph links the
    seeds at <= that level, so max(fill, D(label)) is label-invariant.
    """
    rows = pdf["row"].to_numpy(np.int64)
    cols = pdf["col"].to_numpy(np.int64)
    z = pdf["z"].to_numpy(np.float64)
    outlet = pdf["outlet"].to_numpy(bool)
    sid = pdf["sid"].to_numpy(np.int64)

    r0, c0 = rows.min(), cols.min()
    h = int(rows.max() - r0 + 1)
    wdt = int(cols.max() - c0 + 1)
    zi = np.full((h, wdt), np.nan)
    sidg = np.full((h, wdt), np.int64(-1))
    outg = np.zeros((h, wdt), bool)
    ri, ci = rows - r0, cols - c0
    zi[ri, ci] = z
    sidg[ri, ci] = sid
    outg[ri, ci] = outlet

    fill = np.full((h, wdt), np.inf)
    label = np.full((h, wdt), np.int64(-1))
    heap: list = []
    # seeds: every cell carrying a seed id (tile perimeter or global outlet)
    for i in range(len(rows)):
        if sid[i] >= 0:
            lab = np.int64(-2) if outlet[i] else sid[i]
            heapq.heappush(heap, (z[i], int(ri[i]), int(ci[i]), int(lab)))
    while heap:
        lvl, rr, cc, lab = heapq.heappop(heap)
        if fill[rr, cc] <= lvl:
            continue
        fill[rr, cc] = lvl
        label[rr, cc] = lab
        for dr, dc in _N8:
            r2, c2 = rr + dr, cc + dc
            if 0 <= r2 < h and 0 <= c2 < wdt and not np.isnan(zi[r2, c2]):
                if fill[r2, c2] == np.inf:
                    heapq.heappush(
                        heap, (max(lvl, zi[r2, c2]), r2, c2, lab)
                    )

    # spill edges between adjacent distinct labels (and label<->ocean)
    edges: dict = {}
    # a seed whose own cell was claimed by another basin (level tie) would
    # otherwise be disconnected from the basin that owns its location —
    # link seed <-> owning label at the cell's fill level
    for i in range(len(rows)):
        if sid[i] >= 0:
            own = np.int64(-2) if outlet[i] else sid[i]
            lab = label[ri[i], ci[i]]
            if lab != own:
                kk = (int(min(own, lab)), int(max(own, lab)))
                v = float(fill[ri[i], ci[i]])
                if kk not in edges or v < edges[kk]:
                    edges[kk] = v
    valid = ~np.isnan(zi)
    for dr, dc in [(0, 1), (1, -1), (1, 0), (1, 1)]:
        rs0 = max(0, -dr)
        rs1 = h - max(0, dr)
        cs0 = max(0, -dc)
        cs1 = wdt - max(0, dc)
        a_lab = label[rs0:rs1, cs0:cs1]
        b_lab = label[rs0 + dr : rs1 + dr, cs0 + dc : cs1 + dc]
        a_f = fill[rs0:rs1, cs0:cs1]
        b_f = fill[rs0 + dr : rs1 + dr, cs0 + dc : cs1 + dc]
        m = (
            valid[rs0:rs1, cs0:cs1]
            & valid[rs0 + dr : rs1 + dr, cs0 + dc : cs1 + dc]
            & (a_lab != b_lab)
        )
        if not m.any():
            continue
        la, lb = a_lab[m], b_lab[m]
        lv = np.maximum(a_f[m], b_f[m])
        lo = np.minimum(la, lb)
        hi = np.maximum(la, lb)
        for k in range(len(lv)):
            kk = (int(lo[k]), int(hi[k]))
            v = float(lv[k])
            if kk not in edges or v < edges[kk]:
                edges[kk] = v

    cells_out = pd.DataFrame(
        {
            "kind": np.zeros(len(rows), np.int32),
            "row": rows,
            "col": cols,
            "z": z,
            "fill": fill[ri, ci],
            "seed": label[ri, ci],
            "a": np.zeros(len(rows), np.int64),
            "b": np.zeros(len(rows), np.int64),
            "lvl": np.zeros(len(rows), np.float64),
        }
    )
    if edges:
        ea, eb = zip(*edges.keys())
        ne = len(ea)
        edges_out = pd.DataFrame(
            {
                "kind": np.ones(ne, np.int32),
                "row": np.zeros(ne, np.int64),
                "col": np.zeros(ne, np.int64),
                "z": np.zeros(ne, np.float64),
                "fill": np.zeros(ne, np.float64),
                "seed": np.zeros(ne, np.int64),
                "a": np.array(ea, np.int64),
                "b": np.array(eb, np.int64),
                "lvl": np.array(list(edges.values()), np.float64),
            }
        )
        return pd.concat([cells_out, edges_out], ignore_index=True)
    return cells_out


def fill_depressions_tiled(
    cells: DataFrame, *, block: int = 256, spill_threshold: int = 2_000_000
) -> DataFrame:
    """FillDepressions (hydro_analysis/fill_depressions.rs) via Barnes'
    parallel priority-flood: O(1) tile passes + one minimax solve on the
    seed spill graph (graph size ~ perimeter cells / tile), itself solved
    hierarchically (spill_minimax: per-coarse-block MSF contraction +
    recursion; only the sub-``spill_threshold`` root graph touches the
    driver — the DEM-wide fixpoint this replaces needed O(drainage path)
    Spark rounds).

    Output = (row, col, value = filled elevation), bit-identical to
    hydro.fill_depressions (pytest-pinned)."""
    spark = cells.sparkSession
    src = cells.filter(F.col("value").isNotNull()).select(
        "row", "col", F.col("value").alias("z")
    )
    st = src.agg(
        F.min("row").alias("r0"), F.max("row").alias("r1"),
        F.min("col").alias("c0"), F.max("col").alias("c1"),
    ).collect()[0]

    # global outlets: DEM border cells + cells adjacent to missing data
    offsets = spark.createDataFrame(_N8, "dy int, dx int")
    nbr_count = (
        src.crossJoin(F.broadcast(offsets))
        .select((F.col("row") + F.col("dy")).alias("row"),
                (F.col("col") + F.col("dx")).alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    border = (
        (F.col("row") == st.r0) | (F.col("row") == st.r1)
        | (F.col("col") == st.c0) | (F.col("col") == st.c1)
    )
    marked = src.join(nbr_count, ["row", "col"], "left").withColumn(
        "outlet", border | (F.coalesce(F.col("__n"), F.lit(0)) < 8)
    ).drop("__n")

    # perimeter seeds: cells on a tile edge; globally unique seed id
    on_perim = (
        (F.col("row") % block == 0) | (F.col("row") % block == block - 1)
        | (F.col("col") % block == 0) | (F.col("col") % block == block - 1)
    )
    width = int(st.c1 - st.c0 + 1)
    seeded = marked.withColumn(
        "sid",
        F.when(
            on_perim | F.col("outlet"),
            (F.col("row") - F.lit(int(st.r0))) * F.lit(width)
            + (F.col("col") - F.lit(int(st.c0))),
        ).otherwise(F.lit(-1)).cast("long"),
    )

    keyed = seeded.withColumn("gr", F.floor(F.col("row") / F.lit(block))).withColumn(
        "gc", F.floor(F.col("col") / F.lit(block))
    )

    both = keyed.groupBy("gr", "gc").applyInPandas(
        lambda pdf: _pf_kernel(pdf), _PF_SCHEMA
    ).localCheckpoint(eager=True)
    flooded = both.filter(F.col("kind") == 0).select("row", "col", "z", "fill", "seed")
    spill = both.filter(F.col("kind") == 1).select("a", "b", "lvl")

    # cross-tile-boundary adjacency is never inside a tile kernel: both
    # endpoints of a boundary-crossing 8-adjacency are perimeter SEEDS, so
    # link them directly at level max(z_a, z_b)
    perim = seeded.filter(F.col("sid") >= 0).select(
        "row", "col", "z",
        F.when(F.col("outlet"), F.lit(-2)).otherwise(F.col("sid")).alias("lab"),
        F.floor(F.col("row") / F.lit(block)).alias("gr"),
        F.floor(F.col("col") / F.lit(block)).alias("gc"),
    )
    nb = perim.crossJoin(F.broadcast(offsets)).select(
        (F.col("row") + F.col("dy")).alias("row"),
        (F.col("col") + F.col("dx")).alias("col"),
        F.col("z").alias("z2"),
        F.col("lab").alias("lab2"),
        F.col("gr").alias("gr2"),
        F.col("gc").alias("gc2"),
    )
    xedges = (
        perim.join(nb, ["row", "col"])
        .filter((F.col("gr") != F.col("gr2")) | (F.col("gc") != F.col("gc2")))
        .filter(F.col("lab") != F.col("lab2"))
        .select(
            F.least("lab", "lab2").alias("a"),
            F.greatest("lab", "lab2").alias("b"),
            F.greatest("z", "z2").alias("lvl"),
        )
    )

    # minimax distance from every seed to the ocean over the spill graph
    # (graph size = O(perimeter cells) = n * 4/block), solved DISTRIBUTED:
    # spill_minimax groups seeds by coarse spatial block, contracts each
    # group's minimum spanning forest onto its boundary terminals, and
    # recurses 8x coarser — only the final sub-threshold graph (default
    # 2M edges) touches the driver. See spill_minimax below.
    edge_df = (
        spill.unionAll(xedges).groupBy("a", "b").agg(F.min("lvl").alias("lvl"))
    )
    lvl_df = spill_minimax(
        edge_df, width, block=block * 8, direct_threshold=spill_threshold
    )
    if lvl_df.isEmpty():
        lvl_df = spark.createDataFrame(
            [(-(10**9), 0.0)], "seed long, ocean_lvl double"
        )

    out = (
        flooded.join(F.broadcast(lvl_df), "seed", "left")
        .withColumn(
            "value",
            F.greatest(
                F.col("z"),
                F.when(
                    F.col("seed") == -2, F.col("fill")
                ).otherwise(
                    F.greatest(
                        F.col("fill"),
                        F.coalesce(F.col("ocean_lvl"), F.col("fill")),
                    )
                ),
            ),
        )
        .select("row", "col", "value")
    )
    return out


# ---------------------------------------------------------------------------
# Weighted-DAG variant: FD8 / D-infinity fractional flow accumulation
# ---------------------------------------------------------------------------
# solve_fa handles functional graphs (out-degree <= 1); FD8/DInf split flow
# across up to 8 / 2 downslope neighbors, so the flow graph is a bounded-
# out-degree weighted DAG and the superstep peel needs O(longest path)
# rounds (hydro._weighted_flow_accum). The stitched solve below is the
# weighted-semiring generalization (VERDICT r03 item 2): accumulation is
# LINEAR in the injected inflows, so each tile reduces to
#   fa(v) = fa_loc(v) + sum_i M(i -> v) * x(i)
# with fa_loc the in-tile-only solve, i ranging over the tile's inlets
# (cells receiving cross-tile flow) and M the in-tile path-product sums.
# Cross edges then give the inlet fixpoint
#   x(t) = base(t) + sum_i coeff(i -> t) * x(i)
# which is the SAME problem over the much smaller inlet graph -> recurse at
# 8x coarser blocks. Unwind = one more tile pass with w' = w + x (linearity
# again). Driver-visible supersteps: O(1) per level, O(log_8 tiles) levels.

_WFA_SCHEMA = (
    "kind int, row long, col long, trow long, tcol long, val double"
)
# kind 0: per-cell fa (row, col, val)          [final mode only]
# kind 1: cross-edge base inflow (trow, tcol, val)   [reduce mode]
# kind 2: inlet coefficient (row, col = inlet; trow, tcol = target inlet;
#         val = d(inflow at target) / d(inflow at inlet))  [reduce mode]


def _wfa_levels(n: int, esrc: np.ndarray, edst: np.ndarray):
    """Kahn levels over an edge list: lvl[v] = 1 + max(lvl[u]) over in-edges.
    Returns (lvl, order of edge indices grouped by source level, group
    boundaries)."""
    indeg = np.bincount(edst, minlength=n)
    lvl = np.zeros(n, np.int64)
    frontier = np.flatnonzero(indeg == 0)
    # CSR over sources for fast out-edge expansion
    eorder = np.argsort(esrc, kind="stable")
    s_sorted = esrc[eorder]
    starts = np.searchsorted(s_sorted, np.arange(n))
    ends = np.searchsorted(s_sorted, np.arange(n) + 1)
    cur = 0
    while frontier.size:
        cnt = ends[frontier] - starts[frontier]
        if cnt.sum() == 0:
            break
        take = np.concatenate(
            [eorder[starts[u]: ends[u]] for u in frontier if ends[u] > starts[u]]
        ) if cnt.max() > 0 else np.empty(0, np.int64)
        tv = edst[take]
        np.maximum.at(lvl, tv, lvl[esrc[take]] + 1)
        indeg -= np.bincount(tv, minlength=n)
        cand = np.unique(tv)
        frontier = cand[indeg[cand] == 0]
        cur += 1
    return lvl, starts, ends, eorder


def _wfa_kernel(
    nodes: pd.DataFrame, edges: pd.DataFrame, *, reduce_mode: bool
) -> pd.DataFrame:
    """Per-tile weighted-DAG solve.

    nodes: (row, col, w, inlet bool); edges: (row, col, trow, tcol, frac),
    grouped by SOURCE tile so every edge source is a node here. In-tile
    edges (target present) drive the local topological accumulate; edges
    whose target is absent are cross edges. reduce_mode emits base inflows
    (kind 1) + inlet->cross-target coefficients (kind 2); final mode emits
    per-cell fa (kind 0)."""
    n = len(nodes)
    row = nodes["row"].to_numpy(np.int64)
    col = nodes["col"].to_numpy(np.int64)
    w = nodes["w"].to_numpy(np.float64)
    key = row * np.int64(1 << 32) + col
    order = np.argsort(key, kind="stable")
    skey = key[order]

    if len(edges):
        er = edges["row"].to_numpy(np.int64)
        ec = edges["col"].to_numpy(np.int64)
        tr = edges["trow"].to_numpy(np.int64)
        tc = edges["tcol"].to_numpy(np.int64)
        fr = edges["frac"].to_numpy(np.float64)
        spos = np.searchsorted(skey, er * np.int64(1 << 32) + ec)
        esrc_all = order[np.clip(spos, 0, n - 1)]
        tkey = tr * np.int64(1 << 32) + tc
        tpos = np.clip(np.searchsorted(skey, tkey), 0, n - 1)
        internal = skey[tpos] == tkey
        esrc = esrc_all[internal]
        edst = order[tpos[internal]]
        efrac = fr[internal]
        x_src = esrc_all[~internal]
        x_tr = tr[~internal]
        x_tc = tc[~internal]
        x_fr = fr[~internal]
    else:
        esrc = edst = np.empty(0, np.int64)
        efrac = np.empty(0, np.float64)
        x_src = x_tr = x_tc = np.empty(0, np.int64)
        x_fr = np.empty(0, np.float64)

    lvl, starts, ends, eorder = _wfa_levels(n, esrc, edst)
    n_lvl = int(lvl.max()) + 1 if n else 1
    # edges bucketed by source level
    e_by_lvl = [np.empty(0, np.int64)] * n_lvl
    if esrc.size:
        el = lvl[esrc]
        eord2 = np.argsort(el, kind="stable")
        bounds = np.searchsorted(el[eord2], np.arange(n_lvl + 1))
        e_by_lvl = [eord2[bounds[i]: bounds[i + 1]] for i in range(n_lvl)]

    # local accumulate: fa_loc(v) = w(v) + sum in-tile frac * fa_loc(u),
    # processed strictly level-by-level (all of a cell's inflow lands
    # before its own out-edges fire)
    fa = w.copy()
    for L in range(n_lvl):
        e = e_by_lvl[L]
        if e.size:
            np.add.at(fa, edst[e], fa[esrc[e]] * efrac[e])

    if not reduce_mode:
        return pd.DataFrame(
            {
                "kind": np.zeros(n, np.int32),
                "row": row, "col": col,
                "trow": np.zeros(n, np.int64), "tcol": np.zeros(n, np.int64),
                "val": fa,
            }
        )

    # ---- reduce mode: base inflows + inlet coefficients ----
    out_frames = []
    if x_src.size:
        bk = x_tr * np.int64(1 << 32) + x_tc
        ub, inv = np.unique(bk, return_inverse=True)
        base = np.zeros(len(ub), np.float64)
        np.add.at(base, inv, fa[x_src] * x_fr)
        out_frames.append(
            pd.DataFrame(
                {
                    "kind": np.ones(len(ub), np.int32),
                    "row": np.zeros(len(ub), np.int64),
                    "col": np.zeros(len(ub), np.int64),
                    "trow": (ub >> np.int64(32)).astype(np.int64),
                    "tcol": (ub & np.int64((1 << 32) - 1)).astype(np.int64),
                    "val": base,
                }
            )
        )

    inlet = nodes["inlet"].to_numpy(bool)
    inlet_idx = np.flatnonzero(inlet)
    if inlet_idx.size and x_src.size:
        n_in = inlet_idx.size
        inlet_ord = np.full(n, -1, np.int64)
        inlet_ord[inlet_idx] = np.arange(n_in)
        # COO coefficient entries bucketed by CELL level; a cell's entries
        # are complete when its level is reached (Kahn property), so each
        # entry is touched exactly once -> total work O(sum of path-product
        # support), no per-level rescans.
        buckets: list[list] = [[] for _ in range(n_lvl)]
        buckets[0] = []
        for i in inlet_idx:
            buckets[lvl[i]].append(
                (np.array([i]), np.array([inlet_ord[i]]), np.array([1.0]))
            )
        # cross-edge sources CSR for emission
        xord = np.argsort(x_src, kind="stable")
        xs_sorted = x_src[xord]
        xstarts = np.searchsorted(xs_sorted, np.arange(n))
        xends = np.searchsorted(xs_sorted, np.arange(n) + 1)
        coef_keys: list[np.ndarray] = []
        coef_vals: list[np.ndarray] = []
        for L in range(n_lvl):
            if not buckets[L]:
                continue
            cc = np.concatenate([b[0] for b in buckets[L]])
            ii = np.concatenate([b[1] for b in buckets[L]])
            vv = np.concatenate([b[2] for b in buckets[L]])
            # aggregate duplicates (same cell, same inlet)
            k = cc * np.int64(n_in) + ii
            uk, inv = np.unique(k, return_inverse=True)
            av = np.zeros(len(uk), np.float64)
            np.add.at(av, inv, vv)
            cc = (uk // np.int64(n_in)).astype(np.int64)
            ii = (uk % np.int64(n_in)).astype(np.int64)
            vv = av
            # emit coefficients at cross-edge sources
            xcnt = xends[cc] - xstarts[cc]
            if xcnt.sum():
                rep = np.repeat(np.arange(len(cc)), xcnt)
                xe = np.concatenate(
                    [xord[xstarts[c]: xends[c]] for c in cc if xends[c] > xstarts[c]]
                )
                tgt_key = x_tr[xe] * np.int64(1 << 32) + x_tc[xe]
                coef_keys.append(
                    np.ascontiguousarray(np.stack([ii[rep], tgt_key], axis=1))
                )
                coef_vals.append(vv[rep] * x_fr[xe])
            # propagate along in-tile out-edges
            cnt = ends[cc] - starts[cc]
            if cnt.sum():
                rep = np.repeat(np.arange(len(cc)), cnt)
                ee = np.concatenate(
                    [eorder[starts[c]: ends[c]] for c in cc if ends[c] > starts[c]]
                )
                dst = edst[ee]
                newv = vv[rep] * efrac[ee]
                # bucket by destination level
                dl = lvl[dst]
                so = np.argsort(dl, kind="stable")
                db = np.searchsorted(dl[so], np.arange(n_lvl + 1))
                for L2 in range(L + 1, n_lvl):
                    seg = so[db[L2]: db[L2 + 1]]
                    if seg.size:
                        buckets[L2].append((dst[seg], ii[rep][seg], newv[seg]))
            buckets[L] = []
        if coef_keys:
            allk = np.concatenate(coef_keys, axis=0)
            allv = np.concatenate(coef_vals)
            # aggregate by (inlet ordinal, target key)
            uk, inv = np.unique(allk, axis=0, return_inverse=True)
            av = np.zeros(len(uk), np.float64)
            np.add.at(av, inv, allv)
            i_ord = uk[:, 0]
            t_key = uk[:, 1]
            out_frames.append(
                pd.DataFrame(
                    {
                        "kind": np.full(len(uk), 2, np.int32),
                        "row": row[inlet_idx[i_ord]],
                        "col": col[inlet_idx[i_ord]],
                        "trow": (t_key >> np.int64(32)).astype(np.int64),
                        "tcol": (t_key & np.int64((1 << 32) - 1)).astype(np.int64),
                        "val": av,
                    }
                )
            )

    if not out_frames:
        return pd.DataFrame(
            {
                "kind": np.empty(0, np.int32),
                "row": np.empty(0, np.int64), "col": np.empty(0, np.int64),
                "trow": np.empty(0, np.int64), "tcol": np.empty(0, np.int64),
                "val": np.empty(0, np.float64),
            }
        )
    return pd.concat(out_frames, ignore_index=True)


def _wfa_grouped(
    nodes: DataFrame, edges: DataFrame, block: int, *, reduce_mode: bool
) -> DataFrame:
    """Cogroup nodes and edges by the source tile and run the kernel.

    Both frames usually trace to the same source raster and so carry the
    SAME row/col expression ids even through localCheckpoint — re-alias
    every column (fresh exprIds) or the cogroup trips Spark's ambiguous-
    self-join check."""
    nodes = nodes.select(*[F.col(c).alias(c) for c in nodes.columns])
    edges = edges.select(*[F.col(c).alias(c) for c in edges.columns])
    nk = nodes.withColumn("gr", F.floor(F.col("row") / F.lit(block))).withColumn(
        "gc", F.floor(F.col("col") / F.lit(block))
    )
    ek = edges.withColumn("gr", F.floor(F.col("row") / F.lit(block))).withColumn(
        "gc", F.floor(F.col("col") / F.lit(block))
    )
    return nk.groupBy("gr", "gc").cogroup(ek.groupBy("gr", "gc")).applyInPandas(
        lambda left, right: _wfa_kernel(left, right, reduce_mode=reduce_mode),
        _WFA_SCHEMA,
    )


def solve_wfa(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    block: int = 256,
    scale: int = 8,
    direct_threshold: int = 200_000,
    max_levels: int = 12,
) -> DataFrame:
    """Accumulate over a bounded-out-degree weighted DAG:
    fa(v) = w(v) + sum over edges (u -> v, frac) of frac * fa(u).

    nodes: (row, col, w); edges: (row, col, trow, tcol, frac) with both
    endpoints in nodes and the graph acyclic (FD8 / D-inf flow graphs:
    targets strictly downslope). Returns (row, col, fa). Hierarchical tile
    stitch, O(log) driver-visible supersteps — see module docstring."""
    # break lineage: nodes and edges usually derive from the same source
    # raster (self-join ambiguity in the cogroup) and the recursion would
    # otherwise compound both plans level over level
    nodes = nodes.select("row", "col", "w").localCheckpoint(eager=True)
    edges = edges.select("row", "col", "trow", "tcol", "frac").localCheckpoint(
        eager=True
    )
    n = nodes.count()
    spark = nodes.sparkSession
    if n == 0:
        return spark.createDataFrame([], "row long, col long, fa double")
    nodes_f = nodes.select("row", "col", "w", F.lit(False).alias("inlet"))
    if n <= direct_threshold:
        # fresh exprIds (see _wfa_grouped) before the cogroup
        nodes_f = nodes_f.select(*[F.col(c).alias(c) for c in nodes_f.columns])
        edges = edges.select(*[F.col(c).alias(c) for c in edges.columns])
        one_n = nodes_f.withColumn("gr", F.lit(0)).withColumn("gc", F.lit(0))
        one_e = edges.withColumn("gr", F.lit(0)).withColumn("gc", F.lit(0))
        solved = one_n.groupBy("gr", "gc").cogroup(one_e.groupBy("gr", "gc")).applyInPandas(
            lambda left, right: _wfa_kernel(left, right, reduce_mode=False),
            _WFA_SCHEMA,
        )
        return solved.select("row", "col", F.col("val").alias("fa"))
    if max_levels <= 1:
        raise RuntimeError("solve_wfa: recursion limit hit (graph too deep)")

    # inlets: targets of cross-tile edges
    tg = F.floor
    cross_t = (
        edges.filter(
            (tg(F.col("row") / block) != tg(F.col("trow") / block))
            | (tg(F.col("col") / block) != tg(F.col("tcol") / block))
        )
        .select(F.col("trow").alias("__irow"), F.col("tcol").alias("__icol"))
        .distinct()
        .withColumn("__inlet", F.lit(True))
    )
    nodes_m = nodes.join(
        cross_t,
        (F.col("row") == F.col("__irow")) & (F.col("col") == F.col("__icol")),
        "left",
    ).select(
        "row", "col", "w", F.coalesce("__inlet", F.lit(False)).alias("inlet")
    )

    red = _wfa_grouped(nodes_m, edges, block, reduce_mode=True).localCheckpoint(
        eager=True
    )
    base = (
        red.filter(F.col("kind") == 1)
        .groupBy(F.col("trow").alias("row"), F.col("tcol").alias("col"))
        .agg(F.sum("val").alias("w"))
    )
    coef = red.filter(F.col("kind") == 2).select(
        "row", "col", "trow", "tcol", F.col("val").alias("frac")
    )
    sub = solve_wfa(
        base,
        coef,
        block=block * scale,
        scale=scale,
        direct_threshold=direct_threshold,
        max_levels=max_levels - 1,
    )
    # unwind: inject the solved external inflow x at the inlets (linearity)
    seeded = nodes_m.join(
        sub.select("row", "col", F.col("fa").alias("__x")), ["row", "col"], "left"
    ).select(
        "row", "col",
        (F.col("w") + F.coalesce(F.col("__x"), F.lit(0.0))).alias("w"),
        "inlet",
    )
    final = _wfa_grouped(seeded, edges, block, reduce_mode=False)
    return final.select("row", "col", F.col("val").alias("fa"))


def fd8_flow_accumulation_tiled(
    cells: DataFrame, grid: GridSpec, *, exponent: float = 1.1, block: int = 256,
    direct_threshold: int = 200_000,
) -> DataFrame:
    """FD8FlowAccumulation (hydro_analysis/fd8_flow_accum.rs:400-470) via
    the weighted-semiring tile stitch — same fractions as the superstep
    peel (hydro.fd8_flow_accum), O(log n) Spark rounds instead of
    O(longest flow path)."""
    from whitebox_tools_spark.operators.hydro import fd8_edges

    nodes = cells.filter(F.col("value").isNotNull()).select(
        "row", "col", F.lit(1.0).alias("w")
    )
    edges = fd8_edges(cells, grid, exponent=exponent)
    return solve_wfa(nodes, edges, block=block, direct_threshold=direct_threshold).select(
        "row", "col", F.col("fa").alias("value")
    )


def dinf_flow_accumulation_tiled(
    cells: DataFrame, grid: GridSpec, *, block: int = 256,
    direct_threshold: int = 200_000,
) -> DataFrame:
    """DInfFlowAccumulation (hydro_analysis/dinf_flow_accum.rs:532-646) via
    the weighted-semiring tile stitch (Tarboton 1997 two-target split),
    O(log n) Spark rounds."""
    from whitebox_tools_spark.operators.hydro import dinf_edges

    nodes = cells.filter(F.col("value").isNotNull()).select(
        "row", "col", F.lit(1.0).alias("w")
    )
    edges = dinf_edges(cells, grid)
    return solve_wfa(nodes, edges, block=block, direct_threshold=direct_threshold).select(
        "row", "col", F.col("fa").alias("value")
    )


# ---------------------------------------------------------------------------
# Distributed spill-graph minimax (removes fill_depressions_tiled's driver
# collect, VERDICT r03 item 4)
# ---------------------------------------------------------------------------
# The seed spill graph is O(perimeter cells); its minimax-distance-from-
# ocean solve used a driver Dijkstra, i.e. a collect of O(tiles x perimeter
# labels). The hierarchical solve below keeps it distributed: group seeds
# by coarse spatial block (seed ids are row-major positions, so the graph
# is spatially local); per group, the minimax structure is fully captured
# by the group's minimum spanning forest (minimax distance = max edge on
# the MST path), CONTRACTED onto the group's boundary terminals (seeds
# with cross-group edges, plus the virtual ocean -2) -> O(terminals)
# reduced edges. Recurse 8x coarser until the edge set fits one task;
# unwind top-down with a per-group multi-source minimax Dijkstra from the
# solved terminals. Same shape as solve_fa's boundary recursion.

_SPILL_SCHEMA = "a long, b long, lvl double"


def _mst_contract_kernel(nodes: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Per-group: Kruskal MSF over (a, b, lvl), then contract onto the
    terminal set (nodes['term'] == True; -2 is always a terminal):
    prune non-terminal leaves, splice degree-2 non-terminal nodes keeping
    the max weight of the merged pair. Emits the reduced terminal-to-
    terminal edge list."""
    if not len(edges):
        return pd.DataFrame({"a": [], "b": [], "lvl": []}).astype(
            {"a": np.int64, "b": np.int64, "lvl": np.float64}
        )
    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    w = edges["lvl"].to_numpy(np.float64)
    term_ids = set(nodes.loc[nodes["term"].astype(bool), "a"].astype(np.int64))
    term_ids.add(-2)

    ids = np.unique(np.concatenate([a, b]))
    idx = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    parent = list(range(n))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    order = np.argsort(w, kind="stable")
    adj: dict = {}
    for e in order:
        ua, ub = idx[int(a[e])], idx[int(b[e])]
        ra, rb = find(ua), find(ub)
        if ra != rb:
            parent[ra] = rb
            adj.setdefault(ua, []).append([ub, float(w[e])])
            adj.setdefault(ub, []).append([ua, float(w[e])])

    is_term = np.array([int(v) in term_ids for v in ids], bool)
    deg = {u: len(v) for u, v in adj.items()}
    # prune non-terminal leaves
    stack = [u for u, d in deg.items() if d == 1 and not is_term[u]]
    dead = set()
    while stack:
        u = stack.pop()
        if u in dead or deg.get(u, 0) != 1:
            continue
        dead.add(u)
        for v, _ in adj[u]:
            if v in dead:
                continue
            deg[v] -= 1
            if deg[v] == 1 and not is_term[v]:
                stack.append(v)
    # splice degree-2 non-terminal nodes: walk maximal chains
    out_a, out_b, out_w = [], [], []
    seen_pairs = set()
    for u in adj:
        if u in dead or not (is_term[u] or deg[u] > 2):
            continue
        # u is a kept junction/terminal: walk each incident live edge
        for v0, w0 in adj[u]:
            if v0 in dead:
                continue
            prev, cur, mx = u, v0, w0
            while cur not in dead and not is_term[cur] and deg[cur] == 2:
                nxts = [(t, tw) for t, tw in adj[cur] if t != prev and t not in dead]
                if not nxts:
                    break
                prev, (cur, cw) = cur, nxts[0]
                mx = max(mx, cw)
            if cur in dead:
                continue
            key = (min(u, cur), max(u, cur), mx)
            if u != cur and key not in seen_pairs:
                seen_pairs.add(key)
                out_a.append(int(ids[u]))
                out_b.append(int(ids[cur]))
                out_w.append(mx)
    if not out_a:
        return pd.DataFrame({"a": [], "b": [], "lvl": []}).astype(
            {"a": np.int64, "b": np.int64, "lvl": np.float64}
        )
    df = pd.DataFrame(
        {
            "a": np.array(out_a, np.int64),
            "b": np.array(out_b, np.int64),
            "lvl": np.array(out_w, np.float64),
        }
    )
    # dedup symmetric duplicates (each chain walked from both ends)
    lo = np.minimum(df["a"], df["b"])
    hi = np.maximum(df["a"], df["b"])
    df = (
        pd.DataFrame({"a": lo, "b": hi, "lvl": df["lvl"]})
        .groupby(["a", "b"], as_index=False)["lvl"]
        .min()
    )
    return df


def _minimax_dijkstra(edge_rows, seed_dist):
    """Plain minimax Dijkstra over an edge list from pre-seeded sources.
    seed_dist: dict node -> starting level. Returns dict node -> level."""
    adj: dict = {}
    for ea, eb, lvl in edge_rows:
        adj.setdefault(ea, []).append((eb, lvl))
        adj.setdefault(eb, []).append((ea, lvl))
    dist = dict(seed_dist)
    pq = [(d, u) for u, d in seed_dist.items()]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, lvl in adj.get(u, ()):
            nd = max(d, lvl)
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _minimax_connect(a: np.ndarray, b: np.ndarray, lvl: np.ndarray, seed_dist):
    """Exact vectorized replacement for the seeded minimax Dijkstra
    (`_minimax_dijkstra`): Kruskal threshold-connect. Append one virtual
    edge SUPER->seed at the seed's start level, sort ALL edges ascending by
    level (one numpy argsort), and union-find; a node's minimax level to
    the seed set is the level of the union step that first joins its
    component to SUPER's (at that instant every already-processed edge has
    level <= L, and every alternative connection must use an unprocessed
    edge of level >= L, so the attach level IS the minimax distance; ties
    between equal levels are therefore order-independent). Union-by-size
    member lists give O(n log n) total assignment moves. Returns
    dict node -> level for every node connected to a seed (seeds
    included), same contract as _minimax_dijkstra."""
    if not seed_dist:
        return {}
    sa = np.fromiter(seed_dist.keys(), np.int64, len(seed_dist))
    sl = np.fromiter((float(v) for v in seed_dist.values()), np.float64,
                     len(seed_dist))
    ids = np.concatenate([a, b, sa])
    uniq, inv = np.unique(ids, return_inverse=True)
    n = len(uniq)
    sup = n  # extra slot: the virtual super-source
    ea = np.concatenate([inv[: len(a)], inv[len(a) + len(b):]])
    eb = np.concatenate([inv[len(a): len(a) + len(b)],
                         np.full(len(sa), sup, np.int64)])
    el = np.concatenate([np.asarray(lvl, np.float64), sl])
    order = np.argsort(el, kind="stable")
    ea, eb, el = ea[order], eb[order], el[order]

    parent = list(range(n + 1))
    size = [1] * (n + 1)
    members = [[i] for i in range(n)] + [None]  # None = attached (super)
    out = np.full(n, np.nan)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ea_l, eb_l, el_l = ea.tolist(), eb.tolist(), el.tolist()
    for i in range(len(el_l)):
        rx, ry = find(ea_l[i]), find(eb_l[i])
        if rx == ry:
            continue
        mx, my = members[rx], members[ry]
        if mx is None and my is None:
            merged = None  # both already attached
        elif mx is None or my is None:
            # one side attached: the other component attaches NOW
            lv = el_l[i]
            for u in (my if mx is None else mx):
                out[u] = lv
            merged = None
        else:
            if len(mx) < len(my):
                mx, my = my, mx
            mx.extend(my)
            merged = mx
        if size[rx] < size[ry]:
            rx, ry = ry, rx
        parent[ry] = rx
        size[rx] += size[ry]
        members[rx] = merged
        members[ry] = None
    keep = ~np.isnan(out)
    nodes = uniq[keep]
    vals = out[keep]
    return {int(u): float(v) for u, v in zip(nodes.tolist(), vals.tolist())}


def _unwind_kernel(bound: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Per-group final pass: minimax Dijkstra over the group's ORIGINAL
    edges from {solved boundary terminals} u {ocean}. bound: (a, lvl) =
    solved terminal levels (-2 rows may appear; ocean always level -inf)."""
    seeds = {int(r.a): float(r.lvl) for r in bound.itertuples()}
    seeds[-2] = float("-inf")
    dist = _minimax_connect(
        edges["a"].to_numpy(np.int64),
        edges["b"].to_numpy(np.int64),
        edges["lvl"].to_numpy(np.float64),
        seeds,
    )
    items = [(int(k), float(v)) for k, v in dist.items() if k != -2]
    if not items:
        return pd.DataFrame({"a": [], "b": [], "lvl": []}).astype(
            {"a": np.int64, "b": np.int64, "lvl": np.float64}
        )
    ka, kv = zip(*items)
    return pd.DataFrame(
        {
            "a": np.array(ka, np.int64),
            "b": np.zeros(len(ka), np.int64),
            "lvl": np.array(kv, np.float64),
        }
    )


def spill_minimax(
    edges: DataFrame,
    width: int,
    *,
    block: int = 4096,
    scale: int = 8,
    direct_threshold: int = 2_000_000,
    max_levels: int = 12,
) -> DataFrame:
    """Minimax distance from the virtual ocean (-2) for every node of the
    spill graph, computed distributed. edges: (a, b, lvl) over row-major
    seed ids (id // width, id % width = position); -2 = ocean. Returns
    (seed long, ocean_lvl double)."""
    spark = edges.sparkSession
    edges = edges.select("a", "b", "lvl").localCheckpoint(eager=True)
    n_e = edges.count()
    if n_e == 0:
        return spark.createDataFrame([], "seed long, ocean_lvl double")
    if n_e <= direct_threshold:
        pdf = edges.toPandas()
        dist = _minimax_connect(
            pdf["a"].to_numpy(np.int64),
            pdf["b"].to_numpy(np.int64),
            pdf["lvl"].to_numpy(np.float64),
            {-2: float("-inf")},
        )
        rows = [(int(s), float(d)) for s, d in dist.items() if s != -2]
        return spark.createDataFrame(
            rows or [(-(10**9), 0.0)], "seed long, ocean_lvl double"
        )
    if max_levels <= 1:
        raise RuntimeError("spill_minimax: recursion limit hit")

    gb = block
    grp = lambda node: F.struct(  # noqa: E731
        F.floor((node / width) / gb).alias("gr"),
        F.floor((node % width) / gb).alias("gc"),
    )
    # ocean edges follow their real endpoint's group
    e2 = edges.withColumn(
        "ga", F.when(F.col("a") == -2, grp(F.col("b"))).otherwise(grp(F.col("a")))
    ).withColumn(
        "gb_", F.when(F.col("b") == -2, grp(F.col("a"))).otherwise(grp(F.col("b")))
    )
    ing = e2.filter(F.col("ga") == F.col("gb_"))
    crossg = e2.filter(F.col("ga") != F.col("gb_")).select("a", "b", "lvl")

    # terminals: nodes incident to a cross-group edge
    terms = (
        crossg.select(F.col("a").alias("t"))
        .unionAll(crossg.select(F.col("b").alias("t")))
        .filter(F.col("t") != -2)
        .distinct()
        .withColumn("term", F.lit(True))
    )
    # node list per group (from in-group edges)
    nd = (
        ing.select(F.col("a").alias("node"), F.col("ga").alias("g"))
        .unionAll(ing.select(F.col("b").alias("node"), F.col("ga").alias("g")))
        .filter(F.col("node") != -2)
        .distinct()
        .join(terms, F.col("node") == F.col("t"), "left")
        .select(
            F.col("node").alias("a"),
            F.col("g"),
            F.coalesce("term", F.lit(False)).alias("term"),
        )
    )
    reduced = (
        nd.groupBy("g")
        .cogroup(ing.select("a", "b", "lvl", F.col("ga").alias("g")).groupBy("g"))
        .applyInPandas(
            lambda left, right: _mst_contract_kernel(left, right[["a", "b", "lvl"]]),
            _SPILL_SCHEMA,
        )
    )
    sub = spill_minimax(
        reduced.unionByName(crossg),
        width,
        block=block * scale,
        scale=scale,
        direct_threshold=direct_threshold,
        max_levels=max_levels - 1,
    )
    # unwind: per group, Dijkstra from the solved terminals over the
    # ORIGINAL in-group edges
    tsolved = sub.join(
        terms.select(F.col("t").alias("seed")), "seed"
    ).select(F.col("seed").alias("a"), F.col("ocean_lvl").alias("lvl"))
    tg2 = tsolved.withColumn(
        "g",
        F.struct(
            F.floor((F.col("a") / width) / gb).alias("gr"),
            F.floor((F.col("a") % width) / gb).alias("gc"),
        ),
    )
    solved = (
        tg2.groupBy("g")
        .cogroup(ing.select("a", "b", "lvl", F.col("ga").alias("g")).groupBy("g"))
        .applyInPandas(
            lambda left, right: _unwind_kernel(
                left[["a", "lvl"]], right[["a", "b", "lvl"]]
            ),
            _SPILL_SCHEMA,
        )
        .select(F.col("a").alias("seed"), F.col("lvl").alias("ocean_lvl"))
    )
    # nodes only touched by cross edges are already solved in `sub`
    extra = sub.join(solved.select("seed"), "seed", "left_anti")
    return solved.unionByName(extra)


# ---------------------------------------------------------------------------
# Hierarchical ADDITIVE shortest path (cost_distance / cost_allocation scale
# path). Same recursion shape as spill_minimax, with the minimax semiring
# replaced by (+, lexicographic-min-(dist, source_id)):
#   contract: per block, a Dijkstra from each boundary terminal over the
#     block's real edges -> a terminal clique of exact through-block costs,
#     plus one (-2 -> terminal) edge = the best (dist, sid) from any source
#     seeded INSIDE the block;
#   recurse on {clique + cross-block edges} with 8x coarser blocks until the
#     graph fits direct_threshold (only that root graph touches the driver);
#   unwind: per block, Dijkstra seeded by the solved terminals + the
#     block's own source edges over the ORIGINAL block edges.
# Virtual node -2 is never a transit node (a physical path cannot pass
# through "any source"), which the kernels enforce by keeping source edges
# out of the adjacency and using them only as Dijkstra seeds.
# ---------------------------------------------------------------------------
_SP_SCHEMA = "a long, b long, w double, sid long"
_SP_OUT_SCHEMA = "seed long, dist double, sid long"
_SP_NOSRC = 2**62


def _sp_split(edge_rows):
    """-> (adj dict over real edges, seeds dict node -> (w, sid) from -2
    edges, lexicographic min)."""
    adj: dict = {}
    seeds: dict = {}
    for a, b, w, sid in edge_rows:
        if a == -2 or b == -2:
            n = b if a == -2 else a
            cand = (w, sid)
            if cand < seeds.get(n, (float("inf"), _SP_NOSRC)):
                seeds[n] = cand
        else:
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
    return adj, seeds


def _sp_dijkstra(adj, init):
    """init: {node: (dist, sid)}; returns {node: (dist, sid)},
    lexicographic settle order (ties to the lowest sid, the engine-wide
    cost_allocation tie rule)."""
    best = dict(init)
    pq = [(d, s, u) for u, (d, s) in init.items()]
    heapq.heapify(pq)
    while pq:
        d, s, u = heapq.heappop(pq)
        if (d, s) > best.get(u, (float("inf"), _SP_NOSRC)):
            continue
        for v, w in adj.get(u, ()):
            cand = (d + w, s)
            if cand < best.get(v, (float("inf"), _SP_NOSRC)):
                best[v] = cand
                heapq.heappush(pq, (cand[0], s, v))
    return best


class _SpCsr:
    """Compacted CSR adjacency over an undirected (a, b, w) edge list —
    built ONCE and reused across the per-terminal Dijkstras of
    _sp_contract_kernel. idx_of maps original node id -> compact index."""

    __slots__ = ("n", "indptr", "dst", "w", "uniq", "idx_of")

    def __init__(self, a: np.ndarray, b: np.ndarray, w: np.ndarray):
        ids = np.concatenate([a, b])
        self.uniq, inv = np.unique(ids, return_inverse=True)
        self.n = len(self.uniq)
        ai, bi = inv[: len(a)], inv[len(a):]
        src = np.concatenate([ai, bi])
        dst = np.concatenate([bi, ai])
        ww = np.concatenate([np.asarray(w, np.float64)] * 2)
        order = np.argsort(src, kind="stable")
        self.dst = dst[order].tolist()
        self.w = ww[order].tolist()
        counts = np.bincount(src, minlength=self.n)
        self.indptr = np.concatenate(
            [[0], np.cumsum(counts)]
        ).astype(np.int64).tolist()
        self.idx_of = {int(u): i for i, u in enumerate(self.uniq.tolist())}


def _sp_dijkstra_csr(csr: _SpCsr, init):
    """Array-backed lexicographic Dijkstra, same contract and identical
    tie rule as _sp_dijkstra ((dist, sid) lexicographic; NOSRC = +inf sid):
    dist/sid live in flat lists indexed by compact node id instead of a
    dict of tuples. init: {original node id: (dist, sid)}; nodes absent
    from the CSR (isolated seeds) pass through unchanged. Returns
    {original node id: (dist, sid)} for every settled node."""
    n = csr.n
    dist = [float("inf")] * n
    sid = [_SP_NOSRC] * n
    pq = []
    passthrough = {}
    for u, (d, s) in init.items():
        i = csr.idx_of.get(int(u))
        if i is None:
            passthrough[u] = (d, s)
            continue
        if (d, s) < (dist[i], sid[i]):
            dist[i], sid[i] = d, s
            pq.append((d, s, i))
    heapq.heapify(pq)
    indptr, dsts, ws = csr.indptr, csr.dst, csr.w
    pop = heapq.heappop
    push = heapq.heappush
    while pq:
        d, s, u = pop(pq)
        if d > dist[u] or (d == dist[u] and s > sid[u]):
            continue
        for k in range(indptr[u], indptr[u + 1]):
            v = dsts[k]
            nd = d + ws[k]
            dv = dist[v]
            if nd < dv or (nd == dv and s < sid[v]):
                dist[v] = nd
                sid[v] = s
                push(pq, (nd, s, v))
    uniq = csr.uniq.tolist()
    out = {
        uniq[i]: (dist[i], sid[i]) for i in range(n) if dist[i] < float("inf")
    }
    out.update(passthrough)
    return out


def _sp_split_np(a, b, w, sid):
    """numpy split of the (-2)-marked seed edges from real edges; seeds
    keep the lexicographic-min (w, sid) per node (same rule as
    _sp_split). Returns (real_a, real_b, real_w, seeds dict)."""
    seed_mask = (a == -2) | (b == -2)
    sn = np.where(a[seed_mask] == -2, b[seed_mask], a[seed_mask])
    sw, ss = w[seed_mask], sid[seed_mask]
    seeds: dict = {}
    for n_, w_, s_ in zip(sn.tolist(), sw.tolist(), ss.tolist()):
        cand = (w_, s_)
        if cand < seeds.get(n_, (float("inf"), _SP_NOSRC)):
            seeds[n_] = cand
    keep = ~seed_mask
    return a[keep], b[keep], w[keep], seeds


def _sp_contract_kernel(nodes: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    ra, rb, rw, seeds = _sp_split_np(
        edges["a"].to_numpy(np.int64), edges["b"].to_numpy(np.int64),
        edges["w"].to_numpy(np.float64), edges["sid"].to_numpy(np.int64))
    csr = _SpCsr(ra, rb, rw)  # built once, shared by every terminal's run
    terms = sorted(int(r.a) for r in nodes.itertuples() if r.term)
    oa, ob, ow, osid = [], [], [], []
    for i, t in enumerate(terms):
        best = _sp_dijkstra_csr(csr, {t: (0.0, _SP_NOSRC)})
        for u in terms[i + 1:]:
            du = best.get(u)
            if du is not None and du[0] < float("inf"):
                oa.append(t); ob.append(u); ow.append(du[0]); osid.append(-1)
    if seeds:
        src_best = _sp_dijkstra_csr(csr, dict(seeds))
        for t in terms:
            dt = src_best.get(t)
            if dt is not None and dt[0] < float("inf"):
                oa.append(-2); ob.append(t); ow.append(dt[0]); osid.append(dt[1])
    return pd.DataFrame({"a": np.array(oa, np.int64), "b": np.array(ob, np.int64),
                         "w": np.array(ow, np.float64), "sid": np.array(osid, np.int64)})


def _sp_unwind_kernel(bound: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    ra, rb, rw, seeds = _sp_split_np(
        edges["a"].to_numpy(np.int64), edges["b"].to_numpy(np.int64),
        edges["w"].to_numpy(np.float64), edges["sid"].to_numpy(np.int64))
    init = dict(seeds)
    for r in bound.itertuples():
        cand = (float(r.dist), int(r.sid))
        if cand < init.get(int(r.a), (float("inf"), _SP_NOSRC)):
            init[int(r.a)] = cand
    best = _sp_dijkstra_csr(_SpCsr(ra, rb, rw), init)
    items = [(k, v[0], v[1]) for k, v in best.items() if v[0] < float("inf")]
    if not items:
        return pd.DataFrame({"seed": [], "dist": [], "sid": []}).astype(
            {"seed": np.int64, "dist": np.float64, "sid": np.int64})
    ks, ds, ss = zip(*items)
    return pd.DataFrame({"seed": np.array(ks, np.int64),
                         "dist": np.array(ds, np.float64),
                         "sid": np.array(ss, np.int64)})


def shortest_path_hier(
    edges: DataFrame,
    width: int,
    *,
    block: int = 4096,
    scale: int = 8,
    direct_threshold: int = 2_000_000,
    max_levels: int = 12,
) -> DataFrame:
    """edges: (a, b, w, sid) undirected over row-major node ids
    (node = row * width + col); a = -2 marks a source edge (w = entry
    cost, sid = the claiming source). Returns (seed, dist, sid) for every
    reachable node."""
    spark = edges.sparkSession
    edges = edges.select("a", "b", "w", "sid").localCheckpoint(eager=True)
    n_e = edges.count()
    if n_e == 0:
        return spark.createDataFrame([], _SP_OUT_SCHEMA)
    if n_e <= direct_threshold:
        pdf = edges.toPandas()
        ra, rb, rw, seeds = _sp_split_np(
            pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64),
            pdf["w"].to_numpy(np.float64), pdf["sid"].to_numpy(np.int64))
        best = _sp_dijkstra_csr(_SpCsr(ra, rb, rw), seeds)
        out = [(int(k), float(v[0]), int(v[1])) for k, v in best.items()
               if v[0] < float("inf")]
        return spark.createDataFrame(out or [(-(10**9), 0.0, -1)], _SP_OUT_SCHEMA)
    if max_levels <= 1:
        raise RuntimeError("shortest_path_hier: recursion limit hit")

    gb = block

    def grp(c: str):
        return F.struct(
            F.expr(f"({c} DIV {width}) DIV {gb}").alias("gr"),
            F.expr(f"({c} % {width}) DIV {gb}").alias("gc"),
        )

    e2 = edges.withColumn(
        "ga", F.when(F.col("a") == -2, grp("b")).otherwise(grp("a"))
    ).withColumn(
        "gb_", F.when(F.col("b") == -2, grp("a")).otherwise(grp("b"))
    )
    ing = e2.filter(F.col("ga") == F.col("gb_"))
    crossg = e2.filter(F.col("ga") != F.col("gb_")).select("a", "b", "w", "sid")

    terms = (
        crossg.select(F.col("a").alias("t"))
        .unionAll(crossg.select(F.col("b").alias("t")))
        .filter(F.col("t") != -2)
        .distinct()
        .withColumn("term", F.lit(True))
    )
    nd = (
        ing.select(F.col("a").alias("node"), F.col("ga").alias("g"))
        .unionAll(ing.select(F.col("b").alias("node"), F.col("ga").alias("g")))
        .filter(F.col("node") != -2)
        .distinct()
        .join(terms, F.col("node") == F.col("t"), "left")
        .select(F.col("node").alias("a"), F.col("g"),
                F.coalesce("term", F.lit(False)).alias("term"))
    )
    ing_e = ing.select("a", "b", "w", "sid", F.col("ga").alias("g"))
    reduced = (
        nd.groupBy("g")
        .cogroup(ing_e.groupBy("g"))
        .applyInPandas(
            lambda left, right: _sp_contract_kernel(left, right[["a", "b", "w", "sid"]]),
            _SP_SCHEMA,
        )
    )
    sub = shortest_path_hier(
        reduced.unionByName(crossg), width,
        block=block * scale, scale=scale,
        direct_threshold=direct_threshold, max_levels=max_levels - 1,
    )
    tsolved = sub.join(terms.select(F.col("t").alias("seed")), "seed").select(
        F.col("seed").alias("a"), "dist", "sid"
    )
    tg2 = tsolved.withColumn("g", grp("a"))
    solved = (
        tg2.groupBy("g")
        .cogroup(ing_e.groupBy("g"))
        .applyInPandas(
            lambda left, right: _sp_unwind_kernel(
                left[["a", "dist", "sid"]], right[["a", "b", "w", "sid"]]
            ),
            _SP_OUT_SCHEMA,
        )
    )
    extra = sub.join(solved.select("seed"), "seed", "left_anti")
    return solved.unionByName(extra)
