"""Vector stream network tools.

vector_stream_network_analysis
(whitebox-plugins/src/vector_stream_network_analysis/main.rs:360-846) and
correct_stream_vector_direction
(whitebox-plugins/src/correct_stream_vector_direction/main.rs:240-420).

Arcs are polylines (arc_id, xs, ys) directed downstream (last vertex =
downstream end) for the analysis tool; endnode coincidence connects the
network. The reference matches endnodes with an r-tree at precision
10*EPSILON (i.e. exact coincidence) and uses `snap_dist` only to seed
outlets / detect outlet links; this engine matches endnodes by quantized
coordinate equality (`key_decimals`, default 9 — the coincidence analog)
and uses snap_dist for the outlet-point seeding. Snapping imperfect
topology is RepairStreamVectorTopology's job, not these tools'.

Spark-first shape, by quantity:
  - downstream path quantities (DIST2MOUTH, NUM_DS_NODES = depth, OUTLET,
    HACK) are pointer-doubling path sums over the downstream-link
    functional graph — O(log depth) self-join rounds, no sequential BFS;
  - upstream aggregates (SHREVE, STRAHLER, TUCL, MAXUPSDIST, TRIB_ID)
    are one bottom-up junction wave (rounds = junction depth, the same
    shape as streams.py's raster link forest);
  - HORTON is a groupBy(trib) max over Strahler, MAINSTEM a join against
    the outlet link's tributary id.

Reference quirks transcribed faithfully:
  - MAXUPSDIST counts channel-head arc lengths TWICE (main.rs:585-599:
    heads are initialized to their length AND add it again when popped);
  - DIST2MOUTH excludes the outlet link's own length (the outlet link
    keeps its initial 0.0 and children add only their own lengths);
  - DS_LINK_ID of an outlet link is -98 (main.rs:778: the -99 sentinel
    is written `as i32 + 1`);
  - NUM_DS_NODES is the arc-hop depth with the outlet link at 1.

Documented deviations (both only on non-generic inputs):
  - Strahler at junctions uses the textbook rule (max order, +1 when >= 2
    children share it); the reference applies pairwise queue-order
    updates which can differ on >=3-way junctions with mixed orders.
  - Tributary-id ties (two children with exactly equal MAXUPSDIST) break
    by smaller child arc id; the reference keeps whichever child popped
    first. Exact float ties are non-generic.
"""

from __future__ import annotations

import math
from collections import deque

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..distributed import loop_checkpoint, with_global_seq


def _arc_base(arcs: DataFrame, key_decimals: int) -> DataFrame:
    """(arc_id, xs, ys, length, fkx, fky, lkx, lky): planar length +
    quantized endpoint keys (vector_stream_network_analysis main.rs:
    419-435 planar branch; the haversine geographic branch is a
    projection concern, out of scope here)."""
    n = F.size("xs")
    seg = F.expr(
        "aggregate(sequence(1, size(xs) - 1), cast(0.0 as double), "
        "(acc, i) -> acc + sqrt((xs[i] - xs[i-1]) * (xs[i] - xs[i-1]) + "
        "(ys[i] - ys[i-1]) * (ys[i] - ys[i-1])))"
    )
    d = key_decimals
    return arcs.select(
        "arc_id",
        "xs",
        "ys",
        F.when(n >= 2, seg).otherwise(F.lit(0.0)).alias("length"),
        F.round(F.col("xs")[0], d).alias("fkx"),
        F.round(F.col("ys")[0], d).alias("fky"),
        F.round(F.element_at("xs", -1), d).alias("lkx"),
        F.round(F.element_at("ys", -1), d).alias("lky"),
    )


def _path_sums(base: DataFrame, links: DataFrame, *, max_rounds: int = 48) -> DataFrame:
    """Pointer doubling over the downstream functional graph.

    links: (arc_id, ds) with ds NULL at roots. Returns per arc:
    root_id, depth (arc hops, root = 1), dist (sum of own lengths along
    the path with the ROOT arc contributing 0 — the DIST2MOUTH rule)."""
    w0 = F.when(F.col("ds").isNull(), 0.0).otherwise(F.col("length"))
    cur = (
        base.select("arc_id", "length")
        .join(links, "arc_id")
        .select(
            "arc_id",
            F.col("ds").alias("nxt"),
            w0.alias("sumw"),
            F.lit(1).cast("long").alias("cnt"),
            F.when(F.col("ds").isNull(), F.col("arc_id")).alias("root_id"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        if cur.filter(F.col("nxt").isNotNull()).isEmpty():
            break
        b = cur.select(
            F.col("arc_id").alias("b_id"),
            F.col("nxt").alias("b_nxt"),
            F.col("sumw").alias("b_sumw"),
            F.col("cnt").alias("b_cnt"),
            F.col("root_id").alias("b_root"),
        )
        cur = (
            cur.join(b, cur["nxt"] == b["b_id"], "left")
            .select(
                "arc_id",
                F.when(F.col("nxt").isNull(), F.lit(None)).otherwise(F.col("b_nxt")).alias("nxt"),
                F.when(F.col("nxt").isNull(), F.col("sumw")).otherwise(F.col("sumw") + F.col("b_sumw")).alias("sumw"),
                F.when(F.col("nxt").isNull(), F.col("cnt")).otherwise(F.col("cnt") + F.col("b_cnt")).alias("cnt"),
                F.coalesce("root_id", "b_root").alias("root_id"),
            )
            .transform(loop_checkpoint)
        )
    return cur.select("arc_id", "root_id", F.col("cnt").alias("depth"), F.col("sumw").alias("dist"))


def vector_stream_network_analysis(
    arcs: DataFrame,
    *,
    key_decimals: int = 9,
    max_rounds: int = 48,
    length_scale: float | None = None,
) -> DataFrame:
    """Per-arc network attributes (the tool's 13 output fields).

    length_scale (e.g. 1e6): quantize arc lengths to integer-valued
    doubles before accumulating. Integer-valued double sums are EXACT
    (associative) below 2^53, which makes TUCL/MAXUPSDIST/DIST2MOUTH
    independent of partitioning and of junction accumulation order —
    engine-invariant for oracle checking and deterministic under retries.
    None keeps raw float lengths (last-ulp order sensitivity)."""
    base = _arc_base(arcs, key_decimals)
    if length_scale is not None:
        base = base.withColumn("length", F.round(F.col("length") * F.lit(length_scale)))
    base = base.localCheckpoint(eager=True)

    # downstream link: the arc whose FIRST node coincides with this arc's
    # LAST node (main.rs BFS discovers children across the parent's
    # upstream endnode; min arc id on braided multi-parents, documented)
    parents = base.select(
        F.col("arc_id").alias("p_id"), F.col("fkx").alias("lkx"), F.col("fky").alias("lky")
    )
    ds = (
        base.select("arc_id", "lkx", "lky")
        .join(parents, ["lkx", "lky"])
        .filter(F.col("p_id") != F.col("arc_id"))
        .groupBy("arc_id")
        .agg(F.min("p_id").alias("ds"))
    )
    links = (
        base.select("arc_id")
        .join(ds, "arc_id", "left")
        .localCheckpoint(eager=True)
    )

    paths = _path_sums(base, links, max_rounds=max_rounds)

    # outlet numbering: outlet links in arc-id order (reference fid order).
    # Outlets scale with basin count, so use the distributed range-
    # partitioned sequence rather than a single-partition global window.
    roots = links.filter(F.col("ds").isNull()).select("arc_id")
    outlet_ids = with_global_seq(roots, ["arc_id"], out_col="outlet_num").select(
        F.col("arc_id").alias("root_id"), "outlet_num"
    )

    # ---- bottom-up junction wave: shreve/strahler/tucl/maxupsdist/trib
    children = links.filter(F.col("ds").isNotNull()).select(
        F.col("arc_id").alias("ch"), F.col("ds").alias("arc_id")
    )
    n_children = children.groupBy("arc_id").agg(F.count(F.lit(1)).alias("n_ch"))
    all_arcs = base.select("arc_id", "length")
    total = all_arcs.count()
    state = (
        all_arcs.join(n_children, "arc_id", "left_anti")
        .select(
            "arc_id",
            F.lit(1).cast("long").alias("shreve"),
            F.lit(1).cast("long").alias("strahler"),
            F.col("length").alias("tucl"),
            (F.col("length") * 2.0).alias("m"),  # head double-count quirk
            F.col("arc_id").alias("trib"),
        )
        .localCheckpoint(eager=True)
    )
    done = state.count()
    for _ in range(max_rounds):
        if done >= total:
            break
        ch = children.join(
            state.select(
                F.col("arc_id").alias("ch"), "shreve", "strahler", "tucl", "m", "trib"
            ),
            "ch",
        )
        agg = ch.groupBy("arc_id").agg(
            F.count(F.lit(1)).alias("n_done"),
            F.sum("shreve").alias("sh"),
            F.max("strahler").alias("mx"),
            F.sum("tucl").alias("tu"),
            F.max("m").alias("mm"),
        )
        at_max = (
            ch.join(agg.select("arc_id", "mx"), "arc_id")
            .filter(F.col("strahler") == F.col("mx"))
            .groupBy("arc_id")
            .agg(F.count(F.lit(1)).alias("n_at_max"))
        )
        wp = Window.partitionBy("arc_id").orderBy("ch")
        trib_pick = (
            ch.join(agg.select("arc_id", "mm"), "arc_id")
            .filter(F.col("m") == F.col("mm"))
            .withColumn("__rk", F.row_number().over(wp))
            .filter(F.col("__rk") == 1)
            .select("arc_id", F.col("trib").alias("w_trib"))
        )
        newly = (
            agg.join(n_children, "arc_id")
            .filter(F.col("n_done") == F.col("n_ch"))
            .join(state.select("arc_id"), "arc_id", "left_anti")
            .join(at_max, "arc_id")
            .join(trib_pick, "arc_id")
            .join(all_arcs, "arc_id")
            .select(
                "arc_id",
                F.col("sh").alias("shreve"),
                (F.col("mx") + F.when(F.col("n_at_max") >= 2, 1).otherwise(0)).alias("strahler"),
                (F.col("tu") + F.col("length")).alias("tucl"),
                (F.col("mm") + F.col("length")).alias("m"),
                F.col("w_trib").alias("trib"),
            )
        )
        state = state.unionByName(newly).transform(loop_checkpoint)
        new_done = state.count()
        if new_done == done:
            break
        done = new_done
    state = state.localCheckpoint(eager=True)

    # horton: max strahler within each tributary
    horton = state.groupBy("trib").agg(F.max("strahler").alias("horton"))

    # hack: 1 + number of tributary changes along the downstream path.
    # second doubling with edge weight c = (trib != trib[ds])
    trib_of = state.select("arc_id", "trib")
    c_edge = (
        links.join(trib_of, "arc_id")
        .join(
            trib_of.select(F.col("arc_id").alias("ds"), F.col("trib").alias("ds_trib")),
            "ds",
            "left",
        )
        .select(
            "arc_id",
            F.col("ds").alias("nxt"),
            F.when(
                F.col("ds").isNotNull() & (F.col("trib") != F.col("ds_trib")), 1
            ).otherwise(0).cast("long").alias("sumc"),
            F.when(F.col("ds").isNull(), F.col("arc_id")).alias("root_id"),
        )
        .localCheckpoint(eager=True)
    )
    cur = c_edge
    for _ in range(max_rounds):
        if cur.filter(F.col("nxt").isNotNull()).isEmpty():
            break
        b = cur.select(
            F.col("arc_id").alias("b_id"),
            F.col("nxt").alias("b_nxt"),
            F.col("sumc").alias("b_sumc"),
            F.col("root_id").alias("b_root"),
        )
        cur = (
            cur.join(b, cur["nxt"] == b["b_id"], "left")
            .select(
                "arc_id",
                F.when(F.col("nxt").isNull(), F.lit(None)).otherwise(F.col("b_nxt")).alias("nxt"),
                F.when(F.col("nxt").isNull(), F.col("sumc")).otherwise(F.col("sumc") + F.col("b_sumc")).alias("sumc"),
                F.coalesce("root_id", "b_root").alias("root_id"),
            )
            .transform(loop_checkpoint)
        )
    hack = cur.select("arc_id", (F.lit(1) + F.col("sumc")).alias("hack"))

    # mainstem: same trib as the outlet link of this arc's basin
    root_trib = trib_of.select(
        F.col("arc_id").alias("root_id"), F.col("trib").alias("root_trib")
    )

    unscale = F.lit(length_scale if length_scale is not None else 1.0)
    return (
        base.select("arc_id", "length")
        .join(links, "arc_id")
        .join(paths, "arc_id")
        .join(state, "arc_id")
        .join(horton, "trib")
        .join(hack, "arc_id")
        .join(F.broadcast(outlet_ids), "root_id")
        .join(F.broadcast(root_trib), "root_id")
        .select(
            "arc_id",
            (F.col("tucl") / unscale).alias("tucl"),
            (F.col("m") / unscale).alias("maxupsdist"),
            F.col("outlet_num").alias("outlet"),
            "horton",
            "strahler",
            "shreve",
            "hack",
            (F.col("dist") / unscale).alias("dist2mouth"),
            F.col("depth").alias("n_ds_nodes"),
            F.col("ds").isNull().cast("int").alias("is_outlet"),
            F.coalesce(F.col("ds"), F.lit(-98)).alias("ds_link_id"),
            (F.col("trib") == F.col("root_trib")).cast("int").alias("mainstem"),
            F.col("trib").alias("trib_id"),
        )
    )


def correct_stream_vector_direction(
    arcs: DataFrame,
    outlets: DataFrame,
    *,
    snap_dist: float,
    key_decimals: int = 9,
    max_rounds: int = 48,
) -> DataFrame:
    """(arc_id, was_reversed, xs, ys): arcs re-oriented to point
    downstream toward the outlet(s) (correct_stream_vector_direction
    main.rs:316-418: bottom-up BFS from each outlet; an arc first reached
    via its START node is backwards).

    Node-BFS formulation: endnode hop distances from the outlet-snapped
    seed nodes; an arc is reversed iff hop(first) < hop(last). On a tree
    this equals the reference BFS exactly; equal-hop braid ties (where
    the reference's queue order decides) stay unreversed, documented.
    Arcs not connected to any outlet are left untouched (reference:
    unvisited arcs keep their orientation)."""
    base = _arc_base(arcs, key_decimals).localCheckpoint(eager=True)
    nodes = (
        base.select(F.col("fkx").alias("kx"), F.col("fky").alias("ky"))
        .unionByName(base.select(F.col("lkx").alias("kx"), F.col("lky").alias("ky")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # undirected node adjacency through arcs
    adj = (
        base.select(
            F.col("fkx").alias("kx"), F.col("fky").alias("ky"),
            F.col("lkx").alias("nkx"), F.col("lky").alias("nky"),
        )
        .unionByName(
            base.select(
                F.col("lkx").alias("kx"), F.col("lky").alias("ky"),
                F.col("fkx").alias("nkx"), F.col("fky").alias("nky"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = (
        nodes.crossJoin(F.broadcast(outlets.select(F.col("x").alias("ox"), F.col("y").alias("oy"))))
        .filter(
            (F.col("kx") - F.col("ox")) * (F.col("kx") - F.col("ox"))
            + (F.col("ky") - F.col("oy")) * (F.col("ky") - F.col("oy"))
            <= F.lit(snap_dist * snap_dist)
        )
        .select("kx", "ky")
        .distinct()
    )
    dist = seeds.withColumn("d", F.lit(0).cast("long")).localCheckpoint(eager=True)
    for hop in range(1, max_rounds + 1):
        frontier = (
            dist.filter(F.col("d") == hop - 1)
            .join(adj, ["kx", "ky"])
            .select(F.col("nkx").alias("kx"), F.col("nky").alias("ky"))
            .distinct()
            .join(dist.select("kx", "ky"), ["kx", "ky"], "left_anti")
            .withColumn("d", F.lit(hop).cast("long"))
        )
        if frontier.isEmpty():
            break
        dist = dist.unionByName(frontier).transform(loop_checkpoint)

    df = (
        base.join(
            dist.select(F.col("kx").alias("fkx"), F.col("ky").alias("fky"), F.col("d").alias("fd")),
            ["fkx", "fky"],
            "left",
        )
        .join(
            dist.select(F.col("kx").alias("lkx"), F.col("ky").alias("lky"), F.col("d").alias("ld")),
            ["lkx", "lky"],
            "left",
        )
        .withColumn(
            "was_reversed",
            F.col("fd").isNotNull() & F.col("ld").isNotNull() & (F.col("fd") < F.col("ld")),
        )
    )
    return df.select(
        "arc_id",
        F.col("was_reversed").cast("int").alias("was_reversed"),
        F.when(F.col("was_reversed"), F.reverse("xs")).otherwise(F.col("xs")).alias("xs"),
        F.when(F.col("was_reversed"), F.reverse("ys")).otherwise(F.col("ys")).alias("ys"),
    )


# ---------------------------------------------------------------------------
# Serial transcriptions (oracles/tests): direct ports of the reference's
# queue algorithms — independent of the Spark formulation above.
# ---------------------------------------------------------------------------
def vsna_reference(
    polylines: list[list[tuple[float, float]]],
    length_scale: float | None = None,
) -> list[dict]:
    """Direct transcription of vector_stream_network_analysis
    main.rs:466-720 (exact-coincidence endnode matching). length_scale
    mirrors the engine's integer-valued length quantization."""
    n = len(polylines)
    lengths = [
        sum(math.hypot(p[i][0] - p[i - 1][0], p[i][1] - p[i - 1][1]) for i in range(1, len(p)))
        for p in polylines
    ]
    if length_scale is not None:
        lengths = [float(round(L * length_scale)) for L in lengths]
    by_node: dict[tuple, list[tuple[int, bool]]] = {}
    for fid, p in enumerate(polylines):
        by_node.setdefault(p[0], []).append((fid, True))
        by_node.setdefault(p[-1], []).append((fid, False))

    outlet_pts = []
    for fid, p in enumerate(polylines):
        if not any(
            fid_n != fid and is_start for fid_n, is_start in by_node.get(p[-1], [])
        ):
            outlet_pts.append(p[-1])

    dist_to_outlet = [0.0] * n
    outlet_nums = [0] * n
    downstream_link = [-99] * n
    num_ds_nodes = [0] * n
    is_outlet_link = [False] * n
    outlet_list = []
    visited = [False] * n
    for oi, opt in enumerate(outlet_pts):
        for fid, is_start in by_node.get(opt, []):
            if not visited[fid]:
                visited[fid] = True
                outlet_list.append(fid)
                is_outlet_link[fid] = True
                outlet_nums[fid] = oi + 1
                num_ds_nodes[fid] = 1
                q = deque([(fid, is_start)])
                while q:
                    fid2, is_start2 = q.popleft()
                    p1 = polylines[fid2][0] if not is_start2 else polylines[fid2][-1]
                    for fid_n, is_start_n in by_node.get(p1, []):
                        if fid_n != fid2 and not visited[fid_n]:
                            q.append((fid_n, is_start_n))
                            visited[fid_n] = True
                            dist_to_outlet[fid_n] = dist_to_outlet[fid2] + lengths[fid_n]
                            outlet_nums[fid_n] = oi + 1
                            downstream_link[fid_n] = fid2
                            num_ds_nodes[fid_n] += num_ds_nodes[fid2] + 1

    num_inflowing = [0] * n
    for i in range(n):
        if downstream_link[i] >= 0:
            num_inflowing[downstream_link[i]] += 1
    link_mag = list(lengths)
    shreve = [0] * n
    strahler = [0] * n
    maxups = [0.0] * n
    trib = [0] * n
    heads = [i for i in range(n) if num_inflowing[i] == 0]
    dq = deque()
    for h in heads:
        dq.append(h)
        shreve[h] = 1
        strahler[h] = 1
        maxups[h] = lengths[h]
        trib[h] = h
    infl = list(num_inflowing)
    while dq:
        fid = dq.popleft()
        maxups[fid] += lengths[fid]
        dsl = downstream_link[fid]
        if dsl >= 0:
            shreve[dsl] += shreve[fid]
            if strahler[dsl] < strahler[fid]:
                strahler[dsl] = strahler[fid]
            elif strahler[dsl] == strahler[fid]:
                strahler[dsl] += 1
            link_mag[dsl] += link_mag[fid]
            if maxups[dsl] < maxups[fid]:
                maxups[dsl] = maxups[fid]
                trib[dsl] = trib[fid]
            infl[dsl] -= 1
            if infl[dsl] == 0:
                dq.append(dsl)

    mainstem = [False] * n
    for i in range(n):
        if outlet_nums[i] > 0:
            ol = outlet_list[outlet_nums[i] - 1]
            mainstem[i] = trib[i] == trib[ol]
    trib_max = {}
    for i in range(n):
        trib_max[trib[i]] = max(trib_max.get(trib[i], 0), strahler[i])
    horton = [trib_max[trib[i]] for i in range(n)]

    hack = [0] * n
    visited = [False] * n
    for oi, opt in enumerate(outlet_pts):
        for fid, is_start in by_node.get(opt, []):
            if not visited[fid]:
                visited[fid] = True
                hack[fid] = 1
                q = deque([(fid, is_start)])
                while q:
                    fid2, is_start2 = q.popleft()
                    p1 = polylines[fid2][0] if not is_start2 else polylines[fid2][-1]
                    for fid_n, is_start_n in by_node.get(p1, []):
                        if fid_n != fid2 and not visited[fid_n]:
                            q.append((fid_n, is_start_n))
                            visited[fid_n] = True
                            hack[fid_n] = hack[fid2] + (0 if trib[fid_n] == trib[fid2] else 1)

    return [
        {
            "arc_id": i,
            "tucl": link_mag[i],
            "maxupsdist": maxups[i],
            "outlet": outlet_nums[i],
            "horton": horton[i],
            "strahler": strahler[i],
            "shreve": shreve[i],
            "hack": hack[i],
            "dist2mouth": dist_to_outlet[i],
            "n_ds_nodes": num_ds_nodes[i],
            "is_outlet": int(is_outlet_link[i]),
            "ds_link_id": downstream_link[i] + 1,
            "mainstem": int(mainstem[i]),
            "trib_id": trib[i],
        }
        for i in range(n)
    ]


def csvd_reference(
    polylines: list[list[tuple[float, float]]],
    outlet_pts: list[tuple[float, float]],
    snap_dist: float,
) -> list[bool]:
    """Direct transcription of correct_stream_vector_direction
    main.rs:316-418: per-arc reversed flag."""
    n = len(polylines)
    by_node: dict[tuple, list[tuple[int, bool]]] = {}
    ends = []
    for fid, p in enumerate(polylines):
        by_node.setdefault(p[0], []).append((fid, True))
        by_node.setdefault(p[-1], []).append((fid, False))
        ends.append((p[0], p[-1]))
    visited = [False] * n
    reverse = [False] * n
    s2 = snap_dist * snap_dist
    for opt in outlet_pts:
        near = [
            (fid, is_start)
            for node, lst in by_node.items()
            for fid, is_start in lst
            if (node[0] - opt[0]) ** 2 + (node[1] - opt[1]) ** 2 <= s2
        ]
        for fid, is_start in near:
            if not visited[fid]:
                visited[fid] = True
                q = deque([(fid, is_start)])
                while q:
                    fid2, is_start2 = q.popleft()
                    if not is_start2:
                        p1 = polylines[fid2][0]
                    else:
                        reverse[fid2] = True
                        p1 = polylines[fid2][-1]
                    for fid_n, is_start_n in by_node.get(p1, []):
                        if fid_n != fid2 and not visited[fid_n]:
                            q.append((fid_n, is_start_n))
                            visited[fid_n] = True
    return reverse


# ---------------------------------------------------------------------------
# repair_stream_vector_topology
# ---------------------------------------------------------------------------
def _seg_intersection(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1):
    """LineSegment::get_intersection (whitebox-common/src/structures/
    line_segment.rs:42-77): parametric proper-intersection point, None on
    parallel/disjoint (the coincident-interval branch is not needed for
    the overshoot trim: the adjoining and target segments cross)."""
    denom = (ax0 - ax1) * (by0 - by1) - (ay0 - ay1) * (bx0 - bx1)
    if denom == 0.0:
        return None
    t = ((ax0 - bx0) * (by0 - by1) - (ay0 - by0) * (bx0 - bx1)) / denom
    u = -((ax0 - ax1) * (ay0 - by0) - (ay0 - ay1) * (ax0 - bx0)) / denom
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        return (ax0 + t * (ax1 - ax0), ay0 + t * (ay1 - ay0))
    return None


def _nearest_on_segment(px, py, x0, y0, x1, y1):
    dx, dy = x1 - x0, y1 - y0
    d2 = dx * dx + dy * dy
    if d2 == 0.0:
        return x0, y0
    t = ((px - x0) * dx + (py - y0) * dy) / d2
    t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
    return x0 + t * dx, y0 + t * dy


def repair_reference(
    polylines: list[list[tuple[float, float]]],
    snap_dist: float,
    *,
    correct_nonconfluence_joins: bool = True,
    precision: float = 1e-9,
) -> list[list[tuple[float, float]]]:
    """Serial transcription of repair_stream_vector_topology
    main.rs:390-745 (joins + dangle snap + splits + zero-length removal;
    the majority-orientation restoration pass main.rs:800-845 is a
    cosmetic re-ordering — outputs here are orientation-normalized by the
    caller). Brute-force searches replace the r-trees."""
    import numpy as np

    polylines = [list(p) for p in polylines]
    n = len(polylines)

    def close(a, b):
        return math.hypot(a[0] - b[0], a[1] - b[1]) <= precision

    if correct_nonconfluence_joins:
        # per-arc, per-end single-neighbour connections (main.rs:390-433)
        conns = [[None, None] for _ in range(n)]
        allends = [(fid, e, polylines[fid][0 if e == 0 else -1]) for fid in range(n) for e in (0, 1)]
        for fid in range(n):
            for e in (0, 1):
                p1 = polylines[fid][0 if e == 0 else -1]
                near = [g for g, _, q in allends if g != fid and close(p1, q)]
                if len(near) == 1:
                    conns[fid][e] = near[0]
        # chain walk (main.rs:436-510)
        marked = [False] * n
        merged = []
        for fid in range(n):
            if marked[fid]:
                continue
            j_start, j_end = conns[fid][0] is not None, conns[fid][1] is not None
            if j_start == j_end:
                continue  # interior of a chain, unjoined, or 2-joined
            marked[fid] = True
            pl = list(polylines[fid]) if j_end else list(reversed(polylines[fid]))
            cur = fid
            while True:
                nxt = None
                for e in (0, 1):
                    c = conns[cur][e]
                    if c is not None and not marked[c]:
                        nxt = c
                        break
                if nxt is None:
                    break
                marked[cur] = True
                cur = nxt
                marked[cur] = True
                if close(pl[-1], polylines[cur][0]):
                    pl.extend(polylines[cur])
                else:
                    pl.extend(reversed(polylines[cur]))
            merged.append(pl)
        polylines = [polylines[i] for i in range(n) if not marked[i]] + merged
        # zero-length vertex removal (main.rs:527-534)
        for pl in polylines:
            for i in range(len(pl) - 1, 0, -1):
                if close(pl[i], pl[i - 1]):
                    pl.pop(i)
        n = len(polylines)

    # dangle snapping (main.rs:585-745)
    segs = [
        (fid, i, pl[i], pl[i + 1])
        for fid, pl in enumerate(polylines)
        for i in range(len(pl) - 1)
    ]
    splits: list[list] = [[] for _ in range(n)]
    offset_by_one = [False] * n

    def dist_pt_seg(p, a, b):
        q = _nearest_on_segment(p[0], p[1], a[0], a[1], b[0], b[1])
        return math.hypot(p[0] - q[0], p[1] - q[1])

    for fid in range(n):
        for e in (0, 1):
            p1 = polylines[fid][0 if e == 0 else -1]
            best = None
            for gfid, si, a, b in segs:
                if gfid == fid:
                    continue
                q = _nearest_on_segment(p1[0], p1[1], a[0], a[1], b[0], b[1])
                d = math.hypot(p1[0] - q[0], p1[1] - q[1])
                if d <= snap_dist and (best is None or d < best[0]):
                    best = (d, q, gfid, si, a, b)
            n_nbr = sum(
                1
                for g in range(n)
                if g != fid
                for q in (polylines[g][0], polylines[g][-1])
                if close(p1, q)
            )
            if best is None:
                continue
            d, point, gfid, si, a, b = best
            if not ((d > precision) or (d <= precision and n_nbr == 0)):
                continue
            if e == 0:
                adj = (polylines[fid][0], polylines[fid][1])
            else:
                adj = (polylines[fid][-2], polylines[fid][-1])
            if abs(dist_pt_seg(point, adj[0], adj[1]) - d) <= precision:
                # undershoot: extend the endpoint
                if e == 0:
                    polylines[fid].insert(0, point)
                    offset_by_one[fid] = True
                else:
                    polylines[fid].append(point)
                splits[gfid].append((si, point))
            else:
                # overshoot: trim to the crossing. Parametrized from the
                # endpoint for both ends (the reference orders the last-
                # end segment (v[-2], p1), main.rs:691 — the same
                # mathematical point; endpoint-first keeps the engine and
                # this transcription bit-identical).
                other = adj[1] if e == 0 else adj[0]
                inter = _seg_intersection(
                    p1[0], p1[1], other[0], other[1],
                    a[0], a[1], b[0], b[1],
                )
                pt = inter if inter is not None else point
                if e == 0:
                    if math.hypot(polylines[fid][1][0] - pt[0], polylines[fid][1][1] - pt[1]) > precision:
                        polylines[fid].insert(0, pt)
                        polylines[fid].pop(1)
                else:
                    polylines[fid].pop()
                    polylines[fid].append(pt)
                splits[gfid].append((si, pt))

    # apply the splits (main.rs:722-733 + Polyline::split)
    out = []
    for fid, pl in enumerate(polylines):
        sp = splits[fid]
        if offset_by_one[fid]:
            sp = [(i + 1, p) for i, p in sp]
        sp = [s for k, s in enumerate(sp) if s not in sp[:k]]
        if not sp:
            out.append(pl)
            continue
        cum = [0.0]
        for i in range(1, len(pl)):
            cum.append(cum[-1] + math.hypot(pl[i][0] - pl[i - 1][0], pl[i][1] - pl[i - 1][1]))
        sp = sorted(
            sp,
            key=lambda s: cum[s[0]] + math.hypot(pl[s[0]][0] - s[1][0], pl[s[0]][1] - s[1][1]),
        )
        cur_split = 0
        line: list = []
        for node in range(len(pl)):
            if cur_split == len(sp) or node < sp[cur_split][0]:
                line.append(pl[node])
            else:
                line.append(pl[node])
                while cur_split < len(sp) and sp[cur_split][0] == node:
                    line.append(sp[cur_split][1])
                    out.append(line)
                    line = [sp[cur_split][1]]
                    cur_split += 1
        if len(line) > 1:
            out.append(line)

    # final zero-length vertex removal
    for pl in out:
        for i in range(len(pl) - 1, 0, -1):
            if close(pl[i], pl[i - 1]):
                pl.pop(i)
    return [pl for pl in out if len(pl) >= 2]


def repair_stream_vector_topology(
    arcs: DataFrame,
    *,
    snap_dist: float,
    correct_nonconfluence_joins: bool = True,
    key_decimals: int = 9,
    max_rounds: int = 64,
) -> DataFrame:
    """repair_stream_vector_topology plugin (main.rs:390-745), distributed.

    Pass A (joins, main.rs:390-510): arcs meeting pairwise at clean
    degree-2 endnodes are chained into single arcs — min-label + pointer-
    doubling component rounds (O(log chain length)), then a per-component
    Arrow stitch kernel (components are individual chains, tiny; all
    chains stitch in parallel — the clump/ring-stitch idiom).
    Pass B (dangle snap, main.rs:585-745): dangling endnodes within
    `snap_dist` of another arc's segment are classified undershoot
    (extend the endpoint to the nearest on-segment point) or overshoot
    (trim to the adjoining/target crossing) exactly per the reference's
    test, and the target arc is split at the contact point. Candidate
    search is a cell-cover equi-join (no all-pairs), nearest-segment
    tie-break (dist, target arc, segment) documented (the reference's
    r-tree iteration order is arbitrary).
    Zero-length vertices are removed (main.rs:527-534, :737-744); the
    majority-orientation restoration pass (main.rs:800-845) is cosmetic
    re-ordering and is not reproduced — treat outputs as orientation-
    normalized. reverse_backward_arcs is correct_stream_vector_direction.

    Returns (arc_id, piece, xs, ys): arc_id = min member id of a merged
    chain (or the original id), piece = split ordinal (0 = first).
    """
    import numpy as np
    import pandas as pd

    spark = arcs.sparkSession
    d = key_decimals
    prec = 10.0 ** (-d)

    def _ends(df):
        return df.select(
            "arc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("e"),
                        F.col("xs")[0].alias("px"), F.col("ys")[0].alias("py"),
                    ),
                    F.struct(
                        F.lit(1).alias("e"),
                        F.element_at("xs", -1).alias("px"), F.element_at("ys", -1).alias("py"),
                    ),
                )
            ).alias("p"),
        ).select(
            "arc_id", F.col("p.e").alias("e"), F.col("p.px").alias("px"), F.col("p.py").alias("py"),
            F.round(F.col("p.px"), d).alias("kx"), F.round(F.col("p.py"), d).alias("ky"),
        )

    cur = arcs.select("arc_id", "xs", "ys")
    if correct_nonconfluence_joins:
        ends = _ends(cur)
        deg = ends.groupBy("kx", "ky").agg(
            F.count(F.lit(1)).alias("deg"), F.collect_set("arc_id").alias("members")
        )
        pairs = (
            deg.filter((F.col("deg") == 2) & (F.size("members") == 2))
            .select(F.array_min("members").alias("a"), F.array_max("members").alias("b"))
            .distinct()
        )
        lab = cur.select("arc_id", F.col("arc_id").alias("lab")).localCheckpoint(eager=True)
        und = pairs.unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        for _ in range(max_rounds):
            prop = (
                und.join(lab, und["a"] == lab["arc_id"])
                .select(F.col("b").alias("arc_id"), "lab")
                .groupBy("arc_id")
                .agg(F.min("lab").alias("nlab"))
            )
            relaxed = lab.join(prop, ["arc_id"], "left").select(
                "arc_id",
                F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("lab"),
            )
            short = relaxed.alias("x").join(
                relaxed.alias("y"), F.col("x.lab") == F.col("y.arc_id"), "left"
            ).select(
                F.col("x.arc_id").alias("arc_id"),
                F.least(F.col("x.lab"), F.coalesce(F.col("y.lab"), F.col("x.lab"))).alias("l2"),
            )
            nxt = lab.select("arc_id", F.col("lab").alias("l1")).join(short, ["arc_id"])
            done = nxt.filter(F.col("l2") != F.col("l1")).limit(1).isEmpty()
            lab = nxt.select("arc_id", F.col("l2").alias("lab")).transform(loop_checkpoint)
            if done:
                break
        sizes = lab.groupBy("lab").agg(F.count(F.lit(1)).alias("n"))
        multi = lab.join(sizes.filter(F.col("n") > 1).select("lab"), "lab")
        single = (
            lab.join(sizes.filter(F.col("n") == 1).select("lab"), "lab")
            .join(cur, "arc_id")
            .select("arc_id", "xs", "ys")
        )

        def _stitch(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = list(pdf.itertuples(index=False))
            pls = {int(r.arc_id): list(zip(r.xs, r.ys)) for r in rows}
            ids = sorted(pls)
            # local per-end single-neighbour connections (exact keys)
            node_of = {}
            for i in ids:
                for e, p in ((0, pls[i][0]), (1, pls[i][-1])):
                    k = (round(p[0], d), round(p[1], d))
                    node_of.setdefault(k, []).append((i, e))
            conns = {i: [None, None] for i in ids}
            for k, lst in node_of.items():
                for i, e in lst:
                    others = [j for j, _ in lst if j != i]
                    if len(others) == 1:
                        conns[i][e] = others[0]
            starts = [
                i for i in ids
                if (conns[i][0] is None) != (conns[i][1] is None)
            ]
            out = []
            if not starts:
                # pure cycle: the reference never merges it (no valid
                # chain start) — members pass through unchanged
                for i in ids:
                    out.append((i, [p[0] for p in pls[i]], [p[1] for p in pls[i]]))
            else:
                marked = {i: False for i in ids}
                for fid in starts:
                    if marked[fid]:
                        continue
                    marked[fid] = True
                    members = [fid]
                    pl = list(pls[fid]) if conns[fid][1] is not None else list(reversed(pls[fid]))
                    cnode = fid
                    while True:
                        nxt = None
                        for e in (0, 1):
                            c = conns[cnode][e]
                            if c is not None and not marked[c]:
                                nxt = c
                                break
                        if nxt is None:
                            break
                        cnode = nxt
                        marked[cnode] = True
                        members.append(cnode)
                        q = pls[cnode]
                        if (
                            abs(pl[-1][0] - q[0][0]) <= prec
                            and abs(pl[-1][1] - q[0][1]) <= prec
                        ):
                            pl.extend(q)
                        else:
                            pl.extend(reversed(q))
                    out.append((min(members), [p[0] for p in pl], [p[1] for p in pl]))
                for i in ids:
                    if not marked[i]:
                        out.append((i, [p[0] for p in pls[i]], [p[1] for p in pls[i]]))
            return pd.DataFrame(out, columns=["arc_id", "xs", "ys"])

        stitched = (
            multi.join(cur, "arc_id")
            .groupBy("lab")
            .applyInPandas(_stitch, "arc_id long, xs array<double>, ys array<double>")
        )
        cur = single.unionByName(stitched)

    # zero-length vertex removal (exact-coincident consecutive vertices)
    cur = cur.select(
        "arc_id",
        F.expr(
            f"filter(arrays_zip(xs, ys), (v, i) -> i = 0 OR "
            f"abs(v.xs - xs[i-1]) > {prec!r} OR abs(v.ys - ys[i-1]) > {prec!r})"
        ).alias("vz"),
    ).select(
        "arc_id",
        F.expr("transform(vz, v -> v.xs)").alias("xs"),
        F.expr("transform(vz, v -> v.ys)").alias("ys"),
    ).localCheckpoint(eager=True)

    # ---- pass B: dangle snapping
    segs = cur.select(
        F.col("arc_id").alias("sarc"),
        F.posexplode(F.arrays_zip("xs", "ys")).alias("si", "v"),
    ).select(
        "sarc", "si",
        F.col("v.xs").alias("x0"), F.col("v.ys").alias("y0"),
    )
    segs = (
        segs.alias("a")
        .join(
            segs.select(
                F.col("sarc").alias("sarc2"), (F.col("si") - 1).alias("si"),
                F.col("x0").alias("x1"), F.col("y0").alias("y1"),
            ).alias("b"),
            (F.col("a.sarc") == F.col("sarc2")) & (F.col("a.si") == F.col("b.si")),
        )
        .select("sarc", F.col("a.si").alias("si"), "x0", "y0", "x1", "y1")
        .localCheckpoint(eager=True)
    )
    stats = segs.agg(
        F.max(F.greatest(F.abs(F.col("x1") - F.col("x0")), F.abs(F.col("y1") - F.col("y0")))).alias("mx")
    ).collect()[0]
    cell = max(float(stats["mx"] or 1.0), snap_dist) * 1.001

    def _cells(xlo, xhi, ylo, yhi):
        return F.expr(
            f"flatten(transform(sequence(cast(floor(({xlo})/{cell!r}) as bigint), "
            f"cast(floor(({xhi})/{cell!r}) as bigint)), cx -> "
            f"transform(sequence(cast(floor(({ylo})/{cell!r}) as bigint), "
            f"cast(floor(({yhi})/{cell!r}) as bigint)), cy -> struct(cx, cy))))"
        )

    seg_cells = segs.select(
        "sarc", "si", "x0", "y0", "x1", "y1",
        F.explode(
            _cells(
                f"least(x0, x1) - {snap_dist!r}", f"greatest(x0, x1) + {snap_dist!r}",
                f"least(y0, y1) - {snap_dist!r}", f"greatest(y0, y1) + {snap_dist!r}",
            )
        ).alias("c"),
    )
    ends2 = _ends(cur)
    nbr = (
        ends2.alias("p")
        .join(
            ends2.select(F.col("arc_id").alias("o_arc"), F.col("kx").alias("kx"), F.col("ky").alias("ky")).alias("q"),
            ["kx", "ky"],
        )
        .filter(F.col("o_arc") != F.col("p.arc_id"))
        .groupBy("p.arc_id", "e")
        .agg(F.count(F.lit(1)).alias("n_nbr"))
    )
    adj = cur.select(
        "arc_id",
        F.col("xs")[1].alias("a0x"), F.col("ys")[1].alias("a0y"),
        F.element_at("xs", -2).alias("a1x"), F.element_at("ys", -2).alias("a1y"),
    )
    ep = (
        ends2.join(nbr, ["arc_id", "e"], "left")
        .withColumn("n_nbr", F.coalesce("n_nbr", F.lit(0)))
        .join(adj, "arc_id")
        .withColumn("ax", F.when(F.col("e") == 0, F.col("a0x")).otherwise(F.col("a1x")))
        .withColumn("ay", F.when(F.col("e") == 0, F.col("a0y")).otherwise(F.col("a1y")))
        .select("arc_id", "e", "px", "py", "ax", "ay", "n_nbr")
        .withColumn(
            "c",
            F.struct(
                F.floor(F.col("px") / F.lit(cell)).cast("long").alias("cx"),
                F.floor(F.col("py") / F.lit(cell)).cast("long").alias("cy"),
            ),
        )
    )
    # nearest point on candidate segments (pure expressions)
    candv = (
        ep.join(seg_cells, "c")
        .filter(F.col("sarc") != F.col("arc_id"))
        .withColumn("dx", F.col("x1") - F.col("x0"))
        .withColumn("dy", F.col("y1") - F.col("y0"))
        .withColumn("d2", F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .withColumn(
            "t",
            F.when(F.col("d2") == 0.0, F.lit(0.0)).otherwise(
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        F.lit(1.0),
                        ((F.col("px") - F.col("x0")) * F.col("dx") + (F.col("py") - F.col("y0")) * F.col("dy")) / F.col("d2"),
                    ),
                )
            ),
        )
        .withColumn("qx", F.col("x0") + F.col("t") * F.col("dx"))
        .withColumn("qy", F.col("y0") + F.col("t") * F.col("dy"))
        .withColumn("dist", F.sqrt((F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2))
        .filter(F.col("dist") <= F.lit(snap_dist))
    )
    wd = Window.partitionBy("arc_id", "e").orderBy("dist", "sarc", "si")
    best = (
        candv.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") == 1)
        .filter((F.col("dist") > F.lit(prec)) | (F.col("n_nbr") == 0))
    )

    # undershoot test: |dist(adjoining segment, q) - dist| <= prec
    def _pt_seg(px, py, x0, y0, x1, y1):
        dx, dy = x1 - x0, y1 - y0
        d2 = dx * dx + dy * dy
        t = F.when(d2 == F.lit(0.0), F.lit(0.0)).otherwise(
            F.greatest(F.lit(0.0), F.least(F.lit(1.0), ((px - x0) * dx + (py - y0) * dy) / d2))
        )
        return F.sqrt((px - (x0 + t * dx)) ** 2 + (py - (y0 + t * dy)) ** 2)

    best = best.withColumn(
        "adj_d", _pt_seg(F.col("qx"), F.col("qy"), F.col("px"), F.col("py"), F.col("ax"), F.col("ay"))
    ).withColumn("undershoot", F.abs(F.col("adj_d") - F.col("dist")) <= F.lit(prec))
    # overshoot crossing of (adjoining seg) x (target seg)
    den = (F.col("px") - F.col("ax")) * (F.col("y0") - F.col("y1")) - (
        F.col("py") - F.col("ay")
    ) * (F.col("x0") - F.col("x1"))
    tt = (
        (F.col("px") - F.col("x0")) * (F.col("y0") - F.col("y1"))
        - (F.col("py") - F.col("y0")) * (F.col("x0") - F.col("x1"))
    ) / den
    uu = -(
        (F.col("px") - F.col("ax")) * (F.col("py") - F.col("y0"))
        - (F.col("py") - F.col("ay")) * (F.col("px") - F.col("x0"))
    ) / den
    has_int = (den != F.lit(0.0)) & (tt >= 0.0) & (tt <= 1.0) & (uu >= 0.0) & (uu <= 1.0)
    # NOTE: the reference builds the adjoining segment as (endpoint,
    # neighbour vertex) for the first end and (neighbour, endpoint) for
    # the last; the parametric point is the same either way.
    best = (
        best.withColumn(
            "nx",
            F.when(F.col("undershoot"), F.col("qx")).otherwise(
                F.when(has_int, F.col("px") + tt * (F.col("ax") - F.col("px"))).otherwise(F.col("qx"))
            ),
        )
        .withColumn(
            "ny",
            F.when(F.col("undershoot"), F.col("qy")).otherwise(
                F.when(has_int, F.col("py") + tt * (F.col("ay") - F.col("py"))).otherwise(F.col("qy"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    moves = best.select("arc_id", "e", "undershoot", "nx", "ny")
    splits = best.select(
        F.col("sarc").alias("arc_id"), F.col("si").alias("si"),
        F.col("nx").alias("sx"), F.col("ny").alias("sy"),
    )

    mv = moves.groupBy("arc_id").agg(
        F.collect_list(F.struct("e", "undershoot", "nx", "ny")).alias("mv")
    )
    sp = splits.groupBy("arc_id").agg(
        F.collect_list(F.struct("si", "sx", "sy")).alias("sp")
    )
    todo = (
        cur.join(mv, "arc_id", "left").join(sp, "arc_id", "left")
    )

    def _apply(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pl = list(zip(r.xs, r.ys))
                offset = False
                if isinstance(r.mv, (list, np.ndarray)) and len(r.mv):
                    for m in sorted(r.mv, key=lambda m: m["e"]):
                        p = (m["nx"], m["ny"])
                        if m["e"] == 0:
                            if m["undershoot"]:
                                pl.insert(0, p)
                                offset = True
                            elif math.hypot(pl[1][0] - p[0], pl[1][1] - p[1]) > prec:
                                pl[0] = p
                        else:
                            if m["undershoot"]:
                                pl.append(p)
                            else:
                                pl[-1] = p
                sps = []
                if isinstance(r.sp, (list, np.ndarray)) and len(r.sp):
                    sps = [
                        ((s["si"] + 1) if offset else s["si"], (s["sx"], s["sy"]))
                        for s in r.sp
                    ]
                pieces = split_polyline_at(pl, sps)
                for piece_idx, piece in enumerate(pieces):
                    piece = [
                        p for i, p in enumerate(piece)
                        if i == 0 or math.hypot(p[0] - piece[i - 1][0], p[1] - piece[i - 1][1]) > prec
                    ]
                    if len(piece) >= 2:
                        out.append(
                            (r.arc_id, piece_idx, [p[0] for p in piece], [p[1] for p in piece])
                        )
            import pandas as _pd

            yield _pd.DataFrame(out, columns=["arc_id", "piece", "xs", "ys"])

    return todo.mapInPandas(
        _apply, "arc_id long, piece int, xs array<double>, ys array<double>"
    )


def split_polyline_at(pl: list, sps: list) -> list:
    """Split a polyline at (segment_index, point) split points —
    Polyline::split (repair_stream_vector_topology main.rs:1113-1180):
    dedupe, sort by along-line distance, share the split vertex between
    consecutive pieces."""
    sps = [s for k, s in enumerate(sps) if s not in sps[:k]]
    if not sps:
        return [list(pl)]
    cum = [0.0]
    for i in range(1, len(pl)):
        cum.append(cum[-1] + math.hypot(pl[i][0] - pl[i - 1][0], pl[i][1] - pl[i - 1][1]))
    sps = sorted(
        sps,
        key=lambda s: cum[s[0]] + math.hypot(pl[s[0]][0] - s[1][0], pl[s[0]][1] - s[1][1]),
    )
    pieces = []
    k = 0
    line = []
    for node in range(len(pl)):
        if k == len(sps) or node < sps[k][0]:
            line.append(pl[node])
        else:
            line.append(pl[node])
            while k < len(sps) and sps[k][0] == node:
                line.append(sps[k][1])
                pieces.append(line)
                line = [sps[k][1]]
                k += 1
    if len(line) > 1:
        pieces.append(line)
    return pieces


def split_with_lines(
    lines: DataFrame,
    split_lines: DataFrame,
    *,
    precision: float = 1e-9,
) -> DataFrame:
    """SplitWithLines, POLYLINE input case (gis_analysis/
    split_with_lines.rs): split each input polyline at its intersection
    points with the split-layer polylines. Candidate segment pairs come
    from a cell-cover equi-join (sized from a one-row segment-stats
    aggregate — no all-pairs); splits apply per input line in an Arrow
    kernel via the shared split_polyline_at. The POLYGON input case
    (boundary split + face re-closure) is not implemented.
    lines: (line_id, xs, ys); split_lines: (sid, xs, ys).
    -> (line_id, piece, xs, ys)."""
    import numpy as np
    import pandas as pd

    def segs_of(df, idc):
        s = df.select(
            F.col(idc).alias("gid"),
            F.posexplode(F.arrays_zip("xs", "ys")).alias("si", "v"),
        ).select("gid", "si", F.col("v.xs").alias("x0"), F.col("v.ys").alias("y0"))
        return (
            s.alias("a")
            .join(
                s.select(
                    F.col("gid").alias("gid2"), (F.col("si") - 1).alias("si"),
                    F.col("x0").alias("x1"), F.col("y0").alias("y1"),
                ).alias("b"),
                (F.col("a.gid") == F.col("gid2")) & (F.col("a.si") == F.col("b.si")),
            )
            .select("gid", F.col("a.si").alias("si"), "x0", "y0", "x1", "y1")
        )
    a = segs_of(lines, "line_id").localCheckpoint(eager=True)
    b = segs_of(split_lines, "sid").localCheckpoint(eager=True)
    stats = a.unionByName(b.withColumnRenamed("gid", "gid")).agg(
        F.max(F.greatest(F.abs(F.col("x1") - F.col("x0")), F.abs(F.col("y1") - F.col("y0")))).alias("mx")
    ).collect()[0]
    cell = max(float(stats["mx"] or 1.0), 1e-9) * 1.001

    def covered(df):
        return df.select(
            "*",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(cast(floor(least(x0, x1)/{cell!r}) as bigint), "
                    f"cast(floor(greatest(x0, x1)/{cell!r}) as bigint)), cx -> "
                    f"transform(sequence(cast(floor(least(y0, y1)/{cell!r}) as bigint), "
                    f"cast(floor(greatest(y0, y1)/{cell!r}) as bigint)), cy -> struct(cx, cy))))"
                )
            ).alias("c"),
        )
    den = (F.col("x0") - F.col("x1")) * (F.col("by0") - F.col("by1")) - (
        F.col("y0") - F.col("y1")
    ) * (F.col("bx0") - F.col("bx1"))
    tt = (
        (F.col("x0") - F.col("bx0")) * (F.col("by0") - F.col("by1"))
        - (F.col("y0") - F.col("by0")) * (F.col("bx0") - F.col("bx1"))
    ) / den
    uu = -(
        (F.col("x0") - F.col("x1")) * (F.col("y0") - F.col("by0"))
        - (F.col("y0") - F.col("y1")) * (F.col("x0") - F.col("bx0"))
    ) / den
    inter = (
        covered(a)
        .join(
            covered(
                b.select(
                    F.col("gid").alias("sgid"), F.col("si").alias("ssi"),
                    F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
                    F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
                ).withColumnRenamed("bx0", "x0").withColumnRenamed("by0", "y0")
                .withColumnRenamed("bx1", "x1").withColumnRenamed("by1", "y1")
            ).withColumnRenamed("x0", "bx0").withColumnRenamed("y0", "by0")
            .withColumnRenamed("x1", "bx1").withColumnRenamed("y1", "by1"),
            "c",
        )
        .filter(den != 0.0)
        .withColumn("t", tt)
        .withColumn("u", uu)
        .filter((F.col("t") >= 0.0) & (F.col("t") <= 1.0) & (F.col("u") >= 0.0) & (F.col("u") <= 1.0))
        .select(
            "gid", "si",
            (F.col("x0") + F.col("t") * (F.col("x1") - F.col("x0"))).alias("sx"),
            (F.col("y0") + F.col("t") * (F.col("y1") - F.col("y0"))).alias("sy"),
        )
        .distinct()
    )
    sp = inter.groupBy("gid").agg(
        F.collect_list(F.struct("si", "sx", "sy")).alias("sp")
    )
    todo = lines.join(sp, lines["line_id"] == sp["gid"], "left").drop("gid")

    def _apply(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pl = list(zip(r.xs, r.ys))
                sps = []
                if isinstance(r.sp, (list, np.ndarray)) and len(r.sp):
                    sps = sorted(
                        ((s["si"], (s["sx"], s["sy"])) for s in r.sp),
                        key=lambda s: (s[0], s[1]),
                    )
                for piece_idx, piece in enumerate(split_polyline_at(pl, sps)):
                    piece = [
                        p for i, p in enumerate(piece)
                        if i == 0 or math.hypot(p[0] - piece[i - 1][0], p[1] - piece[i - 1][1]) > precision
                    ]
                    if len(piece) >= 2:
                        out.append(
                            (r.line_id, piece_idx, [p[0] for p in piece], [p[1] for p in piece])
                        )
            yield pd.DataFrame(out, columns=["line_id", "piece", "xs", "ys"])

    return todo.mapInPandas(
        _apply, "line_id long, piece int, xs array<double>, ys array<double>"
    )


def polygonize(
    lines: DataFrame,
    *,
    key_decimals: int = 9,
    area_scale: float = 1e6,
    max_rounds: int = 48,
) -> DataFrame:
    """Polygonize (gis_analysis/polygonize.rs): polygons from every space
    enclosed by an intersecting line set.

    Spark-first planar arrangement:
      1. node the lines at mutual intersections (the split_with_lines
         machinery — cell-cover candidate join, shared split kernel);
      2. two half-edges per noded piece; the face successor of an
         incoming half-edge is the outgoing half-edge rotated clockwise
         from the reversed incoming direction (one equi-join + max-angle
         aggregate per vertex — no sequential trace);
      3. faces = cycles of the successor permutation, labeled by
         pointer-doubling min-id (O(log n) rounds — the clump idiom);
      4. face area = sum of per-half-edge directed shoelace partials
         (quantized at area_scale so the aggregate is associative-exact),
         keep area > 0 (the unbounded face and dangling spurs net <= 0).

    The FACE SET of a planar subdivision is implementation-independent,
    so the area multiset is comparable against any correct serial
    polygonizer. -> (face_id, area, n_half_edges)."""
    from ..distributed import with_global_seq

    pieces = split_with_lines(lines, lines.withColumnRenamed("line_id", "sid"))
    pieces = with_global_seq(pieces, ["line_id", "piece"], out_col="eid").localCheckpoint(
        eager=True
    )
    d = key_decimals

    def key(xc, yc):
        return F.struct(F.round(xc, d).alias("kx"), F.round(yc, d).alias("ky"))

    # directed half-edges with origin/destination keys, first-segment
    # departure angle, reversed-last-segment arrival angle, and the
    # directed shoelace partial
    shoelace = F.expr(
        "aggregate(sequence(1, size(xs) - 1), cast(0.0 as double), "
        "(acc, i) -> acc + round((xs[i-1] * ys[i] - xs[i] * ys[i-1]) * "
        f"{area_scale!r}))"
    )
    fwd = pieces.select(
        (F.col("eid") * 2).alias("he"),
        (F.col("eid") * 2 + 1).alias("twin"),
        key(F.col("xs")[0], F.col("ys")[0]).alias("okey"),
        key(F.element_at("xs", -1), F.element_at("ys", -1)).alias("dkey"),
        F.atan2(F.col("ys")[1] - F.col("ys")[0], F.col("xs")[1] - F.col("xs")[0]).alias("dep"),
        F.atan2(
            F.element_at("ys", -2) - F.element_at("ys", -1),
            F.element_at("xs", -2) - F.element_at("xs", -1),
        ).alias("arr"),
        shoelace.alias("shoelace2"),
    )
    rev = pieces.select(
        (F.col("eid") * 2 + 1).alias("he"),
        (F.col("eid") * 2).alias("twin"),
        key(F.element_at("xs", -1), F.element_at("ys", -1)).alias("okey"),
        key(F.col("xs")[0], F.col("ys")[0]).alias("dkey"),
        F.atan2(
            F.element_at("ys", -2) - F.element_at("ys", -1),
            F.element_at("xs", -2) - F.element_at("xs", -1),
        ).alias("dep"),
        F.atan2(F.col("ys")[1] - F.col("ys")[0], F.col("xs")[1] - F.col("xs")[0]).alias("arr"),
        (-shoelace).alias("shoelace2"),
    )
    hes = fwd.unionByName(rev).localCheckpoint(eager=True)

    outgoing = hes.select(F.col("okey").alias("vk"), F.col("dep").alias("oang"), F.col("he").alias("ohe"))
    incoming = hes.select("he", F.col("dkey").alias("vk"), F.col("arr").alias("iang"))
    cand = incoming.join(outgoing, "vk")
    # clockwise rotation from the reversed incoming direction: the
    # outgoing edge with the greatest angle strictly below iang, else the
    # global maximum (wrap)
    below = (
        cand.filter(F.col("oang") < F.col("iang"))
        .groupBy("he")
        .agg(F.max_by("ohe", "oang").alias("nxt_below"))
    )
    allmax = cand.groupBy("he").agg(F.max_by("ohe", "oang").alias("nxt_wrap"))
    nxt = (
        incoming.select("he")
        .join(below, "he", "left")
        .join(allmax, "he")
        .select("he", F.coalesce("nxt_below", "nxt_wrap").alias("nxt"))
        .localCheckpoint(eager=True)
    )
    # cycle labels: pointer doubling over the successor permutation
    cur = nxt.select("he", "nxt", F.col("he").alias("lab"))
    for _ in range(max_rounds):
        b = cur.select(
            F.col("he").alias("b_he"), F.col("nxt").alias("b_nxt"), F.col("lab").alias("b_lab")
        )
        stepped = cur.join(b, cur["nxt"] == b["b_he"]).select(
            "he", F.col("b_nxt").alias("nxt"), F.least("lab", "b_lab").alias("lab")
        )
        done = (
            stepped.join(cur.select("he", F.col("lab").alias("l0")), "he")
            .filter(F.col("lab") != F.col("l0"))
            .limit(1)
            .isEmpty()
        )
        cur = stepped.transform(loop_checkpoint)
        if done:
            break
    faces = (
        cur.join(hes.select("he", "shoelace2"), "he")
        .groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n_half_edges"), F.sum("shoelace2").alias("s2"))
        .withColumn("area", F.col("s2") / F.lit(2.0 * area_scale))
        .filter(F.col("area") > 0.0)
    )
    return with_global_seq(faces, ["lab"], out_col="face_id").select(
        "face_id", "area", "n_half_edges"
    )
