"""Independent serial transcriptions used as literal-VALUES oracles.

Each function here re-implements a reference tool's documented semantics
(whitebox-tools `*.rs` files cited per function) with pure-python dicts,
heaps and loops — no Spark, no numpy blocks, no imports from the engine's
operator modules — so a distribution/tiling/halo bug in the engine cannot
also hide in the oracle.  `__spark_entry__.oracle_sql()` runs these over
the same FIXED deterministic fixtures the queries use and embeds the
result as a literal ``VALUES`` table; the driver then value-checks the
distributed engine against them at any scale factor.

Float policy: where an engine result is float-identical to the serial
sweep (bit-matched pytests) the oracle emits full precision; where the
distributed solver re-associates float adds (rel ~1e-9: the weighted-
semiring stitch, the hierarchical Dijkstra), the query and oracle both
round to a per-query decimal count whose rounding-boundary margin is
pinned far above the observed error by tests/test_serial_oracles.py.
"""

from __future__ import annotations

import heapq
import math
from collections import deque

# D8 neighbor order shared by the reference's tools (dx/dy per index).
DX = [1, 1, 1, 0, -1, -1, -1, 0]
DY = [-1, 0, 1, 1, 1, 0, -1, -1]

# MDInf neighbor order (mdinf_flow_accum.rs:392-401): counterclockwise
# from north — NOT the D8 order.
MDINF_XD = [0, -1, -1, -1, 0, 1, 1, 1]
MDINF_YD = [-1, -1, 0, 1, 1, 1, 0, -1]
MDINF_DD = [1.0, math.sqrt(2.0), 1.0, math.sqrt(2.0),
            1.0, math.sqrt(2.0), 1.0, math.sqrt(2.0)]


def grid_lengths(res_x: float, res_y: float) -> list[float]:
    diag = math.sqrt(res_x * res_x + res_y * res_y)
    return [diag, res_x, diag, res_y, diag, res_x, diag, res_y]


def round_half_away(v: float, k: int) -> float:
    """Spark/DuckDB ROUND: half away from zero (python round() banks)."""
    s = 10.0 ** k
    if v >= 0:
        return math.floor(v * s + 0.5) / s
    return -math.floor(-v * s + 0.5) / s


# ---------------------------------------------------------------------------
# fixed fixtures (mirror the __spark_entry__ range-based builders term for
# term; integer-derived so python and Spark produce bit-identical doubles)
# ---------------------------------------------------------------------------

def cost20_vals() -> dict[tuple[int, int], float]:
    """The 20x20 LCG cost surface of the cost_* queries."""
    return {
        (i // 20, i % 20): ((i * 48271 + 7) % 1000) / 100.0 + 1.0
        for i in range(400)
    }


def dense20_vals(n: int = 2000) -> dict[tuple[int, int], float]:
    """Fixed dense 20 x ~n/20 hash-noise DEM (keys 1..n)."""
    return {
        (k % 20, k // 20): ((k * 48271) % 100000) / 100.0
        for k in range(1, n + 1)
    }


def noise_vals(n: int = 2000) -> dict[tuple[int, int], float]:
    """Fixed 200-row hash-noise DEM (keys 1..n)."""
    return {
        (k % 200, (k // 200) % 200): ((k * 48271) % 100000) / 100.0
        for k in range(1, n + 1)
    }


def valley_vals(n: int = 500) -> dict[tuple[int, int], float]:
    """Fixed fishbone valley DEM (keys 1..n), mirrors _VALLEY_DEM_SQL."""
    out = {}
    for k in range(1, n + 1):
        pk = k - 1
        row, col = pk % 20, pk // 20
        base = abs(row - 10) * 50.0 + (25 - col) * 2.0 + ((k * 31) % 7) * 0.1
        trib = -45.0 if (col % 4 == 1 and row != 10) else 0.0
        out[(row, col)] = base + trib
    return out


# ---------------------------------------------------------------------------
# cost family (gis_analysis/cost_distance.rs, cost_allocation.rs)
# ---------------------------------------------------------------------------

def cost_distance_serial(
    vals: dict[tuple[int, int], float],
    res_x: float,
    res_y: float,
    sources: list[tuple[int, int]],
) -> dict[tuple[int, int], float]:
    """Multi-source Dijkstra, accumulated cost = sum over steps of
    cost_a*(len/2) + cost_b*(len/2) (cost_distance.rs:332-340 metric;
    same half-length association as the engine's edge builder so the two
    agree to the ulp where path shapes coincide)."""
    lens = grid_lengths(res_x, res_y)
    dist = {s: 0.0 for s in sources if s in vals}
    heap = [(0.0, r, c) for (r, c) in dist]
    heapq.heapify(heap)
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist.get((r, c), math.inf):
            continue
        va = vals[(r, c)]
        for i in range(8):
            q = (r + DY[i], c + DX[i])
            vb = vals.get(q)
            if vb is None:
                continue
            hl = lens[i] * 0.5
            nd = d + (va * hl + vb * hl)
            if nd < dist.get(q, math.inf):
                dist[q] = nd
                heapq.heappush(heap, (nd, q[0], q[1]))
    return dist


def cost_allocation_serial(
    vals: dict[tuple[int, int], float],
    res_x: float,
    res_y: float,
    sources: list[tuple[int, int, int]],
) -> dict[tuple[int, int], int]:
    """Multi-source Dijkstra carrying the claiming source id; cost ties
    break to the LOWEST source id ((dist, sid) lexicographic semiring)."""
    lens = grid_lengths(res_x, res_y)
    best: dict[tuple[int, int], tuple[float, int]] = {}
    heap = []
    for r, c, sid in sources:
        if (r, c) in vals and (0.0, sid) < best.get((r, c), (math.inf, 1 << 62)):
            best[(r, c)] = (0.0, sid)
            heap.append((0.0, sid, r, c))
    heapq.heapify(heap)
    while heap:
        d, sid, r, c = heapq.heappop(heap)
        if (d, sid) > best.get((r, c), (math.inf, 1 << 62)):
            continue
        va = vals[(r, c)]
        for i in range(8):
            q = (r + DY[i], c + DX[i])
            vb = vals.get(q)
            if vb is None:
                continue
            hl = lens[i] * 0.5
            nd = d + (va * hl + vb * hl)
            if (nd, sid) < best.get(q, (math.inf, 1 << 62)):
                best[q] = (nd, sid)
                heapq.heappush(heap, (nd, sid, q[0], q[1]))
    return {k: v[1] for k, v in best.items()}


# ---------------------------------------------------------------------------
# priority-flood fill + plateau epsilon ramp (shared by upslope storage)
# ---------------------------------------------------------------------------

def priority_flood_fill(
    vals: dict[tuple[int, int], float]
) -> dict[tuple[int, int], float]:
    """Minimax flat fill: W(c) = min over paths to the border of the max
    elevation along the path (Wang-Liu 2006 without the epsilon). Border =
    any cell with fewer than 8 in-raster neighbors."""
    pq = []
    for (r, c), z in vals.items():
        nbs = [(r + DY[i], c + DX[i]) for i in range(8)]
        if any(p not in vals for p in nbs):
            heapq.heappush(pq, (z, r, c))
    W: dict[tuple[int, int], float] = {}
    while pq:
        w0, r, c = heapq.heappop(pq)
        if (r, c) in W:
            continue
        W[(r, c)] = w0
        for i in range(8):
            p = (r + DY[i], c + DX[i])
            if p in vals and p not in W:
                heapq.heappush(pq, (max(w0, vals[p]), p[0], p[1]))
    return W


def plateau_hops_serial(W: dict[tuple[int, int], float]) -> dict[tuple[int, int], int]:
    """BFS hop count within each flat (equal-W plateau) to the nearest
    pour cell (border cell or cell with a strictly lower-W neighbor)."""
    hops: dict[tuple[int, int], int] = {}
    dq = deque()
    for (r, c), w0 in W.items():
        nbs = [(r + DY[i], c + DX[i]) for i in range(8)]
        if any(p not in W for p in nbs) or any(W.get(p, math.inf) < w0 for p in nbs):
            hops[(r, c)] = 0
            dq.append((r, c))
    while dq:
        r, c = dq.popleft()
        for i in range(8):
            p = (r + DY[i], c + DX[i])
            if p in W and p not in hops and W[p] == W[(r, c)]:
                hops[p] = hops[(r, c)] + 1
                dq.append(p)
    return hops


def upslope_depression_storage_serial(
    vals: dict[tuple[int, int], float],
    res_x: float,
    res_y: float,
    flat_increment: float,
    exponent: float = 1.1,
) -> dict[tuple[int, int], float]:
    """upslope_depression_storage.rs:240-560: FD8-accumulated depression
    depth / FD8-accumulated upslope count over the epsilon-filled surface
    (eps = flat-fill W + flat_increment * plateau hops). FD8 drop weights
    mirror the engine's (drop/len*len)^exp association so the only
    engine-serial float divergence is the stitch's add re-association."""
    W = priority_flood_fill(vals)
    hops = plateau_hops_serial(W)
    s = flat_increment
    eps = {p: W[p] + s * hops[p] for p in W}
    depth = {p: eps[p] - vals[p] for p in W}
    lens = grid_lengths(res_x, res_y)
    acc_d = dict(depth)
    acc_n = {p: 1.0 for p in W}
    for p in sorted(W, key=lambda q: (-eps[q], q)):
        r, c = p
        ws = []
        for i in range(8):
            q = (r + DY[i], c + DX[i])
            if q in eps and eps[q] < eps[p]:
                sl = (eps[p] - eps[q]) / lens[i]
                ws.append((q, (sl * lens[i]) ** exponent))
        tot = 0.0
        for _, w in ws:
            tot += w
        if tot > 0.0:
            for q, w in ws:
                acc_d[q] += acc_d[p] * (w / tot)
                acc_n[q] += acc_n[p] * (w / tot)
    return {p: acc_d[p] / acc_n[p] for p in W}


# ---------------------------------------------------------------------------
# MFD accumulations (mdinf_flow_accum.rs; Quinn 1995 / Qin 2007 plugins)
# ---------------------------------------------------------------------------

def mdinf_serial(
    vals: dict[tuple[int, int], float], res: float, exponent: float = 1.1
) -> dict[tuple[int, int], float]:
    """Seibert & McGlynn 2007 facet split (mdinf_flow_accum.rs:420-590):
    per triangular facet the normal-derived direction/slope (clamped to
    the facet's cardinal edges when outside), valley validity rules,
    slope^exponent weighting, angular split between the bounding
    neighbors; weights to non-downslope neighbors dropped."""
    gr, qpi = res, math.pi / 4.0
    xd, yd, dd = MDINF_XD, MDINF_YD, MDINF_DD

    def weights_of(rc):
        r0, c0 = rc
        z = vals[rc]
        P = [vals.get((r0 + yd[i], c0 + xd[i])) for i in range(8)]
        rr = [0.0] * 8
        ss = [0.0] * 8
        valid = [False] * 8
        down = [P[i] is not None and P[i] < z for i in range(8)]
        for c in range(8):
            i, ii = c, (c + 1) % 8
            p1, p2 = P[i], P[ii]
            if p1 is not None and p2 is not None:
                z1, z2 = p1 - z, p2 - z
                nx = (yd[i] * z2 - yd[ii] * z1) * gr
                ny = (xd[ii] * z1 - xd[i] * z2) * gr
                nzv = float(xd[i] * yd[ii] - xd[ii] * yd[i]) * gr * gr
                if nx == 0.0:
                    hr = 0.0 if ny >= 0.0 else math.pi
                elif nx >= 0.0:
                    hr = math.pi / 2.0 - math.atan(ny / nx)
                else:
                    hr = 3.0 * math.pi / 2.0 - math.atan(ny / nx)
                hs = -math.tan(
                    math.acos(nzv / math.sqrt(nx * nx + ny * ny + nzv * nzv))
                )
                if hr < i * qpi or hr > (i + 1) * qpi:
                    if p1 < p2:
                        hr, hs = i * qpi, (z - p1) / (dd[i] * gr)
                    else:
                        hr, hs = ii * qpi, (z - p2) / (dd[ii] * gr)
                rr[c], ss[c], valid[c] = hr, hs, True
            elif p1 is not None and p1 < z:
                rr[c], ss[c], valid[c] = (
                    (i / 4.0) * math.pi,
                    (z - p1) / (dd[ii] * gr),
                    True,
                )
        valley = [0.0] * 8
        for i in range(8):
            ii, im = (i + 1) % 8, (i + 7) % 8
            if valid[i] and ss[i] > 0.0:
                if (i * qpi < rr[i] < (i + 1) * qpi) or rr[i] == rr[ii] \
                        or (not valid[ii] and rr[i] == (i + 1) * qpi) \
                        or (not valid[im] and rr[i] == i * qpi):
                    valley[i] = ss[i]
        valley = [v ** exponent for v in valley]
        vs = sum(valley)
        w = [0.0] * 8
        if vs > 0.0:
            valley = [v / vs for v in valley]
            if rr[7] == 0.0:
                rr[7] = 2.0 * math.pi
            for i in range(8):
                ii = (i + 1) % 8
                if valley[i] > 0.0:
                    w[i] += valley[i] * (((i + 1) * qpi - rr[i]) / qpi)
                    w[ii] += valley[i] * ((rr[i] - i * qpi) / qpi)
        return [(i, w[i]) for i in range(8) if down[i] and w[i] > 0.0]

    fa = {p: 1.0 for p in vals}
    for p in sorted(vals, key=lambda q: (-vals[q], q)):
        for i, w in weights_of(p):
            q = (p[0] + yd[i], p[1] + xd[i])
            fa[q] += fa[p] * w
    return fa


def quinn_qin_serial(
    vals: dict[tuple[int, int], float],
    res: float,
    which: str,
    *,
    qin_upper: float = 45.0,
    qin_max_exp: float = 10.0,
    exponent: float = 1.1,
) -> dict[tuple[int, int], float]:
    """Quinn 1995 (contour-length x slope MFD) / Qin 2007 (adaptive
    exponent from max downslope slope) fractional accumulations."""
    lens = grid_lengths(res, res)
    cl = [0.354 * res, 0.5 * res] * 4
    us = math.tan(math.radians(qin_upper))
    fa = {p: 1.0 for p in vals}
    for p in sorted(vals, key=lambda q: (-vals[q], q)):
        z = vals[p]
        slopes = []
        for i in range(8):
            q = (p[0] + DY[i], p[1] + DX[i])
            if q in vals and vals[q] < z:
                slopes.append((i, q, (z - vals[q]) / lens[i]))
        if not slopes:
            continue
        if which == "quinn":
            ws = [(q, cl[i] * s) for i, q, s in slopes]
        else:
            smax = max(s for _, _, s in slopes)
            f = min(smax, us) / us * (qin_max_exp - exponent) + exponent
            ws = [(q, cl[i] * s ** f) for i, q, s in slopes]
        tot = 0.0
        for _, w in ws:
            tot += w
        for q, w in ws:
            fa[q] += fa[p] * (w / tot)
    return fa


# ---------------------------------------------------------------------------
# isobasins (hydro_analysis/isobasins.rs:392-470)
# ---------------------------------------------------------------------------

def d8_next_serial(
    vals: dict[tuple[int, int], float], res_x: float, res_y: float
) -> dict[tuple[int, int], tuple[int, int]]:
    """Steepest-descent D8 target per cell (max positive slope, ties to
    the lowest neighbor index)."""
    lens = grid_lengths(res_x, res_y)
    nxt = {}
    for (r, c), z in vals.items():
        best = None
        for i in range(8):
            q = (r + DY[i], c + DX[i])
            if q in vals:
                s = (z - vals[q]) / lens[i]
                if s > 0 and (best is None or s > best[0]):
                    best = (s, q)
        if best:
            nxt[(r, c)] = best[1]
    return nxt


def isobasins_serial(
    vals: dict[tuple[int, int], float],
    res_x: float,
    res_y: float,
    size: int,
) -> dict[tuple[int, int], float]:
    """Topological sweep down the D8 DAG: at a cell with residual
    accumulation fa >= size, cut an outlet at the largest-inflow neighbor
    (ties lowest i; only when 0 < inla <= size — the reference's usize
    wrap guard — and (size - inla) < (fa - size)), else at the cell
    itself; terminals always become outlets. Ids = raster-scan order of
    outlet cells (the engine's documented deviation from the reference's
    stack-order numbering); every cell labeled by the FIRST outlet on its
    flow path. Accumulations are sums of 1.0s minus cut residuals —
    integer-valued floats, so the result is exact."""
    nxt = d8_next_serial(vals, res_x, res_y)
    indeg = {p: 0 for p in vals}
    for p, t in nxt.items():
        indeg[t] += 1
    order = [p for p in vals if indeg[p] == 0]
    accum = {p: 1.0 for p in vals}
    # inflow value per (target, direction index of SOURCE around target)
    inflows: dict[tuple[int, int], list[tuple[float, int]]] = {}
    outlets = set()
    deg = dict(indeg)
    qi = 0
    while qi < len(order):
        p = order[qi]
        qi += 1
        fa = accum[p]
        if fa >= size:
            # largest inflow, ties to lowest direction index i
            inla, inla_q = 0.0, None
            best = None
            for (w, i, q) in inflows.get(p, []):
                if best is None or (w, -i) > (best[0], -best[1]):
                    best = (w, i, q)
            if best is not None:
                inla, inla_q = best[0], best[2]
            if (
                inla_q is not None
                and 0.0 < inla <= size
                and (size - inla) < (fa - size)
            ):
                fa -= inla
                outlets.add(inla_q)
            else:
                fa = 1.0
                outlets.add(p)
        t = nxt.get(p)
        if t is None:
            outlets.add(p)
        else:
            # direction index of p around its target t
            i = next(
                j for j in range(8)
                if (p[0] - t[0], p[1] - t[1]) == (DY[j], DX[j])
            )
            inflows.setdefault(t, []).append((fa, i, p))
            accum[t] += fa
            deg[t] -= 1
            if deg[t] == 0:
                order.append(t)
    ids = {p: k + 1 for k, p in enumerate(sorted(outlets))}

    label: dict[tuple[int, int], float] = {}

    def first_outlet(p):
        path = []
        while p not in label:
            if p in ids:
                label[p] = float(ids[p])
                break
            path.append(p)
            p = nxt[p]
        v = label[p]
        for q in path:
            label[q] = v
        return v

    for p in vals:
        first_outlet(p)
    return label


# ---------------------------------------------------------------------------
# breach least cost (hydro_analysis/breach_depressions_least_cost.rs)
# ---------------------------------------------------------------------------

def breach_least_cost_serial(
    vals: dict[tuple[int, int], float],
    res_x: float,
    res_y: float,
    *,
    dist: int,
    max_cost: float,
    min_dist: bool,
    s: float,
) -> dict[tuple[int, int], float]:
    """Raise pits to min(neighbors) - s, per-pit bounded least-cost search
    (deterministic (cost, row, col) heap order), carve the cheapest
    channel, min-combine carves (Lindsay & Dhun 2015). Matches the engine
    bit-for-bit (tests/test_breach_least_cost.py pins abs 1e-12)."""
    raised = dict(vals)
    pits = []
    for (r, c), z in vals.items():
        nbs = [vals.get((r + DY[n], c + DX[n])) for n in range(8)]
        if all(v is not None for v in nbs) and min(nbs) >= z:
            raised[(r, c)] = min(nbs) - s
            pits.append((r, c))
    lens = grid_lengths(res_x, res_y)
    carve: dict[tuple[int, int], float] = {}
    for pr, pc in sorted(pits):
        z = raised[(pr, pc)]
        heap = [(0.0, pr, pc)]
        enc = {(pr, pc)}
        plen = {(pr, pc): 0}
        back: dict[tuple[int, int], tuple[int, int]] = {}
        solved = False
        while heap and not solved:
            accum, r, c = heapq.heappop(heap)
            if accum > max_cost:
                break
            L = plen[(r, c)]
            cost1 = raised[(r, c)] - z + L * s
            for n in range(8):
                rn, cn = r + DY[n], c + DX[n]
                if (rn, cn) in enc:
                    continue
                Ln = L + 1
                plen[(rn, cn)] = Ln
                back[(rn, cn)] = (r, c)
                zn = raised.get((rn, cn))
                zout = z - Ln * s
                if zn is not None and zn > zout:
                    enc.add((rn, cn))
                    if Ln <= dist:
                        w = (cost1 + (zn - zout)) / 2.0 * lens[n] if min_dist \
                            else zn - zout
                        heapq.heappush(heap, (accum + w, rn, cn))
                else:
                    br, bc = rn, cn
                    while (br, bc) in back:
                        br, bc = back[(br, bc)]
                        zb = z - plen[(br, bc)] * s
                        if raised[(br, bc)] > zb:
                            carve[(br, bc)] = min(carve.get((br, bc), zb), zb)
                    solved = True
                    break
    return {k: min(v, carve.get(k, v)) for k, v in raised.items()}


# ---------------------------------------------------------------------------
# D-infinity pointer / accumulation / mass flux (hydro_analysis/
# dinf_pointer.rs:225-320, dinf_flow_accum.rs:532-646, dinf_mass_flux.rs)
# ---------------------------------------------------------------------------

# Tarboton facet table: (angle_count ac, angle_factor af, neighbor1,
# neighbor2) with neighbors as (dx, dy) — dinf_pointer.rs:236-250.
DINF_FACETS = [
    (0, 1, (1, 0), (1, -1)),
    (1, -1, (0, -1), (1, -1)),
    (1, 1, (0, -1), (-1, -1)),
    (2, -1, (-1, 0), (-1, -1)),
    (2, 1, (-1, 0), (-1, 1)),
    (3, -1, (0, 1), (-1, 1)),
    (3, 1, (0, 1), (1, 1)),
    (4, -1, (1, 0), (1, 1)),
]

# 45-degree sector index -> bracketing neighbor (dx, dy), sector 0 = north
# (dinf_flow_accum.rs:560-575).
DINF_SECTOR = [
    (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1)
]


def dinf_pointer_serial(
    vals: dict[tuple[int, int], float], res_x: float, res_y: float
) -> dict[tuple[int, int], float]:
    """Tarboton (1997) D-inf direction in degrees clockwise from north,
    -1.0 for pits/flats. Transcribed from dinf_pointer.rs:225-320 with the
    exact tie rule the engine SQL applies (equal-slope facets: the
    highest-index facet wins) and the reference's skip of candidates whose
    slope is exactly 0.00001."""
    G = (res_x + res_y) / 2.0
    D = math.sqrt(res_x * res_x + res_y * res_y)
    qpi = math.atan(1.0)
    out = {}
    for (r0, c0), e0 in vals.items():
        ss = []
        dd = []
        for ac, af, (dx1, dy1), (dx2, dy2) in DINF_FACETS:
            e1 = vals.get((r0 + dy1, c0 + dx1))
            e2 = vals.get((r0 + dy2, c0 + dx2))
            if e1 is None or e2 is None:
                ss.append(None)
                dd.append(None)
                continue
            s1 = (e0 - e1) / G
            s2 = (e1 - e2) / G
            r0a = math.atan(s2 / s1) if s1 != 0.0 else math.pi / 2.0
            rc = min(max(r0a, 0.0), qpi)
            if e0 > e1 and e0 > e2:
                if r0a < 0.0:
                    s = s1
                elif r0a > qpi:
                    s = (e0 - e2) / D
                else:
                    s = math.sqrt(s1 * s1 + s2 * s2)
                rr = rc
            elif e0 > e1:
                s, rr = s1, 0.0
            elif e0 > e2:
                s, rr = (e0 - e2) / D, qpi
            else:
                ss.append(None)
                dd.append(None)
                continue
            if s == 0.00001:
                ss.append(None)
                dd.append(None)
                continue
            ss.append(s)
            dd.append(af * rr + ac * math.pi / 2.0)
        best = max((-1e308 if s is None else s) for s in ss)
        if best > 0.0:
            for i in range(7, -1, -1):
                if (-1e308 if ss[i] is None else ss[i]) == best:
                    ang = 360.0 - math.degrees(dd[i]) + 90.0
                    out[(r0, c0)] = ang - 360.0 if ang > 360.0 else ang
                    break
        else:
            out[(r0, c0)] = -1.0
    return out


def dinf_edges_serial(
    vals: dict[tuple[int, int], float], res_x: float, res_y: float
) -> dict[tuple[int, int], list[tuple[tuple[int, int], float]]]:
    """Fractional D-inf edges: each cell's flow splits between the two
    neighbors bracketing its angle, proportions linear in the 45-degree
    offset (dinf_flow_accum.rs:545-603); edges to missing cells vanish."""
    dirs = dinf_pointer_serial(vals, res_x, res_y)
    edges = {}
    for p, d in dirs.items():
        if d < 0.0:
            continue
        k = min(int(d // 45.0), 7)
        p2 = (d - k * 45.0) / 45.0
        p1 = 1.0 - p2
        outs = []
        for kk, frac in ((k, p1), ((k + 1) % 8, p2)):
            if frac <= 0.0:
                continue
            dx, dy = DINF_SECTOR[kk]
            q = (p[0] + dy, p[1] + dx)
            if q in vals:
                outs.append((q, frac))
        if outs:
            edges[p] = outs
    return edges


def dinf_serial(
    vals: dict[tuple[int, int], float], res: float
) -> dict[tuple[int, int], float]:
    """DInfFlowAccumulation in cell-count units: unit load accumulated over
    the fractional edges in descending-elevation order (every edge with a
    bracketing proportion > 0 requires both facet neighbors strictly lower,
    so elevation-descending is a topological order of the flow DAG)."""
    edges = dinf_edges_serial(vals, res, res)
    fa = {p: 1.0 for p in vals}
    for p in sorted(vals, key=lambda q: (-vals[q], q)):
        for q, frac in edges.get(p, ()):
            fa[q] += fa[p] * frac
    return fa


def fd8_serial(
    vals: dict[tuple[int, int], float], res: float, exponent: float = 1.1
) -> dict[tuple[int, int], float]:
    """FD8FlowAccumulation (Freeman 1991; fd8_flow_accum.rs:424-470):
    slope^exponent proportioning over the strictly-lower valid neighbors,
    accumulated in descending-elevation order."""
    lens = grid_lengths(res, res)
    fa = {p: 1.0 for p in vals}
    for p in sorted(vals, key=lambda q: (-vals[q], q)):
        z = vals[p]
        ws = []
        for i in range(8):
            q = (p[0] + DY[i], p[1] + DX[i])
            if q in vals and vals[q] < z:
                ws.append((q, ((z - vals[q]) / lens[i]) ** exponent))
        tot = 0.0
        for _, w in ws:
            tot += w
        if tot > 0.0:
            for q, w in ws:
                fa[q] += fa[p] * (w / tot)
    return fa


def dinf_mass_flux_serial(
    vals: dict[tuple[int, int], float], res: float, *,
    loading, efficiency, absorption,
) -> dict[tuple[int, int], float]:
    """DInfMassFlux (dinf_mass_flux.rs): out(c) = load(c) + sum over inflow
    edges of (out(i) - absorption(i)) * efficiency(i) * frac(i), over the
    same fractional D-inf edges, in descending-elevation order. loading /
    efficiency / absorption are callables z -> per-cell value (the query
    derives them from the DEM so single-inflow chains never land on a
    6-dp rounding cliff; constants made short terminating decimals that
    Spark's BigDecimal ROUND and DuckDB's float round split)."""
    edges = dinf_edges_serial(vals, res, res)
    m = {p: loading(vals[p]) for p in vals}
    for p in sorted(vals, key=lambda q: (-vals[q], q)):
        for q, frac in edges.get(p, ()):
            m[q] += (m[p] - absorption(vals[p])) * efficiency(vals[p]) * frac
    return m


def cost_pathway_serial(
    vals: dict[tuple[int, int], float],
    res_x: float,
    res_y: float,
    sources: list[tuple[int, int]],
    dests: list[tuple[int, int]],
) -> list[tuple[int, int, int, float]]:
    """CostPathway (gis_analysis/cost_pathway.rs): per destination, walk
    the accumulated-cost surface back to a source, stepping to the
    8-neighbor p with acc(p) + cost(p)*len/2 + cost(head)*len/2 == acc
    (|delta| <= 1e-9, ties to the lowest (row, col) — the engine's
    documented rule). -> [(dest_id, row, col, acc)] with dest_id =
    row * 2^31 + col, one row per path cell including the endpoints."""
    dist = cost_distance_serial(vals, res_x, res_y, sources)
    lens = grid_lengths(res_x, res_y)
    out = []
    for (dr, dc) in dests:
        if (dr, dc) not in dist:
            continue
        dest_id = dr * (1 << 31) + dc
        r, c, acc = dr, dc, dist[(dr, dc)]
        out.append((dest_id, r, c, acc))
        while acc > 0.0:
            best = None
            vh = vals[(r, c)]
            for i in range(8):
                q = (r + DY[i], c + DX[i])
                if q not in dist:
                    continue
                hl = lens[i] * 0.5
                step = vals[q] * hl + vh * hl
                if abs(dist[q] + step - acc) <= 1e-9:
                    if best is None or (q[0], q[1]) < best[:2]:
                        best = (q[0], q[1], dist[q])
            if best is None:
                break
            r, c, acc = best
            out.append((dest_id, r, c, acc))
    return out


# ---------------------------------------------------------------------------
# PCA (math_stat_analysis/principal_component_analysis.rs)
# ---------------------------------------------------------------------------

def pca_vals(n: int = 500, p: int = 8) -> dict[int, list[float]]:
    """Fixed synthetic feature table (ids 1..n): two latent LCG factors
    mixed per feature + a per-feature LCG noise term — gives the
    correlation matrix two dominant, well-separated eigenvalues so the
    eigenvector sensitivity to float noise stays tiny. Mirrors the Spark
    builder in __spark_entry__._pca_fixture term for term."""
    out = {}
    for k in range(1, n + 1):
        b1 = ((k * 48271) % 100000) / 100000.0
        b2 = ((k * 69621 + 12345) % 100000) / 100000.0
        feats = []
        for i in range(p):
            noise = ((k * (179 + 2 * i) + 31 * i) % 1000) / 10000.0
            feats.append(((i + 1) / 8.0) * b1 + ((8 - i) / 8.0) * b2 + noise)
        out[k] = feats
    return out


def jacobi_eigh_serial(A: list[list[float]], sweeps: int = 30):
    """Cyclic Jacobi eigensolver for a small symmetric matrix — pure
    python, independent of numpy's LAPACK path. -> (eigenvalues list,
    eigenvector columns list-of-lists), unordered."""
    p = len(A)
    a = [row[:] for row in A]
    V = [[1.0 if i == j else 0.0 for j in range(p)] for i in range(p)]
    for _ in range(sweeps):
        off = math.sqrt(sum(a[i][j] ** 2 for i in range(p) for j in range(p) if i != j))
        if off < 1e-15:
            break
        for q in range(p - 1):
            for r in range(q + 1, p):
                if a[q][r] == 0.0:
                    continue
                theta = (a[r][r] - a[q][q]) / (2.0 * a[q][r])
                t = (1.0 if theta >= 0 else -1.0) / (
                    abs(theta) + math.sqrt(theta * theta + 1.0)
                )
                c = 1.0 / math.sqrt(t * t + 1.0)
                s = t * c
                for i in range(p):
                    aiq, air = a[i][q], a[i][r]
                    a[i][q] = c * aiq - s * air
                    a[i][r] = s * aiq + c * air
                for i in range(p):
                    aqi, ari = a[q][i], a[r][i]
                    a[q][i] = c * aqi - s * ari
                    a[r][i] = s * aqi + c * ari
                for i in range(p):
                    viq, vir = V[i][q], V[i][r]
                    V[i][q] = c * viq - s * vir
                    V[i][r] = s * viq + c * vir
    evals = [a[i][i] for i in range(p)]
    evecs = [[V[i][j] for i in range(p)] for j in range(p)]  # column j
    return evals, evecs


def pca_scores_serial(
    rows: dict[int, list[float]], k: int
) -> dict[int, list[float]]:
    """Correlation-matrix PCA scores with the engine's deterministic
    contract: components by descending eigenvalue, sign canonicalized so
    the largest-magnitude loading (smallest index on ties) is positive.
    -> {id: [pc1..pck]}."""
    ids = sorted(rows)
    p = len(rows[ids[0]])
    n = len(ids)
    mu = [sum(rows[i][c] for i in ids) / n for c in range(p)]
    sd = [
        math.sqrt(sum((rows[i][c] - mu[c]) ** 2 for i in ids) / (n - 1))
        for c in range(p)
    ]
    z = {i: [(rows[i][c] - mu[c]) / sd[c] for c in range(p)] for i in ids}
    R = [
        [
            sum(z[i][a] * z[i][b] for i in ids) / (n - 1)
            for b in range(p)
        ]
        for a in range(p)
    ]
    evals, evecs = jacobi_eigh_serial(R)
    order = sorted(range(p), key=lambda j: -evals[j])[:k]
    comps = []
    for j in order:
        v = evecs[j][:]
        pivot = max(range(p), key=lambda i: (abs(v[i]), -i))
        if v[pivot] < 0:
            v = [-x for x in v]
        comps.append(v)
    return {
        i: [sum(z[i][c] * v[c] for c in range(p)) for v in comps] for i in ids
    }


# ---------------------------------------------------------------------------
# RasterToVectorLines (data_tools/raster_to_vector_lines.rs:229-420)
# ---------------------------------------------------------------------------

def line20_vals() -> dict[tuple[int, int], float]:
    """Fixed analytic line raster on the 20x25 STREAM_GRID: a main stem
    along row 10, six tributaries joining from above (confluences), and a
    hollow square loop below (closed-loop trace path). Mirrors
    __spark_entry__._line_raster term for term."""
    cells = {(10, c): 1.0 for c in range(25)}
    for c in (1, 5, 9, 13, 17, 21):
        for r in range(10):
            cells[(r, c)] = float(c)
    for c in range(15, 20):
        cells[(13, c)] = 9.0
        cells[(17, c)] = 9.0
    for r in range(14, 17):
        cells[(r, 15)] = 9.0
        cells[(r, 19)] = 9.0
    return cells


def raster_lines_serial(
    cellv: dict[tuple[int, int], float],
    west: float, north: float, res_x: float, res_y: float,
) -> list[tuple[float, int, float, float, float, float, float]]:
    """Global-FIFO transcription of the reference's trace (the engine runs
    the per-component equivalent; geometry multisets match — pinned by
    tests/test_raster_lines.py). -> [(value, n_vertices, length, x1, y1,
    x2, y2)] with length/coords rounded 6 dp."""
    cnt = {p: sum((p[0] + DY[i], p[1] + DX[i]) in cellv for i in range(8))
           for p in cellv}
    visited = set()
    queue = deque(sorted(p for p, n in cnt.items() if n == 1))
    lines = []

    def trace(r, c):
        pts = [(r, c)]
        visited.add((r, c))
        while True:
            highest, best, others = 0, None, []
            for i in range(8):
                p = (r + DY[i], c + DX[i])
                if p in cellv and p not in visited:
                    if cnt[p] > highest:
                        if highest > 0:
                            others.append(best)
                        highest, best = cnt[p], p
                    else:
                        others.append(p)
            if best is None:
                return pts
            queue.extend(others)
            r, c = best
            pts.append((r, c))
            visited.add((r, c))

    def emit(pts, val):
        if len(pts) < 2:
            return
        xs = [west + res_x / 2.0 + c * res_x for _, c in pts]
        ys = [north - res_y / 2.0 - r * res_y for r, _ in pts]
        length = sum(
            ((xs[i + 1] - xs[i]) ** 2 + (ys[i + 1] - ys[i]) ** 2) ** 0.5
            for i in range(len(pts) - 1)
        )
        lines.append((
            val, len(pts), round_half_away(length, 6),
            round_half_away(xs[0], 6), round_half_away(ys[0], 6),
            round_half_away(xs[-1], 6), round_half_away(ys[-1], 6),
        ))

    while queue:
        p = queue.popleft()
        if p not in visited:
            emit(trace(*p), cellv[p])
    for p in sorted(cellv):
        if p not in visited:
            emit(trace(*p), cellv[p])
    return lines
