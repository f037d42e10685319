"""Independent serial transcriptions of the lidar RANSAC family, used as
literal VALUES oracles by the correctness gate (the same conversion the
cost/flow-accumulation families got in round 5: the reference algorithm is
re-run serially in pure python/numpy over the fixed fixture, and the result
is embedded in the oracle SQL).

Reference sources transcribed:
  - LidarRansacPlanes   (lidar_analysis/lidar_ransac_planes.rs:480-560,
                         Plane impl :773-920)
  - LidarSegmentation   (lidar_analysis/lidar_segmentation.rs:600-720)
  - LidarSegmentationBasedFilter
                        (lidar_analysis/lidar_segmentation_based_filter.rs:380-530)
  - LidarTophatTransform (lidar_analysis/lidar_tophat_transform.rs:256-360)
  - LidarRooftopAnalysis (lidar_analysis/lidar_rooftop_analysis.rs:800-1000)

Determinism contract: the reference samples RANSAC subsets with an unseeded
thread RNG (non-reproducible). Engine and oracle both implement the repo's
documented deterministic replacement — a minstd stream keyed by
(point_id, seed) drawing a partial Fisher-Yates sample over the nid-sorted
neighbor list — so the sampling protocol here is the same *specification*
the distributed kernels implement (operators/lidar.py), while everything
around it (neighbor search, graph construction, components, reachability)
is an independent brute-force serial path.

Float-exactness: neighbor membership and plane fits are IEEE double
arithmetic on identical inputs in both engines, so threshold comparisons
inside the numpy kernels are bit-identical by construction.  The ONLY
transcendental evaluated on the JVM side is acos() in the similarity-edge
filters (JVM StrictMath vs C libm may differ in the last ulp), so every
acos comparison evaluated here asserts a margin of >= 1e-9 radians from the
threshold — a 1-ulp (~1e-16) discrepancy cannot flip an edge.
"""

from __future__ import annotations

import math

import numpy as np

from whitebox_tools_spark import synth

_TIN_PLANE = (2.0, 0.01, 0.02)  # z = a + b*x + c*y (queries/raster_stats.py)
_TIN_KEYS = 150

_ACOS_MARGIN = 1e-9


# ---------------------------------------------------------------------------
# Fixtures (bit-exact replicas of the queries' Spark expressions)
# ---------------------------------------------------------------------------

def _plane_z(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    a, b, c = _TIN_PLANE
    # same association as F.lit(a) + F.lit(b)*x + F.lit(c)*y
    return (a + b * x) + c * y


def ransac_cloud():
    """q_lidar_ransac_planes fixture: plane keys 1..150 + 30 outliers."""
    keys = np.arange(1, _TIN_KEYS + 1, dtype=np.int64)
    x, y = synth.point_np(keys)
    z = _plane_z(x, y)
    ok = np.arange(1001, 1031, dtype=np.int64)
    ox, oy = synth.point_np(ok)
    oz = (_plane_z(ox, oy) + 50.0) + (ok % 7).astype(np.float64) * 9.0
    return (
        np.concatenate([keys, ok]),
        np.concatenate([x, ox]),
        np.concatenate([y, oy]),
        np.concatenate([z, oz]),
    )


def seg_cloud():
    """q_lidar_segmentation fixture: two offset roof planes + veg blob."""
    keys = np.arange(1, _TIN_KEYS + 1, dtype=np.int64)
    x, y = synth.point_np(keys)
    z = _plane_z(x, y)
    uk = np.arange(2001, 2001 + _TIN_KEYS, dtype=np.int64)
    ux, uy = synth.point_np(uk)
    uz = _plane_z(ux, uy) + 200.0
    vk = np.arange(5001, 5041, dtype=np.int64)
    vx0, vy0 = synth.point_np(vk)
    vx, vy = vx0 / 20.0, vy0 / 20.0
    vz = (vk % 13).astype(np.float64) * 37.0
    return (
        np.concatenate([keys, uk, vk]),
        np.concatenate([x, ux, vx]),
        np.concatenate([y, uy, vy]),
        np.concatenate([z, uz, vz]),
    )


def sbf_cloud():
    """q_lidar_segmentation_based_filter fixture: ground plane + roof."""
    keys = np.arange(1, _TIN_KEYS + 1, dtype=np.int64)
    x, y = synth.point_np(keys)
    z = _plane_z(x, y)
    rk = np.arange(3001, 3041, dtype=np.int64)
    rx0, ry0 = synth.point_np(rk)
    rx, ry = rx0 / 3.0 + 100.0, ry0 / 3.0 + 100.0
    rz = _plane_z(rx, ry) + 60.0
    return (
        np.concatenate([keys, rk]),
        np.concatenate([x, rx]),
        np.concatenate([y, ry]),
        np.concatenate([z, rz]),
    )


def rooftop_cloud():
    """q_lidar_rooftop_analysis fixture: 41x41 grid at two elevations."""
    ids = np.arange(0, 41 * 41, dtype=np.int64)
    x = (ids % 41).astype(np.float64) * 25.0
    y = (ids // 41).astype(np.float64) * 25.0
    z = _plane_z(x, y)
    return (
        np.concatenate([ids + 1, ids + 10001]),
        np.concatenate([x, x]),
        np.concatenate([y, y]),
        np.concatenate([z, z + 200.0]),
    )


# ---------------------------------------------------------------------------
# Serial kernels
# ---------------------------------------------------------------------------

def _neighbors3d(pid, x, y, z, radius):
    """Brute-force 3-D radius search (the independent path vs the engine's
    block-bin equi-join). For each point: indices of neighbors (self
    included), sorted by neighbor point_id — identical membership because
    dist^2 <= r^2 is exact IEEE arithmetic on identical doubles."""
    order = np.argsort(pid, kind="stable")
    r2 = float(radius) * float(radius)
    out = []
    for i in range(len(pid)):
        d2 = (x[i] - x) ** 2 + (y[i] - y) ** 2 + (z[i] - z) ** 2
        hits = d2 <= r2
        out.append(order[hits[order]])
    return out


def _fit_plane(pts):
    """Least-squares plane via the best-conditioned covariance cofactor axis
    (Plane impl, lidar_ransac_planes.rs:773-920) -> (a, b, c, d) unit
    normal, or None. Bit-identical to the engine kernels (same numpy ops
    over the same nid-sorted arrays)."""
    if len(pts) < 3:
        return None
    cen = pts.mean(axis=0)
    q = pts - cen
    xx = (q[:, 0] * q[:, 0]).sum(); xy = (q[:, 0] * q[:, 1]).sum()
    xz = (q[:, 0] * q[:, 2]).sum(); yy = (q[:, 1] * q[:, 1]).sum()
    yz = (q[:, 1] * q[:, 2]).sum(); zz = (q[:, 2] * q[:, 2]).sum()
    dx_, dy_, dz_ = yy * zz - yz * yz, xx * zz - xz * xz, xx * yy - xy * xy
    dm = max(dx_, dy_, dz_)
    if dm <= 0.0:
        return None
    if dm == dx_:
        a, b, c = 1.0, (xz * yz - xy * zz) / dx_, (xy * yz - xz * yy) / dx_
    elif dm == dy_:
        a, b, c = (yz * xz - xy * zz) / dy_, 1.0, (xy * xz - yz * xx) / dy_
    else:
        a, b, c = (yz * xy - xz * yy) / dz_, (xz * xy - yz * xx) / dz_, 1.0
    nrm = (a * a + b * b + c * c) ** 0.5
    a, b, c = a / nrm, b / nrm, c / nrm
    d = -a * cen[0] - b * cen[1] - c * cen[2]
    return a, b, c, d


def _resid(m, pts):
    a, b, c, d = m
    nrm = (a * a + b * b + c * c) ** 0.5
    return np.abs(pts @ np.array([a, b, c]) + d) / nrm


def _ransac_best(pid_val, P, center, *, num_iter, num_samples, threshold,
                 model_size, seed, ms_cos=None):
    """The deterministic minstd RANSAC protocol (shared specification with
    operators/lidar.py kernels; see module docstring). ms_cos gates sampled
    models by |c| >= cos(max_slope) when given (lidar_ransac_planes only).
    -> best refit plane or None."""
    n = len(P)
    thr = float(threshold)
    state = (int(pid_val) * 2654435761 + int(seed) * 97 + 1) % 2147483647 or 1
    best = None
    min_rmse = np.inf
    for _k in range(int(num_iter)):
        idx = np.arange(n)
        for j in range(int(num_samples)):
            state = (state * 48271) % 2147483647
            rdraw = j + state % (n - j)
            idx[j], idx[rdraw] = idx[rdraw], idx[j]
        m = _fit_plane(P[idx[: int(num_samples)]])
        if m is None or (ms_cos is not None and abs(m[2]) < ms_cos):
            continue
        res = _resid(m, P)
        inl = res < thr
        if int(inl.sum()) >= int(model_size):
            better = _fit_plane(P[inl])
            if better is None:
                continue
            res2 = _resid(better, P[inl])
            rmse = float(np.sqrt((res2 * res2).mean()))
            cres = float(_resid(better, center[None, :])[0])
            if rmse < min_rmse and cres < thr:
                min_rmse = rmse
                best = better
                if inl.sum() == n or min_rmse == 0.0:
                    break
    return best


def ransac_planes_serial(cloud, *, radius, num_iter, num_samples, threshold,
                         model_size, max_slope=75.0, seed):
    """LidarRansacPlanes -> {point_id: is_planar}. A point is planar iff it
    is within threshold of ANY accepted neighborhood model (the reference's
    global model_points union)."""
    pid, x, y, z = cloud
    nbs = _neighbors3d(pid, x, y, z, radius)
    larger = max(int(num_samples), int(model_size))
    ms_cos = math.cos(math.radians(float(max_slope)))
    marked: set[int] = set()
    for i in range(len(pid)):
        nb = nbs[i]
        if len(nb) <= larger:
            continue
        P = np.stack([x[nb], y[nb], z[nb]], axis=1)
        center = np.array([x[i], y[i], z[i]])
        best = _ransac_best(
            pid[i], P, center, num_iter=num_iter, num_samples=num_samples,
            threshold=threshold, model_size=model_size, seed=seed,
            ms_cos=ms_cos,
        )
        if best is not None:
            res = _resid(best, P)
            marked.update(int(v) for v in pid[nb][res <= float(threshold)])
    return {int(p): (int(p) in marked) for p in pid}


def _per_point_planes(cloud, nbs, *, num_iter, num_samples, threshold,
                      model_size, seed):
    """_ransac_plane_per_point transcription (no slope gate): best
    neighborhood plane normal per point, or absent."""
    pid, x, y, z = cloud
    larger = max(int(num_samples), int(model_size))
    planes: dict[int, tuple[float, float, float]] = {}
    for i in range(len(pid)):
        nb = nbs[i]
        if len(nb) <= larger:
            continue
        P = np.stack([x[nb], y[nb], z[nb]], axis=1)
        center = np.array([x[i], y[i], z[i]])
        best = _ransac_best(
            pid[i], P, center, num_iter=num_iter, num_samples=num_samples,
            threshold=threshold, model_size=model_size, seed=seed,
        )
        if best is not None:
            planes[int(pid[i])] = (best[0], best[1], best[2])
    return planes


class _UF:
    def __init__(self, items):
        self.p = {i: i for i in items}

    def find(self, a):
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _angle_ok(n1, n2, nd):
    """acos(clamp(dot)) < nd with a margin assertion (see module docstring:
    the engine evaluates acos on the JVM, so near-threshold edges must not
    exist in the fixture)."""
    dot = n1[0] * n2[0] + n1[1] * n2[1] + n1[2] * n2[2]
    ang = math.acos(min(max(dot, -1.0), 1.0))
    assert abs(ang - nd) > _ACOS_MARGIN, (
        f"fixture produces a near-threshold normal angle ({ang} vs {nd}); "
        "JVM/libm acos ulp differences could flip this edge"
    )
    return ang < nd


def segmentation_serial(cloud, *, radius, norm_diff, maxzdiff, num_iter,
                        num_samples, threshold, model_size, seed):
    """LidarSegmentation -> {point_id: (segment_id, is_planar)}: segments =
    connected components of the similarity graph (planar-planar edges by
    |dz| < maxzdiff and normal angle < norm_diff within radius; volume-
    volume edges by proximity), labeled by min member point_id."""
    pid, x, y, z = cloud
    nbs = _neighbors3d(pid, x, y, z, radius)
    planes = _per_point_planes(
        cloud, nbs, num_iter=num_iter, num_samples=num_samples,
        threshold=threshold, model_size=model_size, seed=seed,
    )
    nd = math.radians(min(max(float(norm_diff), 0.0), 90.0))
    uf = _UF([int(p) for p in pid])
    for i in range(len(pid)):
        a = int(pid[i])
        for j in nbs[i]:
            b = int(pid[j])
            if a == b:
                continue
            if a in planes and b in planes:
                if abs(z[j] - z[i]) < float(maxzdiff) and _angle_ok(
                    planes[a], planes[b], nd
                ):
                    uf.union(a, b)
            elif a not in planes and b not in planes:
                uf.union(a, b)
    return {
        int(p): (uf.find(int(p)), int(p) in planes) for p in pid
    }


def tophat_serial(cloud, *, radius):
    """LidarTophatTransform residuals: z - dilation(erosion) over the 2-D
    radius disc, neighborhoods including the point (min/max aggregates are
    order-free, so this is exact vs the engine)."""
    pid, x, y, z = cloud
    r = float(radius)
    n = len(pid)
    nbs = []
    for i in range(n):
        d = np.sqrt((x[i] - x) ** 2 + (y[i] - y) ** 2)
        # the engine's _radius_pairs computes (x-nx)**2 via Spark POWER
        # (java.lang.Math.pow, <=1 ulp), not exact multiplication — assert
        # no pair sits within 1e-9 of the boundary so that ulp cannot flip
        # membership
        assert not np.any(np.abs(d - r) <= 1e-9 * max(r, 1.0)), (
            "fixture has a pair on the tophat radius boundary"
        )
        nbs.append(np.nonzero(d <= r)[0])
    ero = np.array([z[nb].min() for nb in nbs])
    opening = np.array([ero[nb].max() for nb in nbs])
    return pid, x, y, z - opening


def sbf_serial(cloud, *, radius, norm_diff, maxzdiff):
    """LidarSegmentationBasedFilter -> {point_id: is_ground}: tophat
    residuals, least-squares normals over the 3-D (x, y, residual) radius
    neighborhood, ground = reachability from residual==0 seeds through
    edges with |dresidual| < maxzdiff and normal angle < norm_diff."""
    pid, x, y, _z = cloud
    _, _, _, resid = tophat_serial(cloud, radius=radius)
    r2 = float(radius) * float(radius)
    order = np.argsort(pid, kind="stable")
    n = len(pid)
    nbs = []
    for i in range(n):
        d2 = (x[i] - x) ** 2 + (y[i] - y) ** 2 + (resid[i] - resid) ** 2
        hits = d2 <= r2
        nbs.append(order[hits[order]])
    normals = []
    for i in range(n):
        nb = nbs[i]
        if len(nb) < 3:
            normals.append((0.0, 0.0, 0.0))
            continue
        m = _fit_plane(np.stack([x[nb], y[nb], resid[nb]], axis=1))
        normals.append((m[0], m[1], m[2]) if m is not None else (0.0, 0.0, 0.0))
    nd = math.radians(min(max(float(norm_diff), 0.0), 90.0))
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for i in range(n):
        for j in nbs[i]:
            j = int(j)
            if i == j:
                continue
            if abs(resid[j] - resid[i]) < float(maxzdiff) and _angle_ok(
                normals[i], normals[j], nd
            ):
                adj[i].append(j)
    ground = resid == 0.0
    frontier = list(np.nonzero(ground)[0])
    while frontier:
        nxt = []
        for i in frontier:
            for j in adj[i]:
                if not ground[j]:
                    ground[j] = True
                    nxt.append(j)
        frontier = nxt
    return {int(pid[i]): bool(ground[i]) for i in range(n)}
