"""TIN construction / gridding tests (Delaunay kernel + Spark operators)."""

import numpy as np
import pytest

from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.operators.tin import construct_tin, delaunay, tin_gridding


def test_delaunay_invariants():
    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 100, 60)
    ys = rng.uniform(0, 100, 60)
    tris = delaunay(xs, ys)
    # Euler: triangles = 2n - h - 2 (h = hull vertex count)
    from whitebox_tools_spark import geometry as G

    hx, hy = G.convex_hull(xs, ys)
    h = len(hx)
    # near-collinear hull triples can cost a boundary sliver to fp rounding;
    # allow a deficit of at most 1 vs the exact Euler count 2n - h - 2
    assert 2 * 60 - h - 3 <= len(tris) <= 2 * 60 - h - 2
    # every point participates in the triangulation
    assert {v for t in tris for v in t} == set(range(60))
    # empty-circumcircle property (strict interior)
    for a, b, c in tris:
        ax, ay, bx, by, cx, cy = xs[a], ys[a], xs[b], ys[b], xs[c], ys[c]
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
              + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
              + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        dist2 = (xs - ux) ** 2 + (ys - uy) ** 2
        assert (dist2 >= r2 * (1 - 1e-9)).all(), "circumcircle contains a point"


def test_delaunay_duplicates_and_degenerate():
    xs = np.array([0.0, 10.0, 0.0, 10.0, 0.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0, 0.0])  # last = duplicate of first
    tris = delaunay(xs, ys)
    assert len(tris) == 2
    assert delaunay(np.array([0.0, 1.0]), np.array([0.0, 1.0])) == []


def test_construct_tin(spark):
    pts = spark.createDataFrame(
        [(0.0, 0.0, 1.0), (10.0, 0.0, 2.0), (0.0, 10.0, 3.0), (10.0, 10.0, 4.0)],
        "x double, y double, z double",
    )
    tris = construct_tin(pts).collect()
    assert len(tris) == 2
    for t in tris:
        # CCW orientation
        assert (t.bx - t.ax) * (t.cy - t.ay) - (t.cx - t.ax) * (t.by - t.ay) > 0


def test_tin_gridding_recovers_plane(spark):
    g = GridSpec(west=0.0, north=100.0, res_x=10.0, res_y=10.0, rows=10, cols=10)
    rng = np.random.default_rng(5)
    pts = [(float(x), float(y), float(2.0 + 0.5 * x - 0.25 * y))
           for x, y in rng.uniform(0, 100, (80, 2))]
    # corner anchors so the hull covers every cell center
    for x, y in [(-5, -5), (105, -5), (-5, 105), (105, 105)]:
        pts.append((float(x), float(y), 2.0 + 0.5 * x - 0.25 * y))
    df = spark.createDataFrame(pts, "x double, y double, z double")
    out = {(r.row, r.col): r.value for r in tin_gridding(df, g).collect()}
    assert len(out) == 100  # hull covers the whole grid
    for (r, c), v in out.items():
        x = g.x_center(c)
        y = g.y_center(r)
        assert v == pytest.approx(2.0 + 0.5 * x - 0.25 * y, abs=1e-9)


def test_tin_gridding_tiled_matches_global_interior(spark):
    g = GridSpec(west=0.0, north=100.0, res_x=5.0, res_y=5.0, rows=20, cols=20)
    rng = np.random.default_rng(9)
    pts = [(float(x), float(y), float(np.sin(x / 20) + np.cos(y / 30)))
           for x, y in rng.uniform(-10, 110, (300, 2))]
    df = spark.createDataFrame(pts, "x double, y double, z double")
    glob = {(r.row, r.col): r.value for r in tin_gridding(df, g).collect()}
    tiled = {(r.row, r.col): r.value for r in
             tin_gridding(df, g, tile=2, halo=40.0).collect()}
    # with a generous halo the tiled result matches the global TIN
    assert set(tiled) == set(glob)
    diff = [abs(tiled[k] - glob[k]) for k in glob]
    assert float(np.median(diff)) < 1e-12
    assert sum(1 for d in diff if d > 1e-9) < len(glob) * 0.02


def test_sibson_weights_match_pixel_voronoi():
    """Sibson area-stealing weights vs an independent brute-force pixel
    Voronoi before/after estimate (resolution-limited to ~1e-3)."""
    import numpy as np

    from whitebox_tools_spark.operators.tin import delaunay, sibson_weights

    rng = np.random.RandomState(7)
    xs = rng.rand(40) * 100
    ys = rng.rand(40) * 100
    tris = delaunay(xs, ys)

    def brute(qx, qy, res=700):
        gx, gy = np.meshgrid(np.linspace(0, 100, res), np.linspace(0, 100, res))
        gx, gy = gx.ravel(), gy.ravel()
        d = (gx[:, None] - xs[None, :]) ** 2 + (gy[:, None] - ys[None, :]) ** 2
        before = np.argmin(d, axis=1)
        dq = (gx - qx) ** 2 + (gy - qy) ** 2
        taken = dq < d.min(axis=1)
        stolen = np.bincount(before[taken], minlength=len(xs)).astype(float)
        return stolen / stolen.sum()

    for qx, qy in [(50, 50), (30, 70), (62, 41), (20, 20), (80, 55)]:
        w = sibson_weights(xs, ys, tris, qx, qy)
        assert w is not None
        assert abs(sum(w.values()) - 1.0) < 1e-12
        bw = brute(qx, qy)
        for p, wt in w.items():
            assert abs(wt - bw[p]) < 0.02, (qx, qy, p)
        for i in range(len(xs)):
            if i not in w:
                assert bw[i] < 0.02


def test_voronoi_cells_partition_extent(spark):
    import numpy as np

    from whitebox_tools_spark.operators.tin import voronoi_cell_areas

    rng = np.random.default_rng(12)
    pts = [(i, float(x), float(y)) for i, (x, y) in
           enumerate(rng.uniform(5, 95, (40, 2)))]
    df = spark.createDataFrame(pts, "point_id long, x double, y double")
    out = voronoi_cell_areas(df, extent=(0.0, 0.0, 100.0, 100.0)).collect()
    assert len(out) == 40
    assert sum(r.area for r in out) == pytest.approx(100.0 * 100.0, rel=1e-9)
    assert all(r.area > 0 and r.n_vertices >= 3 for r in out)
