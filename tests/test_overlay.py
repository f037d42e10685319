"""OVL overlay tests: line clip/erase splitting and polygon overlay areas."""

import numpy as np
import pytest

from whitebox_tools_spark import geometry as G
from whitebox_tools_spark import synth
from whitebox_tools_spark.grid import CellIndex
from whitebox_tools_spark.operators.overlay import (
    clip_lines,
    erase_lines,
    intersection_area,
    polygon_overlay_areas,
)

IDX = CellIndex(0.0, 0.0, 1000.0, 4)


def _sq(x0, y0, x1, y1, hole=False):
    """Axis-aligned ring in shapefile winding (CW shell / CCW hole)."""
    xs = np.array([x0, x0, x1, x1, x0], dtype=float)
    ys = np.array([y0, y1, y1, y0, y0], dtype=float)
    if hole:  # reverse to CCW
        xs, ys = xs[::-1], ys[::-1]
    return xs, ys, hole


def test_intersection_area_squares():
    a = [_sq(0, 0, 10, 10)]
    b = [_sq(5, 5, 15, 15)]
    assert intersection_area(a, b) == pytest.approx(25.0)
    assert intersection_area(b, a) == pytest.approx(25.0)


def test_intersection_area_contained_and_disjoint():
    big = [_sq(0, 0, 20, 20)]
    small = [_sq(5, 5, 8, 9)]
    far = [_sq(100, 100, 110, 110)]
    assert intersection_area(big, small) == pytest.approx(12.0)
    assert intersection_area(small, big) == pytest.approx(12.0)
    assert intersection_area(big, far) == pytest.approx(0.0)


def test_intersection_area_with_hole():
    # A = 20x20 square with a 4x4 hole fully inside B's overlap region
    a = [_sq(0, 0, 20, 20), _sq(2, 2, 6, 6, hole=True)]
    b = [_sq(0, 0, 10, 10)]
    assert intersection_area(a, b) == pytest.approx(100.0 - 16.0)


def test_intersection_area_concave_vs_grid_sampling():
    """Concave star polygons: validate the boundary-sum area against dense
    grid sampling (both kernels share only the PIP primitive)."""
    polys = synth.polygons_as_parts(synth.make_polygons(8, seed=21))
    a, b = polys[1][1], polys[2][1]
    # force overlap: translate b's rings onto a's centroid
    ax = np.concatenate([p[0] for p in a]); ay = np.concatenate([p[1] for p in a])
    bx = np.concatenate([p[0] for p in b]); by = np.concatenate([p[1] for p in b])
    dxy = (ax.mean() - bx.mean(), ay.mean() - by.mean())
    b = [(xs + dxy[0], ys + dxy[1], h) for xs, ys, h in b]
    area = intersection_area(a, b)
    # grid-sample reference
    xmin, xmax = ax.min() - 1, ax.max() + 1
    ymin, ymax = ay.min() - 1, ay.max() + 1
    n = 400
    gx, gy = np.meshgrid(np.linspace(xmin, xmax, n), np.linspace(ymin, ymax, n))
    gx, gy = gx.ravel(), gy.ravel()
    both = G.point_in_parts(gx, gy, a) & G.point_in_parts(gx, gy, b)
    cell = ((xmax - xmin) / (n - 1)) * ((ymax - ymin) / (n - 1))
    approx = both.sum() * cell
    assert area > 0
    assert area == pytest.approx(approx, rel=0.05)


def _lines_df(spark, rows):
    return spark.createDataFrame(rows, "line_id long, xs array<double>, ys array<double>")


def test_clip_lines_splits_at_boundary(spark):
    # one horizontal line crossing a 10x10 square at y=5
    lines = _lines_df(spark, [(0, [-5.0, 15.0], [5.0, 5.0])])
    polys = [(0, [_sq(0, 0, 10, 10)])]
    out = clip_lines(lines, polys, IDX).collect()
    assert len(out) == 1
    r = out[0]
    assert r.xs == [0.0, 10.0] and r.ys == [5.0, 5.0]
    # erase keeps the two outside stubs
    er = sorted(erase_lines(lines, polys, IDX).collect(), key=lambda r: r.part_idx)
    assert [tuple(r.xs) for r in er] == [(-5.0, 0.0), (15.0, 10.0)] or \
        [tuple(r.xs) for r in er] == [(-5.0, 0.0), (10.0, 15.0)]


def test_clip_lines_hole_and_multisegment(spark):
    # square with central hole; line passes through both
    polys = [(0, [_sq(0, 0, 12, 12), _sq(4, 4, 8, 8, hole=True)])]
    lines = _lines_df(spark, [(7, [-2.0, 14.0], [6.0, 6.0])])
    out = sorted(clip_lines(lines, polys, IDX).collect(), key=lambda r: r.part_idx)
    assert [(tuple(r.xs), tuple(r.ys)) for r in out] == [
        ((0.0, 4.0), (6.0, 6.0)),
        ((8.0, 12.0), (6.0, 6.0)),
    ]


def test_clip_lines_no_candidates(spark):
    polys = [(0, [_sq(0, 0, 10, 10)])]
    lines = _lines_df(spark, [(1, [500.0, 600.0], [500.0, 500.0])])
    assert clip_lines(lines, polys, IDX).count() == 0
    kept = erase_lines(lines, polys, IDX).collect()
    assert len(kept) == 1 and kept[0].xs == [500.0, 600.0]


def test_clip_lines_fully_inside(spark):
    polys = [(0, [_sq(0, 0, 10, 10)])]
    lines = _lines_df(spark, [(2, [2.0, 3.0, 4.0], [2.0, 5.0, 2.0])])
    out = clip_lines(lines, polys, IDX).collect()
    assert len(out) == 1 and out[0].xs == [2.0, 3.0, 4.0]
    assert erase_lines(lines, polys, IDX).count() == 0


def test_polygon_overlay_areas_dataframe(spark):
    # A-side parts table: two squares; B-side: one offset square
    rows = [
        (0, 0, False, [0.0, 0.0, 10.0, 10.0, 0.0], [0.0, 10.0, 10.0, 0.0, 0.0]),
        (1, 0, False, [100.0, 100.0, 104.0, 104.0, 100.0], [100.0, 104.0, 104.0, 100.0, 100.0]),
    ]
    a = spark.createDataFrame(
        rows, "poly_id long, part_idx int, is_hole boolean, xs array<double>, ys array<double>"
    )
    b = [(7, [_sq(5, 5, 15, 15)]), (8, [_sq(102, 102, 120, 120)])]
    out = {(r.a_id, r.b_id): r for r in polygon_overlay_areas(a, b, IDX).collect()}
    assert set(out) == {(0, 7), (1, 8)}
    assert out[(0, 7)].inter_area == pytest.approx(25.0)
    assert out[(0, 7)].a_area == pytest.approx(100.0)
    assert out[(0, 7)].b_area == pytest.approx(100.0)
    assert out[(1, 8)].inter_area == pytest.approx(4.0)


def test_overlay_synth_polygons_pairwise_symmetry():
    """intersection_area(A,B) == intersection_area(B,A) on the synth set."""
    polys = synth.polygons_as_parts(synth.make_polygons(12, seed=7))
    hits = 0
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            a, b = polys[i][1], polys[j][1]
            ab = intersection_area(a, b)
            ba = intersection_area(b, a)
            assert ab == pytest.approx(ba, abs=1e-6)
            if ab > 1.0:
                hits += 1
    assert hits >= 1  # the 1000x1000 world with ~60-180 unit shapes overlaps


def test_intersect_rings_squares(spark):
    from whitebox_tools_spark.operators.overlay import intersect_polygons_rings

    rows = [(0, 0, False, [0.0, 0.0, 10.0, 10.0, 0.0], [0.0, 10.0, 10.0, 0.0, 0.0])]
    a = spark.createDataFrame(
        rows, "poly_id long, part_idx int, is_hole boolean, xs array<double>, ys array<double>"
    )
    b = [(5, [_sq(5, 5, 15, 15)])]
    out = intersect_polygons_rings(a, b, IDX).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a_id, r.b_id, r.is_hole) == (0, 5, False)
    assert len(r.xs) == 5  # closed square ring
    assert G.signed_area2(np.array(r.xs), np.array(r.ys)) / -2.0 == pytest.approx(25.0)
    assert set(zip(r.xs, r.ys)) == {(5.0, 5.0), (5.0, 10.0), (10.0, 10.0), (10.0, 5.0)}


def test_intersect_rings_hole_case(spark):
    from whitebox_tools_spark.operators.overlay import intersect_polygons_rings

    # A = big square with a hole entirely inside B -> intersection keeps the
    # hole as a CCW ring
    rows = [
        (0, 0, False, [0.0, 0.0, 20.0, 20.0, 0.0], [0.0, 20.0, 20.0, 0.0, 0.0]),
    ]
    hx, hy, _ = _sq(4, 4, 8, 8, hole=True)
    rows.append((0, 1, True, [float(v) for v in hx], [float(v) for v in hy]))
    a = spark.createDataFrame(
        rows, "poly_id long, part_idx int, is_hole boolean, xs array<double>, ys array<double>"
    )
    b = [(3, [_sq(2, 2, 12, 12)])]
    out = sorted(intersect_polygons_rings(a, b, IDX).collect(), key=lambda r: r.part_idx)
    assert [r.is_hole for r in out] == [False, True]
    net = sum(-0.5 * G.signed_area2(np.array(r.xs), np.array(r.ys)) for r in out)
    assert net == pytest.approx(100.0 - 16.0)


def test_intersect_rings_area_matches_boundary_sum(spark):
    """Stitched-ring net area must equal the stitch-free boundary-sum area
    for every overlapping synth pair (the two computations share only the
    kept pieces)."""
    from whitebox_tools_spark.operators.overlay import (
        intersect_polygons_rings,
        polygon_overlay_areas,
    )

    polys = synth.polygons_as_parts(synth.make_polygons(16, seed=13))
    rows = []
    for pid, parts in polys[:8]:
        for k, (xs, ys, h) in enumerate(parts):
            rows.append((pid, k, bool(h), [float(v) for v in xs], [float(v) for v in ys]))
    a = spark.createDataFrame(
        rows, "poly_id long, part_idx int, is_hole boolean, xs array<double>, ys array<double>"
    )
    b = synth.polygons_as_parts(synth.make_polygons(16, seed=7))
    areas = {(r.a_id, r.b_id): r.inter_area
             for r in polygon_overlay_areas(a, b, IDX).collect()}
    rings = intersect_polygons_rings(a, b, IDX).collect()
    net = {}
    for r in rings:
        net[(r.a_id, r.b_id)] = net.get((r.a_id, r.b_id), 0.0) + (
            -0.5 * G.signed_area2(np.array(r.xs), np.array(r.ys))
        )
    assert set(net) == set(areas)
    for k in areas:
        # each junction keeps one of its two per-side parametrization
        # variants (round-9 t => <= ~1e-7 apart at world scale), so the two
        # area computations agree to ~n_vertices * 1e-7 * scale
        assert net[k] == pytest.approx(areas[k], abs=1e-3)
