"""Kernel unit tests pinning reference semantics (SURVEY.md section 2.2)."""

import numpy as np
import pytest

from whitebox_tools_spark import geometry as G


def square(cw=True):
    xs = np.array([0.0, 0.0, 5.0, 5.0, 0.0])
    ys = np.array([0.0, 5.0, 5.0, 0.0, 0.0])
    if not cw:
        xs, ys = xs[::-1], ys[::-1]
    return xs, ys


def test_point_in_ring_basic():
    xs, ys = square()
    assert G.point_in_ring([2.0], [2.0], xs, ys)[0]
    assert not G.point_in_ring([6.0], [2.0], xs, ys)[0]


def test_reference_winding_number_cases():
    # verbatim transcription of poly_ops.rs:198-210 (triangle fixture):
    # boundary point (5, 2) -> wn 0 (OUTSIDE); (4, 2) -> 1; (6, 2) -> 0
    xs = np.array([0.0, 5.0, 5.0, 0.0])
    ys = np.array([0.0, 0.0, 5.0, 0.0])
    assert G.winding_number([5.0], [2.0], xs, ys)[0] == 0
    assert G.winding_number([4.0], [2.0], xs, ys)[0] == 1
    assert G.winding_number([6.0], [2.0], xs, ys)[0] == 0
    # poly_ops.rs:185-196: (2,2) in, (12,12) out
    assert G.point_in_ring([2.0], [2.0], xs, ys)[0]
    assert not G.point_in_ring([12.0], [12.0], xs, ys)[0]


def test_boundary_edge_midpoint_is_outside():
    # the documented boundary-outside rule (poly_ops.rs:26-27) on a square:
    # midpoints of the right and top edges are out
    xs, ys = square()
    assert not G.point_in_ring([5.0], [2.5], xs, ys)[0]
    assert not G.point_in_ring([2.5], [5.0], xs, ys)[0]


def test_winding_requires_closed_ring():
    with pytest.raises(ValueError):
        G.winding_number([1.0], [1.0], np.array([0.0, 1.0, 1.0]), np.array([0.0, 0.0, 1.0]))


def test_part_order_hole_resolution():
    # clip.rs:317-321 — later containing part wins
    shell_xs, shell_ys = square(cw=True)
    hole_xs = np.array([1.0, 3.0, 3.0, 1.0, 1.0])
    hole_ys = np.array([1.0, 1.0, 3.0, 3.0, 1.0])  # CCW (hole winding)
    assert G.is_hole(hole_xs, hole_ys)
    parts = [(shell_xs, shell_ys, False), (hole_xs, hole_ys, True)]
    keep = G.point_in_parts([2.0, 4.5], [2.0, 4.5], parts)
    assert keep.tolist() == [False, True]  # in-hole dropped, in-shell kept


def test_is_hole_windings():
    xs, ys = square(cw=True)
    assert not G.is_hole(xs, ys)
    xs, ys = square(cw=False)
    assert G.is_hole(xs, ys)


def test_area_perimeter_match_reference_tests():
    # poly_area.rs / poly_perimeter.rs unit tests: 5x5 square, open + closed
    xs, ys = square()
    assert G.polygon_area(xs, ys) == 25.0
    assert G.polygon_perimeter(xs, ys) == 20.0
    assert G.polygon_area(xs[:-1], ys[:-1]) == 25.0
    assert G.polygon_perimeter(xs[:-1], ys[:-1]) == 20.0


def test_centroid_square():
    xs, ys = square()
    cx, cy = G.centroid(xs, ys)
    assert (cx, cy) == (2.5, 2.5)


def test_convex_hull():
    xs = np.array([0.0, 5.0, 5.0, 0.0, 2.5, 1.0])
    ys = np.array([0.0, 0.0, 5.0, 5.0, 2.5, 1.0])
    hx, hy = G.convex_hull(xs, ys)
    assert len(hx) == 4
    assert G.polygon_area(np.append(hx, hx[0]), np.append(hy, hy[0])) == 25.0


def test_simplify_rdp():
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.001, 0.0, 0.001, 0.0])
    sx, sy = G.simplify_rdp(xs, ys, 0.01)
    assert len(sx) == 2  # collinear-ish collapsed
    sx, sy = G.simplify_rdp(xs, ys, 0.0001)
    assert len(sx) == 5
