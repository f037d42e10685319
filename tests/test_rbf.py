"""RadialBasisFunctionInterpolation (gis_analysis/
radial_basis_function_interpolation.rs) — solver + distributed-path tests."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import CellIndex, GridSpec
from whitebox_tools_spark.operators.rbf import (
    basis_eval,
    rbf_interpolation,
    rbf_reference_cell,
    rbf_solve_eval,
)

GRID = GridSpec(west=0.0, north=100.0, res_x=10.0, res_y=10.0, rows=10, cols=10)
IDX = CellIndex(0.0, 0.0, 100.0, 3)


def _cloud():
    rng = np.random.RandomState(7)
    n = 60
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 100, n)
    pz = 5.0 + 0.1 * px - 0.05 * py + rng.uniform(-1, 1, n)
    return px, py, pz


def test_rbf_interpolates_data_points_exactly():
    # an RBF surface passes through its centers (radial_basis_function.rs:
    # the system is solved so that eval(center_i) == vals_i)
    px, py, pz = _cloud()
    sel = slice(0, 12)
    for i in range(3):
        v = rbf_solve_eval(
            px[sel], py[sel], pz[sel], px[i], py[i],
            "thin_plate_spline", 0.1, 0,
        )
        assert abs(v - pz[i]) < 1e-6


@pytest.mark.parametrize("func_type,weight,order", [
    ("thin_plate_spline", 0.1, 0),
    ("polyharmonic", 3.0, 1),
    ("gaussian", 30.0, 0),
    ("multiquadric", 5.0, 2),
    ("inverse_multiquadric", 5.0, 1),
])
def test_solver_matches_independent_gaussian_elimination(func_type, weight, order):
    # SVD pseudo-inverse (engine) vs partial-pivot GE (transcription):
    # identical solutions on nonsingular systems
    px, py, pz = _cloud()
    sel = slice(10, 22)
    pts = list(zip(px[sel], py[sel], pz[sel]))
    for tx, ty in [(25.0, 40.0), (80.0, 15.0)]:
        a = rbf_solve_eval(px[sel], py[sel], pz[sel], tx, ty, func_type, weight, order)
        b = rbf_reference_cell(pts, tx, ty, func_type, weight, order)
        assert abs(a - b) < 1e-6 * max(1.0, abs(b))


def test_basis_polyharmonic_even_guard():
    assert basis_eval(np.array([0.0]), "polyharmonic", 2.0)[0] == 0.0
    r = basis_eval(np.array([2.0]), "polyharmonic", 2.0)[0]
    assert abs(r - 4.0 * math.log(2.0)) < 1e-12


def test_distributed_matches_serial_and_is_partition_invariant(spark):
    px, py, pz = _cloud()
    rows = [(i + 1, float(px[i]), float(py[i]), float(pz[i])) for i in range(len(px))]
    pts = spark.createDataFrame(rows, "point_id long, x double, y double, z double")

    out = rbf_interpolation(
        pts, GRID, IDX, radius=18.0, min_points=5
    ).collect()
    got = {(r.row, r.col): r.value for r in out}
    assert len(got) == 100

    # serial transcription of the full tool loop
    zmin, zmax = float(pz.min()), float(pz.max())
    mid, rng_ = zmin + (zmax - zmin) / 2.0, zmax - zmin
    fallback = 0
    for (r, c), v in got.items():
        tx = GRID.west + (c + 0.5) * GRID.res_x
        ty = GRID.north - (r + 0.5) * GRID.res_y
        d2 = (px - tx) ** 2 + (py - ty) ** 2
        order = sorted(range(len(px)), key=lambda i: (d2[i], i + 1))
        sel = [i for i in order if d2[i] <= 18.0 * 18.0]
        if len(sel) < 5:
            sel = order[:5]
            fallback += 1
        exp = rbf_reference_cell(
            [(px[i], py[i], pz[i]) for i in sel], tx, ty,
            "thin_plate_spline", 0.1, 0,
        )
        if not abs(exp - mid) < 10.0 * rng_:
            exp = GRID.nodata
        assert abs(v - exp) < 1e-6 * max(1.0, abs(exp)), (r, c)
    assert fallback > 0  # the kNN fallback path was exercised

    # partitioning invariance: same numbers from a different physical layout
    out2 = rbf_interpolation(
        pts.repartition(7), GRID, IDX, radius=18.0, min_points=5
    ).collect()
    got2 = {(r.row, r.col): r.value for r in out2}
    assert got == got2
