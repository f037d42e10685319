"""remove_embankments_dem vs a hand-rolled serial IDW (embankment_mapping.rs
:858-960): donor MULTIPLICITY must be preserved (FixedRadiusSearch2D inserts
one entry per adjacent embankment cell — fixed_radius_search.rs:81 — so a
donor bordering k embankment cells carries k-fold weight), the radius test is
on SQUARED cell-center distance <= (max_width/2)^2, weights are 1/d^2, and
embankment cells with no donor in range drop to nodata (absent from the
sparse output). The fixture is shaped so dropping multiplicity CHANGES the
answer (asserted), killing any dedup regression in the donor build."""

import math

import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.operators.terrain import remove_embankments_dem


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="embankment-removal", cores=4, shuffle_partitions=4)


GRID = GridSpec(west=0.0, north=60.0, res_x=5.0, res_y=5.0, rows=12, cols=12)
MAX_WIDTH = 30.0  # r = 15 world units = 3 cells


def _dem_rows():
    # irregular but deterministic surface (no symmetry, so multiplicity
    # actually shifts the weighted mean)
    return [
        (r, c, float((r * 7 + c * 13) % 29) + 0.25 * r + 100.0)
        for r in range(GRID.rows)
        for c in range(GRID.cols)
    ]


# an L-shaped embankment blob: interior donors border multiple emb cells
EMB = [(4, 4), (4, 5), (4, 6), (5, 4), (6, 4), (5, 5)]
# plus an isolated embankment cell far from any donor? impossible on a full
# grid (8-neighbors always exist) — the no-donor branch is exercised by
# clipping the DEM instead: cells near (10, 10) removed below.
EMB_ISOLATED = [(10, 10)]


def _serial_idw(dem, emb_set):
    r = MAX_WIDTH / 2.0
    dx8 = [1, 1, 1, 0, -1, -1, -1, 0]
    dy8 = [-1, 0, 1, 1, 1, 0, -1, -1]
    donors = []
    for (er, ec) in sorted(emb_set):
        for i in range(8):
            nb = (er + dy8[i], ec + dx8[i])
            if nb in dem and nb not in emb_set:
                donors.append(
                    (GRID.x_center(nb[1]), GRID.y_center(nb[0]), dem[nb])
                )
    out = {}
    for (er, ec) in emb_set:
        x, y = GRID.x_center(ec), GRID.y_center(er)
        near = [
            (z, (x - px) ** 2 + (y - py) ** 2)
            for (px, py, z) in donors
            if (x - px) ** 2 + (y - py) ** 2 <= r * r
        ]
        if not near:
            continue  # nodata
        sw = sum(1.0 / d2 for (_, d2) in near if d2 > 0.0)
        out[(er, ec)] = sum(z * (1.0 / d2) / sw for (z, d2) in near if d2 > 0.0)
    return donors, out


def test_remove_embankments_matches_serial_and_needs_multiplicity(spark):
    # DEM with a hole: the 8-neighborhood of (10,10) is removed so that
    # embankment cell has NO valid donor and must drop to nodata
    hole = {(r, c) for r in range(9, 12) for c in range(9, 12)} - {(10, 10)}
    dem = {
        (r, c): v for (r, c, v) in _dem_rows() if (r, c) not in hole
    }
    emb_set = set(EMB) | set(EMB_ISOLATED)

    donors, expect = _serial_idw(dem, emb_set)
    # fixture sanity: multiplicity must matter — dedup donors and confirm
    # at least one interpolated value changes beyond rounding
    uniq = sorted(set(donors))
    assert len(uniq) < len(donors), "fixture has no duplicated donor"
    r = MAX_WIDTH / 2.0
    changed = False
    for (er, ec), v in expect.items():
        x, y = GRID.x_center(ec), GRID.y_center(er)
        near = [
            (z, (x - px) ** 2 + (y - py) ** 2)
            for (px, py, z) in uniq
            if (x - px) ** 2 + (y - py) ** 2 <= r * r
        ]
        sw = sum(1.0 / d2 for (_, d2) in near)
        v_dedup = sum(z / d2 for (z, d2) in near) / sw
        if abs(v_dedup - v) > 1e-6:
            changed = True
    assert changed, "fixture insensitive to donor multiplicity"

    dem_df = spark.createDataFrame(
        [(r, c, v) for (r, c), v in dem.items()], "row long, col long, value double"
    ).repartition(4)
    emb_df = spark.createDataFrame(
        [(r, c, 1.0) for (r, c) in sorted(emb_set)],
        "row long, col long, value double",
    ).repartition(3)

    got = {
        (int(x["row"]), int(x["col"])): float(x["value"])
        for x in remove_embankments_dem(
            dem_df, emb_df, GRID, max_width=MAX_WIDTH
        ).collect()
    }

    # the isolated embankment cell has no donors -> absent
    assert (10, 10) not in got
    # every non-embankment DEM cell passes through exactly
    for cell, v in dem.items():
        if cell in emb_set:
            continue
        assert got[cell] == v
    # every reachable embankment cell matches the serial IDW
    for cell, v in expect.items():
        assert got[cell] == pytest.approx(v, rel=0, abs=1e-9)
    assert len(got) == (len(dem) - len(emb_set)) + len(expect)
