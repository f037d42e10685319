"""GeoTIFF connector round-trips (driver path + distributed binaryFile path)."""

import numpy as np
import pytest

from whitebox_tools_spark.grid import GridSpec
from whitebox_tools_spark.geotiff import (
    decode_geotiff_bytes,
    read_geotiff,
    read_geotiff_dir,
    write_geotiff,
)

G = GridSpec(west=100.0, north=250.0, res_x=5.0, res_y=10.0, rows=6, cols=4)


def _cells(spark, holes=()):
    rng = np.random.default_rng(3)
    rows = [
        (r, c, float(rng.uniform(-50, 50)))
        for r in range(G.rows) for c in range(G.cols)
        if (r, c) not in holes
    ]
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_roundtrip_dense(spark, tmp_path):
    src = _cells(spark)
    p = str(tmp_path / "a.tif")
    write_geotiff(src, G, p)
    df, grid = read_geotiff(spark, p)
    assert (grid.west, grid.north, grid.res_x, grid.res_y, grid.rows, grid.cols) == (
        100.0, 250.0, 5.0, 10.0, 6, 4
    )
    a = {(r.row, r.col): r.value for r in src.collect()}
    b = {(r.row, r.col): r.value for r in df.collect()}
    assert a == b  # float64 payload: bit-exact round trip


def test_roundtrip_nodata_holes(spark, tmp_path):
    holes = {(0, 0), (3, 2), (5, 3)}
    src = _cells(spark, holes=holes)
    p = str(tmp_path / "b.tif")
    write_geotiff(src, G, p)
    df, _ = read_geotiff(spark, p)
    got = {(r.row, r.col) for r in df.collect()}
    assert got == {(r, c) for r in range(6) for c in range(4)} - holes


def test_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_geotiff_bytes(b"XX\x00\x00 not a tiff")


def test_read_geotiff_dir_distributed(spark, tmp_path):
    # three tiles -> one distributed cell table with per-file georeferencing
    for i in range(3):
        g = GridSpec(west=1000.0 * i, north=100.0, res_x=2.0, res_y=2.0, rows=3, cols=3)
        cells = spark.createDataFrame(
            [(r, c, float(i * 100 + r * 3 + c)) for r in range(3) for c in range(3)],
            "row long, col long, value double",
        )
        write_geotiff(cells, g, str(tmp_path / f"tile_{i}.tif"))
    out = read_geotiff_dir(spark, str(tmp_path / "*.tif"))
    rows = out.collect()
    assert len(rows) == 27
    by_file = {}
    for r in rows:
        by_file.setdefault(r.raster_id, []).append(r)
    assert len(by_file) == 3
    wests = sorted({r.west for r in rows})
    assert wests == [0.0, 1000.0, 2000.0]
    # values survived per tile
    for rid, rs in by_file.items():
        i = int(rid.split("tile_")[1][0])
        assert {r.value for r in rs} == {float(i * 100 + k) for k in range(9)}
