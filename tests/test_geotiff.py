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


def test_print_geotiff_tags_and_convert(spark, tmp_path):
    from whitebox_tools_spark.geotiff import (
        convert_raster_format,
        print_geotiff_tags,
        read_geotiff,
    )
    from whitebox_tools_spark.geotiff import write_geotiff
    from whitebox_tools_spark.grid import GridSpec
    from whitebox_tools_spark.sources import read_ascii_grid

    g = GridSpec(west=10.0, north=40.0, res_x=2.0, res_y=2.0, rows=5, cols=4)
    cells = spark.createDataFrame(
        [(r, c, float(r * 4 + c)) for r in range(5) for c in range(4)],
        "row long, col long, value double",
    )
    tif = str(tmp_path / "a.tif")
    write_geotiff(cells, g, tif)
    tags = dict(print_geotiff_tags(tif))
    assert tags[256] == "[4]" and tags[257] == "[5]"       # width, height
    assert "2.0" in tags[33550]                              # pixel scale
    # tif -> asc -> tif round trip preserves values
    asc = str(tmp_path / "a.asc")
    convert_raster_format(spark, tif, asc)
    cells2, g2 = read_ascii_grid(spark, asc)
    tif2 = str(tmp_path / "b.tif")
    convert_raster_format(spark, asc, tif2)
    cells3, g3 = read_geotiff(spark, tif2)
    got = {(r.row, r.col): r.value for r in cells3.collect()}
    assert got == {(r, c): float(r * 4 + c) for r in range(5) for c in range(4)}
    assert (g3.west, g3.north, g3.res_x) == (10.0, 40.0, 2.0)


def test_reclass_from_file(spark, tmp_path):
    from whitebox_tools_spark.operators.raster_math import reclass_from_file

    rules = tmp_path / "rules.csv"
    rules.write_text("1.0,0.0,10.0\n2.0,10.0,20.0\n")
    cells = spark.createDataFrame(
        [(0, 0, 5.0), (0, 1, 10.0), (0, 2, 15.0), (0, 3, 25.0)],
        "row long, col long, value double",
    )
    out = {(r.row, r.col): r.value
           for r in reclass_from_file(cells, str(rules)).collect()}
    assert out == {(0, 0): 1.0, (0, 1): 2.0, (0, 2): 2.0, (0, 3): 25.0}


def test_write_geotiff_tiles_roundtrip(spark, tmp_path):
    """Distributed per-tile writer -> read_geotiff_dir mosaic recovers the
    raster exactly (executor-side writes, no driver collect)."""
    from whitebox_tools_spark.geotiff import read_geotiff_dir, write_geotiff_tiles
    from whitebox_tools_spark.grid import GridSpec

    g = GridSpec(west=100.0, north=500.0, res_x=5.0, res_y=5.0, rows=30, cols=30)
    cells = spark.createDataFrame(
        [(r, c, float(r * 100 + c)) for r in range(30) for c in range(30)
         if (r + c) % 7 != 0],  # holes -> nodata
        "row long, col long, value double",
    )
    out = str(tmp_path / "tiles")
    paths = write_geotiff_tiles(cells, g, out, tile=16)
    assert len(paths) == 4  # 2x2 tile grid
    back = read_geotiff_dir(spark, out + "/*.tif")
    got = {}
    for r in back.collect():
        # per-tile local coords + tiepoint -> global coords
        gr = int(r.row + round((500.0 - r.north) / 5.0))
        gc = int(r.col + round((r.west - 100.0) / 5.0))
        if r.value != -32768.0:
            got[(gr, gc)] = r.value
    want = {(r, c): float(r * 100 + c) for r in range(30) for c in range(30)
            if (r + c) % 7 != 0}
    assert got == want
