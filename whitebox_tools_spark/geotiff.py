"""Minimal GeoTIFF connector (class SRC).

Re-answers the reference's GeoTIFF ingest path
(/root/reference/whitebox-raster/src/geotiff/mod.rs:446-640: IFD tag
walk, ModelPixelScale 33550 + ModelTiepoint 33922 georeferencing,
GDAL_NODATA 42113, strip decode) for the subset a cell-table engine needs:
single-band baseline TIFF, strip-organized, uncompressed (Compression=1)
or DEFLATE (=8, the reference also supports PACKBITS/LZW which this
connector rejects explicitly), integer/float samples of 8/16/32/64 bits.

Spark ingest shape:
  - read_geotiff: one file, driver-side numpy decode -> (cells df,
    GridSpec). Right for a base raster / small sidecar.
  - read_geotiff_dir: the SCALE path — spark.read.format('binaryFile')
    over a glob, per-file numpy decode inside mapInPandas, so a directory
    of tiles ingests with one distributed pass and no driver bottleneck
    (each GeoTIFF tile becomes its (raster_id, row, col, value) rows).
  - write_geotiff: single-strip float64 + DEFLATE writer (round-trip and
    interchange with the reference's reader).

Byte layout note: only little-endian ('II') files are produced and both
endiannesses are read; nodata becomes NULL in the cell table
(whitebox-raster/src/lib.rs:186-194 rewrites NaN nodata to -32768 — the
cell table instead drops the sentinel entirely).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

_SAMPLE_DTYPES = {
    # (sample_format, bits) -> numpy dtype
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4", (1, 64): "u8",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4", (2, 64): "i8",
    (3, 32): "f4", (3, 64): "f8",
}


def _read_ifd(buf: bytes):
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file (bad byte-order mark)")
    magic = struct.unpack(e + "H", buf[2:4])[0]
    if magic != 42:
        raise ValueError("not a TIFF file (bad magic)")
    ifd_off = struct.unpack(e + "I", buf[4:8])[0]
    n = struct.unpack(e + "H", buf[ifd_off:ifd_off + 2])[0]
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    type_fmt = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}
    tags = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(e + "HHI", buf[off:off + 8])
        size = type_size.get(typ, 1) * count
        if size <= 4:
            data = buf[off + 8:off + 8 + size]
        else:
            doff = struct.unpack(e + "I", buf[off + 8:off + 12])[0]
            data = buf[doff:doff + size]
        if typ == 2:  # ASCII
            tags[tag] = data.rstrip(b"\x00").decode("ascii", "replace")
        elif typ == 5:  # RATIONAL
            vals = struct.unpack(e + "II" * count, data)
            tags[tag] = [vals[2 * k] / max(vals[2 * k + 1], 1) for k in range(count)]
        elif typ in type_fmt:
            tags[tag] = list(struct.unpack(e + type_fmt[typ] * count, data))
        else:
            tags[tag] = data
    return e, tags


def decode_geotiff_bytes(buf: bytes) -> tuple[np.ndarray, dict]:
    """-> (2-D float64 array with nodata as NaN, meta dict with west/north/
    res_x/res_y/nodata). The numpy kernel shared by the driver-side and
    mapInPandas ingest paths."""
    e, tags = _read_ifd(buf)
    width = int(tags[256][0])
    height = int(tags[257][0])
    bits = int(tags.get(258, [32])[0])
    comp = int(tags.get(259, [1])[0])
    sample_format = int(tags.get(339, [1])[0])
    spp = int(tags.get(277, [1])[0])
    if spp != 1:
        raise NotImplementedError("only single-band GeoTIFFs supported")
    if comp not in (1, 8):
        raise NotImplementedError(
            f"compression {comp} not supported (only NONE=1 and DEFLATE=8; "
            "the reference also reads PACKBITS/LZW, geotiff/mod.rs:466-474)"
        )
    dtype = np.dtype(e + _SAMPLE_DTYPES[(sample_format, bits)])
    offsets = [int(v) for v in tags[273]]
    counts = [int(v) for v in tags[279]]
    rows_per_strip = int(tags.get(278, [height])[0])
    rows_out = []
    for si, (o, c) in enumerate(zip(offsets, counts)):
        raw = buf[o:o + c]
        if comp == 8:
            raw = zlib.decompress(raw)
        nrows = min(rows_per_strip, height - si * rows_per_strip)
        arr = np.frombuffer(raw, dtype=dtype, count=nrows * width).reshape(nrows, width)
        rows_out.append(arr)
    data = np.vstack(rows_out).astype(np.float64)

    scale = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    res_x, res_y = float(scale[0]), float(scale[1])
    # tiepoint maps raster (i, j) -> model (x, y): west/north of the grid
    west = float(tie[3]) - float(tie[0]) * res_x
    north = float(tie[4]) + float(tie[1]) * res_y
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            nodata = None
    if nodata is not None:
        data = np.where(data == nodata, np.nan, data)
    meta = {
        "west": west, "north": north, "res_x": res_x, "res_y": res_y,
        "rows": height, "cols": width, "nodata": nodata,
    }
    return data, meta


def read_geotiff(spark, path: str):
    """-> (cells DataFrame(row, col, value), GridSpec). Driver-side decode
    of ONE file; use read_geotiff_dir for tile sets."""
    with open(path, "rb") as fh:
        data, meta = decode_geotiff_bytes(fh.read())
    grid = GridSpec(
        west=meta["west"], north=meta["north"], res_x=meta["res_x"],
        res_y=meta["res_y"], rows=meta["rows"], cols=meta["cols"],
    )
    rows, cols = np.nonzero(~np.isnan(data)) if np.isnan(data).any() else (
        np.repeat(np.arange(meta["rows"]), meta["cols"]),
        np.tile(np.arange(meta["cols"]), meta["rows"]),
    )
    vals = data[rows, cols]
    recs = list(zip(rows.tolist(), cols.tolist(), [float(v) for v in vals]))
    df = spark.createDataFrame(recs, "row long, col long, value double")
    return df, grid


def read_geotiff_dir(spark, pattern: str):
    """Distributed ingest of a GeoTIFF tile directory: binaryFile scan ->
    per-file numpy decode in mapInPandas -> long cell table
    (raster_id, row, col, value) + per-file georeferencing carried as
    columns. No data ever gathers on the driver."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(pattern).select("path", "content")

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                data, meta = decode_geotiff_bytes(bytes(content))
                rr, cc = np.nonzero(~np.isnan(data))
                yield pd.DataFrame(
                    {
                        "raster_id": path,
                        "row": rr,
                        "col": cc,
                        "value": data[rr, cc],
                        "west": meta["west"],
                        "north": meta["north"],
                        "res_x": meta["res_x"],
                        "res_y": meta["res_y"],
                    }
                )

    return files.mapInPandas(
        decode,
        schema=(
            "raster_id string, row long, col long, value double, "
            "west double, north double, res_x double, res_y double"
        ),
    )


def encode_geotiff(data: np.ndarray, grid: GridSpec, *, nodata: float = -32768.0) -> bytes:
    """Encode a dense (rows, cols) float64 array as a single-strip
    little-endian DEFLATE GeoTIFF with ModelPixelScale/ModelTiepoint/
    GDAL_NODATA tags. Pure function of the array + grid — usable on
    executors (write_geotiff_tiles)."""
    payload = zlib.compress(np.ascontiguousarray(data, dtype="<f8").tobytes())
    nod_ascii = (repr(nodata) + "\x00").encode("ascii")

    tags = []  # (tag, type, count, value_bytes or int)
    header_size = 8
    # layout: header | payload | nodata ascii | scale(3d) | tiepoint(6d) | IFD
    off_payload = header_size
    off_nod = off_payload + len(payload)
    off_scale = off_nod + len(nod_ascii)
    off_tie = off_scale + 3 * 8
    off_ifd = off_tie + 6 * 8

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    entries = [
        entry(256, 4, 1, struct.pack("<I", grid.cols)),
        entry(257, 4, 1, struct.pack("<I", grid.rows)),
        entry(258, 3, 1, struct.pack("<HH", 64, 0)),
        entry(259, 3, 1, struct.pack("<HH", 8, 0)),          # DEFLATE
        entry(262, 3, 1, struct.pack("<HH", 1, 0)),          # BlackIsZero
        entry(273, 4, 1, struct.pack("<I", off_payload)),    # StripOffsets
        entry(277, 3, 1, struct.pack("<HH", 1, 0)),
        entry(278, 4, 1, struct.pack("<I", grid.rows)),      # RowsPerStrip
        entry(279, 4, 1, struct.pack("<I", len(payload))),
        entry(339, 3, 1, struct.pack("<HH", 3, 0)),          # float samples
        entry(33550, 12, 3, struct.pack("<I", off_scale)),
        entry(33922, 12, 6, struct.pack("<I", off_tie)),
        entry(42113, 2, len(nod_ascii), struct.pack("<I", off_nod)),
    ]
    entries.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
    _ = tags
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", off_ifd)
    out += payload
    out += nod_ascii
    out += struct.pack("<3d", grid.res_x, grid.res_y, 0.0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, grid.west, grid.north, 0.0)
    out += struct.pack("<H", len(entries))
    for b in entries:
        out += b
    out += struct.pack("<I", 0)
    return bytes(out)


def write_geotiff(cells_df, grid: GridSpec, path: str, *, nodata: float = -32768.0) -> None:
    """Collect a (row, col, value) cell table (bounded: ONE output raster;
    the distributed path is write_geotiff_tiles) into a dense array and
    write it via encode_geotiff."""
    data = np.full((grid.rows, grid.cols), nodata, dtype="<f8")
    for r in cells_df.select("row", "col", "value").collect():
        if r.value is not None:
            data[int(r.row), int(r.col)] = float(r.value)
    with open(path, "wb") as fh:
        fh.write(encode_geotiff(data, grid, nodata=nodata))


def write_geotiff_tiles(
    cells_df, grid: GridSpec, out_dir: str, *, tile: int = 1024,
    nodata: float = -32768.0,
) -> list[str]:
    """Distributed GeoTIFF writer (removes write_geotiff's driver collect):
    the raster is split into tile x tile blocks; each occupied block is
    encoded and written BY ITS EXECUTOR as out_dir/tile_R_C.tif with
    correct per-tile geotransform tags (the reference's own batch mode
    emits one .tif per LAS tile for later mosaicking — read back with
    read_geotiff_dir). Returns the written paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    T = int(tile)
    west, north, rx, ry = grid.west, grid.north, grid.res_x, grid.res_y

    src = cells_df.filter(F.col("value").isNotNull()).select(
        "row", "col", "value",
        (F.col("row") / T).cast("long").alias("tr"),
        (F.col("col") / T).cast("long").alias("tc"),
    )

    def kernel(key, pdf):
        import pandas as pd

        tr, tc = int(key[0]), int(key[1])
        data = np.full((T, T), nodata, dtype="<f8")
        rr = pdf["row"].to_numpy() - tr * T
        cc = pdf["col"].to_numpy() - tc * T
        data[rr, cc] = pdf["value"].to_numpy()
        g = GridSpec(
            west=west + tc * T * rx, north=north - tr * T * ry,
            res_x=rx, res_y=ry, rows=T, cols=T, nodata=nodata,
        )
        path = os.path.join(out_dir, f"tile_{tr}_{tc}.tif")
        with open(path, "wb") as fh:
            fh.write(encode_geotiff(data, g, nodata=nodata))
        return pd.DataFrame({"path": [path]})

    paths = (
        src.groupBy("tr", "tc")
        .applyInPandas(kernel, "path string")
        .collect()
    )
    return sorted(r.path for r in paths)


def print_geotiff_tags(path: str) -> list[tuple[int, str]]:
    """PrintGeoTiffTags (data_tools/print_geotiff_tags.rs): dump every IFD
    tag of a GeoTIFF as (tag_id, rendered value) pairs — the tags are
    already parsed by _read_ifd; this exposes them."""
    with open(path, "rb") as f:
        buf = f.read()
    _e, tags = _read_ifd(buf)
    out = []
    for tag in sorted(tags):
        v = tags[tag]
        if isinstance(v, bytes):
            v = v.hex()
        out.append((int(tag), str(v)))
    return out


def convert_raster_format(spark, src: str, dst: str, grid: GridSpec | None = None) -> None:
    """ConvertRasterFormat (data_tools/convert_raster_format.rs): read any
    supported raster (GeoTIFF / ASCII grid / parquet cell table) and write
    it in the format implied by the destination extension."""
    from whitebox_tools_spark.sources import (
        read_ascii_grid,
        read_cells,
        write_ascii_grid,
        write_cells,
    )

    def ext(p):
        return p.rsplit(".", 1)[-1].lower()

    if ext(src) in ("tif", "tiff"):
        cells, g = read_geotiff(spark, src)
    elif ext(src) in ("asc", "txt"):
        cells, g = read_ascii_grid(spark, src)
    else:
        cells, g = read_cells(spark, src), grid
    if g is None:
        g = grid
    if g is None:
        raise ValueError("grid metadata required for headerless sources")
    if ext(dst) in ("tif", "tiff"):
        write_geotiff(cells, g, dst)
    elif ext(dst) in ("asc", "txt"):
        write_ascii_grid(cells, g, dst)
    else:
        write_cells(cells, dst)
