"""LAS point-cloud codec (class SRC).

Pure-python LAS 1.2 reader/writer for point record formats 0-3 — the
fields the reference's whitebox-lidar/src/las.rs reads for every analysis
tool (x/y/z via scale+offset, intensity, return byte, classification, GPS
time for formats 1/3, RGB for formats 2/3). Layout follows the public
ASPRS LAS 1.2 specification; no external lidar libraries exist in this
environment.

Distribution shape mirrors geotiff.py: reads go through Spark's binaryFile
source + mapInPandas so a directory of LAS tiles decodes in parallel, one
task per file (the standard way lidar is shipped: many per-tile files).
The writer is a driver-side small-cloud sink (one file), labeled as such.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_HEADER_SIZE = 227
_POINT_LEN = {0: 20, 1: 28, 2: 26, 3: 34}  # record length per point format

POINT_SCHEMA = (
    "point_id long, x double, y double, z double, intensity int, "
    "return_number int, number_of_returns int, classification int, "
    "gps_time double, red int, green int, blue int"
)


def encode_las(points: pd.DataFrame, *, scale: float = 0.001) -> bytes:
    """Point table -> LAS 1.2 bytes. Columns: x, y, z and optional
    intensity / return_number / number_of_returns / classification /
    gps_time / red,green,blue. The point format is inferred from the
    optional columns present: gps_time -> 1, rgb -> 2, both -> 3, else 0."""
    n = len(points)
    xs = points["x"].to_numpy(np.float64)
    ys = points["y"].to_numpy(np.float64)
    zs = points["z"].to_numpy(np.float64)
    ox = float(xs.min()) if n else 0.0
    oy = float(ys.min()) if n else 0.0
    oz = float(zs.min()) if n else 0.0

    def col(name, default):
        if name in points.columns:
            return points[name].to_numpy(np.int64)
        return np.full(n, default, np.int64)

    inten = col("intensity", 0)
    rn = np.clip(col("return_number", 1), 1, 7)
    nr = np.clip(col("number_of_returns", 1), 1, 7)
    cls = col("classification", 0)

    header = bytearray(_HEADER_SIZE)
    header[0:4] = b"LASF"
    struct.pack_into("<HH", header, 4, 0, 0)          # source id, encoding
    # GUID bytes 8..24 left zero
    header[24] = 1                                     # version major
    header[25] = 2                                     # version minor
    header[26:26 + 10] = b"WBT-SPARK\x00"              # system id (32 b)
    header[58:58 + 10] = b"wbt-spark\x00"              # software (32 b)
    struct.pack_into("<HH", header, 90, 1, 2026)       # day, year
    struct.pack_into("<H", header, 94, _HEADER_SIZE)   # header size
    struct.pack_into("<I", header, 96, _HEADER_SIZE)   # offset to points
    struct.pack_into("<I", header, 100, 0)             # number of VLRs
    # point format + record length set below once optional columns are known
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<5I", header, 111, n, 0, 0, 0, 0)
    struct.pack_into("<3d", header, 131, scale, scale, scale)
    struct.pack_into("<3d", header, 155, ox, oy, oz)
    struct.pack_into(
        "<6d", header, 179,
        float(xs.max()) if n else 0.0, ox,
        float(ys.max()) if n else 0.0, oy,
        float(zs.max()) if n else 0.0, oz,
    )

    rec = np.zeros(n, dtype=np.dtype(
        [("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("intensity", "<u2"),
         ("flags", "u1"), ("cls", "u1"), ("scan_angle", "i1"),
         ("user", "u1"), ("source", "<u2")]
    ))
    rec["x"] = np.round((xs - ox) / scale).astype(np.int64)
    rec["y"] = np.round((ys - oy) / scale).astype(np.int64)
    rec["z"] = np.round((zs - oz) / scale).astype(np.int64)
    rec["intensity"] = inten
    rec["flags"] = (rn & 0x7) | ((nr & 0x7) << 3)
    rec["cls"] = cls
    base = rec.tobytes()

    has_gps = "gps_time" in points.columns
    has_rgb = all(c in points.columns for c in ("red", "green", "blue"))
    fmt = (1 if has_gps else 0) | (2 if has_rgb else 0)
    header[104] = fmt
    rec_len = _POINT_LEN[fmt]
    struct.pack_into("<H", header, 105, rec_len)
    if fmt == 0:
        return bytes(header) + base

    out = np.zeros((n, rec_len), dtype=np.uint8)
    out[:, :20] = np.frombuffer(base, dtype=np.uint8).reshape(n, 20)
    pos = 20
    if has_gps:
        gps = points["gps_time"].to_numpy(np.float64)
        out[:, pos:pos + 8] = gps.view(np.uint8).reshape(n, 8)
        pos += 8
    if has_rgb:
        rgb = np.zeros(n, dtype=np.dtype([("r", "<u2"), ("g", "<u2"), ("b", "<u2")]))
        rgb["r"] = points["red"].to_numpy(np.int64)
        rgb["g"] = points["green"].to_numpy(np.int64)
        rgb["b"] = points["blue"].to_numpy(np.int64)
        out[:, pos:pos + 6] = np.frombuffer(rgb.tobytes(), dtype=np.uint8).reshape(n, 6)
    return bytes(header) + out.tobytes()


def decode_las(data: bytes, *, id_base: int = 0) -> pd.DataFrame:
    """LAS bytes -> point table (POINT_SCHEMA columns)."""
    if data[0:4] != b"LASF":
        raise ValueError("not a LAS file (missing LASF signature)")
    offset = struct.unpack_from("<I", data, 96)[0]
    fmt = data[104]
    rec_len = struct.unpack_from("<H", data, 105)[0]
    n = struct.unpack_from("<I", data, 107)[0]
    sx, sy, sz = struct.unpack_from("<3d", data, 131)
    ox, oy, oz = struct.unpack_from("<3d", data, 155)
    if fmt not in (0, 1, 2, 3):
        raise ValueError(f"unsupported LAS point format {fmt}")
    base = np.frombuffer(
        data, dtype=np.uint8, count=n * rec_len, offset=offset
    ).reshape(n, rec_len)
    xi = base[:, 0:4].copy().view("<i4").ravel()
    yi = base[:, 4:8].copy().view("<i4").ravel()
    zi = base[:, 8:12].copy().view("<i4").ravel()
    inten = base[:, 12:14].copy().view("<u2").ravel()
    flags = base[:, 14]
    cls = base[:, 15]
    # formats 1/3 carry GPS time at byte 20; 2/3 carry RGB after it
    if fmt in (1, 3):
        gps = base[:, 20:28].copy().view("<f8").ravel()
        rgb_off = 28
    else:
        gps = np.zeros(n, np.float64)
        rgb_off = 20
    if fmt in (2, 3):
        r = base[:, rgb_off:rgb_off + 2].copy().view("<u2").ravel()
        g = base[:, rgb_off + 2:rgb_off + 4].copy().view("<u2").ravel()
        b = base[:, rgb_off + 4:rgb_off + 6].copy().view("<u2").ravel()
    else:
        r = g = b = np.zeros(n, np.uint16)
    return pd.DataFrame(
        {
            "point_id": np.arange(id_base, id_base + n, dtype=np.int64),
            "x": ox + xi * sx,
            "y": oy + yi * sy,
            "z": oz + zi * sz,
            "intensity": inten.astype(np.int32),
            "return_number": (flags & 0x7).astype(np.int32),
            "number_of_returns": ((flags >> 3) & 0x7).astype(np.int32),
            "classification": cls.astype(np.int32),
            "gps_time": gps,
            "red": r.astype(np.int32),
            "green": g.astype(np.int32),
            "blue": b.astype(np.int32),
        }
    )


def write_las(points: DataFrame, path: str, *, scale: float = 0.001) -> None:
    """Driver-side small-cloud LAS sink (single file; tile the cloud
    upstream and call per tile for big outputs — the read side is fully
    distributed)."""
    pdf = points.toPandas()
    with open(path, "wb") as fh:
        fh.write(encode_las(pdf, scale=scale))


def read_las(spark: SparkSession, path: str) -> DataFrame:
    """Distributed LAS directory read: binaryFile -> per-file Arrow decode.
    point_id is unique across files (file-ordinal * 2^40 + in-file index)."""
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)

    def decode(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                base = (hash(r["path"]) & 0xFFFFF) << 40
                yield decode_las(bytes(r["content"]), id_base=base)

    return files.select("path", "content").mapInPandas(decode, POINT_SCHEMA)


def las_to_ascii(spark, las_path: str, ascii_path: str) -> None:
    """LasToAscii (lidar_analysis/las_to_ascii.rs): dump a LAS file as
    comma-delimited text (X,Y,Z,intensity,class,return,num_returns header,
    the reference's column set restricted to the fields this codec
    carries)."""
    df = read_las(spark, las_path).orderBy("point_id")
    with open(ascii_path, "w") as fh:
        fh.write("X,Y,Z,CLASS\n")
        for r in df.collect():
            fh.write(f"{r.x!r},{r.y!r},{r.z!r},{int(r.classification)}\n")


def ascii_to_las(spark, ascii_path: str, las_path: str, *, scale: float = 0.001) -> None:
    """AsciiToLas (lidar_analysis/ascii_to_las.rs): parse X,Y,Z[,CLASS]
    delimited text into a LAS 1.2 format-0 file via the engine codec."""
    from pyspark.sql import functions as F

    df = (
        spark.read.csv(ascii_path, header=True, inferSchema=True)
        .withColumnRenamed("X", "x").withColumnRenamed("Y", "y")
        .withColumnRenamed("Z", "z").withColumnRenamed("CLASS", "classification")
    )
    if "classification" not in df.columns:
        df = df.withColumn("classification", F.lit(1))
    df = df.withColumn("point_id", F.monotonically_increasing_id())
    write_las(df, las_path, scale=scale)
