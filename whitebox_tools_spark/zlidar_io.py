"""zLidar point-cloud codec (class SRC).

Pure-python reader/writer for the reference's compressed zLidar format
v1.1 (whitebox-lidar/src/las.rs: write_zlidar_data 3526-4400,
read_zlidar_data 1421-2460): a 235-byte ZLDR header (the LAS 1.3 header
layout with a ZLDR signature), VLRs, word alignment, a 4-byte zlidar
header (num_fields, compression byte = level<<3 | method, version 1.1),
then 50 000-point blocks of per-field compressed sub-streams:

  code 0  change bytes   (chan/gps/retnum±1/nret/class/angle/intensity>255)
  code 1  scanner channel 2-bit stream (entries only on change-bit 0)
  code 2  return number   4-bit stream (entries only when |diff| > 1)
  code 3  number of returns 4-bit stream (entries on change-bit 4)
  code 4/5/6  x/y/z: per-(channel, 16-context) double-delta with 4-bit
          tags (0..12 = value+6, 13/14/15 = i8/i16/i32 escape stream) —
          two sub-streams (tag nibbles, escape bytes); context =
          4*return_class(i) + return_class(i-1) (las.rs get_context:6570)
  code 7  intensity: first u16, then u8/u16 switched by change-bit 7
  code 8  flags: one raw byte per point (synthetic..edge-of-flightline)
  code 9  classification: bytes appended on change-bit 5
  code 10 user data: 1-bit tag stream + byte stream (first in bytes)
  code 11 scan angle: i16 appended on change-bit 6
  code 12 point source id: 1-bit tag stream + u16 stream
  code 13 GPS time: first f64 raw, then per-channel deltas on change-bit 1

Each field block is [code u8][abs-offset u64][len u64][payload]; the
dual-stream fields append a second [offset u64][len u64][payload].

Deviations (documented): compression is DEFLATE (method 0, stdlib zlib —
bit-compatible with the reference's miniz zlib container); Brotli (the
reference default) needs an external lib absent here and is refused on
read with a clear error. The multi-scanner-channel x/y/z prev-value
seeding asymmetry in the reference (writer seeds prev_vals per channel
with 0, reader seeds every channel with the first point) is resolved the
reader's way; for single-channel clouds — all LAS <=1.3 data, and
everything this engine's LAS codec emits — the two agree bit-for-bit.
File day/year are fixed (1, 2026) for determinism (the reference stamps
wall-clock now(), irreproducible by design).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# zLidar v1.1 carries no RGB stream in this codec subset; its read schema is
# the classic LAS format-1 field set (the LAS reader's POINT_SCHEMA also adds
# red/green/blue for formats 2/3)
ZLIDAR_SCHEMA = (
    "point_id long, x double, y double, z double, intensity int, "
    "return_number int, number_of_returns int, classification int, "
    "gps_time double"
)

_BLOCK = 50_000
_HEADER_SIZE = 235


def _return_class(rn: int, nr: int) -> int:
    """las.rs get_context:6570 return classes: only/last/intermediate/first."""
    if nr <= 1:
        return 0
    if rn == nr:
        return 1
    if 1 < rn < nr:
        return 2
    return 3


class _BitWriter:
    """Packs fixed-width little-endian sub-byte fields, low bits first."""

    def __init__(self) -> None:
        self.data = bytearray()
        self.cur = 0
        self.bits = 0

    def push(self, val: int, width: int) -> None:
        self.cur |= (val & ((1 << width) - 1)) << self.bits
        self.bits += width
        if self.bits == 8:
            self.data.append(self.cur)
            self.cur = 0
            self.bits = 0

    def bytes(self) -> bytes:
        if self.bits > 0:
            return bytes(self.data + bytes([self.cur]))
        return bytes(self.data)


class _BitReader:
    def __init__(self, data: bytes, start_bits: int = 0) -> None:
        self.data = data
        self.pos = 0
        self.bits = start_bits

    def read(self, width: int) -> int:
        v = (self.data[self.pos] >> self.bits) & ((1 << width) - 1)
        self.bits += width
        if self.bits == 8 and self.pos < len(self.data) - 1:
            self.pos += 1
            self.bits = 0
        return v


def encode_zlidar(points: pd.DataFrame, *, scale: float = 0.001, level: int = 6) -> bytes:
    """Point table -> zLidar v1.1 bytes (DEFLATE). Columns: x, y, z and
    optional intensity / return_number / number_of_returns /
    classification / gps_time (zeros when absent; scanner channel, scan
    angle, user data, point source id are zero in this engine's model)."""
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
    rn = np.clip(col("return_number", 1), 1, 15)
    nr = np.clip(col("number_of_returns", 1), 1, 15)
    cls = col("classification", 0)
    gps = (
        points["gps_time"].to_numpy(np.float64)
        if "gps_time" in points.columns
        else np.zeros(n, np.float64)
    )
    xi = np.round((xs - ox) / scale).astype(np.int64)
    yi = np.round((ys - oy) / scale).astype(np.int64)
    zi = np.round((zs - oz) / scale).astype(np.int64)

    by_return = [int((rn == k).sum()) for k in range(1, 6)]

    header = bytearray(_HEADER_SIZE)
    header[0:4] = b"ZLDR"
    struct.pack_into("<HH", header, 4, 0, 0)        # source id, encoding
    # project id bytes 8..24 zero
    header[24] = 1                                  # version major
    header[25] = 3                                  # version minor (las.rs:3561)
    header[26:26 + 20] = b"whitebox-tools-spark"    # system id (32 b)
    header[58:58 + 20] = b"whitebox-tools-spark"    # software (32 b)
    struct.pack_into("<HH", header, 90, 1, 2026)    # fixed day, year
    struct.pack_into("<H", header, 94, _HEADER_SIZE)
    align = 4 - (_HEADER_SIZE % 4)                  # no VLRs
    offset_to_points = _HEADER_SIZE + align
    struct.pack_into("<I", header, 96, offset_to_points)
    struct.pack_into("<I", header, 100, 0)          # number of VLRs
    header[104] = 1                                 # point format (gps block emitted)
    struct.pack_into("<H", header, 105, 28)         # record length (fmt1 + int + user)
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<5I", header, 111, *by_return)
    struct.pack_into("<3d", header, 131, scale, scale, scale)
    struct.pack_into("<3d", header, 155, ox, oy, oz)
    struct.pack_into(
        "<6d", header, 179,
        float(xs.max()) if n else 0.0, ox,
        float(ys.max()) if n else 0.0, oy,
        float(zs.max()) if n else 0.0, oz,
    )
    struct.pack_into("<Q", header, 227, 0)          # waveform start

    out = bytearray(bytes(header) + b"\x00" * align)
    comp_byte = ((int(level) & 0b0001_1111) << 3) | 0  # method 0 = DEFLATE
    out += bytes([14, comp_byte, 1, 1])             # num_fields, comp, v1.1

    def emit(code: int, *payloads: bytes) -> None:
        first = True
        for p in payloads:
            c = zlib.compress(p, level)
            if first:
                out.append(code)
                first = False
            pos = len(out) + 16
            out.extend(struct.pack("<QQ", pos, len(c)))
            out.extend(c)

    ret_cls = np.array([_return_class(int(a), int(b)) for a, b in zip(rn, nr)], np.int64)

    for bs in range(0, max(n, 1), _BLOCK):
        be = min(bs + _BLOCK, n)
        if be <= bs:
            break
        m = be - bs
        # change bytes (single scanner channel: prev index is i-1)
        change = np.zeros(m, np.uint8)
        for j in range(1, m):
            i = bs + j
            b = 0
            if gps[i] != gps[i - 1]:
                b |= 0b0000_0010
            d = int(rn[i]) - int(rn[i - 1])
            if d == 1:
                b |= 0b0000_0100
            elif d == -1:
                b |= 0b0000_1000
            elif d != 0:
                b |= 0b0000_1100
            if nr[i] != nr[i - 1]:
                b |= 0b0001_0000
            if cls[i] != cls[i - 1]:
                b |= 0b0010_0000
            # scan angle constant (0) -> bit 6 never set
            if inten[i] > 255:
                b |= 0b1000_0000
            change[j] = b
        emit(0, change.tobytes())

        # scanner channel: first point's channel only (no changes)
        bw = _BitWriter()
        bw.push(0, 2)
        emit(1, bw.bytes())

        # return number
        bw = _BitWriter()
        bw.push(int(rn[bs]), 4)
        for j in range(1, m):
            i = bs + j
            if abs(int(rn[i]) - int(rn[i - 1])) > 1:
                bw.push(int(rn[i]), 4)
        emit(2, bw.bytes())

        # number of returns
        bw = _BitWriter()
        bw.push(int(nr[bs]), 4)
        for j in range(1, m):
            i = bs + j
            if nr[i] != nr[i - 1]:
                bw.push(int(nr[i]), 4)
        emit(3, bw.bytes())

        # x/y/z double-delta context streams
        for code, vals in ((4, xi), (5, yi), (6, zi)):
            tags = _BitWriter()
            esc = bytearray()
            delta = np.zeros(m, np.int64)
            prev_val = 0
            prev_index = [bs] * 16
            for j in range(m):
                i = bs + j
                v = int(vals[i])
                delta[j] = v - prev_val
                prev_val = v
                if j == 0:
                    tags.push(15, 4)
                    esc += struct.pack("<i", v)
                else:
                    cntx = ret_cls[i] * 4 + ret_cls[i - 1]
                    v2 = int(delta[j]) - int(delta[prev_index[cntx] - bs])
                    if abs(v2) <= 6:
                        tags.push(v2 + 6, 4)
                    elif -128 <= v2 <= 127:
                        tags.push(13, 4)
                        esc += struct.pack("<b", v2)
                    elif -32768 <= v2 <= 32767:
                        tags.push(14, 4)
                        esc += struct.pack("<h", v2)
                    else:
                        tags.push(15, 4)
                        esc += struct.pack("<i", v2)
                    cntx_i = ret_cls[i] * 4 + ret_cls[i - 1]
                    prev_index[cntx_i] = i
            emit(code, tags.bytes(), bytes(esc))

        # intensity: first u16, then u8/u16 by change bit 7
        buf = bytearray(struct.pack("<H", int(inten[bs])))
        for j in range(1, m):
            i = bs + j
            if inten[i] > 255:
                buf += struct.pack("<H", int(inten[i]))
            else:
                buf += struct.pack("<B", int(inten[i]))
        emit(7, bytes(buf))

        # flags: zero byte per point (engine model carries none)
        emit(8, bytes(m))

        # classification
        buf = bytearray([int(cls[bs]) & 0xFF])
        for j in range(1, m):
            i = bs + j
            if cls[i] != cls[i - 1]:
                buf.append(int(cls[i]) & 0xFF)
        emit(9, bytes(buf))

        # user data: 1-bit tag stream (bit 0 unused by the reader) + bytes
        bw = _BitWriter()
        bw.push(0, 1)
        for _ in range(1, m):
            bw.push(0, 1)           # constant user data -> never changes
        emit(10, bw.bytes(), bytes([0]))

        # scan angle: first i16 only (constant zero)
        emit(11, struct.pack("<h", 0))

        # point source id: tag stream + u16 stream
        bw = _BitWriter()
        bw.push(0, 1)
        for _ in range(1, m):
            bw.push(0, 1)
        emit(12, bw.bytes(), struct.pack("<H", 0))

        # gps time: first f64 raw, deltas on change bit 1
        buf = bytearray(struct.pack("<d", float(gps[bs])))
        prev = float(gps[bs])
        for j in range(1, m):
            i = bs + j
            if gps[i] != gps[i - 1]:
                buf += struct.pack("<d", float(gps[i]) - prev)
                prev = float(gps[i])
        emit(13, bytes(buf))

    return bytes(out)


def decode_zlidar(data: bytes, *, id_base: int = 0) -> pd.DataFrame:
    """zLidar v1.1 bytes -> point table (POINT_SCHEMA columns + gps_time).
    Faithful transcription of las.rs read_zlidar_data:1421-2460 for field
    codes 0-13 (DEFLATE; Brotli refused with a clear error)."""
    if data[0:4] != b"ZLDR":
        raise ValueError("not a zLidar file (missing ZLDR signature)")
    offset_to_points = struct.unpack_from("<I", data, 96)[0]
    n = struct.unpack_from("<I", data, 107)[0]
    sx, sy, sz = struct.unpack_from("<3d", data, 131)
    ox, oy, oz = struct.unpack_from("<3d", data, 155)

    pos = offset_to_points
    num_fields, comp_byte, vmaj, vmin = data[pos:pos + 4]
    if (vmaj, vmin) != (1, 1):
        raise ValueError(f"unsupported zlidar version {vmaj}.{vmin}")
    method = comp_byte & 0b0000_0111
    if method != 0:
        raise NotImplementedError(
            "zlidar Brotli compression requires an external library not "
            "present in this environment; re-encode with DEFLATE"
        )

    xi = np.zeros(n, np.int64)
    yi = np.zeros(n, np.int64)
    zi = np.zeros(n, np.int64)
    inten = np.zeros(n, np.int64)
    rn = np.zeros(n, np.int64)
    nr = np.zeros(n, np.int64)
    cls = np.zeros(n, np.int64)
    chan = np.zeros(n, np.int64)
    gps = np.zeros(n, np.float64)

    def rclass(i: int) -> int:
        return _return_class(int(rn[i]), int(nr[i]))

    next_offset = offset_to_points + 4
    point_num = 0
    while point_num < n:
        p = next_offset
        block_bytes = 0
        change = b""
        m = 0
        for _ in range(num_fields):
            code = data[p]
            off, ln = struct.unpack_from("<QQ", data, p + 1)
            payload = zlib.decompress(data[off:off + ln])
            p = off + ln
            block_bytes += 17 + ln

            if code == 0:
                change = payload
                m = len(change)
            elif code == 1:
                br = _BitReader(payload, 0)
                c = br.read(2)
                chan[point_num] = c
                for j in range(1, m):
                    if change[j] & 1:
                        c = br.read(2)
                    chan[point_num + j] = c
            elif code == 2:
                br = _BitReader(payload, 0)
                prev = [br.read(4)] * 4
                rn[point_num] = prev[0]
                for j in range(1, m):
                    i = point_num + j
                    sc = int(chan[i])
                    d = (change[j] & 0b0000_1100) >> 2
                    if d == 0:
                        rn[i] = prev[sc]
                    elif d == 1:
                        prev[sc] += 1
                        rn[i] = prev[sc]
                    elif d == 2:
                        prev[sc] -= 1
                        rn[i] = prev[sc]
                    else:
                        prev[sc] = br.read(4)
                        rn[i] = prev[sc]
            elif code == 3:
                br = _BitReader(payload, 0)
                prev = [br.read(4)] * 4
                nr[point_num] = prev[0]
                for j in range(1, m):
                    i = point_num + j
                    sc = int(chan[i])
                    if (change[j] & 0b0001_0000) >> 4:
                        prev[sc] = br.read(4)
                    nr[i] = prev[sc]
            elif code in (4, 5, 6):
                off2, ln2 = struct.unpack_from("<QQ", data, p)
                esc = zlib.decompress(data[off2:off2 + ln2])
                p = off2 + ln2
                block_bytes += 16 + ln2
                br = _BitReader(payload, 0)
                ep = 0
                tag = br.read(4)
                if tag != 15:
                    raise ValueError("corrupt zlidar coordinate stream")
                first = struct.unpack_from("<i", esc, ep)[0]
                ep += 4
                val2 = [first]
                for _j in range(1, m):
                    tag = br.read(4)
                    if tag < 13:
                        val2.append(tag - 6)
                    elif tag == 13:
                        val2.append(struct.unpack_from("<b", esc, ep)[0])
                        ep += 1
                    elif tag == 14:
                        val2.append(struct.unpack_from("<h", esc, ep)[0])
                        ep += 2
                    else:
                        val2.append(struct.unpack_from("<i", esc, ep)[0])
                        ep += 4
                arr = {4: xi, 5: yi, 6: zi}[code]
                arr[point_num] = first
                deltas = [first]
                prev_vals = [first] * 4
                prev_index = [[0] * 16 for _ in range(4)]
                for j in range(1, m):
                    i = point_num + j
                    sc = int(chan[i])
                    cntx = rclass(i) * 4 + rclass(i - 1)
                    dj = val2[j] + deltas[prev_index[sc][cntx]]
                    deltas.append(dj)
                    v = prev_vals[sc] + dj
                    arr[i] = v
                    prev_vals[sc] = v
                    prev_index[sc][cntx] = j
            elif code == 7:
                ep = 0
                inten[point_num] = struct.unpack_from("<H", payload, ep)[0]
                ep += 2
                for j in range(1, m):
                    i = point_num + j
                    if (change[j] & 0b1000_0000) >> 7:
                        inten[i] = struct.unpack_from("<H", payload, ep)[0]
                        ep += 2
                    else:
                        inten[i] = payload[ep]
                        ep += 1
            elif code == 8:
                pass  # per-point flag bytes; engine model carries none
            elif code == 9:
                prev = [payload[0]] * 4
                cls[point_num] = payload[0]
                vn = 0
                for j in range(1, m):
                    i = point_num + j
                    sc = int(chan[i])
                    if (change[j] & 0b0010_0000) >> 5:
                        vn += 1
                        prev[sc] = payload[vn]
                    cls[i] = prev[sc]
            elif code in (10, 12):
                off2, ln2 = struct.unpack_from("<QQ", data, p)
                vals = zlib.decompress(data[off2:off2 + ln2])
                p = off2 + ln2
                block_bytes += 16 + ln2
                # user data / point source id — engine model keeps neither;
                # consume for stream integrity
            elif code == 11:
                pass  # scan angle — engine model drops it (zeros)
            elif code == 13:
                ep = 0
                v = struct.unpack_from("<d", payload, ep)[0]
                ep += 8
                gps[point_num] = v
                prev = [v] * 4
                for j in range(1, m):
                    i = point_num + j
                    sc = int(chan[i])
                    if (change[j] & 0b0000_0010) >> 1:
                        v = struct.unpack_from("<d", payload, ep)[0]
                        ep += 8
                        prev[sc] = v + prev[sc]
                    gps[i] = prev[sc]
            else:
                raise ValueError(f"unsupported zlidar field code {code}")
        next_offset += block_bytes
        point_num += m

    return pd.DataFrame(
        {
            "point_id": np.arange(id_base, id_base + n, dtype=np.int64),
            "x": ox + xi * sx,
            "y": oy + yi * sy,
            "z": oz + zi * sz,
            "intensity": inten.astype(np.int32),
            "return_number": rn.astype(np.int32),
            "number_of_returns": nr.astype(np.int32),
            "classification": cls.astype(np.int32),
            "gps_time": gps,
        }
    )


def write_zlidar(points: DataFrame, path: str, *, scale: float = 0.001, level: int = 6) -> None:
    """Driver-side small-cloud zLidar sink (single file; tile upstream for
    big outputs — the read side is fully distributed)."""
    pdf = points.toPandas()
    with open(path, "wb") as fh:
        fh.write(encode_zlidar(pdf, scale=scale, level=level))


def read_zlidar(spark: SparkSession, path: str) -> DataFrame:
    """Distributed zLidar directory read: binaryFile -> per-file Arrow
    decode, one task per tile file (mirrors lidar_io.read_las)."""
    files = spark.read.format("binaryFile").load(path)

    def decode(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                base = (hash(r["path"]) & 0xFFFFF) << 40
                yield decode_zlidar(bytes(r["content"]), id_base=base)

    return files.select("path", "content").mapInPandas(decode, ZLIDAR_SCHEMA)


def las_to_zlidar(las_path: str, zlidar_path: str, *, level: int = 6) -> None:
    """LasToZlidar (lidar_analysis/las_to_zlidar.rs): re-encode a LAS file
    as zLidar (DEFLATE; the reference's Brotli default needs an external
    library absent here)."""
    from whitebox_tools_spark.lidar_io import decode_las

    with open(las_path, "rb") as fh:
        pdf = decode_las(fh.read())
    # preserve the LAS quantization exactly: same scale, offsets re-derived
    with open(zlidar_path, "wb") as fh:
        fh.write(encode_zlidar(pdf, level=level))


def zlidar_to_las(zlidar_path: str, las_path: str) -> None:
    """ZlidarToLas (lidar_analysis/zlidar_to_las.rs): decode zLidar and
    re-encode with the engine's LAS 1.2 writer."""
    from whitebox_tools_spark.lidar_io import encode_las

    pdf = decode_zlidar(open(zlidar_path, "rb").read())
    with open(las_path, "wb") as fh:
        fh.write(encode_las(pdf))
