"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas.

Decode support is split honestly by what this container can parse:

* REAL decoders (pure numpy/stdlib, no codec libraries needed):
  binary netpbm images (P5 grayscale / P6 RGB) and PCM RIFF/WAVE audio
  (stdlib `wave`). `extract_media_features(..., fake=False)` decodes these
  for real and emits a typed 16-dim feature vector; `resize_image_nn`
  re-encodes a nearest-neighbour resample.
* Compressed formats (JPEG/PNG/MP3/MP4...) require codec libraries that are
  NOT present here — those payloads raise NotImplementedError, and the
  deterministic media_ref-seeded fake (`fake=True`) stands in so the
  Spark-side plumbing (schema, batching, partitioning) stays testable.
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def _fake_decode(ref: str) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decoder: a feature
    vector seeded from the media_ref (stable across runs/executors)."""
    h = hashlib.sha256(ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(FEATURE_DIM)


# ---------------------------------------------------------------------------
# real decoders (no external codec libraries required)


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary netpbm decode: P5 -> (h, w) uint8/uint16, P6 -> (h, w, 3).
    Header tokens (magic, width, height, maxval) may be separated by any
    whitespace/comments; raster follows the single whitespace after maxval."""
    if payload[:2] not in (b"P5", b"P6"):
        raise NotImplementedError("not a binary netpbm payload")
    tokens = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    channels = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=dtype, count=w * h * channels, offset=i)
    arr = arr.astype(np.uint16 if maxval > 255 else np.uint8)
    return arr.reshape(h, w, 3) if channels == 3 else arr.reshape(h, w)


def encode_netpbm(arr: np.ndarray) -> bytes:
    """Inverse of decode_netpbm (uint8 only; P5 for 2-D, P6 for (h, w, 3))."""
    if arr.ndim == 2:
        magic, body = b"P5", arr.astype(np.uint8).tobytes()
    else:
        magic, body = b"P6", arr.astype(np.uint8).tobytes()
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM RIFF/WAVE decode via stdlib `wave`: -> ((n_frames, channels)
    int16/int32/uint8 array, framerate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    arr = np.frombuffer(raw, dtype=dtype).reshape(-1, nch)
    return arr, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of decode_wav for int16 samples of shape (n, channels)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def media_feature_vector(payload: bytes) -> list[float]:
    """Typed 16-dim feature vector from a REAL decode. Images (netpbm):
    kind=1, [channels, width, height, mean, std, min, max, per-channel
    means, first-row mean, first-col mean, center sample]. Audio (WAVE):
    kind=2, [channels, framerate, n_frames, mean, std, min, max, first,
    last, |x| mean, zero crossings]. Raises NotImplementedError for
    compressed formats (no codecs in this environment)."""
    if payload[:2] in (b"P5", b"P6"):
        img = decode_netpbm(payload).astype(np.float64)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        ch_means = [float(img[:, :, k].mean()) for k in range(3)] if c == 3 else [
            float(img[:, :, 0].mean()), 0.0, 0.0,
        ]
        v = [
            1.0, float(c), float(w), float(h),
            float(img.mean()), float(img.std()),
            float(img.min()), float(img.max()),
            ch_means[0], ch_means[1], ch_means[2],
            float(img[0, :, :].mean()), float(img[:, 0, :].mean()),
            float(img[h // 2, w // 2, 0]), 0.0, 0.0,
        ]
        return v
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        arr, rate = decode_wav(payload)
        x = arr.astype(np.float64)
        mono = x.mean(axis=1)
        zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        v = [
            2.0, float(arr.shape[1]), float(rate), float(arr.shape[0]),
            float(x.mean()), float(x.std()), float(x.min()), float(x.max()),
            float(mono[0]), float(mono[-1]), float(np.abs(mono).mean()),
            float(zc), 0.0, 0.0, 0.0, 0.0,
        ]
        return v
    raise NotImplementedError(
        "payload is not netpbm/WAVE; compressed codecs are not available in "
        "this environment (use fake=True for the deterministic stand-in)"
    )


def resize_image_nn(media: DataFrame, *, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour image resize over mapInPandas: decode netpbm,
    index-sample to (out_h, out_w), re-encode. -> (doc_id, media_ref,
    payload binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = decode_netpbm(bytes(payload))
                h, w = img.shape[:2]
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                out.append(encode_netpbm(img[np.ix_(ri, ci)]))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                 "payload": out}
            )

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        run, schema="doc_id string, media_ref string, payload binary"
    )


def extract_media_features(
    media: DataFrame, *, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """(doc_id, media_ref, ...) -> (doc_id, media_ref, features array<double>).

    Real pipeline shape: mapInPandas partitions stream Arrow batches through
    the (stubbed) decoder; on a cluster the scan partitions bound memory to
    one batch of decoded media per task.
    """

    cols = ["doc_id", "media_ref"] + ([] if fake else ["payload"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [list(_fake_decode(r)) for r in pdf["media_ref"]]
            else:
                # REAL decode: netpbm + PCM WAVE parse in-task; compressed
                # payloads raise (no codec libraries in this environment)
                feats = [media_feature_vector(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "features": feats,
                }
            )

    return media.select(*cols).mapInPandas(
        run, schema="doc_id string, media_ref string, features array<double>"
    )


def audio_window_features(
    media: DataFrame, *, window_ms: int = 20, hop_ms: int | None = None
) -> DataFrame:
    """Windowed audio features over REAL PCM WAVE decode: each clip is cut
    into window_ms windows (hop_ms stride, default = window), one output
    row per window with (n, mean, rms, peak) over the mono mix — the audio
    analog of video frame sampling, fan-out happens inside the Arrow batch.
    -> (doc_id, media_ref, win_idx, n, mean, rms, peak)."""
    hop = hop_ms or window_ms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                arr, rate = decode_wav(bytes(payload))
                mono = arr.astype(np.float64).mean(axis=1)
                wlen = max(1, (rate * window_ms) // 1000)
                step = max(1, (rate * hop) // 1000)
                for wi, start in enumerate(range(0, len(mono), step)):
                    seg = mono[start : start + wlen]
                    if not len(seg):
                        break
                    rows.append(
                        (
                            doc_id, ref, wi, int(len(seg)),
                            float(seg.mean()),
                            float(np.sqrt((seg * seg).mean())),
                            float(np.abs(seg).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "win_idx", "n", "mean", "rms", "peak"],
            )

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        run,
        schema=(
            "doc_id string, media_ref string, win_idx int, n int, "
            "mean double, rms double, peak double"
        ),
    )


def frame_sample_plan(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode per-media frame timestamps as
    rows (decode stubbed). Shows the fan-out schema a real sampler uses:
    (doc_id, media_ref, frame_ts_ms)."""
    n = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return media.select(
        "doc_id",
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def media_exact_dedup(
    media: DataFrame, *, payload: str = "payload", ref: str = "media_ref"
) -> DataFrame:
    """Exact media dedup by content digest — the binary twin of
    dedup.exact_dedup: md5 over the raw payload bytes (codec-agnostic:
    identical bytes are identical media, no decode needed), canonical =
    smallest media_ref per digest. One hash aggregate + one equi-join
    (AQE broadcasts the digest table when it fits); at 10^12 media rows
    this is the same single-shuffle shape as text exact dedup.
    -> (media_ref, digest, canonical_ref, is_dup)."""
    d = media.select(
        F.col(ref).alias("media_ref"), F.md5(F.col(payload)).alias("digest")
    )
    canon = d.groupBy("digest").agg(F.min("media_ref").alias("canonical_ref"))
    return d.join(canon, "digest").select(
        "media_ref",
        "digest",
        "canonical_ref",
        (F.col("media_ref") != F.col("canonical_ref")).cast("long").alias("is_dup"),
    )


def media_near_dup_pairs(
    media: DataFrame, *, threshold: float = 0.98, n_planes: int = 8, dim: int = 16
) -> DataFrame:
    """Perceptual media near-dup: REAL-decode 16-dim feature vectors
    (extract_media_features fake=False: netpbm/WAVE stats) fed through the
    SAME hyperplane-LSH + exact-cosine-verify machinery as text-embedding
    near-dup — so re-encoded / slightly-jittered copies of one image or
    clip that exact byte hashing cannot see land in one bucket and verify
    by cosine. Scale shape inherited from embedding_near_dup_pairs
    (bucketed candidates, never all-pairs). -> (id_a, id_b, cosine)."""
    from whitebox_tools_spark.operators.dedup import embedding_near_dup_pairs

    feats = extract_media_features(media, fake=False).select(
        F.col("media_ref").alias("vec_id"), F.col("features").alias("embedding")
    )
    return embedding_near_dup_pairs(
        feats, threshold=threshold, n_planes=n_planes, dim=dim
    )
