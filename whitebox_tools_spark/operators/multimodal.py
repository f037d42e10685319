"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas. The image/audio codec libraries are NOT present in this
container, so the decode step is STUBBED — `decode_stub` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
(seeded from the media_ref hash) stands in so the Spark-side plumbing
(schema, batching, partitioning) is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
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


def extract_media_features(
    media: DataFrame, *, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """(doc_id, media_ref, ...) -> (doc_id, media_ref, features array<double>).

    Real pipeline shape: mapInPandas partitions stream Arrow batches through
    the (stubbed) decoder; on a cluster the scan partitions bound memory to
    one batch of decoded media per task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            feats = [list(_fake_decode(r)) for r in pdf["media_ref"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_ref").mapInPandas(
        run, schema="doc_id string, media_ref string, features array<double>"
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
