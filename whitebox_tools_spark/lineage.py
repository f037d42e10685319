"""Per-partition lineage checkpointing + mid-job resume.

North-rule requirement: every stage checkpoints per-partition lineage
(cell range, row count, content hash) so runs resume mid-job. The real
deployment target is an Iceberg table (snapshot + manifest); this container
has no Iceberg runtime jars, so the same design is implemented as a
partitioned parquet layout + a JSON manifest that plays the role of the
Iceberg manifest list:

    <root>/bucket=<b>/*.parquet        one bucket = one unit of resume
    <root>/_manifest/<b>.json          {bucket, cell_min, cell_max,
                                        row_count, content_hash}

A stage writes bucket-by-bucket; a killed run leaves completed buckets +
manifests behind; `run_stage` re-runs only the missing buckets (anti-join
against the manifest). content_hash is an order-insensitive xor-sum of
xxhash64 over the rows — cheap, associative, partition-order independent.

Swapping the physical layer for Iceberg is a sink change only (writeTo +
snapshot metadata), not a redesign.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _manifest_dir(root: str) -> str:
    d = os.path.join(root, "_manifest")
    os.makedirs(d, exist_ok=True)
    return d


def completed_buckets(root: str) -> set[int]:
    d = _manifest_dir(root)
    out = set()
    for f in os.listdir(d):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.add(json.load(fh)["bucket"])
    return out


def _run_bucket(
    df_for_bucket: Callable[[int], DataFrame],
    b: int,
    root: str,
    cell_col: str,
    progress: Callable[[str], None] | None,
) -> int:
    out_path = os.path.join(root, f"bucket={b}")
    df = df_for_bucket(b)
    df.write.mode("overwrite").parquet(out_path)
    written = df.sparkSession.read.parquet(out_path)
    cols = written.columns
    stats = (
        written.withColumn(
            # order-insensitive content hash: sum of 31-bit-masked row
            # hashes — commutative, duplicate-sensitive, and overflow-free
            # for < 2^31 rows per bucket even under ANSI mode
            "__h",
            F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(2147483647)),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min(cell_col) if cell_col in cols else F.lit(None)).alias("cmin"),
            (F.max(cell_col) if cell_col in cols else F.lit(None)).alias("cmax"),
            F.sum("__h").alias("h"),
        )
        .collect()[0]
    )
    manifest = {
        "bucket": b,
        "cell_min": stats["cmin"],
        "cell_max": stats["cmax"],
        "row_count": stats["n"],
        "content_hash": str(stats["h"]),
    }
    # atomic publish: a manifest only ever exists complete (kill-safe)
    mpath = os.path.join(_manifest_dir(root), f"{b}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mpath)
    if progress:
        progress(f"bucket {b}: {stats['n']} rows")
    return b


def run_stage(
    df_for_bucket: Callable[[int], DataFrame],
    buckets: list[int],
    root: str,
    *,
    cell_col: str = "cell_id",
    progress: Callable[[str], None] | None = None,
    max_concurrent: int = 4,
) -> list[int]:
    """Execute a stage bucket-by-bucket with lineage; skip buckets whose
    manifest already exists (resume). Returns the buckets actually run.

    Buckets run CONCURRENTLY (max_concurrent submitter threads): Spark's
    scheduler interleaves their jobs across the executor pool (FIFO works;
    a fair scheduler pool sharpens it), so a bucket whose write stalls on a
    skewed partition no longer serializes the whole stage. Each bucket
    still publishes its own manifest atomically, so kill/resume semantics
    are unchanged — a killed run leaves any subset of complete buckets."""
    os.makedirs(root, exist_ok=True)
    done = completed_buckets(root)
    todo = [b for b in buckets if b not in done]
    if not todo:
        return []
    if max_concurrent <= 1 or len(todo) == 1:
        return [
            _run_bucket(df_for_bucket, b, root, cell_col, progress) for b in todo
        ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_concurrent) as ex:
        futs = [
            ex.submit(_run_bucket, df_for_bucket, b, root, cell_col, progress)
            for b in todo
        ]
        # propagate the first failure after letting others finish
        return [f.result() for f in futs]


def read_stage(spark, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "bucket=*"))


def stage_metrics(root: str) -> list[dict]:
    d = _manifest_dir(root)
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out
