"""Structured Streaming: incremental geodoc ingest + streaming spatial ops.

The reference is batch-only (SURVEY.md section 2.1: no streaming
operators); this module is the engine's forward path for continuously
arriving document tables: new parquet files under a directory are decoded,
spatially joined and tiled incrementally, with exactly-once sink semantics
via foreachBatch + the lineage layer.

Patterns:
  - incremental_pip_tiles: readStream over the geodoc directory -> decode
    points (same pure-expression decode as batch) -> PIP cell-cover
    broadcast join -> tile assignment -> streaming aggregation of per-tile
    counts (update mode, in-memory sink for tests; foreachBatch/parquet in
    production).
  - event_window_counts: watermarked tumbling-window aggregation over the
    driver's `events` table shape (ts, event_type, value) — late data
    handled by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEODOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def incremental_pip_tiles(
    spark: SparkSession,
    geodoc_dir: str,
    polys_parts: list,
    index,
    tile_params: dict,
):
    """Streaming DataFrame of (tile, poly_id, n_points) maintained
    incrementally over arriving geodoc parquet files."""
    from whitebox_tools_spark.ingest import decode_points
    from whitebox_tools_spark.operators.pip import points_in_polygons
    from whitebox_tools_spark.operators.tiling import assign_tiles

    docs = (
        spark.readStream.schema(GEODOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(geodoc_dir)
    )
    pts = assign_tiles(decode_points(docs).drop("z"), **tile_params)
    # tile rides through the PIP join (carry_cols) — a single-stream plan,
    # no stream-stream self-join
    hits = points_in_polygons(pts, polys_parts, index, carry_cols=["tile"])
    return hits.groupBy("tile", "poly_id").agg(F.count(F.lit(1)).alias("n_points"))


def run_to_memory(streaming_df, query_name: str, *, timeout_s: int = 120):
    """Drive a streaming aggregation to completion over the currently
    available files (test/bootstrap harness): complete-mode memory sink +
    processAllAvailable."""
    q = (
        streaming_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def event_window_counts(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over an (ts, event_type, value)
    stream: count + sum per (window, event_type). Works identically on a
    batch DataFrame (unit-testable) and a readStream source."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    df = events
    if events.isStreaming:
        df = events.withWatermark("ts", watermark)
    return df.groupBy(w.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )


def streaming_cell_stats(points, *, cell: float = 125.0):
    """Custom STATEFUL streaming operator via applyInPandasWithState: per
    grid cell, maintain running (n, sum_z, min_z, max_z) across micro-
    batches and emit the updated row for every cell touched by a trigger.
    This is the engine's template for stateful spatial operators the
    built-in streaming aggregates can't express (e.g. evolving per-cell
    sketches); state is Spark-managed (checkpointed, partition-local), so
    the operator scales exactly like a shuffle-by-key. Works only on a
    streaming DataFrame with columns (x, y, z)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = points.select(
        F.floor(F.col("x") / F.lit(cell)).cast("long").alias("cx"),
        F.floor(F.col("y") / F.lit(cell)).cast("long").alias("cy"),
        "z",
    )

    out_schema = (
        "cx long, cy long, n long, sum_z double, min_z double, max_z double"
    )
    state_schema = "n long, sum_z double, min_z double, max_z double"

    def update(key, pdfs, state):
        n, s, mn, mx = (state.get if state.exists else (0, 0.0, None, None))
        for pdf in pdfs:
            z = pdf["z"].astype(float)
            if not len(z):
                continue
            n += int(len(z))
            s += float(z.sum())
            bmn, bmx = float(z.min()), float(z.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            [{"cx": key[0], "cy": key[1], "n": n, "sum_z": s,
              "min_z": mn, "max_z": mx}]
        )

    return keyed.groupBy("cx", "cy").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_exact_dedup(docs):
    """STREAMING exact dedup against all history via applyInPandasWithState
    (the stream-side complement of dedup.exact_dedup): documents group by
    their text; per-group state carries (canonical_doc_id, n_seen) across
    micro-batches, so every arriving document is labeled against EVERYTHING
    the stream has ever seen, not just its own trigger. Within one
    micro-batch ties resolve to the smallest doc_id (deterministic); across
    batches the earlier arrival wins (stream order — the streaming
    semantics). State is Spark-managed and checkpointed: a killed query
    restarted on the same checkpoint resumes deduplicating against full
    history, which is the property batch anti-joins cannot give a
    continuous ingest pipeline.

    Grouping on the raw text keeps the semantics exact at any content
    length; a production 10^12-doc deployment would group on a 128-bit
    content digest instead (state-store key size) with the same plan
    shape — one shuffle by key, partition-local state.
    Works only on a streaming DataFrame with columns (doc_id, text).
    -> stream of (doc_id, canonical_id, is_dup, n_seen)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "doc_id long, canonical_id long, is_dup boolean, n_seen long"
    state_schema = "canon long, n long"

    def update(key, pdfs, state):
        canon, n = (state.get if state.exists else (None, 0))
        rows = []
        batch_ids = []
        for pdf in pdfs:
            batch_ids.extend(int(x) for x in pdf["doc_id"])
        for did in sorted(batch_ids):
            if canon is None:
                canon = did
            n += 1
            rows.append((did, canon, did != canon, n))
        state.update((int(canon), int(n)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "canonical_id", "is_dup", "n_seen"]
        )

    return docs.select("doc_id", "text").groupBy("text").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_minhash_near_dup(
    docs,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float = 0.5,
    hash_family: str = "md5",
):
    """STREAMING MinHash+LSH near-dup against ALL history — the stream-side
    complement of dedup.minhash_lsh_pairs: every arriving document emits a
    pair for each earlier stream document (any micro-batch, any trigger)
    that shares one of its LSH band buckets and whose signature-agreement
    Jaccard estimate clears verify_threshold.

    Plan shape mirrors the batch path's scaling story: signatures and band
    keys are the SAME stateless column expressions (minhash_signatures /
    md5 band keys — no UDF), the stream shuffles once on (band, key), and
    applyInPandasWithState keeps per-BUCKET history (doc ids + signatures)
    in the Spark state store, so comparisons are bucket-local, never
    corpus-wide. Checkpoint-resumable: a killed query restarted on the same
    checkpoint resumes matching against full history.

    A pair sharing several buckets is emitted once per shared band (state
    is per-group; cross-group dedup belongs to the consumer — exactly the
    multi-band collision the batch path dedupes in bucket_pair_candidates).
    Per-bucket state grows with bucket population (num_hashes longs per
    doc); hot templated buckets are the memory bound — a production
    deployment caps history per bucket (evicting oldest) the same way the
    batch path triangle-chunks hot buckets.
    Works only on a streaming DataFrame with columns (doc_id, text).
    -> stream of (band, doc_id_a, doc_id_b, est_jaccard), doc_id_a the
    earlier arrival (within a batch: the smaller id).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from whitebox_tools_spark.operators.dedup import minhash_signatures

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        docs, n=n, num_hashes=num_hashes, hash_family=hash_family,
        repartition=False,
    )

    def band_key(b: int):
        lo, hi = b * rows_per_band, (b + 1) * rows_per_band
        if hash_family == "md5":
            parts = ", ".join(f"cast(sig[{i}] as string)" for i in range(lo, hi))
            return F.expr(f"md5(concat_ws(',', {parts}))")
        return F.xxhash64(*[F.col("sig")[i] for i in range(lo, hi)]).cast("string")

    banded = sigs.withColumn(
        "band",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("b"), band_key(b).alias("h"))
                    for b in range(bands)
                ]
            )
        ),
    ).select("doc_id", "sig", F.col("band.b").alias("b"), F.col("band.h").alias("h"))

    out_schema = "band int, doc_id_a long, doc_id_b long, est_jaccard double"
    state_schema = "ids array<long>, sigs array<array<long>>"

    def update(key, pdfs, state):
        ids, hist = (state.get if state.exists else ([], []))
        ids = list(ids)
        hist = [list(s) for s in hist]
        band = int(key[0])
        arrivals = []
        for pdf in pdfs:
            for did, sig in zip(pdf["doc_id"], pdf["sig"]):
                arrivals.append((int(did), [int(x) for x in sig]))
        rows = []
        for did, sig in sorted(arrivals):
            for hid, hsig in zip(ids, hist):
                est = sum(a == b for a, b in zip(hsig, sig)) / num_hashes
                if est >= verify_threshold:
                    rows.append((band, hid, did, est))
            ids.append(did)
            hist.append(sig)
        state.update((ids, hist))
        yield pd.DataFrame(
            rows, columns=["band", "doc_id_a", "doc_id_b", "est_jaccard"]
        )

    return banded.groupBy("b", "h").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
