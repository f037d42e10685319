"""streaming_exact_dedup: state must carry across micro-batches (a text
seen in batch 1 marks its batch-2 repeat as a duplicate of the ORIGINAL
canonical id), within-batch ties resolve to the smallest doc_id, and the
final canonical assignment equals the batch exact-dedup ground truth."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="stream-dedup", cores=4, shuffle_partitions=4)


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    from whitebox_tools_spark.streaming import streaming_exact_dedup

    d = tmp_path / "docs"
    d.mkdir()
    b1 = [(3, "alpha"), (1, "beta"), (7, "alpha"), (4, "gamma")]
    b2 = [(9, "alpha"), (2, "beta"), (8, "delta"), (6, "delta")]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        str(d / "b2")
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        int(r.doc_id): (int(r.canonical_id), bool(r.is_dup))
        for r in spark.sql("SELECT * FROM stream_dedup").collect()
    }
    # batch 1: alpha -> canonical 3 (min of {3,7} within the batch)
    assert got[3] == (3, False)
    assert got[7] == (3, True)
    assert got[1] == (1, False)
    assert got[4] == (4, False)
    # batch 2: doc 9's alpha dedups against BATCH-1 state (canon 3, not 9);
    # doc 2's beta against doc 1; delta is new, min-id 6 canonical
    assert got[9] == (3, True)
    assert got[2] == (1, True)
    assert got[6] == (6, False)
    assert got[8] == (6, True)
    # every text's canonical is unique and non-dup
    canons = {c for (c, _) in got.values()}
    assert all(got[c] == (c, False) for c in canons)
    assert len(got) == len(b1) + len(b2)
