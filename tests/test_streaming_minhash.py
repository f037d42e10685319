"""streaming_minhash_near_dup: pairs must be found ACROSS micro-batches
(a batch-2 near-dup matches its batch-1 partner out of bucket state), and
the deduped emitted pair set + Jaccard estimates must equal the batch
minhash_lsh_pairs result over the union of all batches (same md5-portable
parameters)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="stream-minhash", cores=4, shuffle_partitions=4)


BASE = "the quick brown fox jumps over the lazy dog near the river bank"
NEAR = "the quick brown fox jumps over the lazy cat near the river bank"
PARAMS = dict(n=3, num_hashes=32, bands=8, verify_threshold=0.5)


def test_cross_batch_pairs_equal_batch_ground_truth(spark, tmp_path):
    from whitebox_tools_spark.operators.dedup import minhash_lsh_pairs
    from whitebox_tools_spark.streaming import streaming_minhash_near_dup

    b1 = [(3, BASE), (7, BASE), (4, "completely different words entirely here")]
    b2 = [(9, NEAR), (2, "nothing shared with anything else at all")]
    d = tmp_path / "docs"
    d.mkdir()
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(d / name))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_minhash_near_dup(stream, **PARAMS)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_mh")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stream_mh").collect()
    # normalize: unordered pair, dedup multi-band emissions
    stream_pairs = {}
    for r in got:
        k = tuple(sorted((r["doc_id_a"], r["doc_id_b"])))
        stream_pairs[k] = r["est_jaccard"]

    batch = minhash_lsh_pairs(
        spark.createDataFrame(b1 + b2, "doc_id long, text string"),
        hash_family="md5",
        **PARAMS,
    ).collect()
    batch_pairs = {
        tuple(sorted((r["doc_id_a"], r["doc_id_b"]))): r["est_jaccard"]
        for r in batch
    }
    assert set(stream_pairs) == set(batch_pairs)
    for k in stream_pairs:
        assert stream_pairs[k] == pytest.approx(batch_pairs[k], abs=1e-12)
    # the defining property: a CROSS-batch pair (9 arrived a batch after 3/7)
    assert (3, 9) in stream_pairs and (7, 9) in stream_pairs
    assert stream_pairs[(3, 7)] == 1.0  # exact dup within batch 1
