"""The cleaning/scoring column-expression ops (C4 rules, PII scrub) are
stateless, so they must run UNCHANGED on a Structured Streaming source and
produce exactly the batch answer — the property that makes the cleaning
pass deployable on a continuous ingest feed with zero extra code."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="stream-cleaning", cores=4, shuffle_partitions=4)


_DOCS = [
    (1, "good first line with five words.\nshort\nmail me at a@b.com now."),
    (2, "please enable javascript to continue here now.\nlorem ipsum tail"),
    (3, "server 10.0.0.1 line one is fine today.\ncall +1 555 123 4567 ok.\n"
        "third calm line with enough words."),
    (4, "brace { here\nan otherwise fine line with words."),
]


def _run_stream(spark, tmp_path, transform, name):
    d = tmp_path / f"in_{name}"
    d.mkdir()
    half = len(_DOCS) // 2
    for i, chunk in enumerate((_DOCS[:half], _DOCS[half:])):
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(d / f"b{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        transform(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {
        r["doc_id"]: r.asDict() for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_c4_and_pii_streaming_equals_batch(spark, tmp_path):
    from whitebox_tools_spark.operators.text import c4_quality_filter, pii_redact

    batch_df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for fn, name in ((c4_quality_filter, "s_c4"), (pii_redact, "s_pii")):
        batch = {r["doc_id"]: r.asDict() for r in fn(batch_df).collect()}
        stream = _run_stream(spark, tmp_path, fn, name)
        assert stream == batch, name
    # and the stream actually exercised both rules
    c4 = {r["doc_id"]: r.asDict() for r in c4_quality_filter(batch_df).collect()}
    assert c4[2]["keep_doc"] == 0 and c4[4]["has_brace"] == 1
    pii = {r["doc_id"]: r.asDict() for r in pii_redact(batch_df).collect()}
    assert pii[1]["n_emails"] == 1 and pii[3]["n_ips"] == 1 and pii[3]["n_phones"] == 1


def test_redact_text_spans_preserves_interleaved_structure(spark, tmp_path):
    """PII scrub on the interleaved span table: text spans redacted, every
    non-text span byte-identical, kind/order sequence preserved, and the
    geometry decoders see EXACTLY the same points before and after."""
    import re

    from pyspark.sql import functions as F

    from whitebox_tools_spark.datagen import write_geodocs
    from whitebox_tools_spark.ingest import decode_points, redact_text_spans
    from whitebox_tools_spark.operators.text import PII_EMAIL

    path = str(tmp_path / "geodocs")
    write_geodocs(path, 300, seed=7)
    docs = spark.read.parquet(path)
    # plant an email in every text span so the scrub provably fires
    planted = docs.withColumn(
        "spans",
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s.kind.alias("kind"),
                F.when(
                    s.kind == "text", F.concat(s.text, F.lit(" ping admin@site.org"))
                ).otherwise(s.text).alias("text"),
                s.media_ref.alias("media_ref"),
                s.offset.alias("offset"),
            ),
        ),
    )
    red = redact_text_spans(planted)

    before = planted.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    after = red.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    b = {(r.doc_id, r.offset): r for r in before.collect()}
    a = {(r.doc_id, r.offset): r for r in after.collect()}
    assert set(a) == set(b)  # span count + order slots identical
    n_text = 0
    for key, rb in b.items():
        ra = a[key]
        assert ra.kind == rb.kind and ra.media_ref == rb.media_ref
        if rb.kind == "text":
            n_text += 1
            assert ra.text == re.sub(PII_EMAIL, "<EMAIL>", rb.text)
            assert "admin@site.org" not in ra.text
        else:
            assert ra.text == rb.text  # non-text spans byte-identical
    assert n_text > 0
    # geometry decode is unaffected
    pb = sorted(map(tuple, decode_points(planted).collect()))
    pa = sorted(map(tuple, decode_points(red).collect()))
    assert pa == pb
