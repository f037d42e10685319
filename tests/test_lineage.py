"""Resumable stage execution: kill-and-resume equivalence + lineage metrics."""

import os

from pyspark.sql import functions as F

from whitebox_tools_spark import lineage


def _stage_fn(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def df_for_bucket(b):
        return cust.filter(F.col("c_custkey") % 4 == b).select(
            "c_custkey", (F.col("c_custkey") % 97).alias("cell_id"), "c_acctbal"
        )

    return df_for_bucket


def test_resume_skips_completed_buckets(spark, sf_dir, tmp_path):
    root = str(tmp_path / "stage1")
    fn = _stage_fn(spark, sf_dir)
    # simulate a killed run: only buckets 0,1 complete
    ran = lineage.run_stage(fn, [0, 1], root)
    assert ran == [0, 1]
    assert lineage.completed_buckets(root) == {0, 1}
    # resume with the full bucket list: only 2,3 run
    ran2 = lineage.run_stage(fn, [0, 1, 2, 3], root)
    assert ran2 == [2, 3]
    # result identical to a clean full run
    root_full = str(tmp_path / "stage_full")
    lineage.run_stage(fn, [0, 1, 2, 3], root_full)
    a = sorted(tuple(r) for r in lineage.read_stage(spark, root).collect())
    b = sorted(tuple(r) for r in lineage.read_stage(spark, root_full).collect())
    assert a == b


def test_manifest_metrics(spark, sf_dir, tmp_path):
    root = str(tmp_path / "stage2")
    lineage.run_stage(_stage_fn(spark, sf_dir), [0, 1, 2, 3], root)
    metrics = lineage.stage_metrics(root)
    assert len(metrics) == 4
    total = sum(m["row_count"] for m in metrics)
    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n
    for m in metrics:
        assert m["cell_min"] is not None and m["cell_max"] is not None
        assert m["content_hash"] is not None


def test_concurrent_buckets_match_serial(spark, sf_dir, tmp_path):
    """Overlapped bucket submission (thread pool -> Spark scheduler) must
    produce byte-identical results + manifests vs the serial path."""
    fn = _stage_fn(spark, sf_dir)
    r_ser = str(tmp_path / "serial")
    r_par = str(tmp_path / "parallel")
    ran_s = lineage.run_stage(fn, [0, 1, 2, 3], r_ser, max_concurrent=1)
    ran_p = lineage.run_stage(fn, [0, 1, 2, 3], r_par, max_concurrent=4)
    assert sorted(ran_s) == sorted(ran_p) == [0, 1, 2, 3]
    a = sorted(tuple(r) for r in lineage.read_stage(spark, r_ser).collect())
    b = sorted(tuple(r) for r in lineage.read_stage(spark, r_par).collect())
    assert a == b
    hs = {m["bucket"]: m["content_hash"] for m in lineage.stage_metrics(r_ser)}
    hp = {m["bucket"]: m["content_hash"] for m in lineage.stage_metrics(r_par)}
    assert hs == hp
    # resume after concurrent run is still a no-op
    assert lineage.run_stage(fn, [0, 1, 2, 3], r_par, max_concurrent=4) == []


def test_content_hash_detects_difference(spark, sf_dir, tmp_path):
    fn = _stage_fn(spark, sf_dir)
    r1 = str(tmp_path / "a")
    r2 = str(tmp_path / "b")
    lineage.run_stage(fn, [0], r1)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def tampered(b):
        return cust.filter(F.col("c_custkey") % 4 == b).select(
            "c_custkey", (F.col("c_custkey") % 97).alias("cell_id"),
            (F.col("c_acctbal") + 1).alias("c_acctbal"),
        )

    lineage.run_stage(tampered, [0], r2)
    h1 = lineage.stage_metrics(r1)[0]["content_hash"]
    h2 = lineage.stage_metrics(r2)[0]["content_hash"]
    assert h1 != h2
