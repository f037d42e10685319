"""Distributed patterns that replace single-partition global windows.

A plain ``Window.orderBy(...)`` with no partition key funnels every row
through ONE task — correct, but a bottleneck/OOM at 10^9+ rows. The helpers
here produce the same sequential ids / global ranks with a fully
distributed plan:

  1. ``repartitionByRange`` on the order columns (range exchange — Spark
     samples boundaries, so partitions are balanced),
  2. ``row_number`` within each range partition (Window PARTITIONED by the
     physical partition id — parallel),
  3. offsets = cumulative row-count over the tiny per-partition count table
     (#partitions rows, broadcast back).

Net cost: one range shuffle + one broadcast join — no global sort on a
single task anywhere. Used by clip/erase FID renumbering (clip.rs:345-360
semantics), clump dense relabeling, multipart explode fids and quantile
ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__wts_pid"
_RN = "__wts_rn"
_OFF = "__wts_off"


def loop_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint for ITERATIVE loops: materialize AND drop the
    carried origin statistics.

    Spark >= 3.4 copies the origin plan's Statistics into the checkpoint's
    LogicalRDD (SPARK-39834). When a loop's round plan references the
    carried state k >= 2 times, each round MULTIPLIES the carried
    sizeInBytes estimates (SizeInBytesOnlyStatsPlanVisitor multiplies
    across joins), so the stat's BIT LENGTH grows ~k-fold per round and
    catalyst planning degenerates into minutes of BigInteger
    multiplications after ~10 rounds (observed: a 39-link Horton wave
    spending 150 s PER ROUND in stats while tasks were idle). Rebuilding
    the Dataset from the checkpointed InternalRow RDD resets the leaf to
    the default size estimate, which keeps stats O(plan size) per round.

    The rebuilt leaf loses its real size estimate (defaults to
    Long.MaxValue), so joins against it never auto-broadcast — inside the
    loops that is what we want anyway; broadcast the genuinely-small sides
    explicitly with F.broadcast."""
    ck = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    try:
        jdf = ck._jdf
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jnew, spark)
    except Exception:  # pragma: no cover - e.g. Spark Connect: no _jdf
        return ck


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    *,
    out_col: str = "seq",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = start, start+1, ... in ``order_cols`` order
    without a single-partition global window.

    Ties in ``order_cols`` get an arbitrary but stable-within-run order
    (same contract as ``row_number`` over a global window). Every other
    column passes through untouched.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins ONE physical range partitioning: the counts and
    # numbering branches below both read `ranged`, and without
    # materialization Spark may plan TWO range exchanges whose sampled
    # boundaries differ (RangePartitioner samples with a per-exchange
    # seed), silently corrupting the per-partition offsets (observed as
    # flaky fids at 15k rows when exchange reuse didn't kick in)
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    numbered = ranged.withColumn(_RN, F.row_number().over(w))
    counts = numbered.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt"))
    # cumulative offsets over the tiny (#partitions-row) count table — a
    # triangular self-join (P^2 <= ~1k rows) instead of a global window, so
    # NO single-partition exchange exists anywhere in the plan
    prior = counts.select(F.col(_PID).alias("__p2"), F.col("__cnt").alias("__c2"))
    offsets = (
        counts.join(prior, F.col("__p2") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(F.coalesce(F.sum("__c2"), F.lit(0)).alias(_OFF))
    )
    return (
        numbered.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_RN) + F.lit(start - 1)).cast("long"))
        .drop(_PID, _RN, _OFF)
    )


def with_running_sum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    *,
    prefix: str = "cum_",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``prefix + c`` = running (inclusive) sum of each column in
    ``sum_cols`` in ``order_cols`` order, with the same distributed shape
    as with_global_seq: range repartition + per-partition window + tiny
    triangular offset join — no single-partition exchange. ``order_cols``
    must be unique per row (e.g. distinct values) so the prefix sum is
    well-defined."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # same materialization as with_global_seq: one pinned range layout for
    # both the per-partition windows and the offset totals (two separately
    # sampled range exchanges would mis-split the running sums)
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged
    for c in sum_cols:
        out = out.withColumn(f"__w_{c}", F.sum(F.col(c)).over(w))
    totals = out.groupBy(_PID).agg(
        *[F.sum(F.col(c)).alias(f"__t_{c}") for c in sum_cols]
    )
    prior = totals.select(
        F.col(_PID).alias("__p2"),
        *[F.col(f"__t_{c}").alias(f"__pt_{c}") for c in sum_cols],
    )
    offsets = (
        totals.join(prior, F.col("__p2") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(*[F.coalesce(F.sum(f"__pt_{c}"), F.lit(0.0) * 0).alias(f"__o_{c}") for c in sum_cols])
    )
    out = out.join(F.broadcast(offsets), _PID)
    for c in sum_cols:
        out = out.withColumn(
            prefix + c, F.coalesce(F.col(f"__o_{c}"), F.lit(0)) + F.col(f"__w_{c}")
        ).drop(f"__w_{c}", f"__o_{c}")
    return out.drop(_PID)
