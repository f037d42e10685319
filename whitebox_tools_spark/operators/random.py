"""Stochastic operators (class RND): RandomField, RandomSample.

The reference draws from an entropy-seeded RNG per run
(math_stat_analysis/random_field.rs:216 — SmallRng::from_entropy), so its
outputs are irreproducible by design. A distributed engine needs the
opposite: identical output for identical (input, seed) regardless of
partitioning, task retries, or speculative execution. Values therefore
derive from a per-cell integer hash (two chained 31-bit LCG steps — exact
in any engine's 64-bit integer arithmetic, products < 2^53) mapped through
Box-Muller for the standard normal. Pure column expressions, no RNG state,
no shuffle; the DuckDB oracle evaluates the identical arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whitebox_tools_spark.grid import GridSpec

_M = 2147483647  # 2^31 - 1 (Lehmer/minstd modulus)
_A = 48271

# Each cell key seeds its own minstd (Lehmer) stream; `steps` successive
# multiplicative steps decorrelate adjacent keys (one multiply already
# spreads key vs key+1 by the full modulus). Two different step counts give
# the near-independent uniform pair Box-Muller needs (measured corr ~1e-3
# over 10k sequential keys; a chained-LCG variant with a shared multiplier
# gave corr 0.999 and a visibly non-normal field).


def _hash_u_expr(key, seed: int, steps: int):
    """Uniform in (0, 1]: `steps` minstd steps from a (key, seed) start."""
    s = (key + F.lit(seed * 2654435 + 1)) % F.lit(_M)
    for _ in range(steps):
        s = (s * F.lit(_A)) % F.lit(_M)
    return (s + F.lit(1)).cast("double") / F.lit(float(_M + 1))


def _hash_u_sql(key: str, seed: int, steps: int) -> str:
    s = f"((({key}) + {seed * 2654435 + 1}) % {_M})"
    for _ in range(steps):
        s = f"(({s} * {_A}) % {_M})"
    return f"(CAST({s} + 1 AS DOUBLE) / {float(_M + 1)!r})"


def random_field(spark, grid: GridSpec, *, seed: int = 1) -> DataFrame:
    """RandomField (random_field.rs): standard-normal value per grid cell.
    Box-Muller over two per-cell hash uniforms. -> (row, col, value)."""
    n = grid.rows * grid.cols
    cells = spark.range(n, numPartitions=max(1, n // 262144)).select(
        (F.col("id") / grid.cols).cast("long").alias("row"),
        (F.col("id") % grid.cols).alias("col"),
        F.col("id").alias("key"),
    )
    u1 = _hash_u_expr(F.col("key"), seed, 2)
    u2 = _hash_u_expr(F.col("key"), seed, 3)
    z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
    return cells.select("row", "col", z.alias("value"))


def random_field_oracle_sql(grid: GridSpec, *, seed: int = 1) -> str:
    k = "CAST(r AS BIGINT) * {c} + CAST(c AS BIGINT)".format(c=grid.cols)
    u1 = _hash_u_sql(k, seed, 2)
    u2 = _hash_u_sql(k, seed, 3)
    return f"""
SELECT CAST(r AS BIGINT) AS row, CAST(c AS BIGINT) AS col,
       round(sqrt(-2.0 * ln({u1})) * cos({2.0 * math.pi!r} * ({u2})), 6) AS value
FROM generate_series(0, {grid.rows - 1}) t1(r), generate_series(0, {grid.cols - 1}) t2(c)
"""


def random_sample(
    cells: DataFrame, num_samples: int, *, seed: int = 1
) -> DataFrame:
    """RandomSample (random_sample.rs): num_samples valid cells chosen
    uniformly (hash order), labeled with unique sample ids 1..n.
    -> (row, col, sample_id). Top-n by hash is a distributed TakeOrdered —
    no global sort materialization."""
    src = cells.filter(F.col("value").isNotNull()).select("row", "col")
    key = F.col("row") * F.lit(1 << 31) + F.col("col")
    u = _hash_u_expr(key, seed, 2)
    ranked = src.withColumn("__u", u).orderBy("__u", "row", "col").limit(num_samples)
    # n is small by definition (a sample) — one final pass assigns ids
    from whitebox_tools_spark.distributed import with_global_seq

    return with_global_seq(ranked, ["__u", "row", "col"], out_col="sample_id").select(
        "row", "col", "sample_id"
    )


def random_sample_oracle_sql(source_sql: str, num_samples: int, *, seed: int = 1) -> str:
    key = "(row * 2147483648 + col)"
    u = _hash_u_sql(key, seed, 2)
    return f"""
WITH src AS (SELECT row, col FROM ({source_sql}) WHERE value IS NOT NULL),
ranked AS (
  SELECT row, col, {u} AS u FROM src ORDER BY u, row, col LIMIT {num_samples}
)
SELECT row, col, CAST(row_number() OVER (ORDER BY u, row, col) AS BIGINT) AS sample_id
FROM ranked
"""
