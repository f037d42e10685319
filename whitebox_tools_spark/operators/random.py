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


# ---------------------------------------------------------------------------
# TurningBandsSimulation
# ---------------------------------------------------------------------------
def _tbs_setup(grid: GridSpec, *, range_dist: float, iterations: int, seed: int):
    """Driver-side band/line generation (turning_bands.rs:270-415) with
    the repo's deterministic minstd stream replacing the reference's
    entropy thread_rng (reproducibility convention — see module doc).
    Bands are 1-D O(diagonal) arrays: driver-scale by construction.
    Returns (lines, bands, w): lines = per-iteration projection params,
    bands = (iter, p, y) rows."""
    rows, cols = grid.rows, grid.cols
    diagonal_size = int(math.sqrt(rows * rows + cols * cols))
    fhs = int(range_dist / (2.0 * grid.res_x))
    filter_size = fhs * 2 + 1
    w = math.sqrt(36.0 / (fhs * (fhs + 1) * filter_size))

    state = [seed * 2654435 + 1]

    def nxt() -> int:
        state[0] = (state[0] * 48271) % 2147483647
        return state[0]

    def uniform() -> float:
        return nxt() / 2147483647.0

    def normal() -> float:
        u1 = (nxt() + 1) / 2147483648.0
        u2 = (nxt() + 1) / 2147483648.0
        return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)

    lines = []
    bands = []
    for it in range(iterations):
        t = [0.0] * (diagonal_size + 2 * fhs)
        for j in range(diagonal_size):
            t[j] = normal()
        y = [0.0] * diagonal_size
        s = sq = 0.0
        for j in range(diagonal_size):
            z = 0.0
            for k in range(filter_size):
                m = k - fhs
                z += m * t[j + fhs + m]
            y[j] = w * z
            s += y[j]
            sq += y[j] * y[j]
        mean = s / diagonal_size
        stdev = math.sqrt(sq / diagonal_size - mean * mean)
        y = [(v - mean) / stdev for v in y]

        edge1 = nxt() % 4
        edge2 = edge1
        while edge2 == edge1:
            edge2 = nxt() % 4

        def pick(edge):
            if edge == 0:
                return 0.0, float(nxt() % rows)
            if edge == 1:
                return float(nxt() % cols), 0.0
            if edge == 2:
                return float(cols - 1), float(nxt() % rows)
            return float(nxt() % cols), float(rows - 1)

        p1x, p1y = pick(edge1)
        p2x, p2y = pick(edge2)
        while p1x == p2x or p1y == p2y:
            p2x, p2y = pick(edge2)

        line_slope = (p2y - p1y) / (p2x - p1x)
        line_intercept = p1y - line_slope * p1x
        perp = -1.0 / line_slope
        slope_diff = line_slope - perp
        corners = []
        for (r, c) in [(0, 0), (0, cols), (rows, 0), (rows, cols)]:
            pli = r - perp * c
            cx = (pli - line_intercept) / slope_diff
            cy = line_slope * cx - line_intercept
            corners.append((cx, cy))
        sx, sy = corners[0]
        for cx, cy in corners[1:]:
            if cy < sy:
                sx, sy = cx, cy
        lines.append((it, line_slope, line_intercept, perp, slope_diff, sx, sy))
        bands.extend((it, p, y[p]) for p in range(diagonal_size))
    return lines, bands, diagonal_size


def turning_bands_simulation(
    spark, grid: GridSpec, *, range_dist: float, iterations: int, seed: int = 1
) -> DataFrame:
    """TurningBandsSimulation (math_stat_analysis/turning_bands.rs:
    250-505): sum of `iterations` 1-D moving-ramp-filtered normal bands
    projected along random grid-crossing lines, scaled by 1/sqrt(n).
    Bands/lines are tiny broadcasts; the per-cell projection (perpendicular
    foot + truncated distance index, the reference's `as isize`) is pure
    expressions. -> (row, col, value)."""
    lines, bands, diag = _tbs_setup(
        grid, range_dist=range_dist, iterations=iterations, seed=seed
    )
    n = grid.rows * grid.cols
    cells = spark.range(n, numPartitions=max(1, n // 262144)).select(
        (F.col("id") / grid.cols).cast("long").alias("row"),
        (F.col("id") % grid.cols).alias("col"),
    )
    ldf = F.broadcast(spark.createDataFrame(
        lines, "it int, ls double, li double, perp double, sd double, sx double, sy double"
    ))
    bdf = F.broadcast(spark.createDataFrame(bands, "it int, p long, y double"))
    pli = F.col("row").cast("double") - F.col("perp") * F.col("col").cast("double")
    ix = (pli - F.col("li")) / F.col("sd")
    iy = F.col("ls") * ix - F.col("li")
    p_raw = F.sqrt((ix - F.col("sx")) ** 2 + (iy - F.col("sy")) ** 2).cast("long")
    p = F.greatest(F.lit(0), F.least(F.lit(diag - 1).cast("long"), p_raw))
    return (
        cells.crossJoin(ldf)
        .withColumn("p", p)
        .join(bdf, ["it", "p"])
        .groupBy("row", "col")
        .agg((F.sum("y") / F.lit(math.sqrt(float(iterations)))).alias("value"))
    )


def turning_bands_oracle_sql(
    grid: GridSpec, *, range_dist: float, iterations: int, seed: int = 1
) -> str:
    """DuckDB mirror: identical band/line literals + identical projection
    arithmetic (trunc before the BIGINT cast — DuckDB's cast rounds)."""
    lines, bands, diag = _tbs_setup(
        grid, range_dist=range_dist, iterations=iterations, seed=seed
    )
    lv = ", ".join(
        f"({it}, {ls!r}, {li!r}, {pp!r}, {sd!r}, {sx!r}, {sy!r})"
        for it, ls, li, pp, sd, sx, sy in lines
    )
    bv = ", ".join(f"({it}, {p}, {y!r})" for it, p, y in bands)
    return f"""
WITH cells AS (
  SELECT CAST(floor(i / {grid.cols}) AS BIGINT) AS row,
         CAST(i % {grid.cols} AS BIGINT) AS col
  FROM range({grid.rows * grid.cols}) t(i)
),
lines AS (SELECT * FROM (VALUES {lv}) AS l(it, ls, li, perp, sd, sx, sy)),
bands AS (SELECT * FROM (VALUES {bv}) AS b(it, p, y)),
proj AS (
  SELECT c.row, c.col, l.it,
         greatest(0, least({diag - 1}, CAST(trunc(sqrt(
           ((((CAST(c.row AS DOUBLE) - l.perp * CAST(c.col AS DOUBLE)) - l.li) / l.sd) - l.sx)
           * ((((CAST(c.row AS DOUBLE) - l.perp * CAST(c.col AS DOUBLE)) - l.li) / l.sd) - l.sx)
           + ((l.ls * (((CAST(c.row AS DOUBLE) - l.perp * CAST(c.col AS DOUBLE)) - l.li) / l.sd) - l.li) - l.sy)
           * ((l.ls * (((CAST(c.row AS DOUBLE) - l.perp * CAST(c.col AS DOUBLE)) - l.li) / l.sd) - l.li) - l.sy)
         )) AS BIGINT))) AS p
  FROM cells c CROSS JOIN lines l
)
SELECT pr.row, pr.col, sum(b.y) / {math.sqrt(float(iterations))!r} AS value
FROM proj pr JOIN bands b ON b.it = pr.it AND b.p = pr.p
GROUP BY pr.row, pr.col
"""
