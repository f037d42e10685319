"""Scaling-efficiency evidence for the north rule (>= 0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels (local[N] vs local[4N]) on identical
input; we report throughput at both plus efficiency

    eff = (T_N / T_4N) / 4      (1.0 = perfect linear scaling)

Each measurement uses a fresh SparkSession (JVM reused; spark context
restarted) with shuffle partitions sized to the core count. Results are
appended to BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_docs] [N] [runs]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cores: int, geodoc_path: str) -> float:
    from bench import geodoc_pipeline
    from whitebox_tools_spark.session import get_spark

    spark = get_spark(app_name=f"wts-scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    # warm-up (JIT, parquet footer cache) — not timed
    geodoc_pipeline(spark, geodoc_path).count()
    t0 = time.time()
    geodoc_pipeline(spark, geodoc_path).count()
    sec = time.time() - t0
    spark.stop()
    return sec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from whitebox_tools_spark.datagen import write_geodocs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    geodoc_path = os.path.join(repo, ".cache", f"geodocs_bench_{n_docs}")
    write_geodocs(geodoc_path, n_docs, seed=42)

    t_n = min(run_once(n, geodoc_path) for _ in range(runs))
    t_4n = min(run_once(4 * n, geodoc_path) for _ in range(runs))
    eff = (t_n / t_4n) / 4.0
    thr_n = n_docs / t_n
    thr_4n = n_docs / t_4n

    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    line = (
        f"| {stamp} | {n_docs} | local[{n}] {t_n:.2f}s ({thr_n:,.0f} docs/s) "
        f"| local[{4*n}] {t_4n:.2f}s ({thr_4n:,.0f} docs/s) | {eff:.2f} |\n"
    )
    path = os.path.join(repo, "BENCH", "BASELINE.md")
    if not os.path.exists(path):
        with open(path, "w") as fh:
            fh.write(
                "# BENCH/BASELINE — throughput + scaling efficiency\n\n"
                "Geodoc spatial-join + tiling pipeline (decode -> PIP "
                "cell-cover broadcast join -> exact winding refine -> tile "
                "assignment -> tile counts) on the deterministic interleaved "
                "document table, same input at two parallelism levels "
                "(sandbox proxy for N vs 4N executors per the north rule; "
                "efficiency = (T_N / T_4N) / 4, target >= 0.8).\n\n"
                "| when | docs | N cores | 4N cores | scaling eff |\n"
                "|---|---|---|---|---|\n"
            )
    with open(path, "a") as fh:
        fh.write(line)
    print(line.strip())
    print(f"scaling_efficiency={eff:.3f} (target >= 0.8)")


if __name__ == "__main__":
    main()
