"""Scaling-efficiency evidence for the north rule (>= 0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels (local[N] vs local[4N]) on identical
input; we report throughput at both plus efficiency

    eff = (T_N / T_4N) / 4      (1.0 = perfect linear scaling)

Measurement protocol: the sandbox host throttles sustained CPU (observed:
per-core throughput halves after ~minutes of full load), so a naive
"N then 4N" ordering systematically penalizes whichever config runs second.
We therefore ALTERNATE configs over `runs` rounds with a cool-down sleep
between measurements and report the MINIMUM wall time per config (the
least-throttled observation of each). Input file granularity is >= 8N
files so the scan/decode stage can fan out at 4N.

Usage: python scripts/bench_scaling.py [n_docs] [N] [rounds] [cooldown_s]
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
    # warm-up (JIT, parquet footers, python workers) — not timed
    geodoc_pipeline(spark, geodoc_path).count()
    t0 = time.time()
    geodoc_pipeline(spark, geodoc_path).count()
    sec = time.time() - t0
    spark.stop()
    return sec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cooldown = int(sys.argv[4]) if len(sys.argv) > 4 else 60

    from whitebox_tools_spark.datagen import write_geodocs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    chunk = max(10_000, n_docs // (8 * n))
    geodoc_path = os.path.join(repo, ".cache", f"geodocs_scale_{n_docs}_{chunk}")
    write_geodocs(geodoc_path, n_docs, seed=42, chunk=chunk)

    times: dict[int, list[float]] = {n: [], 4 * n: []}
    for r in range(rounds):
        for cores in (4 * n, n) if r % 2 == 0 else (n, 4 * n):
            sec = run_once(cores, geodoc_path)
            times[cores].append(sec)
            print(f"round {r} local[{cores}]: {sec:.2f}s", flush=True)
            time.sleep(cooldown)
    t_n = min(times[n])
    t_4n = min(times[4 * n])
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
                "Protocol: alternating measurement order + cool-downs + "
                "per-config minimum, because the sandbox host throttles "
                "sustained CPU (a naive sequential comparison is corrupted "
                "by load history; see scripts/bench_scaling.py).\n\n"
                "| when | docs | N cores | 4N cores | scaling eff |\n"
                "|---|---|---|---|---|\n"
            )
    with open(path, "a") as fh:
        fh.write(line)
    print(line.strip())
    print(f"scaling_efficiency={eff:.3f} (target >= 0.8)")


if __name__ == "__main__":
    main()
