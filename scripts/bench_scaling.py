"""Scaling-efficiency evidence for the north rule (>= 0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels (local[N] vs local[4N]) on identical
input; we report throughput at both plus efficiency

    eff = (T_N / T_4N) / 4      (1.0 = perfect linear scaling)

Measurement protocol (storm-aware, round 2):
  The guest kernel intermittently enters storms of 40-86% SYSTEM time
  during multi-threaded JVM runs (mmap/madvise churn; confirmed by
  /proc/stat sampling — see BENCH/BASELINE.md). Storm frequency grows with
  thread count, so storms systematically penalize the 4N config and corrupt
  a naive comparison. Every timed run therefore samples /proc/stat around
  the measurement and is DISCARDED (but logged) when the system-time share
  of busy CPU exceeds a threshold — the run measured the kernel, not the
  engine. Additionally:
    - configs ALTERNATE order between rounds (load-history fairness),
    - a cool-down sleep separates measurements (burst throttling),
    - the headline is the per-config minimum over CLEAN rounds,
    - rounds continue until each config has >= min_clean clean
      observations (or a hard cap),
    - input file count >= 8N so the scan fans out at 4N.
  The full round log (including discarded storm rounds) is appended to
  BENCH/BASELINE.md.

  Headline metric: the MEDIAN of per-round PAIRED efficiencies (each round
  runs both configs back-to-back under the same host conditions). Host
  throughput here drifts on a minutes timescale, so min-per-config across
  rounds can pair a lucky small-config run with a different hour's
  large-config run — paired rounds cancel the drift; the per-config
  minimums are still reported for reference.

Usage: python scripts/bench_scaling.py [n_docs] [N] [min_clean] [cooldown_s]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STORM_SYS_SHARE = 0.10   # discard reps with > 10% of busy CPU in the kernel
                         # (clean 32-thread runs here sit at 2-6%; storms
                         # at 15-86% — observed bimodal, so 10% separates)
REPS_PER_SESSION = 2     # timed reps per fresh session; each rep samples its
                         # own /proc/stat window, best clean rep counts
MAX_ROUNDS = 8


def _cpu_sample() -> tuple[float, float]:
    """(busy_jiffies, system_jiffies) aggregated over all CPUs."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    user, nice, system, idle, iowait, irq, softirq, steal = (int(v) for v in f[1:9])
    busy = user + nice + system + irq + softirq + steal
    return float(busy), float(system + irq + softirq)


def run_once(cores: int, geodoc_path: str) -> tuple[float, float]:
    """Best clean rep of one fresh session ->
    (wall_sec, sys_share_of_busy); if no rep is clean, the best rep with
    its (stormy) share so the caller discards it."""
    from bench import geodoc_pipeline
    from whitebox_tools_spark.session import get_spark

    spark = get_spark(app_name=f"wts-scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    # warm-up (JIT, parquet footers, python workers) — not timed
    geodoc_pipeline(spark, geodoc_path).count()
    reps: list[tuple[float, float]] = []
    for _ in range(REPS_PER_SESSION):
        b0, s0 = _cpu_sample()
        t0 = time.time()
        geodoc_pipeline(spark, geodoc_path).count()
        sec = time.time() - t0
        b1, s1 = _cpu_sample()
        reps.append((sec, (s1 - s0) / max(b1 - b0, 1.0)))
    spark.stop()
    clean = [r for r in reps if r[1] <= STORM_SYS_SHARE]
    return min(clean) if clean else min(reps)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    min_clean = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cooldown = int(sys.argv[4]) if len(sys.argv) > 4 else 45

    from whitebox_tools_spark.datagen import write_geodocs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    chunk = max(10_000, n_docs // (8 * n))
    geodoc_path = os.path.join(repo, ".cache", f"geodocs_scale_{n_docs}_{chunk}")
    write_geodocs(geodoc_path, n_docs, seed=42, chunk=chunk)

    clean: dict[int, list[float]] = {n: [], 4 * n: []}
    pair_effs: list[float] = []
    log_rows: list[str] = []
    for r in range(MAX_ROUNDS):
        if len(pair_effs) >= min_clean:
            break
        round_clean: dict[int, float] = {}
        for cores in (4 * n, n) if r % 2 == 0 else (n, 4 * n):
            sec, share = run_once(cores, geodoc_path)
            stormy = share > STORM_SYS_SHARE
            verdict = "STORM(discard)" if stormy else "clean"
            if not stormy:
                clean[cores].append(sec)
                round_clean[cores] = sec
            row = (f"| r{r} | local[{cores}] | {sec:.2f}s | sys {share:.0%} "
                   f"| {verdict} |")
            log_rows.append(row)
            print(row, flush=True)
            time.sleep(cooldown)
        if n in round_clean and 4 * n in round_clean:
            e = (round_clean[n] / round_clean[4 * n]) / 4.0
            pair_effs.append(e)
            log_rows.append(f"| r{r} | paired efficiency | {e:.2f} | | |")
            print(f"round {r} paired efficiency: {e:.2f}", flush=True)

    if not pair_effs:
        print("no round produced a clean pair; rerun", file=sys.stderr)
        sys.exit(1)
    import statistics

    eff = statistics.median(pair_effs)
    t_n = min(clean[n])
    t_4n = min(clean[4 * n])
    thr_n = n_docs / t_n
    thr_4n = n_docs / t_4n

    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    line = (
        f"| {stamp} | {n_docs} | local[{n}] {t_n:.2f}s ({thr_n:,.0f} docs/s) "
        f"| local[{4*n}] {t_4n:.2f}s ({thr_4n:,.0f} docs/s) | {eff:.2f} |\n"
    )
    path = os.path.join(repo, "BENCH", "BASELINE.md")
    with open(path, "a") as fh:
        fh.write(line)
        fh.write(
            f"\nRound log {stamp} (storm-aware protocol, sys-share threshold "
            f"{STORM_SYS_SHARE:.0%}; headline = median of paired-round "
            f"efficiencies {['%.2f' % e for e in pair_effs]}):\n\n"
        )
        fh.write("| round | config | wall | kernel share | verdict |\n")
        fh.write("|---|---|---|---|---|\n")
        fh.write("\n".join(log_rows) + "\n")
    print(line.strip())
    print(f"scaling_efficiency={eff:.3f} (target >= 0.8, median of "
          f"{len(pair_effs)} paired rounds: {[round(e, 2) for e in pair_effs]})")


if __name__ == "__main__":
    main()
