#!/usr/bin/env python
"""Interleaved A/B micro-bench for registered queries — the round's noisy-host
measurement discipline (BENCH_AB_r11.md; spark_optimization_guide §1).

The sandbox host shows steal time exceeding user time with ~40x swings on
identical CPU work, so absolute medians are unusable mid-round. This harness
times query callables interleaved (variant A, then B, then A, ...) within ONE
session and reports the MIN per variant — the min is the steal-robust
statistic (a stall can only inflate a rep, never deflate it).

Usage:
  python tools/abbench.py q01_pricing_summary dedup_minhash_lsh ... [--reps N]
    times registered queries (min/median over N reps, default 5)
Library use:
  from tools.abbench import ab
  ab({"A": lambda spark: df_a, "B": lambda spark: df_b}, reps=5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ab(variants: dict, spark=None, reps: int = 5, warm: int = 1) -> dict:
    """variants: name -> (spark -> DataFrame). Returns name -> list of secs.
    Interleaves reps across variants; prints min/median per variant."""
    from pg2parquet_spark.session import get_spark

    spark = spark or get_spark(app_name="abbench")
    times: dict[str, list[float]] = {n: [] for n in variants}
    for n, fn in variants.items():
        for _ in range(warm):
            _noop(fn(spark))
    for r in range(reps):
        for n, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{n}:rep{r}")
            t0 = time.perf_counter()
            _noop(fn(spark))
            times[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for n, ts in times.items():
        s = sorted(ts)
        print(
            f"{n:42s} min={s[0]:7.3f} med={s[len(s)//2]:7.3f} "
            f"max={s[-1]:7.3f} n={len(s)} loadavg={os.getloadavg()[0]:.1f}"
        )
    return times


def main() -> None:
    argv = sys.argv[1:]
    reps = 5
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--reps"):
            # accept both --reps=N and --reps N (r12 ADVICE: the usage
            # string advertised the space form but only = parsed)
            if "=" in a:
                reps = int(a.split("=", 1)[1])
            else:
                i += 1
                reps = int(argv[i])
        else:
            args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg2parquet_spark.registry import load_all

    reg = load_all()
    variants = {n: (lambda spark, f=reg[n].fn: f(spark, sf_dir)) for n in args}
    ab(variants, reps=reps)


if __name__ == "__main__":
    main()
