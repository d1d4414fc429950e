#!/usr/bin/env python
"""Scaling probe: how does each registered query's wall time grow when the
data grows 10× (sf0.01 → sf0.1)?

A query whose plan is scale-shaped (keyed shuffles, bounded broadcasts,
map-side combines) should grow sub-linearly here, because at these sizes
fixed overhead (plan, task launch, JIT) dominates; anything growing
SUPER-linearly at a 10× step is a red flag for the 1000× step to a real
cluster. The known-quadratic contract (`dedup_embedding_cosine_exact`) is
expected to stand out — that is the probe working, not failing.

Usage: python tools/scaleprobe.py [out.md]
Writes a markdown report (default SCALING_r04.md) sorted by ratio.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r04.md"
    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all

    spark = get_spark(app_name="scaleprobe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def run(fn, sf: str) -> float:
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t)
        return best

    rows = []
    for name, spec in sorted(reg.items()):
        try:
            t_small = run(spec.fn, SF_SMALL)
            t_big = run(spec.fn, SF_BIG)
            rows.append((name, t_small, t_big, t_big / max(t_small, 1e-9)))
            print(f"{name:40s} {t_small:6.2f}s -> {t_big:6.2f}s  x{t_big / max(t_small, 1e-9):.2f}", flush=True)
        except Exception as ex:  # pragma: no cover - report, don't die
            print(f"{name:40s} ERROR {str(ex)[:80]}", flush=True)

    rows.sort(key=lambda r: -r[3])
    lines = [
        "# Scaling probe — wall time at sf0.01 vs sf0.1 (10× data)",
        "",
        "Per query: best-of-2 steady-state wall seconds after one warm pass,",
        "single local[32] JVM. Ratio = t(sf0.1)/t(sf0.01); at these sizes",
        "fixed overhead dominates, so scale-shaped plans sit well below 10×.",
        "`dedup_embedding_cosine_exact` is quadratic BY CONTRACT (its",
        "documented role is the exact baseline the LSH twin is measured",
        "against) and is expected to top this table.",
        "",
        "| query | sf0.01 (s) | sf0.1 (s) | ratio (10× data) |",
        "|---|---|---|---|",
    ]
    for name, a, b, r in rows:
        lines.append(f"| {name} | {a:.2f} | {b:.2f} | {r:.2f}× |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
