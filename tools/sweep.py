#!/usr/bin/env python
"""Full-registry noop-sink timing sweep — the 'optimize every operator'
ranking artifact (r12 VERDICT #6: the sweep must be committed, not live in
/tmp). One pass over every registered query at the given SF, each timed
against the noop sink (guide §1.4), written as one JSON file.

Numbers are COLD and contended by the sweep itself (up to 20× inflation was
measured in r12 — see OPTIMIZATION_r12.md); they rank operators for warm
min-of-N follow-up probes, they are not benchmarks.

Usage: SPARK_GRAFT_SF_DIR=... python tools/sweep.py out.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "sweep.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg2parquet_spark.registry import load_all
    from pg2parquet_spark.session import get_spark

    spark = get_spark(app_name="pg2parquet_sweep")
    reg = load_all()
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(reg):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            df = reg[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)
    payload = {
        "sf_dir": sf_dir,
        "loadavg": os.getloadavg(),
        "n_ok": len(times),
        "n_err": len(errors),
        "times_sec_cold_contended": dict(
            sorted(times.items(), key=lambda kv: -kv[1])
        ),
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}: {len(times)} ok, {len(errors)} errors")
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {sec:8.2f}  {name}")


if __name__ == "__main__":
    main()
