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





# --------------------------------------------------------------------------
# Second decade (r4 review item #4): a 10x probe cannot distinguish n·log n
# from n^1.3 — for the operators whose cost is candidate-pair-driven (the
# dedup/LSH/substring family) a second decade is needed. /root/testdata
# stops at sf0.1, so the third point is SYNTHESIZED from sf0.1: 10 copies of
# documents/embeddings with disjoint id ranges, each copy's text re-tokened
# (every token prefixed c{k}) and each copy's embeddings dim-rotated by k —
# within-copy duplicate/similarity structure is preserved exactly (shingle
# sets and dot products are permutation/prefix-invariant within a copy)
# while cross-copy collisions are scrambled away, so candidate-pair density
# per document stays constant as the corpus grows 10x — the same property a
# real crawl decade has. Writes only documents+embeddings, so only queries
# reading those tables are probed.

# the candidate-pair-driven core (the operators whose 100 TB cost model is
# pair density, where one decade cannot separate n·log n from n^1.3)
_FAMILY = (
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_substring_ngrams",
    "dedup_cluster_components",
    "dedup_embedding_cosine_lsh",
    "dedup_embedding_cosine_lsh_adaptive",
)


def synth_decade(spark, src_sf: str, out_dir: str, factor: int = 10) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src_sf}/documents.parquet")
    emb = spark.read.parquet(f"{src_sf}/embeddings.parquet")
    doc_parts = []
    emb_parts = []
    for k in range(factor):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(emb)
            continue
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000).alias("doc_id"),
                F.regexp_replace("text", r"(^|\s)", f"$1c{k}").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + k * 10_000).alias("vec_id"),
                F.expr(
                    f"transform(sequence(0, 63), i -> element_at(embedding, ((i + {k}) % 64) + 1))"
                ).cast("array<float>").alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionAll(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionAll(p)
    d.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def decade2(out_path: str) -> None:
    import math
    import shutil
    import tempfile

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all

    spark = get_spark(app_name="scaleprobe2", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    synth = tempfile.mkdtemp(prefix="probe_sfdoc1_")
    try:
        synth_decade(spark, SF_BIG, synth)

        def run(fn, sf: str, n_timed: int = 2, warm: bool = True) -> float:
            if warm:
                fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(n_timed):
                t = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t)
            return best

        rows = []
        for name in _FAMILY:
            if name not in reg:
                continue
            fn = reg[name].fn
            t1 = run(fn, SF_SMALL)
            t2 = run(fn, SF_BIG)
            # the top point is warm best-of-2 like the lower decades: a cold
            # single-shot measurement there swung 2-4x across runs (page
            # cache, first-shuffle materialization, heap growth to Xmx, AQE
            # stats of the freshly written synth files all land in it), which
            # is noise in exactly the decade the probe exists to read
            t3 = run(fn, synth)
            r12, r23 = t2 / max(t1, 1e-9), t3 / max(t2, 1e-9)
            # effective exponent over the upper decade: t ~ n^e => e = log10(r)
            e23 = math.log10(max(r23, 1e-9))
            rows.append((name, t1, t2, t3, r12, r23, e23))
            print(
                f"{name:34s} {t1:6.2f}s {t2:6.2f}s {t3:6.2f}s  "
                f"x{r12:.2f} x{r23:.2f}  e={e23:.2f}",
                flush=True,
            )
        rows.sort(key=lambda r: -r[5])
        lines = [
            "# Scaling probe, two decades — sf0.01 -> sf0.1 -> synth-10x(sf0.1)",
            "",
            "Third point: 10 disjoint re-tokened/dim-rotated copies of the",
            "sf0.1 documents+embeddings (see tools/scaleprobe.py::synth_decade",
            "— within-copy dup structure preserved, cross-copy collisions",
            "scrambled, so candidate-pair density per doc is scale-invariant,",
            "like a real crawl decade). Best-of-2 steady-state seconds after a",
            "warm pass, one local[32] JVM. The UPPER-decade ratio is the",
            "honest one (the lower decade is fixed-overhead-dominated at these",
            "sizes); e = log10(upper ratio) is the effective scaling exponent",
            "over that decade — e <= ~1.1 reads as linear-with-overhead,",
            "anything approaching 2 would be quadratic candidate blowup.",
            "",
            "| query | sf0.01 (s) | sf0.1 (s) | synth-1.0 (s) | x lower | x upper | e(upper) |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, t1, t2, t3, r12, r23, e23 in rows:
            lines.append(
                f"| {name} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {r12:.2f}x | {r23:.2f}x | {e23:.2f} |"
            )
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", out_path, flush=True)
    finally:
        shutil.rmtree(synth, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--decade2":
        decade2(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r05.md")
    else:
        main()
