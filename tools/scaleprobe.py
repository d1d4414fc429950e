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
import tempfile
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
    "dedup_embedding_cosine_lsh_fixed",
)


def synth_decade(
    spark, src_sf: str, out_dir: str, factor: int = 10, tables=("documents", "embeddings")
) -> None:
    from pyspark.sql import functions as F

    doc_parts = []
    emb_parts = []
    docs = spark.read.parquet(f"{src_sf}/documents.parquet") if "documents" in tables else None
    emb = spark.read.parquet(f"{src_sf}/embeddings.parquet") if "embeddings" in tables else None
    for k in range(factor):
        if k == 0:
            if docs is not None:
                doc_parts.append(docs)
            if emb is not None:
                emb_parts.append(emb)
            continue
        if docs is not None:
            doc_parts.append(
                docs.select(
                    (F.col("doc_id") + k * 10_000).alias("doc_id"),
                    F.regexp_replace("text", r"(^|\s)", f"$1c{k}").alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        if emb is not None:
            # dim-rotation alone wraps at dim=64: copies k and k+64 would be
            # BIT-IDENTICAL vectors (r8 review finding — a factor-300 corpus
            # carried ~4-5 exact clones per rotation class, ~1.1M artifact
            # cos=1.0 pairs, violating the constant-pair-density premise the
            # decade probes rest on). Beyond the first rotation cycle, apply
            # a deterministic per-(cycle, dim) SIGN-FLIP pattern: signs
            # preserve norms and within-copy cosines exactly (s_i^2 = 1) but
            # scramble cross-copy cosines between equal rotation classes
            # (half the products flip sign -> E[dot] ~ 0). Identity for
            # k < 64 keeps the committed factor<=30 corpora byte-stable.
            # flip mask: (31·i + 17·cyc) mod 64 < 32 — distinct for every
            # cycle pair (17·Δcyc mod 64 ≠ 0 for 0 < Δcyc < 64), ~half the
            # dims flip between any two cycles of the same rotation class
            cyc = k // 64
            if cyc == 0:
                rot = f"element_at(embedding, ((i + {k}) % 64) + 1)"
            else:
                rot = (
                    f"element_at(embedding, ((i + {k}) % 64) + 1) * "
                    f"(CASE WHEN pmod(i * 31 + {cyc} * 17, 64) < 32 "
                    "THEN CAST(1.0 AS FLOAT) ELSE CAST(-1.0 AS FLOAT) END)"
                )
            emb_parts.append(
                emb.select(
                    (F.col("vec_id") + k * 10_000).alias("vec_id"),
                    F.expr(
                        f"transform(sequence(0, 63), i -> {rot})"
                    ).cast("array<float>").alias("embedding"),
                    "label",
                )
            )
    for parts, name in ((doc_parts, "documents"), (emb_parts, "embeddings")):
        if not parts:
            continue
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def synth_dir(spark, factor: int, tables=("documents", "embeddings")) -> str:
    """Deterministic synth corpus at a FIXED path keyed by (source sf,
    factor, tables), written once and REUSED across probe runs (r6 review:
    per-run regeneration gave the top decade 2-3x cross-run error bars from
    fresh file layout / page-cache state). A DONE marker gates completeness;
    delete the dir to force a rebuild."""
    import hashlib

    # r7 ADVICE: the key must change whenever the GENERATOR changes, not
    # just its parameters — otherwise editing synth_decade silently reuses
    # stale /tmp corpora from older code and corrupts the measurements the
    # reuse exists to stabilize. Bump the version on any synth_decade edit.
    # v2 (r8 review): sign-flip pattern beyond the first rotation cycle —
    # factors <= 64 are byte-identical to v1, factor > 64 corpora change
    gen_version = "r8-retoken-dimrot-signflip-v2"
    key = f"{gen_version}|{SF_BIG}|x{factor}|{','.join(sorted(tables))}"
    h = hashlib.sha256(key.encode()).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(), f"pg2parquet_synth_x{factor}_{h}"
    )
    marker = os.path.join(base, "_SYNTH_DONE")
    if not os.path.exists(marker):
        synth_decade(spark, SF_BIG, base, factor=factor, tables=tables)
        with open(marker, "w") as f:
            f.write(key + "\n")
    return base


def _run_steady(spark, fn, sf: str, n_timed: int = 3, warm: bool = True) -> float:
    """Warm once, report best-of-n steady-state wall seconds."""
    if warm:
        fn(spark, sf).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n_timed):
        t = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t)
    return best


def decade2(out_path: str) -> None:
    import math

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all

    spark = get_spark(app_name="scaleprobe2", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    # fixed, reused synth corpus (r6 review: per-run regeneration put 2-3x
    # cross-run error bars on exactly the decade the probe exists to read)
    synth = synth_dir(spark, factor=10)

    rows = []
    skipped = []
    for name in _FAMILY:
        if name not in reg:
            continue
        fn = reg[name].fn
        t1 = _run_steady(spark, fn, SF_SMALL)
        t2 = _run_steady(spark, fn, SF_BIG)
        if name == "dedup_embedding_cosine_lsh_fixed":
            # quadratic by measured contract (SCALING_r05.md, e=1.31 over
            # 2k->20k): at the 60k-vector top point one pass is ~10 min of
            # pure in-bucket pair blowup — the cost model is on record, so
            # the demoted baseline stops at the lower decade (same policy
            # as embdial below)
            skipped.append((name, t1, t2))
            print(f"{name:34s} {t1:6.2f}s {t2:6.2f}s  (top point skipped: "
                  "quadratic by measured contract)", flush=True)
            continue
        # the top point is warm best-of-3 like the lower decades: a cold
        # single-shot measurement there swung 2-4x across runs (page
        # cache, first-shuffle materialization, heap growth to Xmx, AQE
        # stats all land in it)
        t3 = _run_steady(spark, fn, synth)
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
        "like a real crawl decade), written ONCE to a fixed keyed path and",
        "reused across runs (r6 fix — per-run regeneration caused 2-3x",
        "cross-run error bars at the top point). Best-of-3 steady-state",
        "seconds after a warm pass, one local[32] JVM. The UPPER-decade",
        "ratio is the honest one (the lower decade is fixed-overhead-",
        "dominated at these sizes); e = log10(upper ratio) is the effective",
        "scaling exponent over that decade — e <= ~1.1 reads as",
        "linear-with-overhead, anything approaching 2 would be quadratic",
        "candidate blowup.",
        "",
        "| query | sf0.01 (s) | sf0.1 (s) | synth-1.0 (s) | x lower | x upper | e(upper) |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t1, t2, t3, r12, r23, e23 in rows:
        lines.append(
            f"| {name} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {r12:.2f}x | {r23:.2f}x | {e23:.2f} |"
        )
    for name, t1, t2 in skipped:
        lines.append(
            f"| {name} | {t1:.2f} | {t2:.2f} | (skipped — quadratic by "
            f"measured contract, SCALING_r05.md) | {t2 / max(t1, 1e-9):.2f}x | — | — |"
        )
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)


# --------------------------------------------------------------------------
# Adaptive-LSH width-dial probe (r7): the r6 review's acceptance bar for the
# promoted corpus-adaptive dedup_embedding_cosine_lsh is a probe point PAST
# the old _ADAPT_MAX_BITS=10 ceiling (~24k vectors) with e(upper) < 1.15.
# Probes the embeddings-only synth corpus at 3x sf0.1 (6k vectors — 7-bit
# keys) and 30x (60k vectors — 11-bit keys, past the old ceiling) and
# reports the decade exponent. The threshold chain pins occupancy to the
# (23.4, 46.9] band and the fixed 48-mask probe budget pins per-vector
# candidate work, so the honest expectation is e ~= 1; the fixed-plane
# baseline is probed alongside for the contrast (its 4-bit occupancy grows
# 10x over the same decade).
def embdial(out_path: str) -> None:
    import math

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all

    spark = get_spark(app_name="embdial", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    lo = synth_dir(spark, factor=3, tables=("embeddings",))   # 6,000 vectors
    hi = synth_dir(spark, factor=30, tables=("embeddings",))  # 60,000 vectors
    lines = [
        "# Adaptive-LSH width dial, past the old 24k ceiling",
        "",
        "Embeddings-only synth corpora from sf0.1 (2,000 vectors): 3x = 6,000",
        "vectors (7-bit keys) and 30x = 60,000 vectors (11-bit keys — past",
        "the pre-r7 _ADAPT_MAX_BITS=10 / 24k-vector ceiling). Fixed keyed",
        "synth paths, reused across runs; best-of-3 steady-state after a",
        "warm pass. e = log10(t_hi/t_lo) over the 10x decade. The adaptive",
        "dial pins occupancy (threshold chain) AND probe count (48-mask",
        "budget), so per-vector candidate work is ~flat; the fixed-plane",
        "baseline's 4-bit occupancy grows 10x over the same decade.",
        "",
        "| query | 6k vecs (s) | 60k vecs (s) | ratio | e(upper) |",
        "|---|---|---|---|---|",
    ]
    for name, probe_hi in (
        ("dedup_embedding_cosine_lsh", True),
        # the fixed-plane baseline is probed at the LOW point only: its
        # candidate count is quadratic by measurement (SCALING_r05.md,
        # e=1.31 over 2k->20k) and at 60k vectors a single pass is ~10 min
        # of pure in-bucket pair blowup — the cost model is already on
        # record; re-paying it per probe run adds no information
        ("dedup_embedding_cosine_lsh_fixed", False),
    ):
        fn = reg[name].fn
        t_lo = _run_steady(spark, fn, lo)
        if not probe_hi:
            print(f"{name:36s} {t_lo:6.2f}s   (hi point skipped: quadratic "
                  "by measured contract)", flush=True)
            lines.append(f"| {name} | {t_lo:.2f} | (skipped — quadratic by "
                         "measured contract, SCALING_r05.md) | — | — |")
            continue
        t_hi = _run_steady(spark, fn, hi)
        r = t_hi / max(t_lo, 1e-9)
        e = math.log10(max(r, 1e-9))
        print(f"{name:36s} {t_lo:6.2f}s {t_hi:7.2f}s  x{r:.2f}  e={e:.2f}", flush=True)
        lines.append(f"| {name} | {t_lo:.2f} | {t_hi:.2f} | {r:.2f}x | {e:.2f} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)


# --------------------------------------------------------------------------
# Third decade for the adaptive LSH (r7 verdict task #5): the width dial was
# proven to 60k vectors / 11-bit keys; the _ADAPT_BITS_THRESHOLDS tail (13
# and 14 bits) had never executed. Probe 60k (11 bits) -> 600k vectors
# (n > 384000 -> the full 14-bit arm) and report e over that decade. The
# 600k corpus is 300 disjoint dim-rotated copies of the sf0.1 embeddings —
# same construction as embdial, one decade up.
def embdial3(out_path: str) -> None:
    import math

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all

    spark = get_spark(app_name="embdial3", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    lo = synth_dir(spark, factor=30, tables=("embeddings",))   # 60,000 / 11 bits
    hi = synth_dir(spark, factor=300, tables=("embeddings",))  # 600,000 / 14 bits
    name = "dedup_embedding_cosine_lsh"
    fn = reg[name].fn
    t_lo = _run_steady(spark, fn, lo)
    t_hi = _run_steady(spark, fn, hi, n_timed=2)
    r = t_hi / max(t_lo, 1e-9)
    e = math.log10(max(r, 1e-9))
    print(f"{name:36s} {t_lo:6.2f}s {t_hi:7.2f}s  x{r:.2f}  e={e:.2f}", flush=True)
    lines = [
        "# Adaptive-LSH width dial, third decade — the 14-bit arm executes",
        "",
        "Embeddings-only synth corpora from sf0.1 (2,000 vectors): 30x =",
        "60,000 vectors (11-bit keys) and 300x = 600,000 vectors (n >",
        "384,000 -> the 14-bit CASE arm, the _ADAPT_BITS_THRESHOLDS tail",
        "that had never executed before this probe). Fixed keyed synth",
        "paths; warm pass then best-of-N steady-state (N=3 lo / N=2 hi).",
        "e = log10(t_hi/t_lo) over the 10x decade; the dial's contract is",
        "e <= ~1.1 (occupancy pinned by the threshold chain, probe count",
        "pinned by the 48-mask budget).",
        "",
        "| query | 60k vecs (s) | 600k vecs (s) | ratio | e(upper) |",
        "|---|---|---|---|---|",
        f"| {name} | {t_lo:.2f} | {t_hi:.2f} | {r:.2f}x | {e:.2f} |",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)



# --------------------------------------------------------------------------
# Planted-pair RECALL at scale for the adaptive embedding LSH (r9, r8
# verdict task #4): the 14-bit arm is timing-probed and hash-green at 600k
# vectors, but hash parity only proves Spark==DuckDB on the same algorithm —
# whether the width dial trades RECALL for the measured speed was never
# checked past sf0.1. The synth corpora make the ground truth analytic: the
# 60k/600k corpora are 30/300 disjoint copies of the sf0.1 embeddings whose
# within-copy cosines are preserved EXACTLY (rotation permutes dims,
# sign-flips square to 1) while cross-copy cosines are scrambled, so the
# planted truth at factor k is k x the 920 exact sf0.1 pairs (cheap to
# compute once) with ids shifted by copy*10_000. Membership at the 0.4
# threshold is stable under fp re-rounding: the nearest-to-threshold planted
# pair sits ~0.01 away, ~5 orders above rotation-induced jitter. Pairs the
# LSH reports are always exact-rescored, so precision is 1.0 by
# construction against the FULL truth; cross-copy finds (pairs the
# scrambling left above threshold) are true positives outside the planted
# denominator and are reported separately, not counted as recall.
_EMB_RECALL_FLOOR = 0.78  # committed sf0.1-family floor 0.80 minus jitter tolerance


def embrecall(out_path: str) -> int:
    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="embrecall", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    lsh = reg["dedup_embedding_cosine_lsh"].fn

    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    shift = 10_000
    rows = []
    # same-metric baseline at the corpus the committed floors were set on
    got01 = {(r.a_id, r.b_id) for r in lsh(spark, SF_BIG).collect()}
    rows.append(("sf0.1 (2k vecs, 5-bit keys)", len(p0), len(got01 & p0), 0, 0,
                 len(got01 & p0) / len(p0)))
    for factor, label in ((30, "60k vecs, 11-bit keys"), (300, "600k vecs, 14-bit keys")):
        d = synth_dir(spark, factor=factor, tables=("embeddings",))
        got = [(r.a_id, r.b_id) for r in lsh(spark, d).collect()]
        hits = cross = fp_flips = 0
        for a, b in got:
            if a // shift == b // shift:
                if (a % shift, b % shift) in p0:
                    hits += 1
                else:
                    fp_flips += 1  # exact-rescored, so only a threshold fp-flip can land here
            else:
                cross += 1
        truth = factor * len(p0)
        rows.append((f"{factor}x ({label})", truth, hits, cross, fp_flips, hits / truth))

    ok = all(r[5] >= _EMB_RECALL_FLOOR for r in rows)
    lines = [
        "# Adaptive embedding LSH — planted-pair recall at scale",
        "",
        "Ground truth per synth point = factor x the exact sf0.1 pair set",
        "(920 pairs at cos >= 0.4), id-shifted per copy; within-copy cosines",
        "are preserved exactly by the rotation/sign-flip construction, and",
        "the nearest planted pair sits ~0.01 from the threshold (5 orders",
        "above fp jitter), so the denominator is exact. LSH output is",
        "exact-rescored -> precision 1.0 vs FULL truth by construction;",
        "cross-copy finds are true positives outside the planted denominator",
        "(reported, not counted). Floor = committed sf0.1-family recall",
        f"floor 0.80 minus tolerance = {_EMB_RECALL_FLOOR}.",
        "",
        "| corpus | planted pairs | recovered | cross-copy finds | threshold fp-flips | recall | >= floor |",
        "|---|---|---|---|---|---|---|",
    ]
    for label, truth, hits, cross, flips, rec in rows:
        mark = "yes" if rec >= _EMB_RECALL_FLOOR else "**NO**"
        lines.append(f"| {label} | {truth} | {hits} | {cross} | {flips} | {rec:.4f} | {mark} |")
        print(f"{label:32s} truth={truth:7d} hits={hits:7d} cross={cross:5d} "
              f"flips={flips:3d} recall={rec:.4f}", flush=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0 if ok else 1


def embrecall2(out_path: str) -> int:
    """Recall-tier vs primary (r9): planted-pair recall AND steady-state
    cost for dedup_embedding_cosine_lsh_recall next to the primary at sf0.1
    and the 60k-vector synth point. Same ground-truth construction as
    embrecall (factor x the 920 exact sf0.1 pairs). The 600k point is
    deliberately NOT probed for the tier: at 14 bits the full H<=2 ball is
    106 masks x 8 tables — several times the primary's candidate work by
    design. The tier's contract is 'recall for bounded super-linear cost',
    and the 60k point plus the closed-form ceiling
    (dedup_embedding_recall_tier_audit) price it."""
    import time as _t

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="embrecall2", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    arms = {
        "primary": reg["dedup_embedding_cosine_lsh"].fn,
        "recall_tier": reg["dedup_embedding_cosine_lsh_recall"].fn,
    }

    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    shift = 10_000
    points = [("sf0.1 (2k vecs, 6-bit keys)", SF_BIG, 1)]
    d60 = synth_dir(spark, factor=30, tables=("embeddings",))
    points.append(("30x (60k vecs, 11-bit keys)", d60, 30))

    rows = []
    for plabel, d, factor in points:
        for arm, fn in arms.items():
            t0 = _t.time()
            got = [(r.a_id, r.b_id) for r in fn(spark, d).collect()]
            warm_s = _t.time() - t0
            t0 = _t.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            steady_s = _t.time() - t0
            hits = cross = 0
            for a, b in got:
                if a // shift == b // shift:
                    if (a % shift, b % shift) in p0:
                        hits += 1
                else:
                    cross += 1
            truth = factor * len(p0)
            rec = hits / truth
            rows.append((plabel, arm, truth, hits, cross, rec, min(warm_s, steady_s)))
            print(f"{plabel:30s} {arm:12s} truth={truth:6d} hits={hits:6d} "
                  f"cross={cross:5d} recall={rec:.4f} t={min(warm_s, steady_s):.1f}s",
                  flush=True)

    # the structural guarantee, enforced on the measurement itself: at every
    # point the tier's recall must be >= the primary's
    by_point: dict = {}
    for plabel, arm, truth, hits, cross, rec, t in rows:
        by_point.setdefault(plabel, {})[arm] = rec
    ok = all(v["recall_tier"] >= v["primary"] for v in by_point.values())

    lines = [
        "# Recall-tier embedding LSH vs primary — planted-pair recall and cost",
        "",
        "Ground truth per point = factor x the 920 exact sf0.1 pairs (same",
        "construction as SCALING_r09_embrecall.md). recall_tier =",
        "dedup_embedding_cosine_lsh_recall: 8 hash tables, full H<=2 probe",
        "ball, candidacy cap 256, occupancy gate at the primary's bound,",
        "pre-score distinct. t = min(collect, noop) steady seconds, one",
        "local[32] JVM.",
        "",
        "| corpus | arm | planted | recovered | cross-copy | recall | t (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for plabel, arm, truth, hits, cross, rec, t in rows:
        lines.append(f"| {plabel} | {arm} | {truth} | {hits} | {cross} | {rec:.4f} | {t:.1f} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0 if ok else 1


def ivfrecall(out_path: str, with_600k: bool = False) -> int:
    """IVF tier vs primary LSH (r9 continuation): planted-pair recall AND
    steady-state cost for dedup_embedding_ivf next to the primary at sf0.1
    and the 60k-vector synth point (the recall_tier's committed numbers
    from SCALING_r09_embrecall2.md complete the three-way comparison
    without re-paying its 158 s run). Same ground-truth construction as
    embrecall. The cell audit rides along so each point's k / max_cell /
    dropped-members triple is recorded next to its recall."""
    import time as _t

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="ivfrecall", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    arms = {
        "primary": reg["dedup_embedding_cosine_lsh"].fn,
        "ivf": reg["dedup_embedding_ivf"].fn,
    }
    audit = reg["dedup_embedding_ivf_cell_audit"].fn

    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    shift = 10_000
    points = [("sf0.1 (2k vecs)", SF_BIG, 1)]
    d60 = synth_dir(spark, factor=30, tables=("embeddings",))
    points.append(("30x (60k vecs)", d60, 30))
    if with_600k:
        d600 = synth_dir(spark, factor=300, tables=("embeddings",))
        points.append(("300x (600k vecs)", d600, 300))

    rows = []
    audits = []
    for plabel, d, factor in points:
        for arm, fn in arms.items():
            if arm == "primary" and factor == 300:
                continue  # its 600k row is committed (SCALING_r09_embrecall.md)
            t0 = _t.time()
            got = [(r.a_id, r.b_id) for r in fn(spark, d).collect()]
            warm_s = _t.time() - t0
            t0 = _t.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            steady_s = _t.time() - t0
            hits = cross = 0
            for a, b in got:
                if a // shift == b // shift:
                    if (a % shift, b % shift) in p0:
                        hits += 1
                else:
                    cross += 1
            truth = factor * len(p0)
            rec = hits / truth
            rows.append((plabel, arm, truth, hits, cross, rec, min(warm_s, steady_s)))
            print(f"{plabel:22s} {arm:8s} truth={truth:6d} hits={hits:6d} "
                  f"cross={cross:6d} recall={rec:.4f} t={min(warm_s, steady_s):.1f}s",
                  flush=True)
        ad = audit(spark, d).collect()[0].asDict()
        audits.append((plabel, ad))
        print(f"{plabel:22s} audit: {ad}", flush=True)

    lines = [
        "# IVF embedding dedup tier vs primary LSH — planted-pair recall and cost",
        "",
        "Ground truth per point = factor x the 920 exact sf0.1 pairs (same",
        "construction as SCALING_r09_embrecall.md). ivf =",
        "dedup_embedding_ivf: sampled-centroid coarse quantizer, corpus-",
        "adaptive k (occupancy band (23.4, 46.9]), nprobe=2 multi-assignment,",
        "cell candidacy cap 192, exact Arrow re-score. recall_tier rows for",
        "the three-way comparison are committed in SCALING_r09_embrecall2.md",
        "(0.8663 @ 13.3s at sf0.1; 0.2272 @ 158.3s at 60k). t = min(collect,",
        "noop) steady seconds, one local[32] JVM.",
        "",
        "| corpus | arm | planted | recovered | cross-copy | recall | t (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for plabel, arm, truth, hits, cross, rec, t in rows:
        lines.append(f"| {plabel} | {arm} | {truth} | {hits} | {cross} | {rec:.4f} | {t:.1f} |")
    lines += ["", "## Cell audits (k / occupancy / cap activity per point)", ""]
    for plabel, ad in audits:
        lines.append("- " + plabel + ": " + ", ".join(f"{k}={v}" for k, v in ad.items()))
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


def ivfdial(out_path: str) -> int:
    """IVF design dials at the 60k-vector point (offline design probe, the
    embdial discipline): (1) nprobe 1/2/4 through the REGISTERED machinery
    (module-constant patch — the kernel and pair build read _IVF_NPROBE at
    plan-build time), recall + steady cost per arm; (2) would Lloyd
    refinement of the sampled centroids buy recall? — evaluated in a
    driver-side numpy replica of the assignment+pair chain (the 60k corpus
    is 30 MiB; this arm prices the DESIGN, not an implementation), same
    planted truth as every embedding recall probe."""
    import time as _t

    import numpy as np

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="ivfdial", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    shift = 10_000
    d60 = synth_dir(spark, factor=30, tables=("embeddings",))
    truth = 30 * len(p0)

    def measure(fn):
        t0 = _t.time()
        got = [(r.a_id, r.b_id) for r in fn(spark, d60).collect()]
        warm = _t.time() - t0
        t0 = _t.time()
        fn(spark, d60).write.format("noop").mode("overwrite").save()
        steady = _t.time() - t0
        hits = sum(
            1 for a, b in got
            if a // shift == b // shift and (a % shift, b % shift) in p0
        )
        cross = sum(1 for a, b in got if a // shift != b // shift)
        return hits, cross, min(warm, steady)

    rows = []
    # nprobe AND cap passed explicitly, matching what a registration at
    # that nprobe would use (cap = 2x the nprobe-widened occupancy band,
    # i.e. 96*nprobe — 192 at the registered primary, 384 at the probe4
    # arm), so the dial characterizes the arm as it would be registered
    # rather than a tighter-capped hybrid (r9 ADVICE).
    for np_ in (1, 2, 4):
        cap_ = 96 * np_
        hits, cross, t = measure(
            lambda s, d: dedup._ivf_pair_build(s, d, nprobe=np_, cap=cap_)
        )
        tag = " (registered)" if np_ == dedup._IVF_NPROBE else ""
        rows.append((f"nprobe={np_} cap={cap_}{tag}",
                     hits, cross, hits / truth, t))
        print(f"nprobe={np_} cap={cap_} hits={hits} cross={cross} "
              f"recall={hits / truth:.4f} t={t:.1f}s", flush=True)

    # ---- Lloyd-refinement arm: numpy replica on the driver --------------
    emb_rows = spark.read.parquet(f"{d60}/embeddings.parquet").select(
        "vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb_rows], dtype=np.int64)
    X = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    k = dedup._IVF_K_BASE * (1 << sum(len(ids) > t for t in dedup._IVF_K_THRESHOLDS))
    seed_mask = ids % dedup._IVF_SEED_MOD == dedup._IVF_SEED_REM
    C = X[seed_mask][:k].copy()

    def assign_top2(C):
        out = np.empty((X.shape[0], 2), dtype=np.int64)
        chunk = 4096
        for s in range(0, X.shape[0], chunk):
            acc = X[s : s + chunk] @ C.T
            top1 = np.argmax(acc, axis=1)
            acc[np.arange(acc.shape[0]), top1] = -np.inf
            top2 = np.argmax(acc, axis=1)
            out[s : s + chunk, 0] = top1
            out[s : s + chunk, 1] = top2
        return out

    def recall_of(C, label):
        a2 = assign_top2(C)
        cells: dict = {}
        for i in range(a2.shape[0]):
            cells.setdefault(a2[i, 0], []).append(i)
            cells.setdefault(a2[i, 1], []).append(i)
        hits = cross = 0
        seen = set()
        for members in cells.values():
            if len(members) < 2:
                continue
            m = np.array(members)
            S = X[m] @ X[m].T
            ii, jj = np.nonzero(S >= dedup._EMB_COS_THRESHOLD)
            for a, b in zip(ii, jj):
                if a >= b:
                    continue
                pa, pb = int(ids[m[a]]), int(ids[m[b]])
                if (pa, pb) in seen:
                    continue
                seen.add((pa, pb))
                if pa // shift == pb // shift:
                    if (pa % shift, pb % shift) in p0:
                        hits += 1
                else:
                    cross += 1
        print(f"{label}: hits={hits} cross={cross} recall={hits / truth:.4f}",
              flush=True)
        return hits, cross

    h0, c0 = recall_of(C, "numpy-replica sampled centroids (sanity vs nprobe=2)")
    for it in (1, 2):
        # one Lloyd step: mean of assigned members per cell (primary
        # assignment only), empty cells keep their old centroid
        a2 = assign_top2(C)
        newC = C.copy()
        for j in range(C.shape[0]):
            members = X[a2[:, 0] == j]
            if len(members):
                newC[j] = members.mean(axis=0)
        C = newC
        h, c = recall_of(C, f"Lloyd iteration {it}")
        rows.append((f"lloyd-{it} (numpy design probe)", h, c, h / truth, float("nan")))
    rows.insert(3, ("numpy sampled (replica sanity)", h0, c0, h0 / truth, float("nan")))

    lines = [
        "# IVF dials at the 60k-vector point — nprobe and Lloyd refinement",
        "",
        "Planted truth = 30 x the 920 exact sf0.1 pairs, as in every",
        "embedding recall probe. nprobe arms run the REGISTERED query with",
        "the module constant patched (same kernel, same caps, same exact",
        "re-score; t = min(collect, noop) steady seconds). Lloyd arms are a",
        "driver-side numpy replica (float64 matmul scoring — it prices the",
        "DESIGN; the replica's sampled-centroid row is the sanity tie to",
        "the registered nprobe=2 arm, modulo matmul-vs-fold fp order).",
        "",
        "| arm | planted hits | cross-copy | recall | t (s) |",
        "|---|---|---|---|---|",
    ]
    for label, h, c, rec, t in rows:
        ts = f"{t:.1f}" if t == t else "n/a (driver numpy)"
        lines.append(f"| {label} | {h} | {c} | {rec:.4f} | {ts} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


# --------------------------------------------------------------------------
# Third decade for the NON-embedding dedup families (r9, r8 verdict task
# #5): minhash, ngram Jaccard, and cluster components were proven to
# synth-1.0 (factor 10, ~50k docs); probe the next full decade, factor 10 ->
# factor 100 (~500k docs), and run the minhash bucket audit at the top
# point. Same synth construction: disjoint re-tokened copies preserve
# within-copy shingle structure, the c{k} prefix scrambles cross-copy
# collisions, so candidate-pair density per document is scale-invariant.
def ivfasym(out_path: str, big_probe: int = 0) -> int:
    """Asymmetric home/probe IVF dial at the 60k-vector point (r10): the
    probe-depth curve P ∈ {4, 8, 16, 32} through the REAL registered
    machinery (dedup._ivf_asym_pair_build — Arrow kernel with_rank, capped
    home/probe windows, pre-distinct, exact re-score), recall against the
    same planted truth as every embedding recall probe (30 copies of the
    sf0.1 exact pair set, id-shifted) and best-of-2 steady cost. The r9
    VERDICT set the floor this dial exists to clear: planted recall >= 0.5
    at the 60k point at <= the recall-tier LSH's measured 158 s. Candidate
    mass is LINEAR in P (N·P·occ ordered rows: 7M/14M/28M/56M at the four
    dials), vs the symmetric arm's quadratic nprobe² — the design headroom
    the asymmetric formulation buys. big_probe > 0 additionally prices that
    P at the 600k point (factor 300), the scale at which the symmetric
    arms' recall collapsed (primary 0.0054, nprobe2 IVF 0.026)."""
    import time as _t

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="ivfasym", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    shift = 10_000

    def measure(fn, d, truth):
        t0 = _t.time()
        got = [(r.a_id, r.b_id) for r in fn(spark, d).collect()]
        warm = _t.time() - t0
        t0 = _t.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        steady = _t.time() - t0
        hits = sum(
            1 for a, b in got
            if a // shift == b // shift and (a % shift, b % shift) in p0
        )
        cross = sum(1 for a, b in got if a // shift != b // shift)
        return hits, cross, len(got), min(warm, steady)

    d60 = synth_dir(spark, factor=30, tables=("embeddings",))
    truth60 = 30 * len(p0)
    rows = []
    for P in (4, 8, 16, 32):
        hits, cross, n, t = measure(
            lambda s, d: dedup._ivf_asym_pair_build(s, d, nprobe=P),
            d60, truth60,
        )
        rows.append((f"60k P={P}", hits, cross, n, hits / truth60, t))
        print(f"60k P={P} hits={hits} cross={cross} pairs={n} "
              f"recall={hits / truth60:.4f} t={t:.1f}s", flush=True)

    big_rows = []
    if big_probe:
        d600 = synth_dir(spark, factor=300, tables=("embeddings",))
        truth600 = 300 * len(p0)
        hits, cross, n, t = measure(
            lambda s, d: dedup._ivf_asym_pair_build(
                s, d, nprobe=big_probe),
            d600, truth600,
        )
        big_rows.append((f"600k P={big_probe}", hits, cross, n,
                         hits / truth600, t))
        print(f"600k P={big_probe} hits={hits} cross={cross} pairs={n} "
              f"recall={hits / truth600:.4f} t={t:.1f}s", flush=True)

    lines = [
        "# Asymmetric home/probe IVF — probe-depth dial at the 60k point (r10)",
        "",
        "Planted truth: 30 (resp. 300) id-shifted copies of the sf0.1 exact",
        "pair set (920 pairs at the contract threshold); recall = within-copy",
        "planted pairs recovered / truth. Cost = best of (first collect,",
        "steady noop write), single local[32] JVM. Arm = the registered",
        "_ivf_asym_pair_build machinery (home cap 96, probe cap 96·P).",
        "Floor being chased (r9 VERDICT): recall >= 0.5 at 60k at <= 158 s.",
        "",
        "| point | planted hits | cross-copy | pairs out | recall | cost (s) |",
        "|---|---|---|---|---|---|",
    ]
    for label, hits, cross, n, rec, t in rows + big_rows:
        lines.append(f"| {label} | {hits} | {cross} | {n} | {rec:.4f} | {t:.1f} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


def ivfgrid(out_path: str) -> int:
    """Driver-side numpy design grid for the asymmetric IVF recall
    frontier at the 60k point (the ivfdial Lloyd-replica discipline: the
    60k corpus is 30 MiB, so the DESIGN sweep runs as driver numpy and
    only the winning arm pays a full through-the-machinery measurement).
    VALIDATED: the replica reproduces the Spark-measured single-table
    points exactly (k=2048 P=16 → 0.2699, P=32 → 0.3858 — same numbers
    ivfasym measured through the registered machinery), because candidate
    CATCH (home(b) ∈ topP(a) ∨ home(a) ∈ topP(b)) is a set property of the
    rankings, which BLAS-vs-fold float differences do not move at this
    corpus (no exact dot ties off the diagonal). Sweeps: probe depth P,
    cell-granularity shift (k, k/2, k/4), and multi-table unions over
    disjoint seed-remainder centroid pools; reports planted recall and
    ordered candidate mass (the cost proxy: sum over cells of
    home_count·probe_count)."""
    import time as _t

    import numpy as np

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="ivfgrid", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    d60 = synth_dir(spark, factor=30, tables=("embeddings",))
    rows = spark.read.parquet(f"{d60}/embeddings.parquet").select(
        "vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    spark.stop()
    N = len(ids)
    shift = 10_000
    id2ix = {int(v): i for i, v in enumerate(ids)}
    tp = [
        (id2ix[c * shift + a], id2ix[c * shift + b])
        for c in range(30) for a, b in p0
        if c * shift + a in id2ix and c * shift + b in id2ix
    ]
    truth_pairs = np.array(tp)
    T = len(truth_pairs)
    base_k = dedup._IVF_K_BASE * (
        1 << sum(N > t for t in dedup._IVF_K_THRESHOLDS))

    def probe_ranks(C, P):
        topP = np.empty((N, P), dtype=np.int32)
        chunk = 4096
        for s in range(0, N, chunk):
            acc = X[s:s + chunk] @ C.T
            part = np.argpartition(-acc, min(P, C.shape[0] - 1), axis=1)[:, :P]
            sc = np.take_along_axis(acc, part, axis=1)
            o = np.argsort(-sc, axis=1)
            topP[s:s + chunk] = np.take_along_axis(part, o, axis=1)
        return topP[:, 0].copy(), topP

    def eval_asym(centroid_sets, P):
        caught = np.zeros(T, dtype=bool)
        mass = 0
        for C in centroid_sets:
            home, topP = probe_ranks(C, P)
            k = C.shape[0]
            hc = np.bincount(home, minlength=k)
            pc = np.bincount(topP.ravel(), minlength=k)
            mass += int((hc * pc).sum())
            a, b = truth_pairs[:, 0], truth_pairs[:, 1]
            ha, hb = home[a], home[b]
            caught |= (topP[a] == hb[:, None]).any(axis=1)
            caught |= (topP[b] == ha[:, None]).any(axis=1)
        return caught.mean(), mass

    def cents(rem, k):
        m = ids % dedup._IVF_SEED_MOD == rem
        return X[m][:k].copy()

    t0 = _t.time()
    lines = [
        "# Asymmetric IVF design grid at the 60k point (driver numpy replica)",
        "",
        f"N={N}, planted truth={T} pairs; base corpus-adaptive k={base_k}.",
        "mass = ordered candidate rows (sum over cells of home·probe counts).",
        "Replica validated against the Spark-measured single-table points",
        "(k=2048 P=16/32 reproduce ivfasym's 0.2699/0.3858 exactly).",
        "",
        "| arm | recall | mass |",
        "|---|---|---|",
    ]
    for kshift in (0, 1, 2):
        k = max(base_k >> kshift, 8)
        C = cents(dedup._IVF_SEED_REM, k)
        for P in (16, 32, 64, 128):
            r, m = eval_asym([C], min(P, k))
            lines.append(f"| single k={k} P={P} | {r:.4f} | {m/1e6:.0f}M |")
            print(f"k={k} P={P}: recall={r:.4f} mass={m/1e6:.0f}M", flush=True)
    for Ptab, rems in ((8, (3, 1)), (8, (3, 1, 5, 7)),
                       (16, (3, 1)), (16, (3, 1, 5, 7)), (32, (3, 1))):
        sets = [cents(r_, base_k) for r_ in rems]
        r, m = eval_asym(sets, Ptab)
        lines.append(f"| multi T={len(rems)} P={Ptab} | {r:.4f} | {m/1e6:.0f}M |")
        print(f"T={len(rems)} P={Ptab}: recall={r:.4f} mass={m/1e6:.0f}M",
              flush=True)
    lines.append("")
    lines.append(f"grid wall: {_t.time()-t0:.0f}s")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


# shared state for the ivfgrid600 fork-pool workers: set by ivfgrid600
# before the pool forks (fork children inherit it copy-on-write — the
# 600k x 64 float64 corpus is ~300 MiB, shipped zero times); module-level
# so the worker functions pickle by reference.
_G600: dict = {}


def _g600_flat_ranks(C):
    """(topPMAX) under the flat quantizer — BLAS chunked."""
    import numpy as np

    X = _G600["X"]
    N = X.shape[0]
    # a quantizer with fewer than PMAX centroids can only rank C.shape[0]
    # cells — size the output to what exists (unreachable at the 600k
    # dials, but the helper is reusable; r11 ADVICE)
    PMAX = min(_G600["PMAX"], C.shape[0])
    topP = np.empty((N, PMAX), dtype=np.int32)
    chunk = 4096
    for s in range(0, N, chunk):
        acc = X[s:s + chunk] @ C.T
        part = np.argpartition(
            -acc, min(PMAX, C.shape[0] - 1), axis=1)[:, :PMAX]
        sc = np.take_along_axis(acc, part, axis=1)
        o = np.argsort(-sc, axis=1)
        topP[s:s + chunk] = np.take_along_axis(part, o, axis=1)
    return topP


def _g600_catch_and_mass(home, topP, P, kcells):
    import numpy as np

    a_ix, b_ix = _G600["a_ix"], _G600["b_ix"]
    t = topP[:, :P]
    hc = np.bincount(home, minlength=kcells)
    pc = np.bincount(t.ravel(), minlength=kcells)
    mass = int((hc * pc).sum())
    ha, hb = home[a_ix], home[b_ix]
    c = (t[a_ix] == hb[:, None]).any(axis=1)
    c |= (t[b_ix] == ha[:, None]).any(axis=1)
    return c, mass


def _g600_flat_one(rem):
    from pg2parquet_spark.operators import dedup

    ids, X, k = _G600["ids"], _G600["X"], _G600["k"]
    m = ids % dedup._IVF_SEED_MOD == rem
    C = X[m][:k].copy()
    topP = _g600_flat_ranks(C)
    home = topP[:, 0].copy()
    c8, m8 = _g600_catch_and_mass(home, topP, 8, k)
    c16, m16 = _g600_catch_and_mass(home, topP, 16, k)
    return c8, m8, c16, m16


def _g600_twolevel_one(args):
    """(rem, k1, k2, c1) -> (catch8, mass8): seeds = the same deterministic
    pool; coarse = first k1 seeds; sub-centroids = first k2 seeds assigned
    to each coarse cell (seed order = vec_id order — the oracle\'s two
    chained ROW_NUMBERs). Query: rank top-c1 coarse, then top-P among the
    selected cells\' subs. Cell key = coarse*k2 + sub."""
    import numpy as np

    from pg2parquet_spark.operators import dedup

    rem, k1, k2, c1 = args
    ids, X, k = _G600["ids"], _G600["X"], _G600["k"]
    PMAX = _G600["PMAX"]
    N = X.shape[0]
    S = X[ids % dedup._IVF_SEED_MOD == rem]
    C1 = S[:k1]
    Sk = S[:k]  # same k-seed budget as the flat quantizer
    sa = np.argmax(Sk @ C1.T, axis=1)
    subC = np.zeros((k1, k2, X.shape[1]))
    subn = np.zeros(k1, dtype=np.int64)
    for j in range(len(Sk)):
        cc = sa[j]
        if subn[cc] < k2:
            subC[cc, subn[cc]] = Sk[j]
            subn[cc] += 1
    valid = np.arange(k2)[None, :] < subn[:, None]  # k1 x k2
    topP = np.empty((N, PMAX), dtype=np.int64)
    chunk = 2048
    for s in range(0, N, chunk):
        Q = X[s:s + chunk]
        cs = Q @ C1.T
        sel = np.argpartition(-cs, min(c1, k1 - 1), axis=1)[:, :c1]
        m0 = Q.shape[0]
        allsc = np.full((m0, c1 * k2), -np.inf)
        for j in range(c1):
            Cj = subC[sel[:, j]]            # m0 x k2 x d
            sc = np.einsum("md,mkd->mk", Q, Cj)
            sc[~valid[sel[:, j]]] = -np.inf
            allsc[:, j * k2:(j + 1) * k2] = sc
        part = np.argpartition(-allsc, PMAX, axis=1)[:, :PMAX]
        psc = np.take_along_axis(allsc, part, axis=1)
        o = np.argsort(-psc, axis=1)
        part = np.take_along_axis(part, o, axis=1)
        # local (j, sub) -> global cell key coarse*k2 + sub
        jj, sub = part // k2, part % k2
        topP[s:s + chunk] = sel[np.arange(m0)[:, None], jj] * k2 + sub
    home = topP[:, 0].copy()
    return _g600_catch_and_mass(home, topP, 8, k1 * k2)


def ivfgrid600(out_path: str) -> int:
    """600k-point design grid (r10 VERDICT #2 + #4): the same driver numpy
    replica discipline as ivfgrid, at the point where the registered mt4
    arm sits at 0.2976 recall — sweeps the multi-table dial T (disjoint
    seed-remainder pools mod 13) × probe depth P, and PRICES the two-level
    coarse quantizer (IMI/residual style, Jégou et al.: assign via k₁
    coarse cells then k₂ sub-cells, so assignment flops per vector fall
    from k to k₁ + c₁·k₂) against the flat quantizer at matched (T, P).
    The replica is validated by reproducing the Spark-measured flat
    T=4 P=8 600k point (0.2976) before any new numbers are read. Catch
    criterion (asym home/probe): home(b) ∈ topP(a) ∨ home(a) ∈ topP(b),
    per table, OR-composed across tables; recall = caught planted pairs /
    planted truth. BLAS scoring is legal here because catch is a SET
    property of the rankings — no exact dot ties off-diagonal at this
    corpus (same argument as ivfgrid, validated r10). Table work fans out
    over a fork pool (the single-process form measured ~20 min/table —
    numpy BLAS holds ~2 threads here, so table-parallelism is the lever)."""
    import multiprocessing as _mp
    import time as _t

    import numpy as np

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    spark = get_spark(app_name="ivfgrid600", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    p0 = {(r.a_id, r.b_id)
          for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    d600 = synth_dir(spark, factor=300, tables=("embeddings",))
    rows = spark.read.parquet(f"{d600}/embeddings.parquet").select(
        "vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    del rows
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    spark.stop()
    N = len(ids)
    shift = 10_000
    id2ix = {int(v): i for i, v in enumerate(ids)}
    tp = [
        (id2ix[c * shift + a], id2ix[c * shift + b])
        for c in range(300) for a, b in p0
        if c * shift + a in id2ix and c * shift + b in id2ix
    ]
    truth_pairs = np.array(tp)
    T = len(truth_pairs)
    k = dedup._IVF_K_BASE * (
        1 << sum(N > t for t in dedup._IVF_K_THRESHOLDS))
    _G600.update(
        ids=ids, X=X, k=k, PMAX=16,
        a_ix=truth_pairs[:, 0], b_ix=truth_pairs[:, 1],
    )

    ALL_REMS = (3, 1, 5, 7, 9, 11, 0, 2, 4, 6, 8, 10)  # 12 disjoint pools

    lines = [
        "# Asymmetric IVF design grid at the 600k point (driver numpy replica)",
        "",
        f"N={N}, planted truth={T} pairs; corpus-adaptive k={k} per table.",
        "mass = ordered candidate rows (sum over cells of home*probe counts),",
        "summed over tables. flops/vec = assignment dot count per vector per",
        "table (the quadratic build cost r10 VERDICT #4 names: flat pays k,",
        "two-level pays k1 + c1*k2).",
        "",
        "## Flat quantizer: T x P frontier (incremental tables)",
        "",
        "| arm | recall | mass | flops/vec/table |",
        "|---|---|---|---|",
    ]
    t0 = _t.time()
    ctx = _mp.get_context("fork")
    with ctx.Pool(min(12, os.cpu_count() or 1)) as pool:
        per_table = pool.map(_g600_flat_one, ALL_REMS)
    caught8 = np.zeros(T, dtype=bool)
    caught16 = np.zeros(T, dtype=bool)
    mass8 = mass16 = 0
    flat_results = {}
    for i, (c8, m8, c16, m16) in enumerate(per_table):
        caught8 |= c8
        caught16 |= c16
        mass8 += m8
        mass16 += m16
        nt = i + 1
        flat_results[(nt, 8)] = (caught8.mean(), mass8)
        flat_results[(nt, 16)] = (caught16.mean(), mass16)
        print(f"flat T={nt}: P=8 r={caught8.mean():.4f} m={mass8/1e6:.0f}M | "
              f"P=16 r={caught16.mean():.4f} m={mass16/1e6:.0f}M", flush=True)
    del per_table
    for nt in (4, 6, 8, 10, 12):
        for P in (8, 16):
            r, m = flat_results[(nt, P)]
            lines.append(f"| flat T={nt} P={P} | {r:.4f} | {m/1e6:.0f}M | {k} |")

    # ---- two-level coarse quantizer (priced at matched T, P) ------------
    lines += [
        "",
        "## Two-level coarse quantizer at matched (T, P=8)",
        "",
        "| arm | recall | mass | flops/vec/table |",
        "|---|---|---|---|",
    ]
    for k1, k2, c1 in ((128, 128, 8), (128, 128, 16), (64, 256, 8)):
        flops = k1 + c1 * k2
        with ctx.Pool(min(8, os.cpu_count() or 1)) as pool:
            per_table = pool.map(
                _g600_twolevel_one,
                [(rem, k1, k2, c1) for rem in ALL_REMS[:8]],
            )
        caught = np.zeros(T, dtype=bool)
        mass = 0
        for nt, (c, m) in enumerate(per_table, start=1):
            caught |= c
            mass += m
            if nt in (4, 6, 8):
                lines.append(
                    f"| 2lvl k1={k1} k2={k2} c1={c1} T={nt} P=8 "
                    f"| {caught.mean():.4f} | {mass/1e6:.0f}M | {flops} |")
                print(f"2lvl {k1}/{k2}/c1={c1} T={nt}: r={caught.mean():.4f} "
                      f"m={mass/1e6:.0f}M", flush=True)
        del per_table

    lines.append("")
    lines.append(f"grid wall: {_t.time()-t0:.0f}s")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


def ivfband800(out_path: str, factor: int = 400) -> int:
    """r10 VERDICT #3 done-criterion: a through-the-machinery cell audit
    ABOVE the old 768k band exit, proving the extended _IVF_K_THRESHOLDS
    keep the (23.4, 46.9] occupancy band. factor=400 → 800k vectors →
    k=32768 under the r11 chain (the r10 chain would have pinned k=16384
    and occupancy 48.8, outside the band and growing). Affordable since
    the r11 k-tiled assignment kernel (the untiled 600k build was
    memory-bound at ~1600 s; this runs one nprobe=2 single-table build).
    ``factor`` picks the band edge under probe: 400 = the 768k edge
    (r11); 780 = 1.56M vectors, just past the 1,536,000 edge where k
    doubles to 65536 (r12)."""
    import time as _t

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup

    spark = get_spark(app_name="ivfband800", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    d800 = synth_dir(spark, factor=factor, tables=("embeddings",))
    n = spark.read.parquet(f"{d800}/embeddings.parquet").count()
    t0 = _t.time()
    row = dedup.dedup_embedding_ivf_cell_audit(spark, d800).collect()[0]
    wall = _t.time() - t0
    d = row.asDict()
    occ = n / d["k"]
    band_lo, band_hi = 375 / 16, 375 / 8
    in_band = band_lo < occ <= band_hi
    lines = [
        "# Occupancy band at the extended _IVF_K_THRESHOLDS edges",
        "",
        f"Corpus: synth factor={factor} = {n} vectors. Audit through the",
        "registered dedup_embedding_ivf_cell_audit machinery (nprobe=2).",
        "",
        "| n | k | n/k (expected occupancy) | band (23.4, 46.9] | n_cells | max_cell | dropped | wall (s) |",
        "|---|---|---|---|---|---|---|---|",
        f"| {n} | {d['k']} | {occ:.1f} | {'IN' if in_band else 'OUT'} "
        f"| {d['n_cells']} | {d['max_cell']} | {d['n_dropped_members']} | {wall:.0f} |",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-2:]), flush=True)
    print("wrote", out_path, flush=True)
    return 0 if in_band else 1


def _g600_dup_one(args):
    """One table of the duplicate-share measurement: (t_index, rem) →
    (home assignment, SAMPLED scored-instance endpoints, exact instance
    count, planted-catch mask). Instances are the exact rows the
    registered cell-block kernel scores for this table (probe×home per
    cell, p≠h, caps ignored — audited inert at these dials); the sample
    keeps an instance iff the hash-bucket of its MIN endpoint is 0, so
    every instance of a given normalized pair is either fully in or fully
    out of the sample — the property the duplicate-share estimator needs."""
    import numpy as np

    from pg2parquet_spark.operators import dedup

    t_index, rem = args
    ids, X, k = _G600["ids"], _G600["X"], _G600["k"]
    inH = _G600["inH"]
    N = X.shape[0]
    m = ids % dedup._IVF_SEED_MOD == rem
    C = X[m][:k].copy()
    topP = _g600_flat_ranks(C)  # N x PMAX (=8), 0-based cell ids
    home = topP[:, 0].copy()
    P = topP.shape[1]

    hc = np.bincount(home, minlength=k)
    pc = np.bincount(topP.ravel(), minlength=k)
    # exact scored-instance count: every (probe, home) entry with p != h.
    # The only diagonal entries are each vector against itself in its own
    # home cell (pr=1 guarantees v probes home(v)), exactly N of them.
    n_inst = int((hc.astype(np.int64) * pc.astype(np.int64)).sum()) - N

    # planted-pair catch (replica validation against the design grid)
    c8, _ = _g600_catch_and_mass(home, topP, P, k)

    # per-cell member lists via one sort each
    vec_p = np.repeat(np.arange(N, dtype=np.int64), P)
    cell_p = topP.ravel().astype(np.int64)
    op = np.argsort(cell_p, kind="stable")
    cell_p, vec_p = cell_p[op], vec_p[op]
    p_start = np.searchsorted(cell_p, np.arange(k + 1))
    oh = np.argsort(home.astype(np.int64), kind="stable")
    home_s = home.astype(np.int64)[oh]
    h_start = np.searchsorted(home_s, np.arange(k + 1))

    mins, maxs = [], []
    for c in range(k):
        pm = vec_p[p_start[c]:p_start[c + 1]]
        hm = oh[h_start[c]:h_start[c + 1]]
        if len(pm) == 0 or len(hm) == 0:
            continue
        for h in hm[inH[hm]]:       # h is the min endpoint
            ps = pm[pm > h]
            if len(ps):
                mins.append(np.full(len(ps), h, dtype=np.int32))
                maxs.append(ps.astype(np.int32))
        for p in pm[inH[pm]]:       # p is the min endpoint
            hs_ = hm[hm > p]
            if len(hs_):
                mins.append(np.full(len(hs_), p, dtype=np.int32))
                maxs.append(hs_.astype(np.int32))
    mins = np.concatenate(mins) if mins else np.empty(0, dtype=np.int32)
    maxs = np.concatenate(maxs) if maxs else np.empty(0, dtype=np.int32)
    return t_index, home.astype(np.int32), mins, maxs, n_inst, c8


def ivfdup600(out_path: str) -> int:
    """r11 VERDICT #4: measure the cross-table duplicate-scoring share of
    dedup_embedding_ivf_mt12 at the 600k point. The arm exact-scores
    ~2117M ordered candidate instances for ~60M surviving pairs across 12
    quasi-independent tables; a pair co-located in m (table, orientation)
    slots is scored m times before the final distinct(). This mode
    measures that multiplicity exactly where it costs wall time: total
    scored instances (exact, from per-cell home/probe counts) vs DISTINCT
    normalized pairs (estimated from a 1/64 hash sample keyed on the min
    endpoint, so a pair's instances are sampled all-or-nothing), split
    into within-table (orientation/per-cell) and cross-table components.
    Also prices the one exact cut available to the kernel without extra
    cross-table payload shipping: skip an instance in table t when the
    endpoints share a home cell in some earlier table t' (home-home
    co-location implies generation in t', since pr=1 cells are always
    probed) — the skippable share bounds what such a cut could save."""
    import multiprocessing as _mp
    import time as _t

    import numpy as np

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    t_all = _t.time()
    spark = get_spark(app_name="ivfdup600", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    p0 = {(r.a_id, r.b_id)
          for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    d600 = synth_dir(spark, factor=300, tables=("embeddings",))
    rows = spark.read.parquet(f"{d600}/embeddings.parquet").select(
        "vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    del rows
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    spark.stop()
    N = len(ids)
    shift = 10_000
    id2ix = {int(v): i for i, v in enumerate(ids)}
    tp = [
        (id2ix[c * shift + a], id2ix[c * shift + b])
        for c in range(300) for a, b in p0
        if c * shift + a in id2ix and c * shift + b in id2ix
    ]
    truth_pairs = np.array(tp)
    k = dedup._IVF_K_BASE * (
        1 << sum(N > t for t in dedup._IVF_K_THRESHOLDS))
    # min-endpoint sample: high multiplicative-hash bits, NOT a plain id
    # residue (ids carry the c*10000+a planting structure and the mod-13
    # pool structure; low-bit residues would correlate with both)
    SAMPLE_MOD = 64
    hashed = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
    inH = (hashed % np.uint64(SAMPLE_MOD)) == 0
    _G600.update(
        ids=ids, X=X, k=k, PMAX=8, inH=inH,
        a_ix=truth_pairs[:, 0], b_ix=truth_pairs[:, 1],
    )
    rems = dedup._IVFMT12_REMS  # registration order = kernel table order
    T = len(rems)

    ctx = _mp.get_context("fork")
    with ctx.Pool(min(T, os.cpu_count() or 1)) as pool:
        per_table = pool.map(_g600_dup_one, list(enumerate(rems)))
    per_table.sort(key=lambda r: r[0])

    H12 = np.stack([pt[1] for pt in per_table], axis=1)  # N x T home cids
    n_inst_exact = sum(pt[4] for pt in per_table)
    caught = np.zeros(len(truth_pairs), dtype=bool)
    per_catch = []
    for pt in per_table:
        caught |= pt[5]
        per_catch.append(pt[5].mean())
    planted_mult = sum(per_catch) / max(caught.mean(), 1e-12)

    keys_all, tbl_all = [], []
    for t_index, _, mins, maxs, _, _ in per_table:
        keys_all.append(mins.astype(np.int64) * N + maxs.astype(np.int64))
        tbl_all.append(np.full(len(mins), t_index, dtype=np.int8))
    keys = np.concatenate(keys_all)
    tbls = np.concatenate(tbl_all)
    n_samp = len(keys)
    uniq_global = len(np.unique(keys))
    uniq_within = sum(len(np.unique(kk)) for kk in keys_all)

    # exact home-home cut: instance in table t is skippable iff endpoints
    # share a home cell in some earlier table (generation there is certain:
    # the home cell is its owner's pr=1 cell and every vector probes its
    # own pr=1 cell, so both orientations exist in t' whenever homes match)
    skip = np.zeros(n_samp, dtype=bool)
    mins_g = (keys // N).astype(np.int64)
    maxs_g = (keys % N).astype(np.int64)
    for t in range(1, T):
        sel = tbls == t
        if not sel.any():
            continue
        skip[sel] = (
            H12[mins_g[sel], :t] == H12[maxs_g[sel], :t]
        ).any(axis=1)
    n_skip = int(skip.sum())
    kept = n_samp - n_skip
    kept_uniq = len(np.unique(keys[~skip]))

    dup_share = 1 - uniq_global / n_samp
    within_share = 1 - uniq_within / n_samp
    cross_share = 1 - uniq_global / uniq_within
    lines = [
        "# mt12 duplicate-scoring share at 600k (r11 VERDICT #4)",
        "",
        f"N={N}, k={k} per table, T={T} tables, P=8; planted truth"
        f"={len(truth_pairs)} pairs.",
        f"Replica validation: per-table planted recall {per_catch[0]:.4f}"
        f" (grid: 0.0867), union {caught.mean():.4f} (grid: 0.6059);",
        f"planted-pair scoring multiplicity {planted_mult:.2f}x.",
        "",
        "Instance = one (probe, home) entry the cell-block kernel scores.",
        f"Sample: 1/{SAMPLE_MOD} of normalized pairs by min-endpoint hash",
        "(all-or-nothing per pair, unbiased for share ratios).",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| scored instances (exact) | {n_inst_exact / 1e6:.0f}M |",
        f"| sampled instances | {n_samp} |",
        f"| sampled distinct pairs | {uniq_global} |",
        f"| duplicate-work share (1 - distinct/instances) | {dup_share:.4f} |",
        f"| … within-table component | {within_share:.4f} |",
        f"| … cross-table component (of within-deduped) | {cross_share:.4f} |",
        f"| home-home-skippable instances (exact cut) | {n_skip / max(n_samp, 1):.4f} |",
        f"| instances after cut | {kept / max(n_samp, 1):.4f} |",
        f"| distinct pairs after cut (must equal before) | {kept_uniq} |",
        "",
        f"probe wall: {_t.time() - t_all:.0f}s",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)
    if kept_uniq != uniq_global:
        print("WARNING: home-home cut would DROP pairs — rule unsound",
              flush=True)
        return 1
    return 0


def ivfmt(
    out_path: str, with_600k: bool = False,
    arm: str = "dedup_embedding_ivf_mt4",
) -> int:
    """Measure a REGISTERED multi-table arm through the full machinery at
    the 60k planted point — the number the r9 VERDICT floor (recall >= 0.5
    at <= 158 s) is judged on — and, with --with-600k, at the 600k point
    where the symmetric arms collapsed (r10 VERDICT #2 floor: >= 0.5
    there too). --arm selects the registered query (default mt4)."""
    import time as _t

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.operators import dedup
    from pg2parquet_spark.operators.dedup import dedup_embedding_cosine_exact

    fn = getattr(dedup, arm)
    spark = get_spark(app_name="ivfmt", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    p0 = {(r.a_id, r.b_id) for r in dedup_embedding_cosine_exact(spark, SF_BIG).collect()}
    shift = 10_000

    def measure(d, factor):
        truth = factor * len(p0)
        t0 = _t.time()
        got = [(r.a_id, r.b_id) for r in fn(spark, d).collect()]
        warm = _t.time() - t0
        t0 = _t.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        steady = _t.time() - t0
        hits = sum(1 for a, b in got
                   if a // shift == b // shift and (a % shift, b % shift) in p0)
        cross = sum(1 for a, b in got if a // shift != b // shift)
        return hits, cross, len(got), hits / truth, min(warm, steady)

    rows = []
    d60 = synth_dir(spark, factor=30, tables=("embeddings",))
    rows.append(("60k", *measure(d60, 30)))
    print(f"60k {arm}: {rows[-1]}", flush=True)
    if with_600k:
        d600 = synth_dir(spark, factor=300, tables=("embeddings",))
        rows.append(("600k", *measure(d600, 300)))
        print(f"600k {arm}: {rows[-1]}", flush=True)

    lines = [
        f"# Registered multi-table IVF arm ({arm}) — planted recall",
        "",
        "Same planted truth and method as SCALING_r10_ivfasym.md; arm = the",
        f"REGISTERED query {arm}.",
        "Floors: recall >= 0.5 at 60k (r9 VERDICT, <= 158 s) and >= 0.5 at",
        "600k (r10 VERDICT #2).",
        "",
        "| point | planted hits | cross-copy | pairs out | recall | cost (s) |",
        "|---|---|---|---|---|---|",
    ]
    for label, hits, cross, n, rec, t in rows:
        lines.append(f"| {label} | {hits} | {cross} | {n} | {rec:.4f} | {t:.1f} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


def docdecade3(out_path: str) -> int:
    import math

    from pg2parquet_spark.session import get_spark
    from pg2parquet_spark.registry import load_all

    spark = get_spark(app_name="docdecade3", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    lo = synth_dir(spark, factor=10, tables=("documents",))
    hi = synth_dir(spark, factor=100, tables=("documents",))
    lines = [
        "# Non-embedding dedup families, third decade — factor 10 -> 100",
        "",
        "Documents-only synth corpora from sf0.1 (5,000 docs): 10x = 50,000",
        "docs (the committed synth-1.0 point) and 100x = 500,000 docs. Same",
        "construction as SCALING_r08 (disjoint re-tokened copies; within-copy",
        "dup structure preserved, cross-copy collisions scrambled). Fixed",
        "keyed synth paths; best-of-3 steady-state after a warm pass, one",
        "local[32] JVM. e = log10(t_hi/t_lo); e <= ~1.1 reads as",
        "linear-with-overhead over the decade.",
        "",
        "| query | 50k docs (s) | 500k docs (s) | ratio | e(upper) |",
        "|---|---|---|---|---|",
    ]
    worst = 0.0
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_cluster_components"):
        fn = reg[name].fn
        t_lo = _run_steady(spark, fn, lo)
        t_hi = _run_steady(spark, fn, hi, n_timed=2)
        r = t_hi / max(t_lo, 1e-9)
        e = math.log10(max(r, 1e-9))
        worst = max(worst, e)
        print(f"{name:34s} {t_lo:6.2f}s {t_hi:7.2f}s  x{r:.2f}  e={e:.2f}", flush=True)
        lines.append(f"| {name} | {t_lo:.2f} | {t_hi:.2f} | {r:.2f}x | {e:.2f} |")
    # cap audits at the top point: the cap+audit contracts must hold where
    # the buckets/posting lists are biggest — a capped run with real
    # candidate mass dropped would invalidate the timing rows above
    for audit_name, label in (
        ("dedup_minhash_bucket_audit", "Minhash bucket audit at 500k docs:"),
        ("dedup_shingle_posting_audit", "Shingle posting audit at 500k docs:"),
    ):
        audit = reg[audit_name].fn(spark, hi).collect()
        lines += ["", label, ""]
        for row in audit:
            d = row.asDict()
            lines.append("- " + ", ".join(f"{k}={v}" for k, v in d.items()))
            print("audit:", d, flush=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_path, flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--decade2":
        decade2(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r07.md")
    elif len(sys.argv) > 1 and sys.argv[1] == "--embdial":
        embdial(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r07_embdial.md")
    elif len(sys.argv) > 1 and sys.argv[1] == "--embdial3":
        embdial3(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r08_embdial3.md")
    elif len(sys.argv) > 1 and sys.argv[1] == "--embrecall":
        sys.exit(embrecall(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r09_embrecall.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--embrecall2":
        sys.exit(embrecall2(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r09_embrecall2.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfdial":
        sys.exit(ivfdial(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r09_ivfdial.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfrecall":
        sys.exit(ivfrecall(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r09_ivfrecall.md",
                           with_600k="--with-600k" in sys.argv))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfgrid":
        sys.exit(ivfgrid(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r10_ivfgrid.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfgrid600":
        sys.exit(ivfgrid600(
            sys.argv[2] if len(sys.argv) > 2 else "SCALING_r11_ivfgrid600.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfband800":
        sys.exit(ivfband800(
            sys.argv[2] if len(sys.argv) > 2 else "SCALING_r11_ivfband800.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfdup600":
        sys.exit(ivfdup600(
            sys.argv[2] if len(sys.argv) > 2 else "SCALING_r12_ivfdup600.md"))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfband1536":
        sys.exit(ivfband800(
            sys.argv[2] if len(sys.argv) > 2 else "SCALING_r12_ivfband1536.md",
            factor=780))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfmt":
        arm_arg = next(
            (a.split("=", 1)[1] for a in sys.argv[2:]
             if a.startswith("--arm=")),
            "dedup_embedding_ivf_mt4",
        )
        sys.exit(ivfmt(
            next((a for a in sys.argv[2:] if not a.startswith("--")),
                 "SCALING_r10_ivfmt.md"),
            with_600k="--with-600k" in sys.argv,
            arm=arm_arg))
    elif len(sys.argv) > 1 and sys.argv[1] == "--ivfasym":
        bp = 0
        for a in sys.argv[2:]:
            if a.startswith("--big-probe="):
                bp = int(a.split("=", 1)[1])
        sys.exit(ivfasym(
            next((a for a in sys.argv[2:] if not a.startswith("--")),
                 "SCALING_r10_ivfasym.md"),
            big_probe=bp))
    elif len(sys.argv) > 1 and sys.argv[1] == "--docdecade3":
        sys.exit(docdecade3(sys.argv[2] if len(sys.argv) > 2 else "SCALING_r09_docdecade3.md"))
    else:
        main()
