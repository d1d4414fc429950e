"""Driver-harness replica: the oracle surface must survive a SHARED,
memory-squeezed DuckDB connection (r11 VERDICT #2).

The round driver runs every ``oracle_sql()`` entry through ONE DuckDB
connection in a memory-constrained process. In r11 a single heavy oracle
(the 12-chain mt12 recall eval) bad_alloc'd under that squeeze and the
shared connection stayed POISONED — 48/50 correctness rows errored even
though each oracle passes alone at defaults. The driver's harness cannot
be patched from here, so this test pins the property the repo CAN
control: every registered oracle fits a tight per-connection memory
budget at default thread count, and no oracle failure mode leaves the
shared connection unable to answer ``SELECT 1``.

Two tiers (both sequential, registry order, one connection per tier):
 - 2GB, DEFAULT threads: the FULL registry — the driver-window replica
   proper (the driver does not cap threads).
 - 1GB, threads capped: the heavy subset (embedding/IVF family + the
   largest oracle texts) — double the safety margin exactly where r11
   broke, thread-capped because at 1GB default-thread reservations make
   the outcome load-dependent (see _budget_connection).

Budget breaches must be fixed by RESTRUCTURING the oracle (materialized
CTEs to serialize branches, smaller intermediates), never by raising the
limits here.
"""

from __future__ import annotations

import duckdb
import pytest

from pg2parquet_spark.registry import load_all
from pg2parquet_spark.tables import TABLES
from tests.conftest import SF_CORRECT


def _budget_connection(limit: str, cap_threads: bool) -> duckdb.DuckDBPyConnection:
    # the 2GB driver-replica tier keeps the DEFAULT thread count: the
    # driver does not cap threads, and per-thread operator reservations
    # are part of what broke r11. The 1GB margin tier caps threads
    # (ORACLE_DUCKDB_THREADS): at 1GB the default-thread reservations
    # make the outcome depend on machine load — observed green standalone
    # and OOM on the mt12 recall eval under a loadavg-44 machine — and a
    # flaky gate protects nothing; thread-capped, the tier pins the
    # deterministic property (the oracles FIT the tighter budget),
    # isolated from scheduling noise.
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{limit}'")
    if cap_threads:
        from pg2parquet_spark.oracle import ORACLE_DUCKDB_THREADS

        con.execute(f"SET threads TO {ORACLE_DUCKDB_THREADS}")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    return con


def _oracles() -> list[tuple[str, str]]:
    return [
        (name, spec.oracle)
        for name, spec in load_all().items()
        if spec.oracle is not None
    ]


def _heavy_subset() -> list[tuple[str, str]]:
    """The embedding/IVF family (the known r11 victim class) plus the ten
    largest oracle texts registry-wide — big SQL is the best available
    proxy for many-branch plans with wide per-thread reservations — plus
    ``text_rrf_hybrid``, the one oracle observed to OOM (without
    poisoning) at 1GB in a FULL-registry 217-oracle shared sweep: it runs
    in 0.3s/<<1GB alone, the full-sweep failure was buffer accumulation
    across ~150 prior oracles, a regime stricter than any driver window
    (50 queries). Including it here pins that it survives a heavy-subset
    sequence, the realistic squeeze."""
    all_o = _oracles()
    fam = [(n, o) for n, o in all_o if "embedding" in n or "ann_" in n]
    by_size = sorted(all_o, key=lambda p: -len(p[1]))[:10]
    rrf = [(n, o) for n, o in all_o if n == "text_rrf_hybrid"]
    seen, out = set(), []
    for n, o in fam + by_size + rrf:
        if n not in seen:
            seen.add(n)
            out.append((n, o))
    return out


def _run_tier(pairs: list[tuple[str, str]], limit: str, cap_threads: bool = False) -> None:
    con = _budget_connection(limit, cap_threads)
    try:
        for name, sql in pairs:
            try:
                con.execute(sql).df()
            except Exception as e:  # noqa: BLE001 — repackage with context
                pytest.fail(
                    f"oracle {name!r} breaches the {limit} budget on the "
                    f"shared connection: {type(e).__name__}: {e}"
                )
            finally:
                # poisoning tripwire: the r11 failure mode was not the one
                # bad_alloc but the 48 queries AFTER it — the connection
                # must stay usable no matter what the previous oracle did
                assert con.execute("SELECT 1").fetchone() == (1,), (
                    f"shared connection poisoned after oracle {name!r} "
                    f"under {limit}"
                )
    finally:
        con.close()


@pytest.mark.slowtier
def test_all_oracles_fit_2gb_shared_connection():
    _run_tier(_oracles(), "2GB")


@pytest.mark.slowtier
def test_heavy_oracles_fit_1gb_shared_connection():
    _run_tier(_heavy_subset(), "1GB", cap_threads=True)
