#!/usr/bin/env python
"""Vacuity tripwire (r8 verdict #1): fail any query that is 0-rows at BOTH SFs.

A hash-green query whose result is empty at every tested scale factor proves
only that Spark and DuckDB agree on emptiness — the predicate has never moved
a row, so the green is vacuous.  This happened silently for eight rounds:
q07_nation_trade / q11_important_stock filtered ``n_name`` on
``'FRANCE'``/``'GERMANY'`` while the corpus names are ``NATION_0..24``, and
q_lateral_explode required 12-char tokens from a corpus whose longest token
is 8 chars.

Reads the row-count sidecars written by ``tools/selfcheck.py`` (run it once
per SF first) and exits 1 listing every query with 0 rows in all of them.

An ALLOWLIST exists for queries whose emptiness IS the asserted behavior
(none today — emptiness-asserting checks are expressed as count columns, not
empty result sets, exactly so this tripwire can stay unconditional).

Usage: python tools/vacuity.py [SELFCHECK_ROWS_sf0.01.json SELFCHECK_ROWS_sf0.1.json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = ["SELFCHECK_ROWS_sf0.01.json", "SELFCHECK_ROWS_sf0.1.json"]
ALLOWLIST: frozenset[str] = frozenset()


def main() -> int:
    paths = sys.argv[1:] or [os.path.join(ROOT, p) for p in DEFAULT]
    sidecars = []
    for p in paths:
        if not os.path.exists(p):
            print(f"missing sidecar {p} — run tools/selfcheck.py at that SF first")
            return 2
        with open(p) as fh:
            sidecars.append(json.load(fh))

    # only queries present in every sidecar can be judged "empty at both SFs"
    common = set(sidecars[0])
    for sc in sidecars[1:]:
        common &= set(sc)
    vacuous = sorted(
        n for n in common
        if n not in ALLOWLIST and all(sc[n] == 0 for sc in sidecars)
    )
    for n in vacuous:
        print(f"VACUOUS {n}: 0 rows in all of {[os.path.basename(p) for p in paths]}")
    print(f"{len(common)} queries compared; {len(vacuous)} vacuous")
    return 1 if vacuous else 0


if __name__ == "__main__":
    sys.exit(main())
