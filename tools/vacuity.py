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

r9 addition — GATE-SF warning tier: the driver's oracle gates at sf0.01, so
a query that is 0 rows there but nonzero at sf0.1 earns driver greens that
only ever compare empty frames (q02_min_cost_supplier /
q22_dormant_customers sat in exactly this blind spot for 8 rounds — r9
VERDICT "What's wrong" #1).  The FIRST sidecar argument is treated as the
gate SF; any query empty there (but not empty everywhere, which is the hard
failure above) prints a ``GATE-VACUOUS`` warning.  Warnings exit 1 too
unless ``--warn-ok`` is passed: an empty-at-gate query is a finding to fix
or allowlist, not a note to scroll past.

Usage: python tools/vacuity.py [--warn-ok] [SELFCHECK_ROWS_sf0.01.json SELFCHECK_ROWS_sf0.1.json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = ["SELFCHECK_ROWS_sf0.01.json", "SELFCHECK_ROWS_sf0.1.json"]
ALLOWLIST: frozenset[str] = frozenset()


def main() -> int:
    argv = sys.argv[1:]
    warn_ok = "--warn-ok" in argv
    argv = [a for a in argv if a != "--warn-ok"]
    paths = argv or [os.path.join(ROOT, p) for p in DEFAULT]
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
    # gate-SF tier: empty at the FIRST sidecar (the driver's gate scale)
    # but nonzero somewhere else — every driver green such a query earns
    # compares empty frames only
    gate_name = os.path.basename(paths[0])
    gate_vacuous = sorted(
        n for n in common
        if n not in ALLOWLIST and sidecars[0][n] == 0 and n not in vacuous
    )
    for n in gate_vacuous:
        print(f"GATE-VACUOUS {n}: 0 rows at the gate SF ({gate_name}) — "
              "driver greens compare empty frames")
    print(f"{len(common)} queries compared; {len(vacuous)} vacuous; "
          f"{len(gate_vacuous)} gate-vacuous")
    if vacuous:
        return 1
    if gate_vacuous and not warn_ok:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
