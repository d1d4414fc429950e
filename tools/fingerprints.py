#!/usr/bin/env python
"""Record WHICH code each driver-verified round actually verified.

Writes VERIFIED_FINGERPRINTS.json: for every round that has a committed
``CORRECTNESS_r*.json``, the git blob id of every ``pg2parquet_spark``
module as of that round's close commit (the ``round N: ...`` artifact
commit — its tree is the code the round-N driver gate ran against).

pg2parquet_spark.registry.load_all consumes this to make the verification
rotation CHANGE-AWARE: a query whose implementing module's current blob id
differs from the blob id at its last driver-green round sorts into the next
verification window ahead of merely-old queries (r6 review: the r5 rewrite
of dedup_substring_ngrams sailed past two rotation windows because ordering
was by last-verified round alone). Blob ids are git's own content hashes —
no bespoke fingerprint scheme, and the committed history is the source of
truth.

Run at round start (after the driver commits the previous round's
artifacts): python tools/fingerprints.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "VERIFIED_FINGERPRINTS.json")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout


def round_commits() -> dict[int, str]:
    """round number -> close-commit hash (the 'round N: ...' artifact commit;
    first match wins = the newest commit for that round)."""
    out: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m:
            out.setdefault(int(m.group(1)), sha)
    return out


def module_blobs(commit: str) -> dict[str, str]:
    """repo-relative module path -> git blob id at ``commit``."""
    blobs: dict[str, str] = {}
    for line in _git("ls-tree", "-r", commit, "--", "pg2parquet_spark").splitlines():
        meta, _, path = line.partition("\t")
        parts = meta.split()
        if len(parts) == 3 and parts[1] == "blob" and path.endswith(".py"):
            blobs[path] = parts[2]
    return blobs


def module_entries(commit: str) -> dict[str, dict]:
    """repo-relative module path -> {"blob": id, "fns": {qname: sha1}}.

    v2 format (r8 verdict #3): per-query SEMANTIC fingerprints computed from
    the module source AS OF the round-close commit, via the same AST
    normalizer the registry uses on the working tree
    (``pg2parquet_spark.fingerprint.module_fingerprints``) — so a
    comment-only edit no longer re-flags a module's whole query population.
    ``fns`` is omitted when the blob doesn't parse or registers nothing;
    the registry then falls back to blob comparison for that module.
    """
    sys.path.insert(0, ROOT)
    from pg2parquet_spark.fingerprint import module_fingerprints

    out: dict[str, dict] = {}
    for path, blob in module_blobs(commit).items():
        entry: dict = {"blob": blob}
        try:
            source = _git("show", f"{commit}:{path}")
            fns = module_fingerprints(source)
            if fns:
                entry["fns"] = fns
        except (SyntaxError, subprocess.CalledProcessError):
            pass
        out[path] = entry
    return out


def main() -> None:
    have_rounds = set()
    for name in os.listdir(ROOT):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", name)
        if m:
            have_rounds.add(int(m.group(1)))
    commits = round_commits()
    rounds = {}
    for rnd in sorted(have_rounds):
        if rnd not in commits:
            print(f"round {rnd}: no 'round {rnd}:' commit found, skipped",
                  file=sys.stderr)
            continue
        rounds[str(rnd)] = module_entries(commits[rnd])
    with open(OUT, "w") as f:
        json.dump({"rounds": rounds}, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(rounds)} rounds)")


if __name__ == "__main__":
    main()
