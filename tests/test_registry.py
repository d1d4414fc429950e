"""Registry rotation-policy tests: the ordering that decides which queries
enter the driver's next verification window must be change-aware (r6 review
item) — a rewritten module re-enters the window; a still-proven query
rotates by age."""

from __future__ import annotations

import json
from pathlib import Path

from pg2parquet_spark import registry as reg


def test_rotation_key_groups_and_order():
    verified = {"a_old": 1, "b_new": 0, "c_changed": 5, "d_recent": 6}
    changed = {"c_changed"}
    names = sorted(verified, key=lambda n: reg._rotation_key(n, verified, changed))
    # group 0 alphabetical (never-green + changed), then group 1 by age
    assert names == ["b_new", "c_changed", "a_old", "d_recent"]


def test_changed_since_verified_flags_blob_drift():
    """A query whose module's current blob id differs from the one recorded
    at its last green round is flagged; matching blobs and unknown rounds
    degrade to 'unchanged' (the pre-tool age-only behavior).

    Runs against the REAL repo root (the module path is resolved from the
    live function object), swapping VERIFIED_FINGERPRINTS.json in and out."""
    reg.load_all()  # import side effect populates REGISTRY
    spec = reg.REGISTRY["dedup_exact"]
    mod_rel = "pg2parquet_spark/operators/dedup.py"
    real_root = Path(reg.__file__).resolve().parent.parent
    cur = reg._git_blob_id(real_root / mod_rel)
    fp_path = real_root / "VERIFIED_FINGERPRINTS.json"
    orig = fp_path.read_text() if fp_path.exists() else None
    verified = {"dedup_exact": 3}
    try:
        fp_path.write_text(json.dumps({"rounds": {"3": {mod_rel: cur}}}))
        assert (
            reg._changed_since_verified(real_root, {"dedup_exact": spec}, verified)
            == set()
        )
        fp_path.write_text(json.dumps({"rounds": {"3": {mod_rel: "0" * 40}}}))
        assert reg._changed_since_verified(
            real_root, {"dedup_exact": spec}, verified
        ) == {"dedup_exact"}
        # unknown round → unchanged
        assert (
            reg._changed_since_verified(
                real_root, {"dedup_exact": spec}, {"dedup_exact": 99}
            )
            == set()
        )
    finally:
        if orig is None:
            fp_path.unlink(missing_ok=True)
        else:
            fp_path.write_text(orig)


def test_git_blob_id_matches_git(tmp_path):
    """_git_blob_id must agree with `git hash-object` — the committed
    VERIFIED_FINGERPRINTS.json stores ls-tree blob ids and the registry
    compares working-tree files against them."""
    import subprocess

    f = tmp_path / "x.py"
    f.write_bytes(b"print('hello')\n")
    want = subprocess.run(
        ["git", "hash-object", str(f)], capture_output=True, text=True, check=True
    ).stdout.strip()
    assert reg._git_blob_id(f) == want
