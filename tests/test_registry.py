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


def test_rotation_group0_cycles_from_cursor():
    """r7 ADVICE: plain alphabetical order within group 0 starved
    late-alphabet members whenever the group outgrew the sampled window.
    With the cursor (= alphabetically-greatest name the newest round
    verified), group 0 resumes AFTER the last window's end and wraps."""
    verified = {"b_seen": 7, "a_stale": 0, "m_stale": 0, "z_stale": 0}
    changed = set()
    cursor = reg._group0_cursor(verified)
    assert cursor == "b_seen"
    names = sorted(
        ("a_stale", "m_stale", "z_stale"),
        key=lambda n: reg._rotation_key(n, verified, changed, cursor),
    )
    # names after the cursor first (m, z), then the wrap-around (a)
    assert names == ["m_stale", "z_stale", "a_stale"]
    # ties to the newest round: the greatest name wins the cursor
    assert reg._group0_cursor({"x": 3, "y": 3, "c": 2}) == "y"
    assert reg._group0_cursor({}) == ""


def test_changed_since_verified_flags_blob_drift(tmp_path):
    """A query whose module's current blob id differs from the one recorded
    at its last green round is flagged; matching blobs and unknown rounds
    degrade to 'unchanged' (the pre-tool age-only behavior).

    The fingerprints file lives under tmp_path (r7 ADVICE: the old in-place
    swap of the committed VERIFIED_FINGERPRINTS.json meant a hard
    interruption or a parallel load_all() observed — or permanently kept —
    a corrupted file and a different registry ordering); module paths still
    resolve against the live package, so the blob-id comparison is real."""
    reg.load_all()  # import side effect populates REGISTRY
    spec = reg.REGISTRY["dedup_exact"]
    mod_rel = "pg2parquet_spark/operators/dedup.py"
    real_root = Path(reg.__file__).resolve().parent.parent
    cur = reg._git_blob_id(real_root / mod_rel)
    fp_path = tmp_path / "VERIFIED_FINGERPRINTS.json"
    verified = {"dedup_exact": 3}
    fp_path.write_text(json.dumps({"rounds": {"3": {mod_rel: cur}}}))
    assert (
        reg._changed_since_verified(tmp_path, {"dedup_exact": spec}, verified)
        == set()
    )
    fp_path.write_text(json.dumps({"rounds": {"3": {mod_rel: "0" * 40}}}))
    assert reg._changed_since_verified(
        tmp_path, {"dedup_exact": spec}, verified
    ) == {"dedup_exact"}
    # unknown round → unchanged
    assert (
        reg._changed_since_verified(
            tmp_path, {"dedup_exact": spec}, {"dedup_exact": 99}
        )
        == set()
    )


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
