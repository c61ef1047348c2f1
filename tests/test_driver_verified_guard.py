"""Structural guard for the driver-verification fold (VERDICT r11 ask #1).

Four consecutive rounds left the newest ``CORRECTNESS_r*.json`` /
``BENCH_r*.json`` untracked and their first-time green rows unfolded
into ``_DRIVER_VERIFIED``.  This test makes that state a hard pytest
failure so the gap can never silently recur:

1. every green row (full value-hash match, or rows-only match for
   no-oracle checks) in EVERY ``CORRECTNESS_r*.json`` on disk must be
   present in ``plans.queries._DRIVER_VERIFIED`` — the static fold the
   registry rotation relies on when the JSON artifacts are absent from
   a clean checkout;
2. every ``CORRECTNESS_r*.json`` / ``BENCH_r*.json`` on disk must be
   tracked by git.

When the driver writes the next round's artifacts after a session
ends, the FIRST pytest run of the following session fails here with an
actionable message naming the exact names to fold and files to commit.
"""
from __future__ import annotations

import glob
import json
import os
import subprocess

from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import _DRIVER_VERIFIED

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness_files() -> list[str]:
    return sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))


def test_all_driver_greens_are_folded():
    """Every driver-green row ever recorded must be statically folded.

    ``_verified_names()`` unions the JSON files at runtime, but the
    static fold is what survives a clean checkout — so the static set
    must be a superset of every green row on disk.
    """
    missing: dict[str, list[str]] = {}
    for path in _correctness_files():
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict) or r.get("err"):
                continue
            green = r.get("hash_match") or (
                r.get("hash_match") is None and r.get("rows_match")
            )
            if green and name not in _DRIVER_VERIFIED:
                missing.setdefault(os.path.basename(path), []).append(name)
    assert not missing, (
        "Driver-green queries missing from _DRIVER_VERIFIED "
        "(plans/queries.py) — fold these names in now:\n"
        + json.dumps(missing, indent=2)
    )


def test_driver_artifacts_are_git_tracked():
    """CORRECTNESS_r*.json / BENCH_r*.json on disk must be committed."""
    on_disk = _correctness_files() + sorted(
        glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json"))
    )
    if not on_disk:
        return
    try:
        tracked = set(
            subprocess.run(
                ["git", "ls-files", "CORRECTNESS_r*.json", "BENCH_r*.json"],
                cwd=REPO_ROOT,
                capture_output=True,
                text=True,
                timeout=30,
                check=True,
            ).stdout.split()
        )
    except (OSError, subprocess.SubprocessError):
        return  # not a git checkout (e.g. sdist install) — nothing to assert
    untracked = [
        os.path.basename(p)
        for p in on_disk
        if os.path.basename(p) not in tracked
    ]
    assert not untracked, (
        f"Driver artifacts present but not committed: {untracked} — "
        "git add + commit them now (VERDICT recurring ask)."
    )
