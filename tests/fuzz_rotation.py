"""Rotating-seed subsets for the heavy fuzz corpora (round 12 —
VERDICT r11 "next" #6: the seal outgrew its 35-minute budget).

The default pytest tier (including the round seal, `pytest tests/ -q`)
runs a deterministic per-round subset of each fuzz corpus; the FULL
corpus runs with ``SPARK_GRAFT_FUZZ_FULL=1`` — which every round must
do at least once when NFA/changelog semantics were touched (the
CLAUDE.md "both slow fuzzers green" rule refers to the full corpora).

Rotation seed = number of committed CORRECTNESS_r*.json files (≈ the
round number), so the subset advances each round and every case runs
every ``1/frac`` rounds — the same discipline as bench.py's elision
sample.  Selection is md5-ranked, so adding cases to a corpus never
reshuffles which OTHER cases a given round picks.
"""

from __future__ import annotations

import glob
import hashlib
import os


def rotating_subset(seeds, frac: float = 1 / 3, tag: str = ""):
    """Deterministic per-round subset of ``seeds`` (full corpus when
    SPARK_GRAFT_FUZZ_FULL is set)."""
    seeds = list(seeds)
    if os.environ.get("SPARK_GRAFT_FUZZ_FULL"):
        return seeds
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    k = max(1, round(len(seeds) * frac))
    ranked = sorted(
        seeds,
        key=lambda s: hashlib.md5(f"{rnd}:{tag}:{s}".encode()).hexdigest(),
    )
    return ranked[:k]
