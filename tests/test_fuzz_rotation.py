"""fuzz_rotation's coverage guarantee (round-12 review finding #3):
the per-round subsets must tile the corpus — every case runs at least
once every ceil(1/frac) rounds, which an independent per-round
re-sample does NOT guarantee."""

from __future__ import annotations

from . import fuzz_rotation as fr


def _patch_round(monkeypatch, rnd: int) -> None:
    monkeypatch.setattr(fr.glob, "glob", lambda pattern: ["f"] * rnd)


def test_three_consecutive_rounds_cover_the_corpus(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_FUZZ_FULL", raising=False)
    corpus = list(range(30))
    seen: set[int] = set()
    for rnd in (7, 8, 9):  # any consecutive window works
        _patch_round(monkeypatch, rnd)
        sub = fr.rotating_subset(corpus, frac=1 / 3, tag="t")
        assert len(sub) == 10
        seen.update(sub)
    assert seen == set(corpus)


def test_subset_is_deterministic_and_advances(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_FUZZ_FULL", raising=False)
    corpus = list(range(12))
    _patch_round(monkeypatch, 3)
    a1 = fr.rotating_subset(corpus, frac=0.5, tag="x")
    a2 = fr.rotating_subset(corpus, frac=0.5, tag="x")
    assert a1 == a2  # same round → same subset
    _patch_round(monkeypatch, 4)
    b = fr.rotating_subset(corpus, frac=0.5, tag="x")
    assert set(a1) != set(b)  # next round → the other half


def test_full_env_returns_everything(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FUZZ_FULL", "1")
    corpus = list(range(17))
    assert fr.rotating_subset(corpus, frac=0.1, tag="y") == corpus


def test_round_undershoot_sizes_covered_in_ceil_rounds(monkeypatch):
    """ADVICE r12: k = round(n * frac) undershoots (n=40 at frac=1/3
    gave k=13 → only 39/40 covered in 3 rounds).  With ceil, EVERY
    corpus size must be fully tiled by ceil(1/frac) consecutive rounds
    — swept over sizes 1..60 and all start rounds 0..5."""
    monkeypatch.delenv("SPARK_GRAFT_FUZZ_FULL", raising=False)
    for n in range(1, 61):
        corpus = list(range(n))
        for start in range(6):
            seen: set[int] = set()
            for rnd in range(start, start + 3):
                _patch_round(monkeypatch, rnd)
                seen.update(fr.rotating_subset(corpus, frac=1 / 3, tag="c"))
            assert seen == set(corpus), f"n={n} start={start}: {sorted(seen)}"


def test_uneven_tail_still_covered(monkeypatch):
    """A corpus whose size is not a multiple of k must still be fully
    tiled by consecutive rounds (the slice wraps)."""
    monkeypatch.delenv("SPARK_GRAFT_FUZZ_FULL", raising=False)
    corpus = list(range(11))
    seen: set[int] = set()
    for rnd in range(12, 16):
        _patch_round(monkeypatch, rnd)
        seen.update(fr.rotating_subset(corpus, frac=1 / 3, tag="z"))
    assert seen == set(corpus)
