"""Unit pins for engine.resolve_approx_mode / suggest_safe_budget.

The single policy function behind ``approx_mode="auto"`` (VERDICT r3 #2:
one resolution shared by the single-chip driver and every mesh entry
point). These tests pin the decision boundaries directly; the integration
behavior is covered by test_midscale_recall / test_parallel.
"""

from __future__ import annotations

import numpy as np

from fast_plaid_tpu.search.engine import (
    resolve_approx_mode,
    suggest_safe_budget,
    suggest_slot_budget,
)


def _resolve(lens, n_full=128, q_cap=8, probe=8, k=None, cand_cap=None, **kw):
    lens = np.asarray(lens, np.int64)
    return resolve_approx_mode(
        kw.pop("approx_mode", "auto"),
        lens,
        q_cap=q_cap,
        n_ivf_probe=probe,
        n_full_scores=n_full,
        n_partitions=k if k is not None else len(lens),
        cand_cap=cand_cap,
        **kw,
    )


def test_below_crossover_stays_plain_cells():
    # expected candidates = mean_len * n_cells = 4 * 64 = 256 <= 6*128.
    mode, rank, budget = _resolve(np.full(64, 4), n_full=128)
    assert (mode, rank) == ("cells", 0)


def test_past_crossover_engages_rank_admission():
    # 1000 cells x mean 600 -> expected 64*600 = 38,400 >> 6*128.
    lens = np.full(1000, 600)
    mode, rank, budget = _resolve(lens, n_full=128)
    assert mode == "cells" and rank >= 1
    # The budget must hold the admitted tier whole.
    assert budget >= suggest_safe_budget(lens, 128, 8, rank)
    assert budget >= suggest_slot_budget(lens, 128)


def test_crossover_sits_at_six_x():
    # Calibrated on the round-4 sweep: planted hit@1 clean through 5.5x,
    # first miss observed at 7.3x (SCALE.md) — the boundary is 6x.
    below = _resolve(np.full(64, 11), n_full=128)  # 64*11 = 704 < 768
    above = _resolve(np.full(64, 13), n_full=128)  # 64*13 = 832 > 768
    assert (below[0], below[1]) == ("cells", 0)
    assert (above[0], above[1]) == ("cells", 1)


def test_auto_rank1_at_moderate_saturation():
    # 6x < ratio <= 32x: rank-1 admission measured recall-perfect (57k at
    # 14.7x, 523k at 15x: planted hit@1 1.0) and 1.2-1.4x faster than
    # rank-2 (523k: 2,047 vs 1,671 QPS) — no escalation in this regime.
    lens = np.full(4096, 40)  # expected 64*40 = 2,560 = 20x * 128
    mode, rank, _ = _resolve(lens, n_full=128)
    assert (mode, rank) == ("cells", 1)


def test_auto_rank2_at_deep_saturation():
    # ratio > 32x: near-tie winners increasingly sit in second-rank cells
    # (clustered score mass 0.966 rank-1 vs 0.97+ rank-2 at ~50-100x) —
    # escalate when the rank-2 budget is affordable.
    lens = np.full(4096, 600)  # expected 64*600 = 38,400 = 300x * 128
    mode, rank, _ = _resolve(lens, n_full=128)
    assert (mode, rank) == ("cells", 2)


def test_coarse_index_falls_over_to_cells_full():
    # Few giant cells: even the rank-1 tier approaches the candidate
    # width -> untruncated estimator.
    lens = np.full(16, 200_000)
    mode, rank, _ = _resolve(lens, n_full=128, cand_cap=131_072)
    assert mode == "cells_full"


def test_explicit_mode_passes_through():
    lens = np.full(1000, 600)
    mode, rank, _ = _resolve(lens, n_full=128, approx_mode="cells")
    assert (mode, rank) == ("cells", 0)
    mode, rank, _ = _resolve(lens, n_full=128, approx_mode="cells_full")
    assert (mode, rank) == ("cells_full", 0)


def test_forced_rank_admit_sizes_budget():
    lens = np.full(64, 4)
    mode, rank, budget = _resolve(
        lens, n_full=128, approx_mode="cells", rank_admit=1
    )
    assert (mode, rank) == ("cells", 1)
    assert budget >= suggest_safe_budget(lens, 128, 8, 1)


def test_explicit_larger_budget_kept():
    lens = np.full(1000, 600)
    _, rank, budget = _resolve(
        lens, n_full=128, approx_mode="cells", rank_admit=1,
        slot_budget=10_000_000,
    )
    assert budget == 10_000_000


def test_no_ivf_stats_defaults_safe():
    mode, rank, budget = resolve_approx_mode(
        "auto",
        None,
        q_cap=8,
        n_ivf_probe=8,
        n_full_scores=128,
        n_partitions=64,
        cand_cap=None,
    )
    assert (mode, rank, budget) == ("cells", 0, None)
