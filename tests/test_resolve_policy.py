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
    # expected candidates = mean_len * n_cells = 4 * 64 = 256 <= 16*128.
    mode, rank, budget = _resolve(np.full(64, 4), n_full=128)
    assert (mode, rank) == ("cells", 0)


def test_past_crossover_engages_rank_admission():
    # 1000 cells x mean 600 -> expected 64*600 = 38,400 >> 16*128.
    lens = np.full(1000, 600)
    mode, rank, budget = _resolve(lens, n_full=128)
    assert mode == "cells" and rank >= 1
    # The budget must hold the admitted tier whole.
    assert budget >= suggest_safe_budget(lens, 128, 8, rank)
    assert budget >= suggest_slot_budget(lens, 128)


def test_prefers_rank2_when_affordable():
    # Small cells: the rank-2 tier is cheap -> pick 2.
    lens = np.full(4096, 600)
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
