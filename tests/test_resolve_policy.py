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


def _make_corpus(rng, kind, n_docs, doc_len, dim):
    """Adversarial corpus shapes for the policy property sweep."""
    lens = rng.integers(max(doc_len // 2, 2), doc_len + 1, n_docs)
    if kind == "uniform":
        docs = [
            rng.standard_normal((int(ln), dim)).astype(np.float32)
            for ln in lens
        ]
    else:
        # Clustered topics with Zipf popularity -> skewed cell sizes; the
        # "hub" variant additionally stamps a shared stopword token on 40%
        # of documents (one giant cell).
        n_topics = 24
        topics = rng.standard_normal((n_topics, dim)).astype(np.float32)
        pop = 1.0 / np.arange(1, n_topics + 1) ** 1.2
        pop /= pop.sum()
        hub = rng.standard_normal(dim).astype(np.float32)
        docs = []
        for ln in lens:
            t = rng.choice(n_topics, int(ln), p=pop)
            d = topics[t] + 0.25 * rng.standard_normal((int(ln), dim))
            if kind == "hub" and rng.random() < 0.4:
                d[0] = hub + 0.01 * rng.standard_normal(dim)
            docs.append(d.astype(np.float32))
    docs = [d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
            for d in docs]
    return docs


import pytest  # noqa: E402

from fast_plaid_tpu import testing  # noqa: E402
from fast_plaid_tpu.search.engine import candidate_capacity, search_core  # noqa: E402


@pytest.mark.slow
def test_auto_policy_planted_recall_property():
    """Adversarial property sweep (VERDICT r4 #5): wherever the budget
    math claims safety, `auto` must keep planted-duplicate hit@1 = 1.0 —
    random Zipf topic skew, hub cells, coarse k, uniform-random worst
    cases — not just the bench-fitted calibration points. A verbatim copy
    of a document's tokens is the strongest possible query for it (PLAID
    stage-1 contract, reference search.rs:554-599).

    This sweep is what exposed (and now pins) the round-5 tie-degeneracy
    guard: at k <= 4 * n_ivf_probe cell-granular estimates TIE across
    whole cells; `auto` must fall over to the token-level estimator when
    its pool can cover the ties (hit@1 1.0 measured everywhere there),
    and to cells_full when the caller's n_full_scores is smaller than
    single cells — a configuration where NO estimator (including the
    reference's own token estimator at the same parameters) can separate
    the ties; there the contract is parity: `auto` >= tokens-mode hit@1.
    """
    rng = np.random.default_rng(1234)
    shapes = []
    # 24 shapes: {uniform, zipf, hub} x {coarse..fine k} x {tight, ample
    # n_full} over two corpus sizes. n_docs/doc_len/dim are held to a few
    # values so the sweep compiles ~a dozen distinct cascade shapes.
    for kind in ("uniform", "zipf", "hub"):
        for k in (8, 16, 64, 256):
            for n_full in (256, 2048):
                n_docs = 2048 if k <= 64 else 4096
                shapes.append((kind, k, n_full, n_docs))
    assert len(shapes) >= 20

    failures = []
    resolutions = set()
    for kind, k, n_full, n_docs in shapes:
        doc_len, dim, q_cap = 12, 32, 16
        docs = _make_corpus(rng, kind, n_docs, doc_len, dim)
        dev, ispec = testing.build_memory_index(
            docs, nbits=4, seed=3, k=k, kmeans_niters=2
        )
        ivf_lengths = np.asarray(dev.ivf_lengths)[: ispec.n_partitions]
        cand_cap = candidate_capacity(
            ivf_lengths, min(q_cap * 8, ispec.n_partitions), n_full
        )
        mode, rank, budget = resolve_approx_mode(
            "auto",
            ivf_lengths,
            q_cap=q_cap,
            n_ivf_probe=8,
            n_full_scores=n_full,
            n_partitions=ispec.n_partitions,
            cand_cap=cand_cap,
            n_docs=ispec.n_docs,
        )
        resolutions.add((mode, rank))

        probe_ids = rng.choice(n_docs, 8, replace=False)
        queries = np.zeros((8, q_cap, dim), np.float32)
        for i, pid in enumerate(probe_ids):
            d = docs[pid]
            queries[i, : min(len(d), q_cap)] = d[:q_cap]

        def run(mode_, rank_, budget_):
            pids, _ = search_core(
                dev,
                queries,
                None,
                ispec=ispec,
                top_k=5,
                n_ivf_probe=8,
                n_full_scores=n_full,
                want_tokens=False,
                cand_cap=cand_cap,
                approx_mode=mode_,
                slot_budget=budget_,
                rank_admit=rank_,
            )
            return float(np.mean(np.asarray(pids)[:, 0] == probe_ids))

        hit1 = run(mode, rank, budget)
        # Degenerate-by-construction shapes: so few partitions that whole
        # cells dwarf the caller's n_full_scores — ties exceed any pool.
        p90 = float(np.quantile(ivf_lengths, 0.9))
        degenerate = (
            k <= 4 * 8
            and p90 >= n_full // 2
            and n_full // 4 < max(n_docs // 4, 1)
        )
        if degenerate:
            # Best-effort parity contract: never worse than the
            # reference's own (token-level) estimator at equal params.
            tok_hit1 = run("tokens", 0, None)
            if hit1 < tok_hit1:
                failures.append(
                    (kind, k, n_full, f"{mode}@{rank}", hit1, "tok", tok_hit1)
                )
        elif hit1 < 1.0:
            failures.append((kind, k, n_full, n_docs, f"{mode}@{rank}", hit1))

    # The sweep must actually exercise distinct policy regimes, not one.
    assert len(resolutions) >= 3, resolutions
    assert not failures, failures
