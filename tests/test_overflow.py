"""Candidate-buffer overflow hardening: when cand_cap is too small for the
probed cells' lists, the engine must (a) report how many slots were
truncated and (b) drop the LOWEST-probe-score cells first, bounding the
recall loss (no silently-arbitrary cell drops)."""

import numpy as np

import jax

from fast_plaid_tpu import testing
from fast_plaid_tpu.search.engine import candidates_core, search_core

DIM = 32


def _build(seed=3, n_docs=80):
    rng = np.random.default_rng(seed)
    docs = testing.random_documents(rng, n_docs, 12, DIM, variable=True)
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=0)
    queries = testing.random_queries(rng, 4, 6, DIM)
    return dev, ispec, np.asarray(queries, np.float32)


def test_overflow_reports_dropped_slots():
    dev, ispec, queries = _build()
    # Unconstrained run: no drops.
    _, dropped_free = candidates_core(
        dev,
        queries,
        None,
        ispec=ispec,
        n_ivf_probe=ispec.n_partitions,
        n_full_scores=256,
        with_stats=True,
    )
    assert int(np.asarray(dropped_free).sum()) == 0

    # Tiny buffer: must report truncation, not hide it.
    _, dropped = candidates_core(
        dev,
        queries,
        None,
        ispec=ispec,
        n_ivf_probe=ispec.n_partitions,
        n_full_scores=256,
        cand_cap=128,
        with_stats=True,
    )
    assert int(np.asarray(dropped).sum()) > 0


def test_overflow_drops_lowest_scoring_cells_first():
    """Recall under heavy truncation stays bounded because the buffer is
    filled in descending probe-score order."""
    dev, ispec, queries = _build()
    full = search_core(
        dev,
        queries,
        None,
        ispec=ispec,
        top_k=10,
        n_ivf_probe=8,
        n_full_scores=256,
        want_tokens=False,
    )
    fp_full = np.asarray(full[0])

    # Force the buffer to roughly half the typical need.
    _, dropped = candidates_core(
        dev,
        queries,
        None,
        ispec=ispec,
        n_ivf_probe=8,
        n_full_scores=256,
        cand_cap=128,
        with_stats=True,
    )
    out = search_core(
        dev,
        queries,
        None,
        ispec=ispec,
        top_k=10,
        n_ivf_probe=8,
        n_full_scores=256,
        want_tokens=False,
        cand_cap=128,
        with_stats=True,
    )
    fp_trunc, _, dropped2 = (np.asarray(x) for x in out)
    jax.block_until_ready(out)
    assert (dropped2 == np.asarray(dropped)).all()

    hits = total = 0
    for b in range(fp_full.shape[0]):
        want = {int(p) for p in fp_full[b] if p >= 0}
        got = {int(p) for p in fp_trunc[b] if p >= 0}
        hits += len(want & got)
        total += max(len(want), 1)
    # Highest-priority cells survive truncation -> most of the true top-10
    # must still be found even at ~half capacity.
    assert hits / total >= 0.7, f"recall under truncation too low: {hits}/{total}"


def test_api_surfaces_overflow_stats(test_index_path):
    """search() exposes dropped-slot accounting via last_search_stats()."""
    from fast_plaid_tpu import search as search_api
    from fast_plaid_tpu.search.searcher import last_search_stats

    rng = np.random.default_rng(11)
    docs = testing.random_documents(rng, 50, 10, DIM, variable=True)
    eng = search_api.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = testing.random_queries(rng, 3, 5, DIM)
    eng.search(queries, top_k=5, show_progress=False)
    stats = last_search_stats()
    assert stats["queries"] == 3
    assert stats["dropped_candidate_slots"] == 0  # ample capacity here
