"""Cell-level vs token-level approximate pruning: both must rank exactly.

The two estimators only decide WHICH candidates reach the exact rerank;
the final scores are exact either way, so on a well-probed small corpus
the top results must agree.
"""

import numpy as np

from fast_plaid_tpu import search
from fast_plaid_tpu.testing import random_documents, random_queries


def test_modes_agree_on_top_results(test_index_path):
    rng = np.random.default_rng(0)
    docs = random_documents(rng, 40, 16, 32, variable=True)
    eng = search.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 4, 6, 32)
    r_cells = eng.search(
        queries, top_k=5, show_progress=False, approx_mode="cells"
    )
    r_tokens = eng.search(
        queries, top_k=5, show_progress=False, approx_mode="tokens"
    )
    r_full = eng.search(
        queries, top_k=5, show_progress=False, approx_mode="cells_full"
    )
    r_auto = eng.search(
        queries, top_k=5, show_progress=False, approx_mode="auto"
    )
    for a, b in zip(r_cells, r_full):
        top = min(len(a), len(b), 3)
        assert [p for p, _ in a[:top]] == [p for p, _ in b[:top]]
    for a, b in zip(r_cells, r_auto):
        top = min(len(a), len(b), 3)
        assert [p for p, _ in a[:top]] == [p for p, _ in b[:top]]
    for a, b in zip(r_cells, r_tokens):
        # same documents in the same order with identical exact scores
        top = min(len(a), len(b), 3)
        assert [p for p, _ in a[:top]] == [p for p, _ in b[:top]]
        for (_, sa), (_, sb) in zip(a[:top], b[:top]):
            assert abs(sa - sb) < 1e-3


def test_exact_doc_found_in_both_modes(test_index_path):
    rng = np.random.default_rng(1)
    docs = random_documents(rng, 30, 12, 32)
    eng = search.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=docs)
    for mode in ("cells", "cells_full", "tokens"):
        res = eng.search(
            docs[7][None], top_k=1, show_progress=False, approx_mode=mode
        )
        assert res[0][0][0] == 7


def test_auto_mode_selection(test_index_path):
    """auto resolves to the fast path on fine cells and to cells_full when
    IVF statistics say the candidate pool dwarfs the slot budget."""
    import numpy as np

    from fast_plaid_tpu.search.searcher import last_search_stats

    rng = np.random.default_rng(5)
    docs = random_documents(rng, 60, 10, 32)
    eng = search.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 2, 4, 32)

    eng.search(queries, top_k=3, show_progress=False, approx_mode="auto")
    assert last_search_stats()["approx_mode"] == "cells"

    # Tiny n_full_scores makes the same IVF look coarse: expected
    # candidates exceed 16x the budget -> the untruncated estimator.
    eng.search(
        queries, top_k=1, show_progress=False, approx_mode="auto",
        n_full_scores=1,
    )
    assert last_search_stats()["approx_mode"] == "cells_full"


def test_pool_divisor_plumbs_and_keeps_winners(test_index_path):
    """pool_divisor narrows the exact-rerank pool (R = n_full_scores //
    divisor) without touching exactness: on a well-probed corpus where the
    pool still covers the relevant candidates, results are identical, and
    a planted self-retrieval query wins at every divisor."""
    rng = np.random.default_rng(7)
    docs = random_documents(rng, 60, 12, 32, variable=True)
    eng = search.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=docs)
    probe = docs[17][:6][None]
    base = eng.search(probe, top_k=5, show_progress=False)
    for div in (2, 4, 8):
        r = eng.search(
            probe, top_k=5, show_progress=False, pool_divisor=div
        )
        assert r[0][0][0] == 17
        # exact scores for shared winners match the default-pool run
        sa = dict(base[0])
        for pid, sc in r[0]:
            if pid in sa:
                assert abs(sa[pid] - sc) < 1e-4
    # env-var override path
    import os

    os.environ["FASTPLAID_POOL_DIV"] = "4"
    try:
        r_env = eng.search(probe, top_k=5, show_progress=False)
        assert r_env[0][0][0] == 17
    finally:
        del os.environ["FASTPLAID_POOL_DIV"]
