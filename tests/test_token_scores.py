"""Token-score matrices: shapes, consistency with search(), MaxSim identity.

Mirrors the reference TestSearchTokenScores (/root/reference/tests/test.py:
106-197). The manual-MaxSim reproduction (175-197) is the one true
numerical-correctness anchor of the whole engine.
"""

import numpy as np
import pytest

from fast_plaid_tpu import search
from fast_plaid_tpu.testing import random_documents, random_queries


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("idx")
    rng = np.random.default_rng(0)
    docs = random_documents(rng, 40, 20, 48, variable=True)
    eng = search.FastPlaid(index=str(path / "i"), device="cpu")
    eng.create(documents_embeddings=docs)
    return eng


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(1)
    return random_queries(rng, 3, 7, 48)


def test_token_matrix_shapes(engine, queries):
    results = engine.search_token_scores(queries, top_k=5, show_progress=False)
    assert len(results) == 3
    for row in results:
        assert 0 < len(row) <= 5
        for pid, score, mat in row:
            assert mat.ndim == 2
            assert mat.shape[0] == 7  # q_tokens
            assert mat.shape[1] > 0  # that doc's token count
            assert isinstance(score, float)


def test_consistent_with_search(engine, queries):
    plain = engine.search(queries, top_k=5, show_progress=False)
    with_tok = engine.search_token_scores(queries, top_k=5, show_progress=False)
    for row_a, row_b in zip(plain, with_tok):
        assert [p for p, _ in row_a] == [p for p, _, _ in row_b]
        for (_, sa), (_, sb, _) in zip(row_a, row_b):
            assert abs(sa - sb) < 1e-3


def test_manual_maxsim_reproduces_score(engine, queries):
    """score == sum over query tokens of max over doc tokens of the matrix."""
    results = engine.search_token_scores(queries, top_k=5, show_progress=False)
    for row in results:
        for _, score, mat in row:
            manual = float(mat.max(axis=1).sum())
            assert abs(manual - score) < 0.1


def test_doc_token_counts_match_reconstruction(engine, queries):
    results = engine.search_token_scores(queries, top_k=3, show_progress=False)
    for row in results:
        pids = [p for p, _, _ in row]
        embs = engine.get_embeddings(pids)
        for (_, _, mat), emb in zip(row, embs):
            assert mat.shape[1] == emb.shape[0]
