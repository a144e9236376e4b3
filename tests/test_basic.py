"""End-to-end create + search through the public API.

Mirrors the reference's TestBasicCreateAndSearch contract
(/root/reference/tests/test.py:31-103): structural invariants — result
counts, id ranges, descending scores — on random embeddings, CPU backend.
"""

import numpy as np
import pytest

from fast_plaid_tpu import search


def make_docs(rng, n, length, dim, variable=False):
    docs = []
    for _ in range(n):
        ln = int(rng.integers(length // 2, length + 1)) if variable else length
        x = rng.standard_normal((ln, dim)).astype(np.float32)
        docs.append(x / np.linalg.norm(x, axis=-1, keepdims=True))
    return docs


def make_queries(rng, n, length, dim):
    x = rng.standard_normal((n, length, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def engine(test_index_path):
    return search.FastPlaid(index=test_index_path, device="cpu")


class TestBasicCreateAndSearch:
    def test_create_and_search_uniform(self, engine):
        rng = np.random.default_rng(42)
        docs = make_docs(rng, 50, 24, 64)
        engine.create(documents_embeddings=docs)
        queries = make_queries(rng, 3, 8, 64)
        results = engine.search(queries, top_k=10, show_progress=False)
        assert len(results) == 3
        for row in results:
            assert 0 < len(row) <= 10
            for pid, score in row:
                assert 0 <= pid < 50
                assert isinstance(score, float)
            scores = [s for _, s in row]
            assert scores == sorted(scores, reverse=True)
            pids = [p for p, _ in row]
            assert len(set(pids)) == len(pids)

    def test_variable_length_docs(self, engine):
        rng = np.random.default_rng(7)
        docs = make_docs(rng, 40, 30, 32, variable=True)
        engine.create(documents_embeddings=docs)
        results = engine.search(
            make_queries(rng, 2, 6, 32), top_k=5, show_progress=False
        )
        assert len(results) == 2
        assert all(len(r) <= 5 for r in results)
        assert all(len(r) > 0 for r in results)

    def test_small_index(self, engine):
        rng = np.random.default_rng(3)
        docs = make_docs(rng, 5, 12, 32)
        engine.create(documents_embeddings=docs)
        results = engine.search(
            make_queries(rng, 1, 4, 32), top_k=10, show_progress=False
        )
        assert len(results) == 1
        assert len(results[0]) <= 5

    def test_search_finds_exact_document(self, engine):
        """A query identical to a document's tokens must rank it first."""
        rng = np.random.default_rng(11)
        docs = make_docs(rng, 30, 16, 48)
        engine.create(documents_embeddings=docs)
        for target in [0, 13, 29]:
            results = engine.search(
                docs[target][None, :, :], top_k=3, show_progress=False
            )
            assert results[0][0][0] == target

    def test_3d_tensor_input(self, engine):
        rng = np.random.default_rng(5)
        docs = np.stack(make_docs(rng, 20, 10, 32))
        engine.create(documents_embeddings=docs)
        results = engine.search(
            make_queries(rng, 2, 4, 32), top_k=4, show_progress=False
        )
        assert len(results) == 2


def test_long_documents(test_index_path):
    """Docs in the reference benchmark regime (~300 tokens)."""
    rng = np.random.default_rng(99)
    docs = make_docs(rng, 25, 300, 64, variable=True)
    eng = search.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=docs)
    res = eng.search(docs[3][None, :64, :], top_k=3, show_progress=False)
    assert res[0][0][0] == 3
