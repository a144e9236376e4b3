"""Reconstruction, compress_only, query formats, edge cases, determinism.

Mirrors the reference TestGetEmbeddings, TestCompressOnly, TestQueryFormats,
TestEdgeCases, TestScoreConsistency and TestMetadataDocumentCount
(/root/reference/tests/test.py:671-1303).
"""

import os

import numpy as np
import pytest

from fast_plaid_tpu import filtering, search
from fast_plaid_tpu.index import storage
from fast_plaid_tpu.testing import random_documents, random_queries

DIM = 32


def _docs(seed, n, ln=12, variable=False):
    return random_documents(np.random.default_rng(seed), n, ln, DIM, variable)


def _queries(seed, n=2, ln=5):
    return random_queries(np.random.default_rng(seed), n, ln, DIM)


class TestGetEmbeddings:
    def test_reconstruction_shapes(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(0, 15, variable=True)
        eng.create(documents_embeddings=docs)
        embs = eng.get_embeddings([0, 3, 7])
        assert len(embs) == 3
        for emb, pid in zip(embs, [0, 3, 7]):
            assert emb.shape == docs[pid].shape

    def test_reconstruction_quality(self, test_index_path):
        """Decompressed embeddings approximate the originals (cosine > 0.85)."""
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(1, 15)
        eng.create(documents_embeddings=docs)
        embs = eng.get_embeddings(list(range(15)))
        for emb, orig in zip(embs, docs):
            cos = np.sum(emb * orig, axis=-1)  # both unit-norm
            assert cos.mean() > 0.85

    def test_empty_subset(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(2, 5))
        assert eng.get_embeddings([]) == []


class TestCompressOnly:
    def test_no_ivf_files(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(3, 10), compress_only=True)
        assert not os.path.exists(os.path.join(test_index_path, "ivf.npy"))
        assert not os.path.exists(
            os.path.join(test_index_path, "ivf_lengths.npy")
        )
        assert storage.load_metadata(test_index_path)["compress_only"] is True

    def test_search_raises(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(4, 10), compress_only=True)
        with pytest.raises(ValueError, match="compress_only"):
            eng.search(_queries(5), show_progress=False)

    def test_get_embeddings_works(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(6, 10)
        eng.create(documents_embeddings=docs, compress_only=True)
        embs = eng.get_embeddings([0, 9])
        assert embs[0].shape == docs[0].shape

    def test_update_preserves_mode(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(7, 10), compress_only=True)
        eng.update(documents_embeddings=_docs(8, 5), start_from_scratch=999)
        meta = storage.load_metadata(test_index_path)
        assert meta["compress_only"] is True
        assert not os.path.exists(os.path.join(test_index_path, "ivf.npy"))


class TestQueryFormats:
    def _engine(self, path):
        eng = search.FastPlaid(index=path, device="cpu")
        eng.create(documents_embeddings=_docs(9, 20))
        return eng

    def test_list_of_variable_queries(self, test_index_path):
        eng = self._engine(test_index_path)
        rng = np.random.default_rng(10)
        queries = [
            rng.standard_normal((ln, DIM)).astype(np.float32) for ln in (3, 6, 4)
        ]
        results = eng.search(queries, top_k=3, show_progress=False)
        assert len(results) == 3

    def test_single_2d_query(self, test_index_path):
        eng = self._engine(test_index_path)
        q = np.random.default_rng(11).standard_normal((5, DIM)).astype(np.float32)
        results = eng.search(q, top_k=3, show_progress=False)
        assert len(results) == 1

    def test_3d_tensor_queries(self, test_index_path):
        eng = self._engine(test_index_path)
        results = eng.search(_queries(12, 4), top_k=3, show_progress=False)
        assert len(results) == 4


class TestEdgeCases:
    def test_top_k_larger_than_corpus(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(13, 6))
        results = eng.search(_queries(14, 1), top_k=50, show_progress=False)
        assert len(results[0]) <= 6

    @pytest.mark.parametrize("n_ivf_probe", [1, 2, 16])
    def test_probe_variants(self, test_index_path, n_ivf_probe):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(15, 20))
        results = eng.search(
            _queries(16, 1),
            top_k=5,
            n_ivf_probe=n_ivf_probe,
            show_progress=False,
        )
        assert len(results[0]) > 0

    @pytest.mark.parametrize("nbits", [2, 8])
    def test_nbits_variants(self, test_index_path, nbits):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(17, 20)
        eng.create(documents_embeddings=docs, nbits=nbits)
        res = eng.search(docs[5][None], top_k=1, show_progress=False)
        assert res[0][0][0] == 5

    def test_small_n_full_scores(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(18, 20))
        results = eng.search(
            _queries(19, 1), top_k=5, n_full_scores=8, show_progress=False
        )
        # rerank pool: n_full/2 in the default cells mode (n_full/4 in
        # reference-parity tokens mode)
        assert 0 < len(results[0]) <= 4


class TestScoreConsistency:
    def test_descending_and_deterministic(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(20, 30))
        q = _queries(21, 3)
        r1 = eng.search(q, top_k=10, show_progress=False)
        r2 = eng.search(q, top_k=10, show_progress=False)
        assert r1 == r2
        for row in r1:
            scores = [s for _, s in row]
            assert scores == sorted(scores, reverse=True)


class TestMetadataDocumentCount:
    def test_accounting_across_mutations(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(
            documents_embeddings=_docs(22, 12),
            metadata=[{"i": i} for i in range(12)],
            start_from_scratch=0,
        )

        def check(n):
            meta = storage.load_metadata(test_index_path)
            assert meta["num_documents"] == n
            assert len(filtering.get(index=test_index_path)) == n
            res = eng.search(_queries(23, 1), top_k=100, show_progress=False)
            assert all(0 <= p < n for p, _ in res[0])

        check(12)
        eng.update(
            documents_embeddings=_docs(24, 4),
            metadata=[{"i": 100 + i} for i in range(4)],
            start_from_scratch=0,
        )
        check(16)
        eng.delete(subset=[0, 15])
        check(14)
        eng.update(
            documents_embeddings=_docs(25, 2),
            metadata=[{"i": 200 + i} for i in range(2)],
            start_from_scratch=0,
        )
        check(16)


class TestValidation:
    def test_query_dim_mismatch_raises(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(30, 10))
        bad = np.random.default_rng(0).standard_normal((1, 5, DIM * 2))
        with pytest.raises(ValueError, match="dimension"):
            eng.search(bad.astype(np.float32), show_progress=False)

    def test_search_before_create_raises(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        with pytest.raises(FileNotFoundError):
            eng.search(_queries(31, 1), show_progress=False)
