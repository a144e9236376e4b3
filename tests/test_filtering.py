"""Subset + SQLite metadata filtering.

Mirrors the reference TestSubsetFiltering, TestMetadataFiltering and
TestFilteringModule (/root/reference/tests/test.py:392-668, 1306-1352).
"""

import datetime

import numpy as np
import pytest

from fast_plaid_tpu import filtering, search
from fast_plaid_tpu.testing import random_documents, random_queries

DIM = 32


def _docs(seed, n, ln=12):
    return random_documents(np.random.default_rng(seed), n, ln, DIM)


def _queries(seed, n=2, ln=5):
    return random_queries(np.random.default_rng(seed), n, ln, DIM)


class TestSubsetFiltering:
    def test_shared_subset(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(0, 40))
        subset = [1, 3, 5, 7, 9, 11]
        results = eng.search(
            _queries(1, 3), top_k=10, subset=subset, show_progress=False
        )
        assert len(results) == 3
        for row in results:
            assert len(row) > 0
            assert all(p in set(subset) for p, _ in row)

    def test_per_query_subsets(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(2, 40))
        subsets = [[0, 1, 2], [10, 11, 12, 13]]
        results = eng.search(
            _queries(3, 2), top_k=10, subset=subsets, show_progress=False
        )
        for row, sub in zip(results, subsets):
            assert len(row) > 0
            assert all(p in set(sub) for p, _ in row)

    def test_int_subset(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(4, 20))
        results = eng.search(
            _queries(5, 2), top_k=5, subset=7, show_progress=False
        )
        for row in results:
            assert [p for p, _ in row] == [7]

    def test_subset_scores_match_unfiltered(self, test_index_path):
        """A subset hit must carry the same exact score as unfiltered search."""
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(6, 30)
        eng.create(documents_embeddings=docs)
        q = docs[4][None]
        full = dict((p, s) for p, s in eng.search(q, top_k=30, show_progress=False)[0])
        sub = eng.search(q, top_k=5, subset=[4, 8, 15], show_progress=False)[0]
        for p, s in sub:
            assert abs(full[p] - s) < 1e-3


class TestMetadataFiltering:
    METADATA = [
        {"cat": "a", "price": 10, "when": datetime.date(2020, 1, 1)},
        {"cat": "a", "price": 25, "when": datetime.date(2021, 2, 2)},
        {"cat": "b", "price": 5, "when": datetime.date(2022, 3, 3)},
        {"cat": "b", "price": 50, "when": datetime.date(2023, 4, 4)},
        {"cat": "c", "price": 30, "when": datetime.date(2024, 5, 5)},
    ] * 4  # 20 docs

    def _build(self, path):
        eng = search.FastPlaid(index=path, device="cpu")
        eng.create(documents_embeddings=_docs(7, 20), metadata=self.METADATA)
        return eng

    def test_where_and_search_composition(self, test_index_path):
        eng = self._build(test_index_path)
        ids = filtering.where(
            index=test_index_path, condition="cat = ?", parameters=("a",)
        )
        assert ids == [i for i in range(20) if i % 5 in (0, 1)]
        results = eng.search(
            _queries(8, 1), top_k=20, subset=ids, show_progress=False
        )
        assert all(p in set(ids) for p, _ in results[0])

    def test_where_numeric_and_get(self, test_index_path):
        self._build(test_index_path)
        ids = filtering.where(
            index=test_index_path, condition="price > ?", parameters=(25,)
        )
        rows = filtering.get(index=test_index_path, subset=ids)
        assert all(r["price"] > 25 for r in rows)
        assert [r["_subset_"] for r in rows] == ids

    def test_date_roundtrip(self, test_index_path):
        self._build(test_index_path)
        rows = filtering.get(index=test_index_path, subset=[0])
        assert rows[0]["when"] == datetime.date(2020, 1, 1)

    def test_update_appends_metadata(self, test_index_path):
        eng = self._build(test_index_path)
        eng.update(
            documents_embeddings=_docs(9, 3),
            metadata=[{"cat": "z", "price": 1}] * 3,
            start_from_scratch=0,
        )
        ids = filtering.where(
            index=test_index_path, condition="cat = ?", parameters=("z",)
        )
        assert ids == [20, 21, 22]

    def test_delete_reindexes_metadata(self, test_index_path):
        self._build(test_index_path)
        filtering.delete(index=test_index_path, subset=[0, 1])
        rows = filtering.get(index=test_index_path)
        assert len(rows) == 18
        assert [r["_subset_"] for r in rows] == list(range(18))
        assert rows[0]["cat"] == "b"

    def test_metadata_length_mismatch_raises(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        with pytest.raises(ValueError):
            eng.create(
                documents_embeddings=_docs(10, 5), metadata=[{"x": 1}] * 3
            )


class TestFilteringModule:
    def test_create_get_where(self, tmp_path):
        idx = str(tmp_path)
        filtering.create(
            index=idx,
            metadata=[{"name": "alice", "age": 30}, {"name": "bob", "age": 25}],
        )
        assert filtering.where(idx, "age > ?", (26,)) == [0]
        rows = filtering.get(index=idx)
        assert rows[0]["name"] == "alice"

    def test_update_new_column(self, tmp_path):
        idx = str(tmp_path)
        filtering.create(index=idx, metadata=[{"a": 1}])
        filtering.update(index=idx, metadata=[{"a": 2, "b": "x"}])
        rows = filtering.get(index=idx)
        assert rows[1]["b"] == "x"
        assert rows[0]["b"] is None

    def test_delete_sorted_required(self, tmp_path):
        idx = str(tmp_path)
        filtering.create(index=idx, metadata=[{"a": i} for i in range(5)])
        with pytest.raises(ValueError):
            filtering.delete(index=idx, subset=[3, 1])

    def test_injection_guard(self, tmp_path):
        idx = str(tmp_path)
        with pytest.raises(ValueError):
            filtering.create(index=idx, metadata=[{"a; DROP TABLE x": 1}])
