"""Per-query failure containment (reference: rust/search/search.rs:252-268 —
a failing query yields an empty result instead of aborting the batch)."""

import warnings

import numpy as np
import pytest

from fast_plaid_tpu.search import FastPlaid


@pytest.fixture()
def index(tmp_path):
    rng = np.random.default_rng(7)
    docs = [
        rng.standard_normal((24, 64), dtype=np.float32) for _ in range(60)
    ]
    fp = FastPlaid(index=str(tmp_path / "idx"), device="cpu")
    fp.create(documents_embeddings=docs)
    yield fp
    fp.close()


def _query(rng, n=8, d=64):
    return rng.standard_normal((n, d)).astype(np.float32)


def test_nan_query_contained(index):
    rng = np.random.default_rng(8)
    queries = [_query(rng) for _ in range(5)]
    queries[2][3, 10] = np.nan
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        results = index.search(queries, top_k=5, show_progress=False)
    assert len(results) == 5
    assert results[2] == []
    for i in (0, 1, 3, 4):
        assert len(results[i]) == 5
        for pid, score in results[i]:
            assert 0 <= pid < 60
            assert np.isfinite(score)
    assert any("non-finite" in str(w.message) for w in caught)


def test_inf_and_bad_shape_contained(index):
    rng = np.random.default_rng(9)
    queries = [_query(rng) for _ in range(4)]
    queries[0][0, 0] = np.inf
    queries[3] = rng.standard_normal((8, 32)).astype(np.float32)  # wrong dim
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        results = index.search(queries, top_k=3, show_progress=False)
    assert results[0] == []
    assert results[3] == []
    assert len(results[1]) == 3
    assert len(results[2]) == 3


def test_contained_results_match_clean_batch(index):
    """Healthy queries score identically with or without a poisoned peer."""
    rng = np.random.default_rng(10)
    clean = [_query(rng) for _ in range(3)]
    baseline = index.search(clean, top_k=5, show_progress=False)
    poisoned = [clean[0], np.full((8, 64), np.nan, np.float32), *clean[1:]]
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        results = index.search(poisoned, top_k=5, show_progress=False)
    assert results[1] == []
    got = [results[0], results[2], results[3]]
    for b_row, g_row in zip(baseline, got):
        assert [p for p, _ in b_row] == [p for p, _ in g_row]
        np.testing.assert_allclose(
            [s for _, s in b_row], [s for _, s in g_row], rtol=1e-5
        )


def test_default_approx_mode_is_auto(index):
    """The library default must be the recall-safe selector (VERDICT r2 #3)."""
    import inspect

    sig = inspect.signature(FastPlaid.search)
    assert sig.parameters["approx_mode"].default == "auto"
    sig = inspect.signature(FastPlaid.search_token_scores)
    assert sig.parameters["approx_mode"].default == "auto"
