"""Length-bucketed rerank layout: parity with the single-cap layout.

The TPU analog of StridedTensor's quantile strides (reference:
rust/search/tensor.rs:154-191): mixed-length corpora store rerank rows per
length bucket so padding FLOPs/bytes track the length distribution, not the
longest document. These tests pin (a) the bucket planner's engage/skip
decision, (b) result parity against the single-cap layout on a skewed
corpus, and (c) the memory win.
"""

from __future__ import annotations

import numpy as np
import pytest

from fast_plaid_tpu import testing
from fast_plaid_tpu.index.layout import emb_cache_bytes, plan_buckets
from fast_plaid_tpu.search.engine import (
    _bucket_quota,
    reconstruct_core,
    search_core,
)


def _mixed_corpus(rng, n_short=400, n_long=40, short=48, long=320, dim=64):
    """Clustered mixed-length corpus: 90% short docs, 10% long docs."""
    lens = np.concatenate(
        [
            rng.integers(short // 2, short + 1, size=n_short),
            rng.integers(long - 32, long + 1, size=n_long),
        ]
    ).astype(np.int64)
    rng.shuffle(lens)
    docs = []
    for ln in lens:
        x = rng.standard_normal((int(ln), dim)).astype(np.float32)
        docs.append(x / np.linalg.norm(x, axis=-1, keepdims=True))
    return docs


def test_plan_buckets_uniform_skips():
    lens = np.full(1000, 160)
    assert plan_buckets(lens, 160) is None
    lens = np.random.default_rng(0).integers(120, 161, size=1000)
    assert plan_buckets(lens, 160) is None  # not enough skew to pay off


def test_plan_buckets_skewed_engages():
    rng = np.random.default_rng(0)
    lens = np.where(rng.random(1000) < 0.9, 100, 1000).astype(np.int64)
    caps = plan_buckets(lens, 1000)
    assert caps is not None
    assert caps[-1] == 1000
    assert caps == sorted(caps)
    assert all(c % 16 == 0 for c in caps[:-1])  # last = doc_cap as given
    assert caps[0] >= 100  # smallest cap still fits the short docs


def test_bucket_quota_bounds():
    from fast_plaid_tpu.index.layout import IndexSpec

    ispec = IndexSpec(
        dim=64,
        nbits=4,
        n_docs=1000,
        n_partitions=64,
        doc_cap=320,
        cell_cap=64,
        has_ivf=True,
        bucket_caps=(64, 320),
        bucket_counts=(900, 100),
    )
    r = 512
    q0, q1 = _bucket_quota(r, ispec, 0), _bucket_quota(r, ispec, 1)
    assert q0 == r  # dominant bucket gets full room
    assert 64 <= q1 <= r  # minority bucket: 2x share + floor
    assert q1 >= int(r * 0.1 * 2)


@pytest.mark.parametrize("emb_cache", [False, True])
def test_bucketed_search_matches_single_cap(emb_cache):
    rng = np.random.default_rng(7)
    docs = _mixed_corpus(rng)
    queries = testing.random_queries(rng, 8, 12, 64)

    dev0, ispec0 = testing.build_memory_index(
        docs, nbits=4, seed=1, emb_cache=emb_cache, length_buckets=0
    )
    dev1, ispec1 = testing.build_memory_index(
        docs, nbits=4, seed=1, emb_cache=emb_cache, length_buckets=4
    )
    assert ispec1.bucket_caps, "skewed corpus must engage bucketing"
    assert dev1.residuals is None and dev1.emb_cache is None
    assert len(dev1.buckets) == len(ispec1.bucket_caps)

    kw = dict(
        top_k=10, n_ivf_probe=8, n_full_scores=256, want_tokens=False
    )
    p0, s0 = search_core(dev0, queries, None, ispec=ispec0, **kw)
    p1, s1 = search_core(dev1, queries, None, ispec=ispec1, **kw)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(
        np.asarray(s0), np.asarray(s1), rtol=2e-2, atol=2e-2
    )


def test_bucketed_token_scores_match():
    rng = np.random.default_rng(3)
    docs = _mixed_corpus(rng, n_short=120, n_long=16)
    queries = testing.random_queries(rng, 4, 8, 64)
    dev0, ispec0 = testing.build_memory_index(docs, seed=2, length_buckets=0)
    dev1, ispec1 = testing.build_memory_index(docs, seed=2, length_buckets=4)
    assert ispec1.bucket_caps
    kw = dict(top_k=5, n_ivf_probe=8, n_full_scores=128, want_tokens=True)
    p0, s0, t0, l0 = search_core(dev0, queries, None, ispec=ispec0, **kw)
    p1, s1, t1, l1 = search_core(dev1, queries, None, ispec=ispec1, **kw)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(
        np.asarray(t0), np.asarray(t1), rtol=2e-2, atol=2e-2
    )


def test_bucketed_reconstruct_matches():
    rng = np.random.default_rng(5)
    docs = _mixed_corpus(rng, n_short=100, n_long=12)
    dev0, ispec0 = testing.build_memory_index(docs, seed=4, length_buckets=0)
    dev1, ispec1 = testing.build_memory_index(docs, seed=4, length_buckets=4)
    assert ispec1.bucket_caps
    pids = np.asarray([0, 3, 50, 111], np.int32)
    e0, l0 = reconstruct_core(dev0, pids, ispec=ispec0)
    e1, l1 = reconstruct_core(dev1, pids, ispec=ispec1)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(
        np.asarray(e0), np.asarray(e1), rtol=1e-5, atol=1e-6
    )


def test_bucketed_layout_saves_memory():
    rng = np.random.default_rng(9)
    docs = _mixed_corpus(rng)
    dev0, ispec0 = testing.build_memory_index(docs, seed=6, length_buckets=0)
    dev1, ispec1 = testing.build_memory_index(docs, seed=6, length_buckets=4)
    full = dev0.residuals.size
    bucketed = sum(b.residuals.size for b in dev1.buckets)
    assert bucketed < 0.55 * full  # 90/10 mix at ~6.7x cap ratio
    assert emb_cache_bytes(ispec1) < 0.55 * emb_cache_bytes(ispec0)


def test_bucketed_via_fastplaid_api(test_index_path):
    """End-to-end through FastPlaid: create skewed corpus, search, tokens."""
    from fast_plaid_tpu import search

    rng = np.random.default_rng(11)
    docs = _mixed_corpus(rng, n_short=150, n_long=18)
    fp = search.FastPlaid(test_index_path, device="cpu", low_memory=False)
    fp.create(documents_embeddings=docs)
    loaded = next(iter(fp.indices.values()))
    assert loaded.ispec.bucket_caps, "API load should auto-bucket skewed corpora"
    queries = testing.random_queries(rng, 3, 8, 64)
    res = fp.search(queries_embeddings=list(queries), top_k=5)
    assert len(res) == 3
    assert all(len(r) == 5 for r in res)
    # exact brute-force cross-check of the top hit for query 0
    emb = fp.get_embeddings(list(range(len(docs))))
    best = max(
        range(len(docs)),
        key=lambda i: float(
            np.maximum(queries[0] @ emb[i].T, 0.0).max(axis=1).sum()
        ),
    )
    top_pid = res[0][0][0]
    scores = {
        i: float(np.max(queries[0] @ emb[i].T, axis=1).sum())
        for i in range(len(docs))
    }
    ranked = sorted(scores, key=scores.get, reverse=True)
    assert top_pid in ranked[:3] or top_pid == best
