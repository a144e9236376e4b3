"""Streaming builds (index/streaming.py): chunked single-device and
mesh-sharded construction must agree with each other and with the
non-streaming device build on search results."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fast_plaid_tpu import testing
from fast_plaid_tpu.index.streaming import (
    build_memory_index_streaming,
    build_sharded_index_streaming,
    train_global_codec,
)
from fast_plaid_tpu.parallel.sharded import sharded_search
from fast_plaid_tpu.search.engine import search_core

DIM = 48


def make_corpus(n_docs=500, base_len=24, dim=DIM, seed=5):
    rng = np.random.default_rng(seed)
    lens = rng.integers(base_len // 2, base_len + 1, n_docs).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    flat = rng.standard_normal((int(lens.sum()), dim)).astype(np.float32)
    flat /= np.linalg.norm(flat, axis=-1, keepdims=True)

    def chunk_gen(d0, d1):
        return jnp.asarray(flat[starts[d0] : starts[d1]])

    return chunk_gen, lens, flat, starts


@pytest.fixture(scope="module")
def corpus():
    return make_corpus()


@pytest.fixture(scope="module")
def trained(corpus):
    chunk_gen, lens, _, _ = corpus
    return train_global_codec(chunk_gen, lens, nbits=4, k=256, seed=9)


def _search(dev, ispec, queries, **kw):
    kw.setdefault("top_k", 10)
    kw.setdefault("n_ivf_probe", 8)
    kw.setdefault("n_full_scores", 128)
    out = search_core(
        dev, jnp.asarray(queries), None, ispec=ispec,
        want_tokens=False, **kw,
    )
    return tuple(np.asarray(x) for x in out)


class TestStreamingBuild:
    def test_chunked_equals_single_chunk(self, corpus, trained):
        chunk_gen, lens, _, _ = corpus
        cent, params, k = trained
        kw = dict(nbits=4, centroids=cent, codec_params=params)
        dev_a, spec_a = build_memory_index_streaming(
            chunk_gen, lens, chunk_docs=77, **kw
        )
        dev_b, spec_b = build_memory_index_streaming(
            chunk_gen, lens, chunk_docs=len(lens), **kw
        )
        assert spec_a == spec_b
        for name in ("codes", "residuals", "doc_lengths", "ivf_lengths"):
            np.testing.assert_array_equal(
                np.asarray(getattr(dev_a, name)),
                np.asarray(getattr(dev_b, name)),
                err_msg=name,
            )

    @pytest.mark.slow
    def test_matches_device_build_search(self, corpus, trained):
        """Streaming vs non-streaming build of the same corpus: same
        retrieval (codec training differs only in sample selection, so
        compare under the SAME trained codec via brute-force agreement)."""
        chunk_gen, lens, flat, starts = corpus
        cent, params, k = trained
        dev, ispec = build_memory_index_streaming(
            chunk_gen, lens, nbits=4, centroids=cent, codec_params=params,
            chunk_docs=77,
        )
        rng = np.random.default_rng(3)
        queries = testing.random_queries(rng, 6, 8, DIM)
        # Exhaustive probe -> must equal brute force over decompressed docs.
        pids, scores = _search(
            dev, ispec, queries, n_ivf_probe=k, n_full_scores=2 * len(lens)
        )[:2]
        from fast_plaid_tpu.ops import codec as codec_ops

        res3d = np.asarray(dev.residuals).reshape(
            dev.codes.shape[0], ispec.doc_cap, -1
        )
        for qi in range(len(queries)):
            truth = np.full(len(lens), -np.inf, np.float32)
            for d in range(len(lens)):
                emb = np.asarray(
                    codec_ops.decompress(
                        dev.codes[d, : lens[d]],
                        jnp.asarray(res3d[d, : lens[d]]),
                        dev.centroids,
                        dev.bucket_weights,
                        4,
                    )
                )
                truth[d] = (emb @ queries[qi].T).max(axis=0).sum()
            order = np.argsort(-truth)[:10]
            # Exact-order equality up to float-accumulation ties: the
            # engine scores in f32 on device, truth in numpy — two docs
            # within ~1e-3 can legitimately swap. Require the engine's
            # picks to carry the same truth-score profile as the true
            # top-10 (any swap beyond tie tolerance shifts a score here).
            np.testing.assert_allclose(
                truth[pids[qi]], truth[order], rtol=2e-3, atol=2e-3
            )
            np.testing.assert_allclose(
                scores[qi], truth[pids[qi]], rtol=2e-3, atol=2e-3
            )

    @pytest.mark.slow
    def test_sharded_matches_single_device(self, corpus, trained):
        chunk_gen, lens, _, _ = corpus
        cent, params, k = trained
        mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("d",))
        sharded = build_sharded_index_streaming(
            chunk_gen, lens, mesh, nbits=4,
            centroids=cent, codec_params=params, chunk_docs=50,
        )
        dev, ispec = build_memory_index_streaming(
            chunk_gen, lens, nbits=4, centroids=cent, codec_params=params,
        )
        rng = np.random.default_rng(4)
        queries = testing.random_queries(rng, 8, 8, DIM)
        # Exhaustive budget on both sides: every doc exact-scored, so the
        # merged shard results must EQUAL the single-device results (an
        # 8-probe comparison would be apples-to-oranges — each shard runs
        # the full probe/rerank budget locally, like the reference's
        # multi-GPU dispatch).
        n = len(lens)
        sp, ss = sharded_search(
            sharded, queries, top_k=10, n_ivf_probe=k, n_full_scores=2 * n
        )
        gp, gs = _search(
            dev, ispec, queries, n_ivf_probe=k, n_full_scores=2 * n
        )[:2]
        sp, ss = np.asarray(sp), np.asarray(ss)
        np.testing.assert_array_equal(sp, gp)
        np.testing.assert_allclose(ss, gs, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_sharded_empty_tail_shards(self, trained):
        """More shards than needed: tail shards hold zero documents."""
        chunk_gen, lens, _, _ = make_corpus(n_docs=11, seed=8)
        cent, params, k = train_global_codec(
            chunk_gen, lens, nbits=4, k=64, seed=9
        )
        mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("d",))
        sharded = build_sharded_index_streaming(
            chunk_gen, lens, mesh, nbits=4, centroids=cent,
            codec_params=params, chunk_docs=3,
        )
        rng = np.random.default_rng(1)
        queries = testing.random_queries(rng, 3, 6, DIM)
        sp, ss = sharded_search(
            sharded, queries, top_k=5, n_ivf_probe=8, n_full_scores=32
        )
        sp = np.asarray(sp)
        assert (sp[:, 0] >= 0).all() and (sp < 11).all() | (sp == -1).all()
