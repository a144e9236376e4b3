"""Device-resident build (index/device_build.py) vs the host build path.

Same corpus, same seed: the two pipelines must produce equivalent indexes
(identical codes/lengths/IVF histograms up to quantile-interpolation float
noise) and near-identical search results.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from fast_plaid_tpu import testing
from fast_plaid_tpu.index.device_build import build_memory_index_device
from fast_plaid_tpu.search.engine import search_core


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    n, length, dim = 400, 48, 64
    flat, lens = testing.random_flat_corpus(rng, n, length, dim, variable=True)
    queries = testing.random_queries(rng, 8, 12, dim)
    return flat, lens, queries


def _search(dev, ispec, queries, **kw):
    out = search_core(
        jax.device_put(dev),
        jnp.asarray(queries),
        None,
        ispec=ispec,
        top_k=10,
        n_ivf_probe=8,
        n_full_scores=256,
        want_tokens=False,
        **kw,
    )
    return tuple(np.asarray(x) for x in out)


class TestDeviceBuild:
    def test_matches_host_build(self, corpus):
        flat, lens, queries = corpus
        dev_h, spec_h = testing.build_memory_index_flat(
            np.asarray(flat), lens, nbits=4, seed=3
        )
        dev_d, spec_d = build_memory_index_device(
            jnp.asarray(flat), lens, nbits=4, seed=3
        )

        assert spec_d.n_docs == spec_h.n_docs
        assert spec_d.doc_cap == spec_h.doc_cap
        assert spec_d.n_partitions == spec_h.n_partitions
        # Same codes / lengths / IVF histogram.
        np.testing.assert_array_equal(
            np.asarray(dev_d.doc_lengths), np.asarray(dev_h.doc_lengths)
        )
        np.testing.assert_array_equal(
            np.asarray(dev_d.codes), np.asarray(dev_h.codes)
        )
        np.testing.assert_array_equal(
            np.asarray(dev_d.ivf_lengths), np.asarray(dev_h.ivf_lengths)
        )
        np.testing.assert_array_equal(
            np.asarray(dev_d.ivf_offsets), np.asarray(dev_h.ivf_offsets)
        )
        # IVF content: identical pid sets per cell (both sorted by pid).
        np.testing.assert_array_equal(
            np.asarray(dev_d.ivf)[: spec_h.n_docs * 4],
            np.asarray(dev_h.ivf)[: spec_h.n_docs * 4],
        )
        # Residual planes agree up to quantile-interpolation float noise in
        # the trained cutoffs (values sitting exactly on a cutoff may move
        # one bucket).
        res_d = np.asarray(dev_d.residuals)
        res_h = np.asarray(dev_h.residuals)
        assert (res_d == res_h).mean() > 0.999

        ph, sh, *_ = _search(dev_h, spec_h, queries)
        pd_, sd, *_ = _search(dev_d, spec_d, queries)
        assert (ph == pd_).mean() > 0.95
        np.testing.assert_allclose(sh, sd, rtol=1e-3, atol=1e-3)

    def test_flat_builder_dispatches_device_path(self, corpus):
        flat, lens, queries = corpus
        dev, ispec = testing.build_memory_index_flat(
            jnp.asarray(flat), lens, nbits=4, seed=3, emb_cache=True
        )
        assert dev.emb_cache is not None
        pids, scores, *_ = _search(dev, ispec, queries)
        # Self-consistency: every query returns real, scored results.
        assert (pids[:, 0] >= 0).all()
        assert np.isfinite(scores[:, 0]).all()

    def test_ivf_big_path_matches_host(self, corpus):
        """_ivf_device_big groups the same per-cell pid sets as build_ivf
        (within-cell order is unspecified for the big path)."""
        from fast_plaid_tpu.index.device_build import _ivf_device_big
        from fast_plaid_tpu.index.ivf import build_ivf
        from fast_plaid_tpu.index.layout import round_up

        flat, lens, _ = corpus
        rng = np.random.default_rng(11)
        n_docs = len(lens)
        k, kp = 100, 128
        codes_flat = rng.integers(0, k, flat.shape[0]).astype(np.int32)
        ivf_h, len_h = build_ivf(codes_flat, lens, k)

        doc_cap = round_up(int(lens.max()), 16)
        npd = round_up(n_docs + 1, 8)
        codes2d = np.zeros((npd, doc_cap), np.int32)
        lengths = np.zeros((npd,), np.int32)
        lengths[:n_docs] = lens
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        for i, (s, ln) in enumerate(zip(starts, lens)):
            codes2d[i, :ln] = codes_flat[s : s + ln]

        pids_d, len_d, n_ivf = _ivf_device_big(
            jnp.asarray(codes2d), jnp.asarray(lengths), kp=kp, n_docs=n_docs
        )
        len_d = np.asarray(len_d)
        np.testing.assert_array_equal(len_d[:k], len_h)
        assert int(n_ivf) == ivf_h.size
        pids_d = np.asarray(pids_d)[: int(n_ivf)]
        off = np.concatenate([[0], np.cumsum(len_h)]).astype(int)
        for c in range(k):
            got = np.sort(pids_d[off[c] : off[c + 1]])
            np.testing.assert_array_equal(got, ivf_h[off[c] : off[c + 1]])

    def test_device_build_2bit(self, corpus):
        flat, lens, queries = corpus
        dev, ispec = build_memory_index_device(
            jnp.asarray(flat), lens, nbits=2, seed=3
        )
        pids, scores, *_ = _search(dev, ispec, queries)
        assert (pids[:, 0] >= 0).all()
