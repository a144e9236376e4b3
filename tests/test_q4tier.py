"""Integration tests for the q4 prefilter tier (resident + low_memory).

The tier must be result-transparent: the prefilter only narrows the
exact-rescore pool, so the returned (pid, score) lists must match the
plain codec-rerank cascade — scores exactly, pids up to exact-score ties.
"""

import numpy as np

import jax

from fast_plaid_tpu.index import ivf as ivf_mod
from fast_plaid_tpu.index.builder import (
    compress_documents,
    train_codec_from_documents,
)
from fast_plaid_tpu.index.layout import (
    build_q4_cache,
    q4_cache_bytes,
    to_device,
)
from fast_plaid_tpu.ops.kmeans import train_kmeans
from fast_plaid_tpu.search.load import LoadedIndex, _build_q4_from_host
from fast_plaid_tpu.search.searcher import search_on_device
from fast_plaid_tpu.testing import random_documents, random_queries


def _build_all(docs, nbits=4):
    """(plain, q4-resident, low_memory+q4) LoadedIndexes over ``docs``."""
    flat = np.concatenate(docs)
    centroids = train_kmeans(flat, k=64, niters=4, seed=3)
    params = train_codec_from_documents(docs, centroids, nbits, 3)
    codes, packed = compress_documents(
        docs, centroids, params.bucket_cutoffs, nbits
    )
    doc_lengths = np.asarray([d.shape[0] for d in docs], np.int64)
    ivf, ivf_lengths = ivf_mod.build_ivf(
        codes, doc_lengths, centroids.shape[0]
    )
    common = dict(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        nbits=nbits,
    )
    cpu = jax.devices("cpu")[0]
    dev_plain, ispec = to_device(**common, device=cpu)
    dev_q4 = build_q4_cache(dev_plain, ispec)
    assert dev_q4.emb_q4 is not None and dev_q4.q4_scale is not None
    dev_lm, _ = to_device(**common, device=cpu, residuals_on_device=False)
    offsets = np.concatenate([[0], np.cumsum(doc_lengths)])[:-1]
    plain = LoadedIndex(dev_plain, ispec, cpu, ivf_lengths_host=ivf_lengths)
    resident = LoadedIndex(dev_q4, ispec, cpu, ivf_lengths_host=ivf_lengths)
    lm = LoadedIndex(
        dev_lm,
        ispec,
        cpu,
        ivf_lengths_host=ivf_lengths,
        low_memory=True,
        host_codes=codes.astype(np.int32),
        host_residuals=packed,
        host_doc_offsets=offsets.astype(np.int64),
        host_doc_lengths=doc_lengths.astype(np.int32),
    )
    _build_q4_from_host(lm, block=64)  # multiple blocks at this size
    assert lm.dev.emb_q4 is not None
    return plain, resident, lm, ispec


def _results_match(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert [p for p, _ in ra] == [p for p, _ in rb]
        np.testing.assert_allclose(
            [s for _, s in ra], [s for _, s in rb], rtol=1e-5, atol=1e-5
        )


class TestQ4Tier:
    def setup_method(self):
        rng = np.random.default_rng(11)
        self.docs = random_documents(rng, 120, 14, 32, variable=True)
        self.queries = [q for q in random_queries(rng, 6, 5, 32)]
        self.plain, self.resident, self.lm, self.ispec = _build_all(self.docs)
        self.kwargs = dict(
            top_k=5,
            n_full_scores=128,  # pool 64 > rescue_pool(5)=32: tier active
            n_ivf_probe=16,
            subsets=None,
            want_tokens=False,
            show_progress=False,
        )

    def test_resident_q4_matches_plain(self):
        r_plain = search_on_device(self.plain, self.queries, **self.kwargs)
        r_q4 = search_on_device(self.resident, self.queries, **self.kwargs)
        _results_match(r_plain, r_q4)

    def test_low_memory_q4_matches_plain(self):
        r_plain = search_on_device(self.plain, self.queries, **self.kwargs)
        r_lm = search_on_device(self.lm, self.queries, **self.kwargs)
        _results_match(r_plain, r_lm)

    def test_host_and_device_q4_caches_agree(self):
        # Same corpus quantized via the device blockwise path and via the
        # host row-stream path must produce identical bytes.
        a = np.asarray(self.resident.dev.emb_q4)
        b = np.asarray(self.lm.dev.emb_q4)
        n_real = len(self.docs)
        np.testing.assert_array_equal(a[:n_real], b[:n_real])
        sa = np.asarray(self.resident.dev.q4_scale)[:n_real]
        sb = np.asarray(self.lm.dev.q4_scale)[:n_real]
        np.testing.assert_allclose(sa, sb, rtol=1e-6)

    def test_exhaustive_params_bypass_prefilter(self):
        # Brute-force-identity contract: with corpus-covering parameters
        # results equal the untiered cascade exactly (prefilter bypassed).
        kwargs = dict(self.kwargs)
        kwargs["n_full_scores"] = 2 * len(self.docs)
        kwargs["n_ivf_probe"] = 64
        r_plain = search_on_device(self.plain, self.queries, **kwargs)
        r_q4 = search_on_device(self.resident, self.queries, **kwargs)
        r_lm = search_on_device(self.lm, self.queries, **kwargs)
        _results_match(r_plain, r_q4)
        _results_match(r_plain, r_lm)

    def test_token_scores_through_tier(self):
        kwargs = dict(self.kwargs)
        kwargs["want_tokens"] = True
        r_plain = search_on_device(self.plain, self.queries, **kwargs)
        r_q4 = search_on_device(self.resident, self.queries, **kwargs)
        for ra, rb in zip(r_plain, r_q4):
            for (pa, sa, ma), (pb, sb, mb) in zip(ra, rb):
                assert pa == pb
                np.testing.assert_allclose(ma, mb, rtol=1e-5, atol=1e-5)

    def test_q4_cache_bytes_accounting(self):
        got = q4_cache_bytes(self.ispec)
        dev = self.resident.dev
        assert dev.q4_scale.ndim == 1  # per-document scale
        real = dev.emb_q4.size + dev.q4_scale.size * 4
        assert got == real
