"""low_memory (host-resident residuals, streamed rerank) parity tests.

On CPU devices the FastPlaid class disables low_memory (as the reference
does); here we force the streamed path directly and require bit-identical
results vs the fully device-resident cascade.
"""

import numpy as np

import jax

from fast_plaid_tpu.index import ivf as ivf_mod
from fast_plaid_tpu.index.builder import (
    compress_documents,
    train_codec_from_documents,
)
from fast_plaid_tpu.index.layout import to_device
from fast_plaid_tpu.ops.kmeans import train_kmeans
from fast_plaid_tpu.search.load import LoadedIndex
from fast_plaid_tpu.search.searcher import search_on_device
from fast_plaid_tpu.testing import random_documents, random_queries


def _build_pair(docs, nbits=4):
    flat = np.concatenate(docs)
    centroids = train_kmeans(flat, k=64, niters=4, seed=3)
    params = train_codec_from_documents(docs, centroids, nbits, 3)
    codes, packed = compress_documents(docs, centroids, params.bucket_cutoffs, nbits)
    doc_lengths = np.asarray([d.shape[0] for d in docs], np.int64)
    ivf, ivf_lengths = ivf_mod.build_ivf(codes, doc_lengths, centroids.shape[0])
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
    dev_full, ispec = to_device(**common, device=cpu)
    dev_lm, _ = to_device(**common, device=cpu, residuals_on_device=False)
    offsets = np.concatenate([[0], np.cumsum(doc_lengths)])[:-1]
    full = LoadedIndex(dev_full, ispec, cpu, ivf_lengths_host=ivf_lengths)
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
    return full, lm


def test_low_memory_matches_full():
    rng = np.random.default_rng(4)
    docs = random_documents(rng, 50, 16, 32, variable=True)
    queries = [q for q in random_queries(rng, 5, 6, 32)]
    full, lm = _build_pair(docs)
    kwargs = dict(
        top_k=7,
        n_full_scores=64,
        n_ivf_probe=8,
        subsets=None,
        want_tokens=False,
        show_progress=False,
    )
    r_full = search_on_device(full, queries, **kwargs)
    r_lm = search_on_device(lm, queries, **kwargs)
    assert len(r_full) == len(r_lm)
    for a, b in zip(r_full, r_lm):
        assert [p for p, _ in a] == [p for p, _ in b]
        np.testing.assert_allclose(
            [s for _, s in a], [s for _, s in b], rtol=1e-5
        )


def test_low_memory_token_scores():
    rng = np.random.default_rng(5)
    docs = random_documents(rng, 30, 12, 32)
    queries = [q for q in random_queries(rng, 2, 5, 32)]
    full, lm = _build_pair(docs)
    kwargs = dict(
        top_k=4,
        n_full_scores=64,
        n_ivf_probe=8,
        subsets=None,
        want_tokens=True,
        show_progress=False,
    )
    r_full = search_on_device(full, queries, **kwargs)
    r_lm = search_on_device(lm, queries, **kwargs)
    for a, b in zip(r_full, r_lm):
        for (pa, sa, ma), (pb, sb, mb) in zip(a, b):
            assert pa == pb
            np.testing.assert_allclose(ma, mb, rtol=1e-5)
            assert abs(float(ma.max(axis=1).sum()) - sa) < 0.1
