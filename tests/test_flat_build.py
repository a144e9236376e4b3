"""Flat-corpus build path: must agree with the list-based builder."""

import numpy as np

from fast_plaid_tpu import testing
from fast_plaid_tpu.search.engine import search_core


def test_flat_corpus_shapes():
    rng = np.random.default_rng(0)
    flat, lens = testing.random_flat_corpus(rng, 20, 12, 16, variable=True)
    assert flat.shape == (int(lens.sum()), 16)
    np.testing.assert_allclose(
        np.linalg.norm(flat, axis=-1), 1.0, atol=1e-5
    )


def test_flat_build_searches_like_list_build():
    rng = np.random.default_rng(1)
    docs = testing.random_documents(rng, 40, 12, 32, variable=True)
    flat = np.concatenate(docs)
    lens = np.asarray([d.shape[0] for d in docs], np.int64)

    dev_a, spec_a = testing.build_memory_index(docs, nbits=4, seed=2)
    dev_b, spec_b = testing.build_memory_index_flat(flat, lens, nbits=4, seed=2)
    assert spec_a.n_docs == spec_b.n_docs
    assert spec_a.n_partitions == spec_b.n_partitions

    # The two builders sample the codec's held-out residuals differently
    # (document tails vs uniform tokens), so quantized scores differ by a
    # hair and random-embedding near-ties can reorder; assert the robust
    # property instead — self-retrieval with matching top scores.
    kw = dict(top_k=1, n_ivf_probe=8, n_full_scores=256, want_tokens=False)
    for target in (0, 17, 39):
        q = docs[target][None, :5, :]
        pa, sa = (np.asarray(x) for x in search_core(dev_a, q, None, ispec=spec_a, **kw))
        pb, sb = (np.asarray(x) for x in search_core(dev_b, q, None, ispec=spec_b, **kw))
        assert pa[0, 0] == target and pb[0, 0] == target
        np.testing.assert_allclose(sa[0, 0], sb[0, 0], atol=0.1)
