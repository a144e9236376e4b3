"""2-D (replica x shard) mesh search vs the 1-D doc-sharded reference."""

from __future__ import annotations

import numpy as np

import jax
import pytest
from jax.sharding import Mesh

from fast_plaid_tpu import testing
from fast_plaid_tpu.index.streaming import (
    build_sharded_index_streaming,
    train_global_codec,
)
from fast_plaid_tpu.parallel.mesh2d import (
    make_mesh_2d,
    replicate_sharded_index,
    sharded_search_2d,
)
from fast_plaid_tpu.parallel.sharded import sharded_search

DIM = 32


@pytest.fixture(scope="module")
def built():
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    n_docs = 300
    lens = rng.integers(8, 17, n_docs).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    flat = rng.standard_normal((int(lens.sum()), DIM)).astype(np.float32)
    flat /= np.linalg.norm(flat, axis=-1, keepdims=True)
    flat_j = jnp.asarray(flat)

    def chunk_gen(a, b):
        return flat_j[int(starts[a]) : int(starts[b])]

    cent, params, k = train_global_codec(chunk_gen, lens, nbits=4, k=128)
    mesh1d = Mesh(np.array(jax.devices("cpu")[:4]), ("d",))
    sharded = build_sharded_index_streaming(
        chunk_gen, lens, mesh1d, nbits=4,
        centroids=cent, codec_params=params, chunk_docs=64,
    )
    return sharded, lens


def test_2d_matches_1d(built):
    sharded, lens = built
    mesh2d = make_mesh_2d(2, 4, jax.devices("cpu")[:8])
    rep = replicate_sharded_index(sharded, mesh2d)

    rng = np.random.default_rng(1)
    queries = testing.random_queries(rng, 6, 6, DIM)
    k = sharded.ispec.n_partitions
    kw = dict(top_k=5, n_ivf_probe=k, n_full_scores=2 * len(lens))
    p1, s1 = sharded_search(sharded, queries, **kw)
    p2, s2 = sharded_search_2d(rep, queries, **kw)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5
    )


def test_2d_pads_odd_batches(built):
    sharded, lens = built
    mesh2d = make_mesh_2d(2, 4, jax.devices("cpu")[:8])
    rep = replicate_sharded_index(sharded, mesh2d)
    rng = np.random.default_rng(2)
    queries = testing.random_queries(rng, 5, 6, DIM)  # 5 % 2 != 0
    p, s = sharded_search_2d(rep, queries, top_k=3)
    p = np.asarray(p)
    assert p.shape == (5, 3)
    assert (p[:, 0] >= 0).all()


def test_mesh_validation():
    with pytest.raises(ValueError, match="need"):
        make_mesh_2d(4, 4, jax.devices("cpu")[:8])


def test_2d_subset_and_tokens_match_1d(built):
    """Subsets + token scores on the (r, d) mesh agree with the 1-D
    doc-sharded path over the same sharded index."""
    sharded, lens = built
    rng = np.random.default_rng(11)
    queries = rng.standard_normal((4, 6, DIM)).astype(np.float32)
    n_docs = len(lens)
    subsets = [sorted(rng.choice(n_docs, 40, replace=False).tolist())
               for _ in range(4)]

    mesh2d = make_mesh_2d(2, 4, jax.devices("cpu")[:8])
    rep = replicate_sharded_index(sharded, mesh2d)

    out2 = sharded_search_2d(
        rep, queries, top_k=3, subset=subsets, want_tokens=True,
        with_stats=True,
    )
    assert len(out2) == 5
    p2, s2, t2, l2, st2 = (np.asarray(x) for x in out2)
    assert st2.shape == (4, 2)

    # 1-D reference over the same 4-shard index.
    from fast_plaid_tpu.parallel.sharded import sharded_search as search_1d

    out1 = search_1d(
        sharded, queries, top_k=3, subset=subsets, want_tokens=True
    )
    p1, s1, t1, l1 = (np.asarray(x) for x in out1)

    for b in range(4):
        got = {int(p) for p in p2[b] if p >= 0}
        assert got <= set(subsets[b])
        if p1[b, 0] >= 0:
            assert p2[b, 0] == p1[b, 0]
            np.testing.assert_allclose(s2[b, 0], s1[b, 0], rtol=1e-5)
            dlen = int(l2[b, 0])
            assert dlen == int(l1[b, 0])
            np.testing.assert_allclose(
                t2[b, 0, :dlen], t1[b, 0, :dlen], rtol=1e-4, atol=1e-5
            )
