"""Decompressed-corpus (emb_cache) rerank path: identical results to the
on-the-fly dequant path, at every API level."""

import numpy as np

from fast_plaid_tpu import testing
from fast_plaid_tpu.index.layout import build_emb_cache, emb_cache_bytes
from fast_plaid_tpu.search.engine import search_core

DIM = 32


def test_engine_cache_matches_fused():
    rng = np.random.default_rng(9)
    docs = testing.random_documents(rng, 120, 14, DIM, variable=True)
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=0)
    dev_cached = build_emb_cache(dev, ispec)
    assert dev_cached.emb_cache is not None
    assert dev_cached.emb_cache.nbytes == emb_cache_bytes(ispec)

    queries = np.asarray(testing.random_queries(rng, 6, 8, DIM), np.float32)
    kw = dict(
        ispec=ispec,
        top_k=10,
        n_ivf_probe=8,
        n_full_scores=256,
        want_tokens=False,
    )
    p_fused, s_fused = (np.asarray(x) for x in search_core(dev, queries, None, **kw))
    p_cache, s_cache = (
        np.asarray(x) for x in search_core(dev_cached, queries, None, **kw)
    )
    for b in range(p_fused.shape[0]):
        assert set(p_fused[b].tolist()) == set(p_cache[b].tolist())
    assert np.allclose(s_fused, s_cache, atol=2e-2), (
        np.abs(s_fused - s_cache).max()
    )


def test_engine_cache_token_scores():
    rng = np.random.default_rng(10)
    docs = testing.random_documents(rng, 60, 10, DIM, variable=True)
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=0)
    dev_cached = build_emb_cache(dev, ispec)
    queries = np.asarray(testing.random_queries(rng, 3, 6, DIM), np.float32)
    kw = dict(
        ispec=ispec,
        top_k=5,
        n_ivf_probe=8,
        n_full_scores=128,
        want_tokens=True,
    )
    out_f = [np.asarray(x) for x in search_core(dev, queries, None, **kw)]
    out_c = [np.asarray(x) for x in search_core(dev_cached, queries, None, **kw)]
    assert np.allclose(out_f[1], out_c[1], atol=2e-2)
    # token matrices match wherever the same doc is ranked at the same slot
    same = out_f[0] == out_c[0]
    assert np.allclose(
        out_f[2][same], out_c[2][same], atol=3e-2
    )


def test_api_cache_budget(test_index_path):
    """emb_cache_budget_bytes opts the FastPlaid API into the cache on CPU."""
    from fast_plaid_tpu.search import FastPlaid

    rng = np.random.default_rng(11)
    docs = testing.random_documents(rng, 80, 12, DIM, variable=True)
    queries = testing.random_queries(rng, 4, 6, DIM)

    plain = FastPlaid(index=test_index_path, device="cpu")
    plain.create(documents_embeddings=docs)
    r_plain = plain.search(queries, top_k=5, show_progress=False)
    loaded = plain.indices[str(plain.devices[0])]
    assert loaded.dev.emb_cache is None  # CPU default: off

    cached = FastPlaid(
        index=test_index_path,
        device="cpu",
        emb_cache_budget_bytes=1 << 30,
    )
    loaded_c = cached.indices[str(cached.devices[0])]
    assert loaded_c.dev.emb_cache is not None
    r_cached = cached.search(queries, top_k=5, show_progress=False)
    for a, b in zip(r_plain, r_cached):
        assert {p for p, _ in a} == {p for p, _ in b}
        for (pa, sa), (pb, sb) in zip(a, b):
            assert abs(sa - sb) < 2e-2


def test_decompress_2d_partial_final_block():
    """_decompress_2d with n % block != 0: the clamped final block must
    land at its clamped offset, not shift the tail docs' rows.

    Regression: the read-only clamp wrote the final block's decompressed
    rows (input rows [n - block, n)) at offset (nb - 1) * block, handing
    every doc past the last full block the embeddings of the WRONG
    documents — planted hit@1 0.641 at 3k docs (block 2048), every miss
    a pid >= 2048.
    """
    import jax.numpy as jnp

    from fast_plaid_tpu.index.layout import _decompress_2d
    from fast_plaid_tpu.ops import codec

    rng = np.random.default_rng(13)
    n, cap, dim, nbits = 40, 16, DIM, 4
    kp = 64
    pd = dim * nbits // 8
    codes = jnp.asarray(rng.integers(0, kp, (n, cap)), jnp.int32)
    res = jnp.asarray(rng.integers(0, 256, (n, cap, pd)), jnp.uint8)
    cents = jnp.asarray(rng.normal(size=(kp, dim)), jnp.float32)
    weights = jnp.asarray(np.sort(rng.normal(size=(1 << nbits,))), jnp.float32)

    want = np.asarray(
        codec.decompress(codes, res, cents, weights, nbits, out_dtype=jnp.bfloat16),
        np.float32,
    )
    for block in (8, 16, 24, 40):  # 40 % 16 != 0 and 40 % 24 != 0: clamped tails
        got = np.asarray(
            _decompress_2d(
                codes, res, cents, weights, nbits=nbits, block=block
            ),
            np.float32,
        )[:n]
        np.testing.assert_array_equal(got, want, err_msg=f"block={block}")


def test_build_emb_cache_partial_final_block():
    """build_emb_cache with a block that does not divide the row count:
    every doc's cache row must decompress ITS OWN tokens."""
    rng = np.random.default_rng(14)
    docs = testing.random_documents(rng, 30, 12, DIM, variable=True)
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=0)
    full = build_emb_cache(dev, ispec)  # single block (n rounds to 32 <= 2048)
    blocked = build_emb_cache(dev, ispec, block=8)  # 32 % 8 == 0 but multi-block
    ragged = build_emb_cache(dev, ispec, block=12)  # 32 % 12 != 0: clamped tail
    n = ispec.n_docs
    a = np.asarray(full.emb_cache[:n], np.float32)
    np.testing.assert_array_equal(np.asarray(blocked.emb_cache[:n], np.float32), a)
    np.testing.assert_array_equal(np.asarray(ragged.emb_cache[:n], np.float32), a)
