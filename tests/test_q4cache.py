"""Unit tests for the 4-bit prefilter cache (ops/q4cache.py).

The q4 tier scores rerank candidates from a 4x-smaller quantized copy of
the decompressed corpus, then exact-rescores the top slice through the
codec path — so the tests pin (a) pack/unpack round-trip, (b) the score
estimate's error envelope, and (c) agreement of the masked MaxSim with a
direct dense computation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fast_plaid_tpu.ops.q4cache import (
    dequantize_emb_q4,
    quantize_emb_q4,
    score_q4,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestQuantizeRoundTrip:
    def test_pack_unpack_exact_levels(self):
        # Values already on the quantization grid survive exactly.
        rng = _rng(1)
        scale = 0.125
        q = rng.integers(-7, 8, size=(16, 128)).astype(np.float32)
        emb = q * scale
        packed, s = quantize_emb_q4(jnp.asarray(emb))
        out = np.asarray(dequantize_emb_q4(packed, s))
        np.testing.assert_allclose(out, emb, rtol=1e-6, atol=1e-7)

    def test_relative_error_envelope(self):
        rng = _rng(2)
        emb = rng.standard_normal((64, 128)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        packed, s = quantize_emb_q4(jnp.asarray(emb))
        out = np.asarray(dequantize_emb_q4(packed, s))
        # Max quantization step is scale/2 = (document max|v|)/14 per dim.
        step = np.abs(emb).max() / 14.0
        assert np.all(np.abs(out - emb) <= step + 1e-6)

    def test_zero_vector(self):
        packed, s = quantize_emb_q4(jnp.zeros((4, 8)))
        assert float(np.asarray(s).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(dequantize_emb_q4(packed, s)), 0.0)

    def test_odd_token_count_rejected(self):
        with pytest.raises(ValueError, match="even"):
            quantize_emb_q4(jnp.zeros((3, 8)))

    def test_packed_shape_and_dtype(self):
        # Token-pair packing: the token axis halves, the dim axis stays
        # full width (TPU tiling needs the 128-wide minor dim intact).
        packed, s = quantize_emb_q4(jnp.ones((5, 10, 32)))
        assert packed.shape == (5, 5, 32)
        assert packed.dtype == jnp.uint8
        assert s.shape == (5,)  # one scale per document


class TestScoreQ4:
    def _setup(self, n_docs=30, doc_cap=24, d=32, b=3, q=5, seed=3):
        rng = _rng(seed)
        lens = rng.integers(1, doc_cap + 1, size=n_docs).astype(np.int32)
        emb = rng.standard_normal((n_docs, doc_cap, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        tok = np.arange(doc_cap)[None, :] < lens[:, None]
        emb *= tok[..., None]
        # +1 all-zero sentinel row
        np_docs = n_docs + 1
        emb_p = np.zeros((np_docs, doc_cap, d), np.float32)
        emb_p[:n_docs] = emb
        lens_p = np.zeros((np_docs,), np.int32)
        lens_p[:n_docs] = lens
        packed, scale = quantize_emb_q4(jnp.asarray(emb_p))
        # Row 2-D store layout (layout.quantize_q4_rows): doc pid's block
        # is rows [pid*doc_cap/2, (pid+1)*doc_cap/2).
        packed_flat = jnp.reshape(packed, (np_docs * (doc_cap // 2), d))
        queries = rng.standard_normal((b, q, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
        pids = rng.integers(0, n_docs, size=(b, 12)).astype(np.int32)
        return (
            packed_flat,
            scale,
            jnp.asarray(lens_p),
            jnp.asarray(pids),
            jnp.asarray(queries),
            emb_p,
            lens_p,
        )

    def _dense_maxsim(self, emb_p, lens_p, pids, queries):
        b, r = pids.shape
        out = np.full((b, r), -np.inf, np.float32)
        for bi in range(b):
            for ri in range(r):
                pid = int(pids[bi, ri])
                ln = int(lens_p[pid])
                if ln == 0:
                    continue
                ts = emb_p[pid, :ln] @ queries[bi].T  # [ln, Q]
                out[bi, ri] = ts.max(axis=0).sum()
        return out

    def test_matches_dense_maxsim_of_dequantized(self):
        packed, scale, lens, pids, queries, emb_p, lens_p = self._setup()
        got = np.asarray(score_q4(packed, scale, lens, pids, queries))
        np_docs, doc_cap, d = emb_p.shape
        deq = np.asarray(
            dequantize_emb_q4(
                packed.reshape(np_docs, doc_cap // 2, d), scale
            )
        )
        want = self._dense_maxsim(deq, lens_p, np.asarray(pids), np.asarray(queries))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_close_to_exact_scores(self):
        packed, scale, lens, pids, queries, emb_p, lens_p = self._setup(seed=4)
        got = np.asarray(score_q4(packed, scale, lens, pids, queries))
        exact = self._dense_maxsim(emb_p, lens_p, np.asarray(pids), np.asarray(queries))
        finite = np.isfinite(exact)
        assert finite.any()
        # bf16 matmul + q4 quantization (unit-norm tokens): generous but
        # binding envelope — unquantized bf16 scoring sits well inside it.
        err = np.abs(got[finite] - exact[finite]) / np.maximum(
            np.abs(exact[finite]), 1.0
        )
        assert err.max() < 0.08

    def test_sentinel_and_oob_pids_score_neg_inf(self):
        packed, scale, lens, pids, queries, _, _ = self._setup()
        n_docs = lens.shape[0] - 1
        bad = jnp.asarray([[n_docs, n_docs + 5, -1, 0]], jnp.int32)
        got = np.asarray(
            score_q4(packed, scale, lens, bad, queries[:1])
        )
        assert np.isneginf(got[0, 0])
        assert np.isneginf(got[0, 1])
        # negative pid is clipped to 0 (a real doc) by contract; slot 3 real
        assert np.isfinite(got[0, 3])

    def test_chunking_invariant(self):
        packed, scale, lens, pids, queries, _, _ = self._setup(seed=5)
        a = np.asarray(score_q4(packed, scale, lens, pids, queries))
        b = np.asarray(
            score_q4(packed, scale, lens, pids, queries, mem_budget=4096)
        )
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_selection_recall_vs_exact(self):
        # The tier contract: top-M q4 selection must contain the exact
        # top-k winners for M = 4k (normalized clustered-ish data).
        packed, scale, lens, pids, queries, emb_p, lens_p = self._setup(
            n_docs=120, doc_cap=16, d=64, b=4, q=8, seed=6
        )
        r = 64
        rng = _rng(7)
        pids = jnp.asarray(
            np.stack([rng.permutation(120)[:r] for _ in range(4)]).astype(np.int32)
        )
        got = np.asarray(score_q4(packed, scale, lens, pids, queries))
        exact = self._dense_maxsim(
            emb_p, lens_p, np.asarray(pids), np.asarray(queries)
        )
        top_k = 8
        m = 4 * top_k
        for bi in range(4):
            exact_top = set(np.argsort(-exact[bi])[:top_k].tolist())
            q4_top = set(np.argsort(-got[bi])[:m].tolist())
            assert exact_top <= q4_top
