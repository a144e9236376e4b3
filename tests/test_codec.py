"""Unit tests for the residual codec (ops/codec.py) — kernel-level coverage
the reference lacks (SURVEY.md §4 calls these out as additions)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fast_plaid_tpu.ops import codec


def _normed(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("nbits", [1, 2, 4, 8])
def test_pack_unpack_roundtrip(nbits):
    rng = np.random.default_rng(0)
    t, d = 13, 32
    ids = rng.integers(0, 1 << nbits, size=(t, d)).astype(np.uint8)
    packed = np.asarray(codec.pack_nibbles(jnp.asarray(ids), nbits))
    assert packed.shape == (t, codec.packed_dim(d, nbits))
    unpacked = np.asarray(codec.unpack_nibbles(jnp.asarray(packed), nbits, d))
    np.testing.assert_array_equal(unpacked, ids)


def test_quantize_bucketize_semantics():
    cutoffs = jnp.asarray([-0.5, 0.0, 0.5], dtype=jnp.float32)
    vals = jnp.asarray([[-1.0, -0.5, -0.1, 0.0, 0.2, 0.5, 0.9]], dtype=jnp.float32)
    ids = np.asarray(codec.quantize_residuals(vals, cutoffs))
    # bucket = number of cutoffs strictly below the value (torch right=False)
    np.testing.assert_array_equal(ids, [[0, 0, 1, 1, 2, 2, 3]])


def test_assign_codes_matches_numpy():
    """assign_codes scores in bf16 (MXU build path): the chosen centroid
    must be within bf16 resolution of the numpy-f64 optimum — a flip needs
    two centroids within ~0.4% relative, where either is an equally good
    coarse quantizer (see the assign_codes docstring)."""
    rng = np.random.default_rng(1)
    emb = _normed(rng, (300, 64))
    cent = _normed(rng, (37, 64))
    codes = np.asarray(codec.assign_codes(jnp.asarray(emb), jnp.asarray(cent)))
    scores = emb @ cent.T
    chosen = scores[np.arange(len(emb)), codes]
    np.testing.assert_allclose(chosen, scores.max(axis=-1), atol=4e-3)
    # The overwhelming majority must still match the exact argmax.
    expected = np.argmax(scores, axis=-1)
    assert np.mean(codes == expected) > 0.98


@pytest.mark.parametrize("nbits", [2, 4])
def test_compress_decompress_reduces_error(nbits):
    """Decompression must approximate the original better than centroid-only."""
    rng = np.random.default_rng(2)
    emb = _normed(rng, (500, 64))
    cent = _normed(rng, (16, 64))
    codes0 = np.argmax(emb @ cent.T, axis=-1)
    residuals = emb - cent[codes0]
    params = codec.train_codec(residuals, nbits)

    codes, packed = codec.compress(
        jnp.asarray(emb), jnp.asarray(cent), jnp.asarray(params.bucket_cutoffs), nbits
    )
    # assign_codes scores in bf16 (MXU build path): require the chosen
    # centroid's score to match the best within bf16 resolution — a flip
    # needs two near-tied centroids, either an equally good quantizer.
    scores = emb @ cent.T
    chosen = scores[np.arange(len(emb)), np.asarray(codes)]
    np.testing.assert_allclose(chosen, scores.max(axis=-1), atol=4e-3)
    recon = np.asarray(
        codec.decompress(
            codes, packed, jnp.asarray(cent), jnp.asarray(params.bucket_weights), nbits
        )
    )
    # Reconstruction is unit-norm and closer than the raw centroid.
    np.testing.assert_allclose(np.linalg.norm(recon, axis=-1), 1.0, atol=1e-5)
    cent_norm = cent[codes0] / np.linalg.norm(
        cent[codes0], axis=-1, keepdims=True
    )
    err_recon = np.linalg.norm(recon - emb, axis=-1).mean()
    err_cent = np.linalg.norm(cent_norm - emb, axis=-1).mean()
    assert err_recon < err_cent
    # More bits -> tighter reconstruction.
    if nbits == 4:
        assert err_recon < 0.45


def test_train_codec_quantiles():
    rng = np.random.default_rng(3)
    res = rng.standard_normal((1000, 8)).astype(np.float32)
    params = codec.train_codec(res, nbits=2)
    assert params.bucket_cutoffs.shape == (3,)
    assert params.bucket_weights.shape == (4,)
    assert np.all(np.diff(params.bucket_cutoffs) >= 0)
    # weights interleave the cutoffs
    assert params.bucket_weights[0] < params.bucket_cutoffs[0]
    assert params.bucket_weights[-1] > params.bucket_cutoffs[-1]
    assert params.cluster_threshold > 0
