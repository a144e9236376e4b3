"""Pallas rerank kernels vs their XLA reference paths, in interpret mode.

The fused kernels (ops/rerank_kernel.py) lower only on real TPUs, so
their numerics were previously covered only by TPU-gated tests and
bench.py. Interpret mode executes the same kernel program (grid, DMA
copies, nibble dequant, masking, reductions) on CPU, pinning the kernel
LOGIC in CI every round; TPU lowering specifics (tiling, real DMA) stay
covered by tests/test_rerank_kernel.py + the bench parity field.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_plaid_tpu.ops.q4cache import quantize_emb_q4, score_q4
from fast_plaid_tpu.ops.rerank_kernel import (
    maxsim_gather_scores,
    maxsim_q4_gather_scores,
)


@pytest.fixture(scope="module")
def corpus():
    npd, cap, d = 128, 16, 128
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((npd, cap, d)).astype(np.float32)
    lens = rng.integers(1, cap + 1, npd).astype(np.int32)
    lens[-1] = 0  # zero-length sentinel row
    for i in range(npd):
        emb[i, lens[i] :] = 0
    b, r, qn = 4, 48, 8
    pids = rng.integers(0, npd, (b, r)).astype(np.int32)
    pids[0, :4] = npd - 1  # sentinel hits must score -inf
    queries = rng.standard_normal((b, qn, d)).astype(np.float32)
    return emb, lens, pids, queries


def test_bf16_kernel_matches_brute_force(corpus):
    emb, lens, pids, queries = corpus
    row_lens = lens[pids]
    got = np.asarray(
        maxsim_gather_scores(
            jnp.asarray(emb, jnp.bfloat16),
            jnp.asarray(pids),
            jnp.asarray(row_lens),
            jnp.asarray(queries),
            interpret=True,
        )
    )
    e = np.asarray(jnp.asarray(emb, jnp.bfloat16), np.float32)[pids]
    qb = np.asarray(jnp.asarray(queries, jnp.bfloat16), np.float32)
    ts = np.einsum("brtd,bqd->brtq", e, qb)
    mask = np.arange(emb.shape[1])[None, None, :] < row_lens[:, :, None]
    ref = np.where(mask[..., None], ts, -np.inf).max(axis=2).sum(axis=-1)
    finite = np.isfinite(ref)
    assert (np.isfinite(got) == finite).all()
    assert np.abs(got[finite] - ref[finite]).max() < 2e-2


def test_q4_kernel_matches_xla_path(corpus):
    emb, lens, pids, queries = corpus
    packed, scale = jax.jit(quantize_emb_q4)(jnp.asarray(emb))
    packed_flat = packed.reshape(emb.shape[0] * (emb.shape[1] // 2), -1)
    ref = np.asarray(
        score_q4(
            packed_flat,
            scale,
            jnp.asarray(lens),
            jnp.asarray(pids),
            jnp.asarray(queries),
        )
    )
    got = np.asarray(
        maxsim_q4_gather_scores(
            packed_flat,
            scale,
            jnp.asarray(pids),
            jnp.asarray(lens)[jnp.asarray(pids)],
            jnp.asarray(queries),
            interpret=True,
        )
    )
    finite = np.isfinite(ref)
    assert (np.isfinite(got) == finite).all()
    # Same dequant dtype (bf16) + f32 accumulation on both paths.
    assert np.abs(got[finite] - ref[finite]).max() < 2e-2
