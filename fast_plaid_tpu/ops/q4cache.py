"""4-bit linearly-quantized embedding cache — the HBM-starved rerank tier.

The bf16 decompressed-corpus cache (index/layout.build_emb_cache) makes
stage 6 pure gather+MXU, but costs 2 bytes/dim of HBM — past ~1M docs it
no longer fits a single chip next to the index. This module provides a
4x smaller tier: the decompressed embedding re-quantized to 4 bits/dim
with one scale per token (symmetric linear), packed two dims per byte.

Used as a *prefilter*: stage 6 scores all R candidates from the q4 cache
(DMA + shift/mask dequant — cheap VPU, no per-token gathers), keeps the
top M = O(top_k), and exactly rescores only those M through the codec
path (ops/codec.decompress), so every returned score is still exactly
the codec-decompressed MaxSim (the reference's stage-6 semantics,
rust/search/search.rs:53-107 + 651-657). Measured per-token-dot error of
the q4 estimate is ~3e-3 relative — orders below the margin a 4x-top_k
rescore pool absorbs.

Packing: byte d of a token holds dims (d, d + D/2): low nibble = dim d,
high nibble = dim d + D/2 — unpacking is two shifts and one
lane-contiguous concat (same no-interleave rule as ops/codec pack).
Stored values are q + 8 with q in [-7, 7].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_emb_q4",
    "dequantize_emb_q4",
    "score_q4",
]


def quantize_emb_q4(emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., D] f32 -> (packed [..., D/2] u8, scale [...] f32).

    Symmetric per-token linear quantization: q = round(v / s), s chosen so
    max|v| maps to 7. Zero vectors get scale 0 (dequantizes to zeros).
    """
    d = emb.shape[-1]
    if d % 2:
        msg = f"dim must be even for nibble packing, got {d}"
        raise ValueError(msg)
    emb = emb.astype(jnp.float32)
    peak = jnp.max(jnp.abs(emb), axis=-1)
    scale = peak / 7.0
    q = jnp.clip(
        jnp.round(emb / jnp.maximum(scale, 1e-12)[..., None]), -7, 7
    ).astype(jnp.int32) + 8
    lo, hi = q[..., : d // 2], q[..., d // 2 :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale


def dequantize_emb_q4(
    packed: jax.Array, scale: jax.Array, out_dtype=jnp.float32
) -> jax.Array:
    """(packed [..., D/2] u8, scale [...]) -> [..., D] approx embeddings."""
    lo = (packed & jnp.uint8(15)).astype(jnp.int8) - 8
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    return (q * scale[..., None].astype(jnp.float32)).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("mem_budget",))
def score_q4(
    emb_q4: jax.Array,  # [Np, doc_cap * D/2] u8 (lane-flattened)
    q4_scale: jax.Array,  # [Np, doc_cap] f32
    doc_lengths: jax.Array,  # [Np] int32
    pids: jax.Array,  # [B, R] int32 (sentinel = Np - 1 zero row is fine)
    queries: jax.Array,  # [B, Q, D]
    mem_budget: int = 256 * 1024 * 1024,
) -> jax.Array:
    """MaxSim scores of candidates from the q4 cache: [B, R] f32.

    Pure-XLA path (CPU + fallback); the Pallas kernel
    (ops/rerank_kernel.maxsim_q4_scores) computes the same quantity with
    the gather fused into VMEM DMAs. Rows whose pid exceeds the cache
    (padding/sentinel) score -inf.
    """
    queries = queries.astype(jnp.float32)
    b, r = pids.shape
    npd = emb_q4.shape[0]
    doc_cap = q4_scale.shape[1]
    d = queries.shape[-1]
    q = queries.shape[1]
    neg = jnp.float32(float("-inf"))

    per_row = b * doc_cap * (d * 2 + q * 4) * 2
    r_chunk = max(4, min(r, mem_budget // max(1, per_row)))
    rn = -(-r // r_chunk)
    pad = rn * r_chunk - r
    sent = npd - 1  # all-zero trailing row
    p = jnp.pad(pids, ((0, 0), (0, pad)), constant_values=sent)
    p = jnp.clip(p, 0, sent)
    p_chunks = p.reshape(b, rn, r_chunk).transpose(1, 0, 2)
    qb = queries.astype(jnp.bfloat16)

    def chunk(pc):
        rows = emb_q4[pc].reshape(b, r_chunk, doc_cap, d // 2)
        sc = q4_scale[pc]  # [B, Rc, doc_cap]
        emb = dequantize_emb_q4(rows, jnp.ones(sc.shape, jnp.float32), jnp.bfloat16)
        # scale applied post-matmul (per-token scalar commutes with the dot)
        ts = jnp.einsum(
            "brtd,bqd->brtq", emb, qb, preferred_element_type=jnp.float32
        )
        ts = ts * sc[..., None]
        lens = doc_lengths[pc]
        tok_ok = (
            jnp.arange(doc_cap, dtype=jnp.int32)[None, None, :]
            < lens[..., None]
        )
        ts = jnp.where(tok_ok[..., None], ts, neg)
        sc_doc = jnp.sum(jnp.max(ts, axis=2), axis=-1)
        return jnp.where(lens > 0, sc_doc, neg)

    out = jax.lax.map(chunk, p_chunks)  # [rn, B, Rc]
    return out.transpose(1, 0, 2).reshape(b, -1)[:, :r]
