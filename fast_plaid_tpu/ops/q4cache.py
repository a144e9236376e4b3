"""4-bit linearly-quantized embedding cache — the HBM-starved rerank tier.

The bf16 decompressed-corpus cache (index/layout.build_emb_cache) makes
stage 6 pure gather+MXU, but costs 2 bytes/dim of HBM — past ~1M docs it
no longer fits a single chip next to the index. This module provides a
4x smaller tier: the decompressed embedding re-quantized to 4 bits/dim
with one scale per DOCUMENT (symmetric linear), packed two tokens per
byte.

Used as a *prefilter*: stage 6 scores all R candidates from the q4 cache
(DMA + shift/mask dequant — cheap VPU, no per-token gathers), keeps the
top M = O(top_k), and exactly rescores only those M through the codec
path (ops/codec.decompress), so every returned score is still exactly
the codec-decompressed MaxSim (the reference's stage-6 semantics,
rust/search/search.rs:53-107 + 651-657).

Two deliberate layout/granularity choices, both forced by TPU tiling:

* **Token-pair packing.** Byte (t, d) holds dim d of tokens (t, t+T/2):
  low nibble = token t, high nibble = token t + T/2. Pairing along the
  TOKEN axis keeps the packed minor dimension at the full vector width D
  (a dim-paired [.., D/2] layout leaves a 64-wide minor dim that the
  (8, 128) tiling cannot slice for row DMAs), and since MaxSim reduces
  over tokens with a max, token order never needs reassembly — the two
  nibble planes are scored independently and max-combined.
* **Per-document scale.** A non-negative per-doc scalar commutes with
  the entire MaxSim reduction (sum_q max_t s*x = s * sum_q max_t x), so
  the kernel scores raw integer levels and the scale is applied to the
  final [B, R] scores by a trivial XLA gather — no scale DMA, no
  in-kernel lane->sublane relayout of a per-token scale vector. The
  cost is a coarser quantization step (doc peak instead of token peak,
  ~1.5x on normalized ColBERT-like tokens); the 4x-top_k rescore pool
  absorbs it (tests/test_q4cache.py pins the selection-recall margin).

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
    """[..., T, D] f32 -> (packed [..., T/2, D] u8, scale [...] f32).

    Symmetric per-document linear quantization: q = round(v / s), s chosen
    so the document's max|v| maps to 7. All-zero documents get scale 0
    (dequantize to zeros). Token pairs (t, t + T/2) share a byte per dim.
    """
    t = emb.shape[-2]
    if t % 2:
        msg = f"token count must be even for nibble packing, got {t}"
        raise ValueError(msg)
    emb = emb.astype(jnp.float32)
    peak = jnp.max(jnp.abs(emb), axis=(-2, -1))
    scale = peak / 7.0
    q = jnp.clip(
        jnp.round(emb / jnp.maximum(scale, 1e-12)[..., None, None]), -7, 7
    ).astype(jnp.int32) + 8
    lo, hi = q[..., : t // 2, :], q[..., t // 2 :, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale


def dequantize_emb_q4(
    packed: jax.Array, scale: jax.Array, out_dtype=jnp.float32
) -> jax.Array:
    """(packed [..., T/2, D] u8, scale [...]) -> [..., T, D] embeddings."""
    lo = (packed & jnp.uint8(15)).astype(jnp.int8) - 8
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    return (q * scale[..., None, None].astype(jnp.float32)).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("mem_budget",))
def score_q4(
    emb_q4: jax.Array,  # [Np * doc_cap/2, D] u8 (row 2-D, layout.py)
    q4_scale: jax.Array,  # [Np] f32
    doc_lengths: jax.Array,  # [Np] int32
    pids: jax.Array,  # [B, R] int32 (sentinel = zero-length row is fine)
    queries: jax.Array,  # [B, Q, D]
    mem_budget: int = 256 * 1024 * 1024,
) -> jax.Array:
    """MaxSim scores of candidates from the q4 cache: [B, R] f32.

    Pure-XLA path (CPU + fallback); the Pallas kernel
    (ops/rerank_kernel.maxsim_q4_gather_scores) computes the same quantity
    with the gather fused into VMEM DMAs. Rows whose pid exceeds the cache
    (padding/sentinel) or has length 0 score -inf.
    """
    queries = queries.astype(jnp.float32)
    b, r = pids.shape
    npd = q4_scale.shape[0]
    d = queries.shape[-1]
    q = queries.shape[1]
    caph = emb_q4.shape[0] // npd
    doc_cap = 2 * caph
    neg = jnp.float32(float("-inf"))

    per_row = b * doc_cap * (d * 2 + q * 4) * 2
    r_chunk = max(4, min(r, mem_budget // max(1, per_row)))
    rn = -(-r // r_chunk)
    pad = rn * r_chunk - r
    sent = npd - 1  # zero-length trailing row
    p = jnp.pad(pids, ((0, 0), (0, pad)), constant_values=sent)
    p = jnp.clip(p, 0, sent)
    p_chunks = p.reshape(b, rn, r_chunk).transpose(1, 0, 2)
    qb = queries.astype(jnp.bfloat16)

    def chunk(pc):
        ridx = pc[..., None] * caph + jnp.arange(caph, dtype=jnp.int32)
        rows = emb_q4[ridx]  # [B, Rc, caph, D]
        emb = dequantize_emb_q4(
            rows, jnp.ones(pc.shape[:2], jnp.float32), jnp.bfloat16
        )  # [B, Rc, doc_cap, D] (unscaled integer levels)
        ts = jnp.einsum(
            "brtd,bqd->brtq", emb, qb, preferred_element_type=jnp.float32
        )
        lens = doc_lengths[pc]
        tok_ok = (
            jnp.arange(doc_cap, dtype=jnp.int32)[None, None, :]
            < lens[..., None]
        )
        ts = jnp.where(tok_ok[..., None], ts, neg)
        # Per-doc scale commutes with max and sum: applied once per score.
        sc_doc = jnp.sum(jnp.max(ts, axis=2), axis=-1) * q4_scale[pc]
        return jnp.where(lens > 0, sc_doc, neg)

    out = jax.lax.map(chunk, p_chunks)  # [rn, B, Rc]
    return out.transpose(1, 0, 2).reshape(b, -1)[:, :r]
