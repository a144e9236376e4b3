"""Pallas TPU kernel: fused candidate-gather + MaxSim rerank.

The XLA rerank path gathers candidate rows from the decompressed-corpus
cache into an HBM buffer, then reads that buffer back for the MaxSim
matmul — 3x the HBM traffic of the data actually needed (measured ~100 ms
per 256-query tile at R=2048, doc_cap=160 on v5e). This kernel DMAs each
candidate's token rows HBM->VMEM once, runs the MaxSim contraction on the
MXU from VMEM, and writes only the [B, R] scores back.

Replaces the decompression+scoring inner loop of the reference
(reference: rust/search/search.rs:53-107 + 651-657) for the cached-corpus
case; the quantized path decompresses into the cache at load time
(index/layout.py:build_emb_cache), so this kernel is the stage-6 hot loop.

Layout notes (all forced by Mosaic's (8, 128) block tiling — single-row
slices of 2-D arrays don't lower): the wrapper processes B_CHUNK=8 query
rows per kernel call with lens/scores carried as [RP/r_tile, 8, r_tile]
so each grid step's block is a legal (1, 8, r_tile); candidate ids stay a
full [8, RP] SMEM array read one scalar at a time to drive the row DMAs;
the batch loops via lax.map over 8-row chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["maxsim_gather_scores", "maxsim_q4_gather_scores"]

NEG = float("-inf")  # python literal: jnp constants can't be captured by kernels


def _kernel(pids_ref, lens_ref, q_ref, emb_hbm, out_ref, scratch, sems):
    """Grid step rt: score candidates [rt*r_tile, (rt+1)*r_tile) of all
    B_CHUNK query rows, double-buffered: step rt issues the DMAs for step
    rt+1 into the other scratch slot before consuming its own, so the row
    gather for the next tile overlaps this tile's MXU contraction.

    All of a slot's row copies signal ONE semaphore and are retired by a
    single aggregate wait sized to the whole slot scratch (TPU DMA
    semaphores count bytes, so one wait covering bc*r_tile rows' bytes is
    exactly the 64 per-copy waits it replaces — measured 45 -> 41 ms per
    256-query tile at the bench shape: the wait loop re-read pids and
    re-built 64 copy descriptors on the scalar core every grid step).

    pids_ref: [BC, RP] int32 (SMEM, full; scalar reads drive the DMAs).
    lens_ref: [1, BC, r_tile] int32 (VMEM, blocked per step).
    q_ref: [BC, Q, D] bf16 (VMEM, full). emb_hbm: [Np, doc_cap, D] bf16
    (HBM, manual DMA). out_ref: [1, BC, r_tile] f32 (VMEM, blocked).
    """
    rt = pl.program_id(0)
    n_rt = pl.num_programs(0)
    _, bc, r_tile, doc_cap, d = scratch.shape

    def issue(slot, step):
        j0 = pl.multiple_of(step * r_tile, r_tile)

        def body(i, _):
            for bj in range(bc):  # static unroll over the 8 query rows
                pid = pids_ref[bj, j0 + i]
                pltpu.make_async_copy(
                    emb_hbm.at[pid],
                    scratch.at[slot, bj, i],
                    sems.at[slot],
                ).start()
            return 0

        jax.lax.fori_loop(0, r_tile, body, 0, unroll=True)

    @pl.when(rt == 0)
    def _():
        issue(0, 0)

    @pl.when(rt + 1 < n_rt)
    def _():
        issue((rt + 1) % 2, rt + 1)

    slot = rt % 2
    # Aggregate wait: the slot scratch's byte count equals the sum of the
    # bc * r_tile row copies that signalled sems[slot].
    pltpu.make_async_copy(
        scratch.at[slot], scratch.at[slot], sems.at[slot]
    ).wait()

    q = q_ref[:]  # [BC, Q, D] bf16
    emb = scratch[slot].reshape(bc, r_tile * doc_cap, d)
    ts = jax.lax.dot_general(
        emb,
        q,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bc, r_tile, doc_cap, q.shape[1])
    tok = jax.lax.broadcasted_iota(jnp.int32, (bc, r_tile, doc_cap), 2)
    lens = lens_ref[0]  # [BC, r_tile] int32
    # Additive f32 mask: Mosaic can't broadcast an i1 vector into a new
    # minor dim, but a 32-bit penalty tensor broadcasts fine.
    penalty = jnp.where(tok < lens[..., None], 0.0, NEG)
    ts = ts + penalty[..., None]
    out_ref[0] = jnp.sum(jnp.max(ts, axis=2), axis=-1)


def _pallas_kwargs(interpret: bool, compiler_params, cost_estimate) -> dict:
    """TPU lowering hints, or interpret mode (CPU logic tests) without them."""
    if interpret:
        return {"interpret": True}
    return {
        "compiler_params": compiler_params,
        "cost_estimate": cost_estimate,
    }


@functools.partial(
    jax.jit, static_argnames=("r_tile", "b_chunk", "interpret")
)
def maxsim_gather_scores(
    emb_cache: jax.Array,  # [Np, doc_cap, D] bf16
    pids: jax.Array,  # [B, R] int32 (rows with length 0 score -inf)
    lens: jax.Array,  # [B, R] int32 valid token counts
    queries: jax.Array,  # [B, Q, D] (cast to bf16)
    r_tile: int = 8,
    b_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused gather+MaxSim: returns [B, R] f32 scores (-inf for empty rows)."""
    b, r = pids.shape
    _, doc_cap, d = emb_cache.shape
    nq = queries.shape[1]
    rpad = (-r) % r_tile
    bpad = (-b) % b_chunk
    pids = jnp.pad(pids.astype(jnp.int32), ((0, bpad), (0, rpad)))
    lens = jnp.pad(lens.astype(jnp.int32), ((0, bpad), (0, rpad)))
    queries = jnp.pad(queries.astype(jnp.bfloat16), ((0, bpad), (0, 0), (0, 0)))
    bp, rp = b + bpad, r + rpad
    n_rt = rp // r_tile

    kernel = pl.pallas_call(
        _kernel,
        grid=(n_rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pids [BC, RP]
            pl.BlockSpec(
                (1, b_chunk, r_tile),
                lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # lens [n_rt, BC, r_tile]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q [BC, Q, D]
            pl.BlockSpec(memory_space=pltpu.HBM),  # emb stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, b_chunk, r_tile), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rt, b_chunk, r_tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, b_chunk, r_tile, doc_cap, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),  # one per slot (aggregate wait)
        ],
        **_pallas_kwargs(
            interpret,
            pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    2 * b_chunk * r_tile * doc_cap * d * 2  # emb scratch x2
                    + b_chunk * r_tile * doc_cap * nq * 4 * 2  # token scores
                    + 8 * 1024 * 1024
                ),
            ),
            pl.CostEstimate(
                flops=2 * b_chunk * rp * doc_cap * nq * d,
                bytes_accessed=b_chunk * rp * doc_cap * d * 2,
                transcendentals=0,
            ),
        ),
    )

    def one(args):
        p, ln, q = args
        # [BC, RP] -> [n_rt, BC, r_tile] so each grid step's lens/score
        # block is a legal (1, 8, r_tile) tile.
        ln3 = ln.reshape(b_chunk, n_rt, r_tile).transpose(1, 0, 2)
        out = kernel(p, ln3, q, emb_cache)  # [n_rt, BC, r_tile]
        return out.transpose(1, 0, 2).reshape(b_chunk, rp)

    nb = bp // b_chunk
    out = jax.lax.map(
        one,
        (
            pids.reshape(nb, b_chunk, rp),
            lens.reshape(nb, b_chunk, rp),
            queries.reshape(nb, b_chunk, *queries.shape[1:]),
        ),
    )
    return out.reshape(bp, rp)[:b, :r]


def _q4_kernel(pids_ref, lens_ref, q_ref, q4_hbm, out_ref, dat, sems):
    """q4 variant of _kernel: DMA the packed nibble rows, dequantize in
    VMEM (shift/mask) and contract on the MXU.

    The low/high nibble planes hold tokens [0, T/2) and [T/2, T)
    (ops/q4cache token-pair packing — chosen so the packed minor dim
    stays the full vector width D, which TPU (8, 128) u8 tiling can
    slice). MaxSim reduces over tokens with a max, so token order never
    needs reassembly: each plane is scored by its own full-width
    dot_general, masked by its own half of the length mask, and the two
    planes are max-combined before the token reduction. The per-document
    scale commutes with the whole reduction and is applied by the
    wrapper to the [B, R] output — no scale DMA, no in-kernel
    lane->sublane relayout.

    dat: [2, BC, r_tile, caph, D] u8 (caph = doc_cap/2).
    q4_hbm: [Np * caph, D] u8 row 2-D — document pid's block is rows
    [pid*caph, (pid+1)*caph). Output is the UNSCALED integer-level score.
    """
    rt = pl.program_id(0)
    n_rt = pl.num_programs(0)
    _, bc, r_tile, caph, d = dat.shape

    def issue(slot, step):
        j0 = pl.multiple_of(step * r_tile, r_tile)

        def body(i, _):
            for bj in range(bc):
                pid = pids_ref[bj, j0 + i]
                pltpu.make_async_copy(
                    q4_hbm.at[pl.ds(pid * caph, caph)],
                    dat.at[slot, bj, i],
                    sems.at[slot],
                ).start()
            return 0

        jax.lax.fori_loop(0, r_tile, body, 0, unroll=True)

    @pl.when(rt == 0)
    def _():
        issue(0, 0)

    @pl.when(rt + 1 < n_rt)
    def _():
        issue((rt + 1) % 2, rt + 1)

    slot = rt % 2
    # Aggregate byte-counted wait for all bc * r_tile row copies of this
    # slot (see _kernel above).
    pltpu.make_async_copy(dat.at[slot], dat.at[slot], sems.at[slot]).wait()

    q = q_ref[:]  # [BC, Q, D] bf16
    nq = q.shape[1]
    packed = dat[slot].reshape(bc, r_tile * caph, d).astype(jnp.int32)
    lo = ((packed & 15) - 8).astype(jnp.bfloat16)
    hi = ((packed >> 4) - 8).astype(jnp.bfloat16)
    dn = (((2,), (2,)), ((0,), (0,)))
    ts_lo = jax.lax.dot_general(
        lo, q, dimension_numbers=dn, preferred_element_type=jnp.float32
    ).reshape(bc, r_tile, caph, nq)
    ts_hi = jax.lax.dot_general(
        hi, q, dimension_numbers=dn, preferred_element_type=jnp.float32
    ).reshape(bc, r_tile, caph, nq)
    tok = jax.lax.broadcasted_iota(jnp.int32, (bc, r_tile, caph), 2)
    lens = lens_ref[0][..., None]  # [BC, r_tile, 1]
    pen_lo = jnp.where(tok < lens, 0.0, NEG)
    pen_hi = jnp.where(tok + caph < lens, 0.0, NEG)
    ts = jnp.maximum(ts_lo + pen_lo[..., None], ts_hi + pen_hi[..., None])
    out_ref[0] = jnp.sum(jnp.max(ts, axis=2), axis=-1)


@functools.partial(
    jax.jit, static_argnames=("r_tile", "b_chunk", "interpret")
)
def maxsim_q4_gather_scores(
    emb_q4: jax.Array,  # [Np * doc_cap/2, D] u8 (row 2-D, layout.py)
    q4_scale: jax.Array,  # [Np] f32 per-document scales
    pids: jax.Array,  # [B, R] int32
    lens: jax.Array,  # [B, R] int32 valid token counts
    queries: jax.Array,  # [B, Q, D] (cast to bf16)
    r_tile: int = 16,
    b_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused q4 gather + dequant + MaxSim: [B, R] f32 (-inf empty rows).

    Same quantity as ops/q4cache.score_q4 (the XLA reference path), with
    4x less HBM row traffic than maxsim_gather_scores' bf16 cache —
    the tier for corpora whose bf16 cache exceeds HBM. The kernel scores
    raw integer levels; the per-document scale (which commutes with the
    MaxSim reduction) and the empty-row -inf mask are applied here.

    The cache arrives in its stored 2-D shape and is consumed as-is —
    any reshape of an HBM operand here makes XLA relayout-copy the WHOLE
    cache inside the search program (measured 5.7 GB HLO temp -> OOM at
    2M docs).
    """
    b, r = pids.shape
    d = queries.shape[-1]
    nq = queries.shape[1]
    npd = q4_scale.shape[0]
    caph = emb_q4.shape[0] // npd
    doc_cap = 2 * caph
    rpad = (-r) % r_tile
    bpad = (-b) % b_chunk
    # Sentinel/padding pids address a real (zero-length) row; clip keeps
    # the raw row DMAs in bounds whatever the caller passes.
    pids = jnp.clip(pids.astype(jnp.int32), 0, npd - 1)
    pids = jnp.pad(pids, ((0, bpad), (0, rpad)))
    lens = jnp.pad(lens.astype(jnp.int32), ((0, bpad), (0, rpad)))
    queries = jnp.pad(
        queries.astype(jnp.bfloat16), ((0, bpad), (0, 0), (0, 0))
    )
    bp, rp = b + bpad, r + rpad
    n_rt = rp // r_tile

    kernel = pl.pallas_call(
        _q4_kernel,
        grid=(n_rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pids [BC, RP]
            pl.BlockSpec(
                (1, b_chunk, r_tile),
                lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # lens [n_rt, BC, r_tile]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q [BC, Q, D]
            pl.BlockSpec(memory_space=pltpu.HBM),  # emb_q4
        ],
        out_specs=pl.BlockSpec(
            (1, b_chunk, r_tile), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rt, b_chunk, r_tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, b_chunk, r_tile, caph, d), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),  # one per slot (aggregate wait)
        ],
        **_pallas_kwargs(
            interpret,
            pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    2 * b_chunk * r_tile * caph * d  # u8 scratch x2
                    + b_chunk * r_tile * caph * d * 4 * 3  # i32/bf16 dequant
                    + b_chunk * r_tile * doc_cap * nq * 4 * 2  # token scores
                    + 16 * 1024 * 1024
                ),
            ),
            pl.CostEstimate(
                flops=2 * b_chunk * rp * doc_cap * nq * d,
                bytes_accessed=b_chunk * rp * caph * d,
                transcendentals=0,
            ),
        ),
    )

    def one(args):
        p, ln, q = args
        ln3 = ln.reshape(b_chunk, n_rt, r_tile).transpose(1, 0, 2)
        out = kernel(p, ln3, q, emb_q4)  # [n_rt, BC, r_tile]
        return out.transpose(1, 0, 2).reshape(b_chunk, rp)

    nb = bp // b_chunk
    out = jax.lax.map(
        one,
        (
            pids.reshape(nb, b_chunk, rp),
            lens.reshape(nb, b_chunk, rp),
            queries.reshape(nb, b_chunk, *queries.shape[1:]),
        ),
    )
    out = out.reshape(bp, rp)[:b, :r]
    scaled = out * q4_scale[pids[:b, :r]]
    return jnp.where(lens[:b, :r] > 0, scaled, jnp.float32(NEG))
