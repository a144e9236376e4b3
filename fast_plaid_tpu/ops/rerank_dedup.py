"""Deduplicated fused rerank: one row DMA per *unique* candidate.

The fused rerank kernels (ops/rerank_kernel.py) are row-DMA-descriptor
bound: ~82 ns of fixed descriptor-issue cost per candidate row on v5e,
63% of the kernel's DMA time (payload size barely matters — shrinking
rows 160->40 tokens saves only 28%). At the bench shape a 256-query tile
issues B*R = 524,288 row DMAs while its rerank pools overlap ~9.1x —
the same document row is fetched nine times over.

This module scores each unique row once:

  1. ``group_pool`` (plain XLA): sort the [B, R] pool by pid, split each
     pid's run of requesters into entries of at most G (query, slot)
     pairs, and build per-entry tables (pid, length, G requester query
     ids) plus the inverse map entry*G+slot for every original slot.
  2. ``_dedup_kernel`` (Pallas): one row DMA per *entry*, double
     buffered exactly like ops/rerank_kernel._kernel; each entry's G
     requester queries' token blocks are gathered VMEM->VMEM from the
     resident [B*Q, D] query array, and one batched MXU contraction
     [e_tile, doc_cap, D] x [e_tile, G*Q, D] scores the row against all
     its requesters at once (N = G*Q = 256 columns vs the per-query
     kernel's N = 32 — better MXU shapes on top of the descriptor win).
  3. A [B, R] gather distributes entry scores back to their slots.

Entry count is data dependent; shapes are not: E_cap = N//G + Np bounds
sum(ceil(run/G)) for any pool, the actual entry count rides in as a
scalar, and the kernel predicates DMA-issue/compute per grid step so
padding entries cost nothing but null grid iterations. Scores are
bitwise the same math as maxsim_gather_scores (bf16 MXU contraction,
f32 accumulation, length-masked token max, sum over query tokens).

Viability is static (``dedup_viable``): the dedup only wins when pools
actually overlap, i.e. the corpus is small against B*R. At 57,638 docs
x 256 queries x R=2048 the bound gives E_cap = 123k entries vs 524k
slots (4.3x fewer descriptors worst-case, ~7x at measured overlap); at
523k docs pools barely overlap and the per-query kernel stays.

Replaces the stage-6 hot loop of the reference
(rust/search/search.rs:53-107, 651-657) for high-overlap tiles; the
reference never deduplicates across queries because its rerank is a
per-query serial loop.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_pool", "maxsim_gather_scores_dedup", "dedup_viable"]

NEG = float("-inf")
G_DEFAULT = 8
CLAMP = -1e30  # stands in for -inf inside the kernel (the G-sum runs on
# the MXU, where -inf * 0 = NaN); the wrapper restores -inf via lens.


def dedup_viable(
    np_rows: int,
    b: int,
    r: int,
    nq: int,
    d: int,
    g: int = G_DEFAULT,
) -> bool:
    """Static decision: is the dedup kernel the right stage-6 realization?

    True when (a) the worst-case entry count E_cap = B*R//G + Np is at
    most half the slot count — guaranteeing >= 2x fewer row DMAs however
    the pools land — and (b) the shapes meet the kernel's layout needs
    (queries resident in VMEM, 128-lane vectors, 16-sublane query
    blocks). Overridable: FASTPLAID_RERANK_DEDUP=0 disables, =1 forces
    (shape-legal only).
    """
    env = os.environ.get("FASTPLAID_RERANK_DEDUP", "auto")
    if env == "0":
        return False
    legal = (
        d % 128 == 0
        and nq % 16 == 0
        and nq >= 16
        and b * nq * d * 2 <= 8 * 1024 * 1024  # all queries stay in VMEM
        and b * r >= 4 * g
    )
    if env == "1":
        return legal
    n = b * r
    return legal and (n // g + np_rows) <= n // 2


@functools.partial(jax.jit, static_argnames=("g", "e_cap"))
def group_pool(
    pids: jax.Array,  # [B, R] int32 (sentinel rows welcome)
    lens: jax.Array,  # [B, R] int32 valid token counts
    g: int,
    e_cap: int,
):
    """Group the rerank pool by document: entries of <= g requesters.

    Returns (entry_pid [E], entry_len [E], entry_qidx [E, g], inv [B, R],
    n_entries scalar). Entry order: pids ascending, so padding entries
    (>= n_entries) are a contiguous tail the kernel can skip. inv maps
    every original slot to entry*g + slot_within_entry.
    """
    b, r = pids.shape
    n = b * r
    flat_pid = pids.reshape(n).astype(jnp.int32)
    flat_len = lens.reshape(n).astype(jnp.int32)
    order = jnp.argsort(flat_pid)
    spid = flat_pid[order]
    slen = flat_len[order]
    qidx = (order // r).astype(jnp.int32)

    idx = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), spid[1:] != spid[:-1]]
    )
    # Position within the pid's run: idx minus the run's start (cummax of
    # start positions).
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_new, idx, 0)
    )
    pos = idx - run_start
    is_start = is_new | (pos % g == 0)
    entry_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # nondecreasing
    slot = pos % g
    n_entries = entry_id[-1] + 1

    # Entry tables by gather: entry e spans sorted positions
    # [bounds[e], bounds[e+1]); empty for e >= n_entries.
    bounds = jnp.searchsorted(
        entry_id, jnp.arange(e_cap + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    estart, eend = bounds[:-1], bounds[1:]
    valid_e = estart < eend
    esafe = jnp.minimum(estart, n - 1)
    entry_pid = jnp.where(valid_e, spid[esafe], 0)
    entry_len = jnp.where(valid_e, slen[esafe], 0)
    posg = esafe[:, None] + jnp.arange(g, dtype=jnp.int32)[None, :]
    in_e = posg < eend[:, None]
    entry_qidx = jnp.where(in_e, qidx[jnp.minimum(posg, n - 1)], 0)

    # Inverse permutation of the sort -> per-slot (entry, slot) address.
    invperm = jnp.argsort(order)
    inv = (entry_id * g + slot)[invperm].reshape(b, r)
    return entry_pid, entry_len, entry_qidx, inv, n_entries


def _dedup_kernel(
    pid_ref,  # [C] int32 SMEM
    qidx_ref,  # [C, G] int32 SMEM
    nv_ref,  # [1] int32 SMEM: valid entries in this chunk
    len_ref,  # [n_et, e_tile, G] int32 VMEM, blocked (1, e_tile, G)
    q_ref,  # [B*Q, D] bf16 VMEM (all queries, resident)
    emb_hbm,  # [Np, doc_cap, D] bf16 HBM (manual DMA)
    out_ref,  # [1, e_tile, G] f32 VMEM block
    emb_scr,  # [2, e_tile, doc_cap, D] bf16
    q_scr,  # [e_tile, G*Q, D] bf16
    sem,  # DMA semaphores [2]
    *,
    nq: int,
    g: int,
):
    rt = pl.program_id(0)
    n_rt = pl.num_programs(0)
    _, e_tile, doc_cap, d = emb_scr.shape
    nv = nv_ref[0]

    def issue(slot, step):
        j0 = pl.multiple_of(step * e_tile, e_tile)

        def body(i, _):
            pid = pid_ref[j0 + i]
            pltpu.make_async_copy(
                emb_hbm.at[pid], emb_scr.at[slot, i], sem.at[slot]
            ).start()
            return 0

        jax.lax.fori_loop(0, e_tile, body, 0, unroll=True)

    @pl.when((rt == 0) & (nv > 0))
    def _():
        issue(0, 0)

    @pl.when((rt + 1 < n_rt) & ((rt + 1) * e_tile < nv))
    def _():
        issue((rt + 1) % 2, rt + 1)

    @pl.when(rt * e_tile < nv)
    def _():
        slot = rt % 2
        # Aggregate byte-counted wait for the slot's e_tile row copies
        # (see ops/rerank_kernel._kernel).
        pltpu.make_async_copy(
            emb_scr.at[slot], emb_scr.at[slot], sem.at[slot]
        ).wait()

        base = rt * e_tile
        # Gather each entry's G requester query blocks VMEM->VMEM. Static
        # unroll; dynamic sublane starts are multiples of nq (>= 16).
        for e in range(e_tile):
            for j in range(g):
                qi = qidx_ref[base + e, j]
                q_scr[e, j * nq : (j + 1) * nq, :] = q_ref[
                    pl.ds(qi * nq, nq), :
                ]

        ts = jax.lax.dot_general(
            emb_scr[slot],
            q_scr[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [e_tile, doc_cap, G*Q]
        lens_v = jnp.max(len_ref[0], axis=-1)  # [e_tile] (G-replicated)
        tok = jax.lax.broadcasted_iota(jnp.int32, (e_tile, doc_cap), 1)
        pen = jnp.where(tok < lens_v[:, None], 0.0, NEG)
        m = jnp.max(ts + pen[..., None], axis=1)  # [e_tile, G*Q]
        # Per-requester sum over its Q token columns as a matmul with a
        # block-diagonal summing matrix (lane->sublane reshapes don't
        # lower well); -inf clamps so 0 * -inf can't make NaN.
        m = jnp.maximum(m, CLAMP)
        seg = (
            jax.lax.broadcasted_iota(jnp.int32, (g * nq, g), 0) // nq
            == jax.lax.broadcasted_iota(jnp.int32, (g * nq, g), 1)
        ).astype(jnp.float32)
        out_ref[0] = jax.lax.dot_general(
            m,
            seg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [e_tile, G]


def _pallas_kwargs(interpret, compiler_params, cost_estimate):
    if interpret:
        return {"interpret": True}
    return {
        "compiler_params": compiler_params,
        "cost_estimate": cost_estimate,
    }


@functools.partial(
    jax.jit, static_argnames=("g", "e_tile", "chunk", "interpret")
)
def maxsim_gather_scores_dedup(
    emb_cache: jax.Array,  # [Np, doc_cap, D] bf16
    pids: jax.Array,  # [B, R] int32 (rows with length 0 score -inf)
    lens: jax.Array,  # [B, R] int32 valid token counts
    queries: jax.Array,  # [B, Q, D] (cast to bf16)
    g: int = G_DEFAULT,
    e_tile: int = 8,
    chunk: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for maxsim_gather_scores: [B, R] f32, -inf for empty rows.

    Same scores (same bf16 contraction / f32 accumulation / masked token
    max), computed once per unique candidate row instead of once per
    (query, slot).
    """
    b, r = pids.shape
    np_rows, doc_cap, d = emb_cache.shape
    nq = queries.shape[1]
    n = b * r
    e_cap = min(n, n // g + np_rows)
    n_chunks = max(1, -(-e_cap // chunk))
    e_pad = n_chunks * chunk

    entry_pid, entry_len, entry_qidx, inv, n_entries = group_pool(
        pids, lens, g, e_cap
    )
    entry_pid = jnp.clip(entry_pid, 0, np_rows - 1)
    pad = e_pad - e_cap
    entry_pid = jnp.pad(entry_pid, (0, pad))
    entry_len = jnp.pad(entry_len, (0, pad))
    entry_qidx = jnp.pad(entry_qidx, ((0, pad), (0, 0)))

    q2 = queries.astype(jnp.bfloat16).reshape(b * nq, d)
    n_et = chunk // e_tile
    # lens replicated across the G minor so each grid step's block is a
    # legal (1, e_tile, G) tile (cf. rerank_kernel's lens staging).
    lenG = jnp.broadcast_to(entry_len[:, None], (e_pad, g))

    kernel = pl.pallas_call(
        functools.partial(_dedup_kernel, nq=nq, g=g),
        grid=(n_et,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pid [C]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qidx [C, G]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nv [1]
            pl.BlockSpec(
                (1, e_tile, g), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
            ),  # lens [n_et, e_tile, G]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q2 [B*Q, D]
            pl.BlockSpec(memory_space=pltpu.HBM),  # emb stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, e_tile, g), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_et, e_tile, g), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, e_tile, doc_cap, d), jnp.bfloat16),
            pltpu.VMEM((e_tile, g * nq, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        **_pallas_kwargs(
            interpret,
            pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    2 * e_tile * doc_cap * d * 2  # emb scratch x2
                    + e_tile * g * nq * d * 2  # gathered queries
                    + e_tile * doc_cap * g * nq * 4 * 2  # token scores
                    + b * nq * d * 2  # resident queries
                    + 8 * 1024 * 1024
                ),
            ),
            pl.CostEstimate(
                flops=2 * chunk * doc_cap * g * nq * d,
                bytes_accessed=chunk * doc_cap * d * 2,
                transcendentals=0,
            ),
        ),
    )

    def one(args):
        pid_c, qidx_c, len_c, base = args
        nv = jnp.clip(n_entries - base, 0, chunk).astype(jnp.int32)
        out = kernel(
            pid_c,
            qidx_c,
            nv[None],
            len_c.reshape(n_et, e_tile, g),
            q2,
            emb_cache,
        )  # [n_et, e_tile, G]
        return out.reshape(chunk, g)

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    out = jax.lax.map(
        one,
        (
            entry_pid.reshape(n_chunks, chunk),
            entry_qidx.reshape(n_chunks, chunk, g),
            lenG.reshape(n_chunks, chunk * g),
            bases,
        ),
    )  # [n_chunks, chunk, G]
    scores = out.reshape(e_pad * g)[inv.reshape(-1)].reshape(b, r)
    return jnp.where(lens > 0, scores, jnp.float32(NEG))
