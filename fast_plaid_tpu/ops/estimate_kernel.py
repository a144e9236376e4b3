"""Pallas TPU kernel: fused per-slot estimates + segmented run-max.

The budgeted candidate path scores every slot of the sorted slot table at
per-query-token granularity: slot i (owned by probed cell ``own[i]``) reads
the row ``table[own[i]]`` of the tiny [C, Q] cell/query score table, equal-
pid runs combine per-token by max, and a candidate's estimate is the
Q-sum at its run head (engine.candidates_impl stage 4). In XLA that costs
a one-hot MXU matmul materializing [B, W, Q] in HBM plus log2(C) doubling
passes over it (~20 ms per 256-query tile at the bench shape — the [.., Q]
minor dim occupies 32 of 128 lanes, so every pass pays 4x tile padding).

This kernel streams the slot table once — HBM traffic is two [B, W] int32
reads and one [B, W] f32 write; the [8, T, Q] working set lives in VMEM:

  per (8 batch rows, W-tile of T slots, tiles processed right-to-left):
    s = onehot(own) @ table            (MXU, exact: one nonzero per row)
    fold the carry from the right tile into slots of its straddling run
    segmented suffix-max within the tile (log2(T) rolled max passes)
    out = sum_q s; carry (pid[:, 0], s[:, 0]) to the next (left) tile

Sequential right-to-left grid order makes cross-tile runs exact: a run
spanning tiles folds through the carry scratch, which resets naturally at
each batch group's first (rightmost) tile. Run heads are masked by the
caller (is_start computed in XLA on the [B, W] pid array — two cheap ops).

Mosaic block constraint: the last two block dims must be (multiple of 8,
multiple of 128), hence the fixed 8-row batch group and the 128-multiple
slot tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["segmented_estimate"]

_INT_MIN = -(2**31)
_BG = 8  # batch rows per grid step (Mosaic sublane granularity)


def _kernel(pid_ref, own_ref, tbl_ref, out_ref, cvec, cpid, *, t_tile, c, q):
    ti = pl.program_id(1)

    pid = pid_ref[...][:, :, None]  # [8, T, 1] i32
    own = own_ref[...]  # [8, T] i32
    tbl = tbl_ref[...]  # [8, C, Q] bf16

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (_BG, t_tile, c), 2)
    onehot = (own[:, :, None] == iota_c).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        onehot,
        tbl,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [8, T, Q] f32 (exact: one nonzero per one-hot row)

    # Fold the carry from the right-neighbour tile into every slot of the
    # straddling run (idempotent under the max-combine below, so applying
    # it to the whole run rather than just the boundary slot is safe). At
    # a batch group's first tile (ti == 0) the sentinel pid never matches.
    cp = jnp.where(ti > 0, cpid[:, 0:1], jnp.int32(_INT_MIN))[:, :, None]
    cv = cvec[:, :q][:, None, :]  # [8, 1, Q]
    s = jnp.where(pid == cp, jnp.maximum(s, cv), s)

    # Segmented suffix-max within the tile: rolled compare-max doubling.
    # Circular roll by t_tile - step == shift left by step; wrapped values
    # land at rows >= t_tile - step, which the row guard masks out.
    # Passes stop at the run-length bound: IVF lists are deduped per cell
    # (index/ivf.py), so an equal-pid run spans at most C slots — after
    # ceil(log2(C)) doublings every head covers its whole run (the XLA
    # fallback caps identically, engine._slot_estimates). At the bench
    # shape this is 7 passes instead of log2(t_tile) = 9.
    row = jax.lax.broadcasted_iota(jnp.int32, (_BG, t_tile, 1), 1)
    step = 1
    while step < min(t_tile, c):
        pid_sh = pltpu.roll(pid, shift=t_tile - step, axis=1)
        s_sh = pltpu.roll(s, shift=t_tile - step, axis=1)
        eq = (pid == pid_sh) & (row < t_tile - step)
        s = jnp.where(eq, jnp.maximum(s, s_sh), s)
        step *= 2

    out_ref[...] = jnp.sum(s, axis=2)
    cpid[:, 0:1] = pid[:, 0, :]
    cvec[:, :q] = s[:, 0, :]


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def segmented_estimate(
    pid_s: jax.Array,  # [B, W] int32, row-sorted by pid
    own_s: jax.Array,  # [B, W] int32 owner-cell index in [0, C)
    cell_scores: jax.Array,  # [B, C, Q] (cast to bf16 for the MXU)
    *,
    t_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[B, W] f32: per-slot Q-sum of the running per-token max over the
    slot's equal-pid run SUFFIX. At each run's first slot this equals the
    candidate's full estimate sum_q max_{cells} table[c, q]; other slots
    hold partial suffixes and must be masked by the caller's is_start.
    """
    b, w = pid_s.shape
    _, c, q = cell_scores.shape
    if not interpret:
        t_tile = max(128, (t_tile // 128) * 128)  # lane-aligned slot tiles
    nt = -(-w // t_tile)
    wp = nt * t_tile
    bp = -(-b // _BG) * _BG
    if wp != w or bp != b:
        pad = ((0, bp - b), (0, wp - w))
        # Pad pids with a value outside any real range so padded slots
        # never join a real run; padded rows never reach the caller.
        pid_s = jnp.pad(pid_s, pad, constant_values=2**31 - 1)
        own_s = jnp.pad(own_s, pad)
        cell_scores = jnp.pad(cell_scores, ((0, bp - b), (0, 0), (0, 0)))

    grid = (bp // _BG, nt)
    rev = lambda bi, ti: (bi, nt - 1 - ti)  # right-to-left tile order
    kwargs = (
        {"interpret": True}
        if interpret
        else {
            "cost_estimate": pl.CostEstimate(
                flops=2 * bp * wp * c * q,
                bytes_accessed=bp * wp * 12 + bp * c * q * 2,
                transcendentals=0,
            ),
        }
    )
    out = pl.pallas_call(
        functools.partial(_kernel, t_tile=t_tile, c=c, q=q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BG, t_tile), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BG, t_tile), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_BG, c, q), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((_BG, t_tile), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BG, max(q, 128)), jnp.float32),
            pltpu.VMEM((_BG, 128), jnp.int32),
        ],
        **kwargs,
    )(pid_s, own_s, cell_scores.astype(jnp.bfloat16))
    return out[:b, :w]
