"""The PLAID search cascade as one jitted, query-batched XLA program.

TPU re-design of the reference's per-query Rust loop (reference:
rust/search/search.rs:219-288 serial driver, 471-696 single-query cascade).
Structural differences, by design:

* **Batched queries.** The whole cascade runs over a [B, Q, D] query tile in
  one XLA program; the reference loops queries serially on the host.
* **Static shapes.** Candidate sets, IVF cells and jagged documents become
  fixed-capacity buffers + validity masks (sort-based dedup instead of
  ``unique``, sentinel ids instead of dynamic sizes), so XLA compiles one
  program per (index shape, search params) pair.
* **No LUTs / scatter-padding.** Decompression is shift/mask vector code
  (ops/codec.py) and jagged lookups are offset+iota gathers (index/layout.py).

Cascade stages (1:1 with search.rs:471-696):
  1. query-centroid scores           (search.rs:491)
  2. IVF probe, subset-restricted    (search.rs:494-532)
  3. candidate generation + dedup    (search.rs:536-547)
  4. approximate (code-only) MaxSim  (search.rs:554-599)
  5. prune to n_full_scores, then /4 (search.rs:605-619)
  6. decompress + exact MaxSim       (search.rs:640-657)
  7. final top-k                     (search.rs:659-692)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from fast_plaid_tpu.index.layout import (
    IVF_ALIGN,
    DeviceIndex,
    IndexSpec,
    gather_res,
    round_up,
)
from fast_plaid_tpu.ops import codec
from fast_plaid_tpu.ops.maxsim import NEG_INF as MAXSIM_NEG
from fast_plaid_tpu.ops.maxsim import maxsim_reduce

__all__ = [
    "search_core",
    "search_impl",
    "candidates_core",
    "candidates_impl",
    "rerank_rows_core",
    "token_matrices_core",
    "final_topk_core",
    "reconstruct_core",
    "candidate_capacity",
    "suggest_slot_budget",
    "suggest_safe_budget",
    "resolve_approx_mode",
    "rescue_pool",
    "q4_prefilter_core",
]

NEG = jnp.float32(-jnp.inf)

# The exact-rerank matmul is the flops bottleneck (B*R*doc_cap*Q*D). bf16
# inputs with f32 accumulation keep it on the MXU's fast path; scores stay
# f32. Set FASTPLAID_TPU_F32=1 to force full f32 (e.g. for numerics debts).
RERANK_DTYPE = (
    jnp.float32 if os.environ.get("FASTPLAID_TPU_F32") else jnp.bfloat16
)


def _exact_scores(emb, queries, valid):
    """MaxSim of decompressed doc tokens vs queries, bf16 in / f32 out."""
    ts = jnp.einsum(
        "brtd,bqd->brtq",
        emb.astype(RERANK_DTYPE),
        queries.astype(RERANK_DTYPE),
        preferred_element_type=jnp.float32,
    )
    return maxsim_reduce(ts, valid), ts


def _chunk_count(total: int, chunk: int) -> int:
    return -(-total // chunk)


def rescue_pool(top_k: int) -> int:
    """Exact-rescore slice size after the q4 prefilter.

    4x the requested top_k (min 32, rounded to a tile-friendly multiple):
    the q4 estimate's per-score error (~1e-2 absolute on unit-norm tokens)
    must only preserve membership of the true top_k inside this slice, a
    4x margin on rank — the codec-exact rescore restores exact order.
    """
    return round_up(max(4 * top_k, 32), 8)


def _pad_to(x: jax.Array, size: int, axis: int, value) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _doc_mask(dev: DeviceIndex, pids: jax.Array, doc_cap: int) -> jax.Array:
    """Validity mask [..., doc_cap] for doc-major rows gathered by pid."""
    lens = dev.doc_lengths[pids]
    return jnp.arange(doc_cap, dtype=jnp.int32) < lens[..., None]


def _allowed_cells_mask(
    dev: DeviceIndex, subset: jax.Array, ispec: IndexSpec, kp: int, chunk: int
) -> jax.Array:
    """[B, S] subset pids -> [B, kp] bool mask of cells their tokens occupy.

    Mirrors the reference's subset probe restriction (search.rs:494-517):
    with a subset, only centroids present in the subset documents' codes are
    eligible for probing.
    """
    b, s = subset.shape
    doc_cap = ispec.doc_cap
    n_chunks = _chunk_count(s, chunk)
    subset_p = _pad_to(subset, n_chunks * chunk, 1, ispec.sentinel_pid)
    chunks = subset_p.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    def body(mask: jax.Array, pids: jax.Array) -> tuple[jax.Array, None]:
        valid = _doc_mask(dev, pids, doc_cap)
        tok_codes = dev.codes[pids]  # [B, chunk, doc_cap]
        tok_codes = jnp.where(valid, tok_codes, kp)  # kp -> dropped by scatter

        def scatter_b(m: jax.Array, c: jax.Array) -> jax.Array:
            return m.at[c.reshape(-1)].set(True, mode="drop")

        return jax.vmap(scatter_b)(mask, tok_codes), None

    init = jnp.zeros((b, kp), dtype=bool)
    mask, _ = jax.lax.scan(body, init, chunks)
    return mask


def _sort_pid_payload(
    pid: jax.Array, payload: jax.Array, payload_bound: int, sent_pid: int
) -> tuple[jax.Array, jax.Array]:
    """Row-sort ``pid`` carrying ``payload`` (values in [0, payload_bound)).

    Packs both into one int32 key (pid * 2^ceil(log2(bound)) + payload)
    when the range fits, so XLA sorts ONE array instead of co-sorting two
    (each compare-exchange pass of the variadic sort moves every operand).
    Payload order within an equal-pid run is unspecified either way
    (num_keys=1 co-sort is unstable too); callers only max-combine runs.
    """
    cpad = 1 << max(payload_bound - 1, 1).bit_length()
    if (sent_pid + 1) * cpad < 2**31:
        key_s = jnp.sort(pid * cpad + payload, axis=-1)
        return key_s // cpad, key_s % cpad
    return jax.lax.sort((pid, payload), dimension=-1, num_keys=1)


def _dedup_sorted(x: jax.Array, sentinel) -> jax.Array:
    """Replace repeated values in a row-sorted array with ``sentinel``."""
    dup = jnp.concatenate(
        [jnp.zeros((*x.shape[:-1], 1), bool), x[..., 1:] == x[..., :-1]], axis=-1
    )
    return jnp.where(dup, sentinel, x)


def _slot_estimates(
    pid_s: jax.Array,  # [B, W] int32, row-sorted by pid (sentinels last)
    own_s: jax.Array,  # [B, W] int32 owning-cell index into cell_scores
    cell_scores: jax.Array,  # [B, C, Q] bf16 probe-score table
    *,
    mem_budget: int,
    use_kernel: bool,
    interpret: bool = False,
) -> jax.Array:
    """Per-slot candidate estimates [B, W] f32: sum_q max over the slot's
    equal-pid run of the owning cells' query-token scores (the per-query-max
    PLAID stage-1 estimator). Only valid at each run's FIRST slot — mask
    with is_start. Shared by the budgeted "cells" and untruncated
    "cells_full" paths; the only difference between them is which slots
    exist in (pid_s, own_s).

    Two realizations: the fused Pallas kernel (one-hot matmul + segmented
    run-max + Q-sum in VMEM, ops/estimate_kernel.py), or an XLA fallback —
    chunked one-hot MXU matmul (a take_along_axis row gather here is
    B*W descriptors, tens of millions at cells_full widths — the measured
    wall of the pre-kernel path) followed by a log2(C)-step doubling
    suffix-max within equal-pid runs.
    """
    if use_kernel:
        from fast_plaid_tpu.ops.estimate_kernel import segmented_estimate

        return segmented_estimate(
            pid_s, own_s, cell_scores, interpret=interpret
        )
    b, width = pid_s.shape
    c, q = cell_scores.shape[1], cell_scores.shape[2]
    c_chunk = max(
        512, min(width, (mem_budget // max(1, 2 * b * c)) // 128 * 128)
    )
    ncc = _chunk_count(width, c_chunk)
    own_p = (
        _pad_to(own_s, ncc * c_chunk, 1, 0)
        .reshape(b, ncc, c_chunk)
        .transpose(1, 0, 2)
    )

    def slot_chunk(cs: jax.Array) -> jax.Array:  # [B, cc] -> [B, cc, Q]
        onehot = (
            cs[..., None] == jnp.arange(c, dtype=jnp.int32)
        ).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            onehot,
            cell_scores,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    s_slot = jax.lax.map(slot_chunk, own_p)  # [ncc, B, cc, Q]
    s_slot = (s_slot.transpose(1, 0, 2, 3).reshape(b, ncc * c_chunk, q))[
        :, :width
    ]
    neg = jnp.bfloat16(-3.0e38)
    step = 1
    while step < c:
        eq = pid_s[:, :-step] == pid_s[:, step:]
        shifted = jnp.where(eq[..., None], s_slot[:, step:, :], neg)
        s_slot = s_slot.at[:, :-step, :].max(shifted)
        step *= 2
    return jnp.sum(s_slot.astype(jnp.float32), axis=-1)


def candidates_impl(
    dev: DeviceIndex,
    queries: jax.Array,  # [B, Q, D] float32 (zero-padded query tokens)
    subset: jax.Array | None,  # [B, S] int32 sorted asc, sentinel_pid padding
    *,
    ispec: IndexSpec,
    n_ivf_probe: int,
    n_full_scores: int,
    mem_budget: int = 256 * 1024 * 1024,
    cand_cap: int | None = None,
    approx_mode: str = "cells",
    with_stats: bool = False,
    slot_budget: int | None = None,
    use_estimate_kernel: bool = False,
    interpret_kernels: bool = False,
    pool_divisor: int = 2,
    rank_admit: int = 0,
) -> jax.Array:
    """Cascade stages 1-5: probe, candidate generation, approximate scoring,
    pruning. Returns the rerank set p2 [B, R] (sentinel_pid padding), sorted
    by descending approximate score. Does not touch ``dev.residuals`` — the
    low_memory path keeps those in host RAM and streams only these R rows.

    ``rank_admit`` > 0 turns on the rank-based admission tier in the
    budgeted "cells" path: every query token's top-``rank_admit`` probed
    cells are admitted whole ahead of the cell_tot ordering (see the inline
    rationale at the tier). Combined with a budget sized to hold them
    (suggest_safe_budget), this is the recall-safe replacement for crossing
    over to the untruncated "cells_full" estimator — same per-query-max
    estimates for every top-rank-matched document at a fraction of the
    slot width.

    ``pool_divisor`` sets the exact-rerank pool R = n_full_scores //
    pool_divisor for the budgeted cells paths (the exhaustive path keeps
    /2 — its brute-force-identity contract needs the pool to cover the
    corpus, and the tokens path keeps the reference's /4,
    search.rs:614-619). The fused rerank kernels are row-DMA-descriptor
    bound, so the rerank stage's cost is linear in R; with the per-query-
    token slot estimator the top-k winners concentrate in the top
    fraction of the pool (measured: /4 reproduces /2's top-10 sets
    exactly at the bench scale) — the searcher resolves the default.

    With ``with_stats`` additionally returns a [B, 2] int32 stats array:
    column 0 = slots the slot BUDGET pruned by design (the estimator
    working as intended), column 1 = slots the static buffers (cand_cap /
    c_sel) truncated beyond what the budget wanted — genuine overflow that
    can cost recall. Probed cells are laid out in admission-priority order,
    so truncation drops the *lowest*-priority cells' candidates first.

    approx_mode selects the pruning estimator:

    * "cells" (default, TPU-native): candidates come from whole probed
      cells taken in descending total-score order until the slot budget
      (``slot_budget``, hub-extended — suggest_slot_budget) fills, with
      giant stopword-style cells demoted to last; every kept slot is
      scored per query token — sum_q max over the candidate's probed
      cells of the [B, C, Q] probe-table score (the PLAID stage-1
      estimator at per-query granularity). No per-token gathers. The
      rerank pool is widened to n_full_scores/2 (instead of the
      reference's /4) because cell-level scores are coarser than token-
      level ones; the final ranking is exact either way.
    * "cells_full": the same per-query-max estimator over EVERY candidate
      slot with no slot budget — the safety net for coarse-k indexes
      whose single cells dwarf any budget (the ``auto`` selector in the
      API layer crosses over on measured volume).
    * "tokens" (reference parity, search.rs:554-599): every candidate
      token gathers its centroid's query scores — the tightest estimate
      but gather-descriptor-bound on TPU (~20M rows/s).

    Estimator regimes: with k at the partition heuristic (~sqrt-scale)
    the budgeted "cells" path is recall-equivalent to cells_full on both
    uniform and hub-skewed corpora (ColBERT-proxy: nDCG gap 0.002 vs
    exhaustive-on-compressed) at fast-path cost. Deliberately coarse-k
    indexes (cells of 10k+ docs) still need cells_full/tokens: every doc
    in a cell shares one estimate there, whatever the budget.
    """
    # Queries may arrive as float16: the host driver stages them over the
    # wire at half width (H2D bandwidth is the API path's bottleneck on
    # remote-attached devices); all math runs in f32.
    queries = queries.astype(jnp.float32)
    b, q, d = queries.shape
    kp = dev.centroids.shape[0]
    k_real = ispec.n_partitions
    doc_cap, cell_cap = ispec.doc_cap, ispec.cell_cap
    sent_pid = ispec.sentinel_pid

    # ---- 1. query-centroid scores: one MXU matmul for the whole tile.
    # At large Kp this [B, Q, Kp] table is the search program's dominant
    # temp (1 GB per 64 queries at Kp=128k); bf16 storage halves it. The
    # table only drives the candidate heuristics (probe ranking, cell
    # totals) — the final ranking is exact-rescored — so the ~0.4% bf16
    # relative error is immaterial. f32 below 32k cells to keep small-k
    # numerics bit-stable.
    qc_dtype = jnp.bfloat16 if kp >= 32768 else jnp.float32
    # In the bf16-table regime the matmul inputs go bf16 too (f32
    # accumulation): the table only drives candidate heuristics, and the
    # bf16-in matmul halves both MXU passes and the [B*Q, Kp] HBM write
    # (measured 24 -> 13 ms per 256-query tile at Kp=32k before the
    # epilogue cast; inputs-bf16 roughly halves again).
    scores_qc = (
        jnp.dot(
            queries.reshape(b * q, d).astype(qc_dtype),
            dev.centroids.T.astype(qc_dtype),
            preferred_element_type=jnp.float32,
        )
        .reshape(b, q, kp)
        .astype(qc_dtype)
    )

    # ---- 2. IVF probe. Zero-padded query tokens (tile/length padding,
    # zeroed bad queries) must not probe: their all-zero score rows would
    # hand approx_max_k arbitrary cells, which the rank-admission tier
    # would then admit ahead of real cells. They contribute exactly 0 to
    # every estimate either way; masking only removes their junk cells.
    tok_ok = jnp.sum(jnp.abs(queries), axis=-1) > 0  # [B, Q]
    cell_valid = jnp.arange(kp) < k_real
    probe_scores = jnp.where(
        cell_valid[None, None, :] & tok_ok[..., None],
        scores_qc,
        jnp.asarray(NEG, qc_dtype),
    )
    if subset is not None:
        allowed = _allowed_cells_mask(
            dev,
            subset,
            ispec,
            kp,
            chunk=max(8, min(subset.shape[1], mem_budget // (4 * b * doc_cap * 4))),
        )
        probe_scores = jnp.where(
            allowed[:, None, :], probe_scores, jnp.asarray(NEG, qc_dtype)
        )
    probe = min(n_ivf_probe, kp)
    # TPU-native approximate top-k for the probe (exact top_k over
    # [B, Q, Kp] measured 20x slower at Kp=32k; the probe is a recall
    # heuristic, and approx_max_k's default 0.95 per-element recall is
    # far inside PLAID's own slack). Exact top_k elsewhere.
    top_cell_scores, cells = jax.lax.approx_max_k(
        probe_scores.reshape(b * q, kp), probe
    )
    top_cell_scores = top_cell_scores.reshape(b, q, probe)
    cells = cells.reshape(b, q, probe)
    cells = jnp.where(top_cell_scores > NEG, cells, kp)  # kp = empty sentinel cell
    # Pack each probed cell with its per-token probe rank (approx_max_k
    # returns scores descending, so rank = position) and sort packed so
    # the MINIMUM rank lands at each equal-cell run's head: the budgeted
    # path's rank-based admission tier needs, per deduped cell, the best
    # rank at which ANY query token probed it.
    pp = 1 << max((probe - 1).bit_length(), 1)
    if (kp + 1) * pp >= 2**31:
        # int32 packing bound: the sentinel key is kp * pp. Realistic
        # configurations sit far inside it (2^22 cells x 256 probe); an
        # oversized one must fail loudly here rather than silently corrupt
        # cell dedup/admission ordering downstream.
        msg = (
            f"n_partitions ({kp}) x probe-rank range ({pp}) overflows the "
            "int32 cell/rank packing; reduce n_ivf_probe or the partition "
            "count"
        )
        raise ValueError(msg)
    rank = jax.lax.broadcasted_iota(jnp.int32, (b, q, probe), 2)
    packed = jnp.where(cells == kp, kp * pp, cells * pp + rank)
    packed = jnp.sort(packed.reshape(b, q * probe), axis=-1)
    best_rank = packed % pp  # valid at each run head (post-dedup slot)
    cells = _dedup_sorted(packed // pp, kp)
    # Per-cell/query-token score table [B, C, Q] for every probed cell,
    # RECOMPUTED from gathered centroid rows with one tiny MXU matmul
    # (0.5 GFLOP at the bench shape) rather than gathered out of the
    # [B, Q, Kp] score tensor: take_along_axis there is a per-ELEMENT
    # descriptor gather (B*Q*C ~ 2M descriptors at ~40M desc/s — measured
    # ~15 ms per 256-query tile on v5e), while centroids[cells] is only
    # B*C row descriptors. Every cell-score consumer below (probe-order
    # priority, cell totals, per-slot estimates) reads this table.
    cent_sel = dev.centroids[jnp.clip(cells, 0, kp - 1)].astype(jnp.float32)
    tbl = jnp.einsum(
        "bcd,bqd->bcq", cent_sel, queries, preferred_element_type=jnp.float32
    )  # [B, C, Q]
    # Order the deduped cells by descending probe score (max over query
    # tokens) so that if the candidate buffer overflows, the truncated tail
    # holds the least-promising cells — never an arbitrary high scorer.
    cell_pri = jnp.where(cells == kp, NEG, jnp.max(tbl, axis=-1))  # [B, C]
    order = jnp.argsort(-cell_pri, axis=-1)
    cells = jnp.take_along_axis(cells, order, axis=-1)
    tbl = jnp.take_along_axis(tbl, order[..., None], axis=1)
    best_rank = jnp.take_along_axis(best_rank, order, axis=-1)

    # ---- 3. candidates: exactly-compacted segmented layout.
    # Instead of a [C, cell_cap] window per probed cell (max-cell padding
    # waste), lay the probed cells' lists end to end in a static
    # [B, cand_cap] buffer: slot j belongs to the cell whose cumulative
    # length range covers j. Ownership is resolved with a chunked
    # compare-reduce over the C probed cells (a vmapped searchsorted lowers
    # to a gather-heavy while loop on TPU). cand_cap defaults to the worst
    # case (sum of the C largest cells) and can be capped by the caller.
    c_cells = cells.shape[1]
    offs = dev.ivf_offsets[cells]
    lens = dev.ivf_lengths[cells]  # sentinel cells -> 0
    seg_end = jnp.cumsum(lens, axis=-1)  # [B, C] inclusive ends
    seg_start = seg_end - lens
    total = seg_end[:, -1]
    if cand_cap is None:
        cand_cap = c_cells * cell_cap
    base_tab = offs - seg_start  # [B, C]
    cell_ids = jnp.arange(c_cells, dtype=jnp.int32)

    def _subset_filter(pid: jax.Array) -> jax.Array:
        """Sentinel-out pids not in the (row-sorted) subset [B, S]."""
        pos = jax.vmap(jnp.searchsorted)(subset, pid)
        pos = jnp.clip(pos, 0, subset.shape[1] - 1)
        member = jnp.take_along_axis(subset, pos, axis=1) == pid
        return jnp.where(member, pid, sent_pid)

    if approx_mode in ("cells", "cells_full"):  # fast cell-window path
        # ---- 3/4/5 (cells, fast path). Cells are ordered by total query
        # score and taken WHOLE until the slot budget fills; their IVF
        # lists arrive via dynamic-slice windows — never a per-slot scalar
        # pid gather (~1M descriptors at ~43M/s, the previous wall). Two
        # regimes share the cell ordering:
        #
        # * exhaustive (full probe / corpus-covering pool): a correctness
        #   contract — results must equal brute force — so no implicit
        #   budget applies (an EXPLICIT cand_cap still caps, with the drop
        #   counted), selections are exact, and candidates are scored at
        #   cell granularity (the pool covers everything anyway).
        # * budgeted: windows are CHUNKED (width ``min(cell_cap, 256)``) so
        #   a Zipf-skewed corpus never pays max-cell padding across every
        #   selected cell, and every kept slot is scored at per-query-token
        #   granularity (sum_q max over the candidate's probed cells) — the
        #   cells_full estimator at fast-path cost. Cell-granular scoring
        #   (every doc in a cell sharing one estimate) measurably collapses
        #   under hub cells: realistic stopword-style cells holding ~40% of
        #   a corpus rank top for every query and flood a cell-granular
        #   pool (ColBERT-proxy corpus: pool recall@10 0.896 cell-granular
        #   vs 0.974 per-query-max with the hub-extended slot_budget).
        # [B, C] cell totals from the recomputed table (zero-padded query
        # rows contribute exactly 0).
        cell_tot = jnp.where(cells == kp, NEG, jnp.sum(tbl, axis=-1))
        order2 = jnp.argsort(-cell_tot, axis=-1)
        ct_s = jnp.take_along_axis(cell_tot, order2, axis=-1)
        offs_s = jnp.take_along_axis(offs, order2, axis=-1)
        lens_s = jnp.take_along_axis(lens, order2, axis=-1)

        exhaustive = (
            n_ivf_probe >= k_real or n_full_scores >= 2 * ispec.n_docs
        )
        if approx_mode == "cells_full":
            # The exhaustive branch scores at CELL granularity — sound only
            # when the rerank pool covers the corpus. cells_full's contract
            # is per-query-token estimates, so a full probe with a small
            # pool still takes the budgeted (untruncated) branch.
            exhaustive = n_full_scores >= 2 * ispec.n_docs
        k2 = min(cand_cap, ((n_full_scores + 127) // 128) * 128)

        if exhaustive:
            budget = cand_cap
            c_sel = c_cells
            csum = jnp.cumsum(lens_s, axis=-1)
            cell_ok = (csum - lens_s) < budget

            # Cell windows as whole 128-aligned rows of the 2-D IVF view
            # (cell starts are IVF_ALIGN-aligned by layout): a row gather,
            # not per-element unaligned slices.
            ivf2d = dev.ivf.reshape(-1, IVF_ALIGN)
            rows_pc = -(-cell_cap // IVF_ALIGN)
            row_ids = (offs_s // IVF_ALIGN)[..., None] + jnp.arange(
                rows_pc, dtype=jnp.int32
            )
            win = ivf2d[jnp.clip(row_ids, 0, ivf2d.shape[0] - 1)].reshape(
                b, c_sel, rows_pc * IVF_ALIGN
            )[:, :, :cell_cap]  # [B, c_sel, cell_cap]
            iota_cc = jnp.arange(cell_cap, dtype=jnp.int32)
            valid = (
                iota_cc[None, None, :] < lens_s[..., None]
            ) & cell_ok[..., None]
            width = c_sel * cell_cap
            pid = jnp.where(valid, win, sent_pid).reshape(b, width)
            if subset is not None:
                pid = _subset_filter(pid)
            vals = jnp.where(valid, ct_s[..., None], NEG).reshape(b, width)

            # dedup multi-cell docs: sort by pid, keep each run's max
            # score (backward doubling), score only the run head.
            pid_s, val_s = jax.lax.sort((pid, vals), dimension=-1, num_keys=1)
            step = 1
            while step < width:
                eq = pid_s[:, :-step] == pid_s[:, step:]
                val_s = val_s.at[:, :-step].max(
                    jnp.where(eq, val_s[:, step:], NEG)
                )
                step *= 2
            is_start = jnp.concatenate(
                [jnp.ones((b, 1), bool), pid_s[:, 1:] != pid_s[:, :-1]],
                axis=-1,
            ) & (pid_s != sent_pid)
            approx = jnp.where(is_start, val_s, NEG)
            r = min(max(n_full_scores // 2, 1), width)
            s1, i1 = jax.lax.top_k(approx, r)
            p2 = jnp.where(
                jnp.isneginf(s1),
                sent_pid,
                jnp.take_along_axis(pid_s, i1, axis=1),
            )
            if with_stats:
                # Exhaustive parameters are a brute-force-identity
                # contract: every slot an explicit cand_cap truncates is
                # genuine overflow, never intended pruning.
                kept = jnp.sum(jnp.where(cell_ok, lens_s, 0), axis=-1)
                over = jnp.maximum(total - kept, 0).astype(jnp.int32)
                return p2, jnp.stack([jnp.zeros_like(over), over], axis=-1)
            return p2

        # ---- budgeted chunked-window path. "cells_full" shares the exact
        # same layout with the budget opened to the full candidate capacity
        # (every probed cell's list materializes; the estimator is
        # untruncated) — the generic segmented path below costs ~6x more
        # here because its candidate generation is a per-ELEMENT ivf gather
        # (B*cand_cap descriptors) plus an O(B*cand_cap*C) ownership
        # compare-reduce, where this path fetches whole 128-aligned IVF
        # rows and resolves ownership at chunk granularity (128x fewer
        # compares).
        if approx_mode == "cells_full":
            budget = cand_cap
            c_sel = c_cells
            # No demotion: every cell is admitted; ordering only decides
            # which cells truncate first if an explicit cand_cap binds.
            order_b = jnp.argsort(-cell_tot, axis=-1)
        else:
            budget = min(cand_cap, max(k2, slot_budget or 0))
            if subset is not None:
                # Density-scaled budget: the slot budget counts EVERY doc in
                # an admitted cell, but only ~S/n_docs of them survive the
                # membership filter. Scale so the expected number of
                # admitted SUBSET docs matches the unfiltered budget (the
                # direct-subset pool in search_impl handles S <= 2*r_pool,
                # so the scale here is bounded by ~n_docs/(2*r_pool)).
                density = max(1, ispec.n_docs // max(subset.shape[1], 1))
                budget = min(cand_cap, budget * density)
            typical = max(1, cand_cap // max(c_cells, 1))
            c_sel = min(c_cells, max(8, -(-2 * budget // typical)))
            # Giant-cell demotion: a hub cell (stopword-style — many times
            # the mean cell size) carries almost no per-document
            # information: every document it holds shares its score. Ranked
            # by raw cell_tot such cells land FIRST for every query
            # (stopword query tokens score them highly) and would eat the
            # whole whole-cell budget, evicting the small content cells
            # that actually discriminate. Demote them below every normal
            # cell (but above sentinel/empty cells): content cells fill the
            # budget first, and a giant enters only with budget left over —
            # or as the fallback when a query probed nothing else.
            # Documents reachable ONLY via a dropped giant are precisely
            # those the estimator could not rank anyway; their hub
            # contribution is near-uniform across the corpus (a constant
            # shift in the reference's token estimator, search.rs:554-599).
            mean_len = dev.ivf_lengths.sum() // jnp.maximum(k_real, 1)
            giant_thresh = jnp.maximum(
                (8 * mean_len).astype(jnp.int32), jnp.int32(budget // 4)
            )
            is_giant = (lens > giant_thresh) & jnp.isfinite(cell_tot)
            demoted = jnp.where(
                is_giant, cell_tot - jnp.float32(1e10), cell_tot
            )
            if rank_admit > 0:
                # Rank-based admission tier (the recall-safe budgeted
                # selection, replacing the cells_full crossover for `auto`):
                # every query token's top-``rank_admit`` probed cells are
                # admitted WHOLE ahead of all cell_tot-ranked cells. Any
                # document whose matching tokens' cells are per-token
                # top-rank therefore receives its full per-query-max
                # estimate — exactly the documents cell_tot ordering loses
                # at scale, where a relevant document's cells are
                # individually unremarkable by TOTAL score (one strong
                # token drowned by Q-1 noise terms) yet rank first for
                # their own token. cell_tot ordering fills the remaining
                # budget; giants stay demoted even at rank 0 (their
                # contribution is near-uniform, see above). Lower ranks
                # admit first, so budget truncation degrades from the
                # weakest rank down, never arbitrarily. Within a tier the
                # f32 +1e10 offset erases cell_tot ordering — harmless,
                # tiers are normally admitted whole.
                tier0 = (best_rank < rank_admit) & (cells != kp) & ~is_giant
                demoted = jnp.where(
                    tier0,
                    jnp.float32(1e10)
                    * (rank_admit - best_rank).astype(jnp.float32),
                    demoted,
                )
                c_sel = min(c_cells, max(c_sel, q * rank_admit + 8))
            order_b = jnp.argsort(-demoted, axis=-1)
        # Full-C admission pass first: cell_ok over every probed cell gives
        # the budget's target keeps, so intended pruning and cand_cap
        # overflow are accounted separately (see the with_stats block).
        offs_o = jnp.take_along_axis(offs, order_b, axis=-1)
        lens_o = jnp.take_along_axis(lens, order_b, axis=-1)
        csum_full = jnp.cumsum(lens_o, axis=-1)
        ok_full = (csum_full - lens_o) < budget  # whole cells until budget
        offs_s, lens_s = offs_o[:, :c_sel], lens_o[:, :c_sel]
        cell_ok = ok_full[:, :c_sel]

        # Chunk table: selected cells' lists decompose into IVF_ALIGN-wide
        # chunks laid end to end. Cell starts are IVF_ALIGN-aligned in the
        # device layout, so every chunk is exactly one ROW of the 2-D IVF
        # view and materializes as an efficient row gather (an unaligned
        # dynamic-slice window lowers to per-element gathers — measured
        # 23 ms/256-query tile vs <1 ms for rows at the bench shape).
        # Table capacity = full-chunk budget + one partial chunk per
        # selected cell + the straddling last cell (whole-cell semantics
        # admit it fully); total width is therefore O(2*budget + cell_cap)
        # regardless of the corpus's cell-size distribution — never
        # c_sel * cell_cap (the max-cell padding this replaces).
        w = IVF_ALIGN
        s_chunks = -(-budget // w) + c_sel + -(-cell_cap // w)
        nck = jnp.where(cell_ok, (lens_s + w - 1) // w, 0)  # [B, c_sel]
        ck_end = jnp.cumsum(nck, axis=-1)
        ck_start = ck_end - nck
        jj = jnp.arange(s_chunks, dtype=jnp.int32)
        own = (jj[None, :, None] >= ck_start[:, None, :]) & (
            jj[None, :, None] < ck_end[:, None, :]
        )  # [B, S, c_sel] — exactly one owner while jj < total chunks
        sel_ids = jnp.arange(c_sel, dtype=jnp.int32)
        owner = jnp.sum(
            jnp.where(own, sel_ids[None, None, :], 0), axis=-1
        ).astype(jnp.int32)  # [B, S]
        has = jnp.any(own, axis=-1)
        local = jj[None, :] - jnp.take_along_axis(ck_start, owner, axis=1)
        off = jnp.take_along_axis(offs_s, owner, axis=1) + local * w
        rem = jnp.take_along_axis(lens_s, owner, axis=1) - local * w
        ivf2d = dev.ivf.reshape(-1, w)
        win = ivf2d[
            jnp.clip(off // w, 0, ivf2d.shape[0] - 1)
        ]  # [B, S, w] row gather (off is w-aligned by layout)
        iota_w = jnp.arange(w, dtype=jnp.int32)
        valid = (iota_w[None, None, :] < rem[..., None]) & has[..., None]
        width = s_chunks * w
        pid = jnp.where(valid, win, sent_pid).reshape(b, width)
        if subset is not None:
            # Membership at slot granularity on the compact chunk table —
            # the windowed realization of the reference's sorted-merge
            # intersection (search.rs:544-547, 404-439).
            pid = _subset_filter(pid)
        ownw = jnp.broadcast_to(
            owner[..., None], (b, s_chunks, w)
        ).reshape(b, width)

        # ---- 4. sort by pid carrying the owning cell; per-query-token
        # estimates come from the tiny [B, c_sel, Q] probe-score table,
        # suffix-maxed within equal-pid runs (a doc appears at most once
        # per cell, so runs are <= c_sel long). When (pid, owner) packs
        # into one int32 key, a single-array sort replaces the 2-array
        # co-sort (~1.5x at the bench width — XLA's variadic sort carries
        # every operand through each compare-exchange pass); owner order
        # within a run is irrelevant (the estimator max-combines it).
        pid_s, own_s = _sort_pid_payload(pid, ownw, c_sel, sent_pid)
        cell_scores = jnp.take_along_axis(tbl, order_b[..., None], axis=1)[
            :, :c_sel
        ].astype(jnp.bfloat16)  # [B, c_sel, Q]
        is_start = jnp.concatenate(
            [jnp.ones((b, 1), bool), pid_s[:, 1:] != pid_s[:, :-1]], axis=-1
        ) & (pid_s != sent_pid)
        est = _slot_estimates(
            pid_s,
            own_s,
            cell_scores,
            mem_budget=mem_budget,
            use_kernel=use_estimate_kernel,
            interpret=interpret_kernels,
        )
        approx = jnp.where(is_start, est, NEG)

        # ---- 5. prune straight to the exact-rerank pool (n_full/2); an
        # exact top_k here would only re-derive an order the exact rerank
        # recomputes. The recall-safety configurations — cells_full and
        # the rank-admitted tier — keep the exact top_k (approx_max_k's
        # ~0.95 per-element recall is inside PLAID's slack for the plain
        # budgeted path, but a safety path should not reintroduce a
        # stochastic miss).
        r = min(max(n_full_scores // pool_divisor, 1), width)
        if approx_mode == "cells_full" or rank_admit > 0:
            s1, i1 = jax.lax.top_k(approx, r)
        else:
            s1, i1 = jax.lax.approx_max_k(approx, r)
        p2 = jnp.where(
            jnp.isneginf(s1),
            sent_pid,
            jnp.take_along_axis(pid_s, i1, axis=1),
        )
        if with_stats:
            # Split the accounting. The slot budget and the c_sel cell cap
            # are both part of the budgeted estimator's DESIGN, and both
            # truncate in admission-priority order (weakest cells first) —
            # slots they drop are intended pruning, never warned about.
            # Genuine overflow is only what an explicit cand_cap clamped
            # off the unconstrained budget (budget = min(cand_cap, ...)):
            # that is a memory ceiling cutting into what the estimator
            # wanted, the one condition that can silently cost recall. In
            # cells_full mode the contract is untruncated estimation, so
            # every dropped slot is overflow.
            kept = jnp.sum(jnp.where(cell_ok, lens_s, 0), axis=-1)
            if approx_mode == "cells_full":
                over = jnp.maximum(total - kept, 0).astype(jnp.int32)
                return p2, jnp.stack([jnp.zeros_like(over), over], axis=-1)
            budget_free = max(k2, slot_budget or 0)  # pre-cand_cap intent
            if subset is not None:
                budget_free = budget_free * max(
                    1, ispec.n_docs // max(subset.shape[1], 1)
                )
            ok_free = (csum_full - lens_o) < budget_free
            target_free = jnp.sum(jnp.where(ok_free, lens_o, 0), axis=-1)
            target_cap = jnp.sum(jnp.where(ok_full, lens_o, 0), axis=-1)
            over = jnp.maximum(target_free - target_cap, 0).astype(jnp.int32)
            pruned = jnp.maximum(total - kept, 0).astype(jnp.int32) - over
            return p2, jnp.stack([jnp.maximum(pruned, 0), over], axis=-1)
        return p2

    j_chunk = max(128, min(cand_cap, mem_budget // max(1, 8 * b * c_cells)))
    jn = _chunk_count(cand_cap, j_chunk)
    j_blocks = jnp.arange(jn * j_chunk, dtype=jnp.int32).reshape(jn, j_chunk)

    def gen_chunk(jj: jax.Array):  # [jc] -> pid [B, jc], cell_slot [B, jc]
        owner = (jj[None, :, None] >= seg_start[:, None, :]) & (
            jj[None, :, None] < seg_end[:, None, :]
        )  # [B, jc, C], exactly one owner while jj < total
        cell_slot = jnp.sum(
            jnp.where(owner, cell_ids[None, None, :], 0), axis=-1
        )
        base = jnp.sum(jnp.where(owner, base_tab[:, None, :], 0), axis=-1)
        src = jnp.clip(base + jj[None, :], 0, dev.ivf.shape[0] - 1)
        pid = dev.ivf[src]
        ok = jj[None, :] < total[:, None]
        return jnp.where(ok, pid, sent_pid), jnp.where(ok, cell_slot, 0)

    pid, cell_slot = jax.lax.map(gen_chunk, j_blocks)  # [jn, B, jc] x2
    pid = pid.transpose(1, 0, 2).reshape(b, -1)[:, :cand_cap]
    cell_slot = cell_slot.transpose(1, 0, 2).reshape(b, -1)[:, :cand_cap]

    if subset is not None:
        s_cap = subset.shape[1]
        pos = jax.vmap(jnp.searchsorted)(subset, pid)
        pos = jnp.clip(pos, 0, s_cap - 1)
        member = jnp.take_along_axis(subset, pos, axis=1) == pid
        pid = jnp.where(member, pid, sent_pid)

    # ---- 4a. sort slots by pid (carrying the owning cell); runs of equal
    # pid are one candidate each. Sentinels sort to the back.
    pid_s, cell_s = _sort_pid_payload(pid, cell_slot, c_cells, sent_pid)
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool), pid_s[:, 1:] != pid_s[:, :-1]], axis=-1
    ) & (pid_s != sent_pid)

    if approx_mode in ("cells", "cells_full"):
        # ---- 4b. cell-level approximate scoring (PLAID stage-1): a
        # candidate's estimate is sum_q max over the probed cells it
        # occurs in of the query-token/cell score. Only the tiny [B, C, Q]
        # probe-score table is gathered — no per-token work. Every
        # candidate slot is scored and deduped (no 2*n_full_scores
        # truncation). Without a subset these modes take the chunked
        # window path above; this segmented realization remains for
        # subset-restricted searches, where membership filtering happens
        # at slot granularity.
        est = _slot_estimates(
            pid_s,
            cell_s,
            tbl.astype(jnp.bfloat16),
            mem_budget=mem_budget,
            use_kernel=use_estimate_kernel,
            interpret=interpret_kernels,
        )
        approx = jnp.where(is_start, est, NEG)
        cand_for_prune = pid_s
        # pool_divisor: caller's choice (subset-restricted searches share
        # the per-query-max estimator, so the same pool economics apply).
    else:
        # ---- 4b'. token-level approximate scoring (reference parity).
        cand = jnp.where(is_start, pid_s, sent_pid)
        cand = jnp.sort(cand, axis=-1)  # compact uniques to the front
        # bf16 score table: halves the gathered-row footprint, and the
        # estimate only feeds a top-k prune (far inside bf16 resolution).
        scores_kq = scores_qc.transpose(0, 2, 1).astype(jnp.bfloat16)
        # Chunk candidates AND doc positions. The gather's minor dim is Q,
        # tiled to 128 lanes (4x expansion at Q=32), and the [B, A, T, Q]
        # block must stay small enough for XLA to fuse the gather with the
        # running max in VMEM — the unchunked gather materializes the
        # lane-padded tensor in HBM (measured 16 GB at doc_cap 304,
        # cand_cap 27k, B 8: the round-5 BEIR-shape OOM/zero-results).
        q_lanes = ((q + 127) // 128) * 128
        t_blk = min(doc_cap, 64)
        a_chunk = max(
            8,
            min(cand_cap, mem_budget // max(1, b * t_blk * q_lanes * 2)),
        )
        n_chunks = _chunk_count(cand_cap, a_chunk)
        cand_p = _pad_to(cand, n_chunks * a_chunk, 1, sent_pid)
        cand_chunks = cand_p.reshape(b, n_chunks, a_chunk).transpose(1, 0, 2)

        kp_tab = scores_kq.shape[1]
        flat_tab = scores_kq.reshape(b * kp_tab, q)
        tab_off = (jnp.arange(b, dtype=jnp.int32) * kp_tab)[:, None, None]

        def approx_chunk(pids: jax.Array) -> jax.Array:  # [B, A] -> [B, A]
            def do(p: jax.Array) -> jax.Array:
                valid = _doc_mask(dev, p, doc_cap)
                tok_codes = dev.codes[p]  # [B, A, doc_cap]
                mx = jnp.full((*p.shape, q), MAXSIM_NEG, jnp.float32)
                for t0 in range(0, doc_cap, t_blk):  # static doc blocks
                    c_b = tok_codes[:, :, t0 : t0 + t_blk]
                    v_b = valid[:, :, t0 : t0 + t_blk]
                    # One flat row gather (batch folded into the row id):
                    # a 2-D row gather lowers efficiently where the
                    # per-batch vmap'd fancy-index does not.
                    g = flat_tab[c_b + tab_off]  # [B, A, t_blk, Q] bf16
                    g = jnp.where(
                        v_b[..., None], g.astype(jnp.float32), MAXSIM_NEG
                    )
                    mx = jnp.maximum(mx, jnp.max(g, axis=2))
                sc = jnp.sum(mx, axis=-1)  # empty rows -> Q * MAXSIM_NEG
                return jnp.where(p == sent_pid, NEG, sc)

            # Uniques are compacted to the front, so tail chunks are often
            # all-sentinel: skip their gathers entirely.
            return jax.lax.cond(
                jnp.any(pids != sent_pid),
                do,
                lambda p: jnp.full(p.shape, NEG, jnp.float32),
                pids,
            )

        approx = jax.lax.map(approx_chunk, cand_chunks)  # [nch, B, A]
        approx = approx.transpose(1, 0, 2).reshape(b, -1)[:, :cand_cap]
        cand_for_prune = cand
        pool_divisor = 4  # reference: n_full_scores // 4 (search.rs:614-619)

    # ---- 5. prune: top n_full_scores, then the exact-rerank pool.
    k1 = min(n_full_scores, approx.shape[1])
    s1, i1 = jax.lax.top_k(approx, k1)
    p1 = jnp.take_along_axis(cand_for_prune, i1, axis=1)
    # -inf filler entries are duplicates/padding, never real candidates.
    p1 = jnp.where(jnp.isneginf(s1), sent_pid, p1)
    r = min(max(n_full_scores // pool_divisor, 1), k1)
    p2 = p1[:, :r]  # top_k output is already sorted desc
    if with_stats:
        # Segmented path: the static cand_cap buffer is the only truncation
        # — genuine overflow (lowest-probe-score cells drop first).
        over = jnp.maximum(total - cand_cap, 0).astype(jnp.int32)
        return p2, jnp.stack([jnp.zeros_like(over), over], axis=-1)
    return p2


def _bucket_quota(r: int, ispec: IndexSpec, bi: int) -> int:
    """Static rerank-slot quota for length bucket ``bi``.

    Candidates are roughly corpus-distributed across length buckets; the
    quota allows 2x the expected share (by document count) plus a fixed
    floor, so quota overflow — which drops that candidate from the exact
    rerank and is counted in the search stats — needs a strong adverse
    length/relevance correlation to occur at all.
    """
    counts = ispec.bucket_counts
    share = counts[bi] / max(sum(counts), 1)
    q = int(r * share * 2.0) + 64
    return min(r, ((q + 7) // 8) * 8)


def _score_bucket_rows(
    dev: DeviceIndex,
    bucket,
    rows: jax.Array,  # [B, N] local row ids (zero row for invalid)
    lens: jax.Array,  # [B, N] valid token counts (<= cap_b)
    queries: jax.Array,
    *,
    nbits: int,
    cap_b: int,
    mem_budget: int,
) -> jax.Array:
    """Chunked decompress(+cache)/MaxSim over one bucket's rows -> [B, N]."""
    b, n = rows.shape
    q, d = queries.shape[1], queries.shape[2]
    per_row = b * cap_b * max(d * 4, q * 4)
    n_chunk = max(4, min(n, mem_budget // max(1, per_row)))
    nn = _chunk_count(n, n_chunk)
    zero_row = bucket.codes.shape[0] - 1

    def prep(x, fill):
        x = _pad_to(x, nn * n_chunk, 1, fill)
        return jnp.moveaxis(x.reshape(b, nn, n_chunk), 1, 0)

    chunks = (prep(rows, zero_row), prep(lens, 0))

    def one(args):
        rr, ll = args
        if bucket.emb is not None:
            emb = bucket.emb[rr]
        else:
            emb = codec.decompress(
                bucket.codes[rr],
                gather_res(bucket.residuals, rr, cap_b),
                dev.centroids,
                dev.bucket_weights,
                nbits,
                out_dtype=RERANK_DTYPE,
            )
        tok_valid = (
            jnp.arange(cap_b, dtype=jnp.int32) < ll[..., None]
        )  # [B, nc, cap_b]
        sc, _ = _exact_scores(emb, queries, tok_valid)
        return sc

    out = jax.lax.map(one, chunks)  # [nn, B, n_chunk]
    return out.transpose(1, 0, 2).reshape(b, -1)[:, :n]


def _rerank_bucketed(
    dev: DeviceIndex,
    queries: jax.Array,
    p2: jax.Array,  # [B, R] pids sorted by descending approx score
    *,
    ispec: IndexSpec,
    mem_budget: int,
) -> tuple[jax.Array, jax.Array]:
    """Stage 6 over the length-bucketed layout.

    Each bucket reranks its own candidates at the bucket cap: candidates
    are compacted to the front (approx-best first, since ``p2`` arrives
    approx-sorted) and truncated to a static per-bucket quota. Scores are
    scattered back to their p2 positions; quota-dropped slots stay -inf and
    are counted. Returns (exact [B, R] f32, quota_dropped [B] i32).
    """
    b, r = p2.shape
    sent = ispec.sentinel_pid
    pos = jnp.arange(r, dtype=jnp.int32)[None, :]
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    safe_pid = jnp.clip(p2, 0, dev.doc_bucket.shape[0] - 1)
    b_of = dev.doc_bucket[safe_pid]
    valid = p2 != sent
    exact = jnp.full((b, r), NEG)
    dropped = jnp.zeros((b,), jnp.int32)
    for bi, bucket in enumerate(dev.buckets):
        cap_b = ispec.bucket_caps[bi]
        quota = _bucket_quota(r, ispec, bi)
        in_b = (b_of == bi) & valid
        # Stable compaction: in-bucket slots keep their (approx-rank) order
        # and move to the front; the static quota then keeps the best.
        keyed = jnp.where(in_b, pos, r + pos)
        perm = jnp.argsort(keyed, axis=-1)[:, :quota]
        sel_ok = jnp.take_along_axis(in_b, perm, axis=1)
        pids_b = jnp.take_along_axis(safe_pid, perm, axis=1)
        zero_row = bucket.codes.shape[0] - 1
        rows = jnp.where(sel_ok, dev.doc_bucket_row[pids_b], zero_row)
        lens = jnp.where(sel_ok, dev.doc_lengths[pids_b], 0)
        sc = _score_bucket_rows(
            dev,
            bucket,
            rows,
            lens,
            queries,
            nbits=ispec.nbits,
            cap_b=cap_b,
            mem_budget=mem_budget,
        )
        sc = jnp.where(sel_ok, sc, NEG)
        # Positions belong to exactly one bucket; other buckets may touch
        # them only with -inf fillers, so a max-scatter composes safely.
        exact = exact.at[bidx, perm].max(sc)
        dropped += jnp.maximum(
            jnp.sum(in_b, axis=-1, dtype=jnp.int32) - quota, 0
        )
    return exact, dropped


def _decompress_rows_bucketed(
    dev: DeviceIndex,
    pids: jax.Array,  # [...,] pids (sentinel-safe)
    *,
    ispec: IndexSpec,
    out_dtype=None,
    use_cache: bool = True,
) -> jax.Array:
    """Gather+decompress token rows from the bucketed layout.

    Returns [..., doc_cap, D] embeddings (zeros beyond each bucket's cap
    and for out-of-bucket rows). Intended for small pid sets (winner token
    matrices, get_embeddings) — each bucket contributes one masked pass.
    """
    doc_cap = ispec.doc_cap
    safe_pid = jnp.clip(pids, 0, dev.doc_bucket.shape[0] - 1)
    b_of = dev.doc_bucket[safe_pid]
    out = None
    for bi, bucket in enumerate(dev.buckets):
        cap_b = ispec.bucket_caps[bi]
        zero_row = bucket.codes.shape[0] - 1
        in_b = b_of == bi
        rows = jnp.where(in_b, dev.doc_bucket_row[safe_pid], zero_row)
        if use_cache and bucket.emb is not None:
            emb = bucket.emb[rows]
            if out_dtype is not None:
                emb = emb.astype(out_dtype)
        else:
            emb = codec.decompress(
                bucket.codes[rows],
                gather_res(bucket.residuals, rows, cap_b),
                dev.centroids,
                dev.bucket_weights,
                ispec.nbits,
                out_dtype=out_dtype,
            )
        emb = jnp.where(in_b[..., None, None], emb, 0)
        emb = _pad_to(emb, doc_cap, emb.ndim - 2, 0)
        out = emb if out is None else out + emb
    return out


def rerank_rows(
    codes_rows: jax.Array,  # [B, R, doc_cap] int32
    res_rows: jax.Array,  # [B, R, doc_cap, PD] uint8
    tok_valid: jax.Array,  # [B, R, doc_cap] bool
    pids: jax.Array,  # [B, R] int32 (sentinel padding)
    centroids: jax.Array,
    bucket_weights: jax.Array,
    queries: jax.Array,  # [B, Q, D]
    *,
    nbits: int,
    sentinel_pid: int,
    mem_budget: int = 256 * 1024 * 1024,
) -> jax.Array:
    """Stage 6: decompress + exact MaxSim over pre-gathered token rows."""
    queries = queries.astype(jnp.float32)
    b, r, doc_cap = codes_rows.shape
    q, d = queries.shape[1], queries.shape[2]
    per_row = b * doc_cap * max(d * 4, q * 4)
    r_chunk = max(4, min(r, mem_budget // max(1, per_row)))
    rn = _chunk_count(r, r_chunk)
    rp = rn * r_chunk

    def prep(x, fill):
        x = _pad_to(x, rp, 1, fill)
        return jnp.moveaxis(
            x.reshape(b, rn, r_chunk, *x.shape[2:]), 1, 0
        )  # [rn, B, r_chunk, ...]

    chunks = (
        prep(codes_rows, 0),
        prep(res_rows, 0),
        prep(tok_valid, False),
        prep(pids, sentinel_pid),
    )

    def exact_chunk(args) -> jax.Array:
        c, res, valid, p = args
        emb = codec.decompress(
            c, res, centroids, bucket_weights, nbits, out_dtype=RERANK_DTYPE
        )
        sc, _ = _exact_scores(emb, queries, valid)
        return jnp.where(p == sentinel_pid, NEG, sc)

    exact = jax.lax.map(exact_chunk, chunks)  # [rn, B, r_chunk]
    return exact.transpose(1, 0, 2).reshape(b, -1)[:, :r]


def token_matrices(
    codes_rows: jax.Array,  # [B, K, doc_cap]
    res_rows: jax.Array,  # [B, K, doc_cap, PD]
    tok_valid: jax.Array,  # [B, K, doc_cap]
    centroids: jax.Array,
    bucket_weights: jax.Array,
    queries: jax.Array,
    *,
    nbits: int,
) -> jax.Array:
    """[B, K, doc_cap, Q] token-score matrices for winner documents."""
    queries = queries.astype(jnp.float32)
    emb = codec.decompress(
        codes_rows, res_rows, centroids, bucket_weights, nbits,
        out_dtype=RERANK_DTYPE,
    )
    _, tok = _exact_scores(emb, queries, tok_valid)
    return jnp.where(tok_valid[..., None], tok, 0.0)


def _final_topk(exact, p2, top_k):
    r = p2.shape[1]
    kk = min(top_k, r)
    fs, fi = jax.lax.top_k(exact, kk)
    fp = jnp.take_along_axis(p2, fi, axis=1)
    fp = jnp.where(jnp.isneginf(fs), -1, fp)
    fp = _pad_to(fp, top_k, 1, -1)
    fs = _pad_to(fs, top_k, 1, NEG)
    return fp, fs


def search_impl(
    dev: DeviceIndex,
    queries: jax.Array,
    subset: jax.Array | None,
    *,
    ispec: IndexSpec,
    top_k: int,
    n_ivf_probe: int,
    n_full_scores: int,
    want_tokens: bool,
    mem_budget: int = 256 * 1024 * 1024,
    cand_cap: int | None = None,
    approx_mode: str = "cells",
    with_stats: bool = False,
    use_rerank_kernel: bool = False,
    slot_budget: int | None = None,
    use_estimate_kernel: bool = False,
    pool_divisor: int = 2,
    rank_admit: int = 0,
):
    """Batched PLAID cascade (traceable body — also used inside shard_map).

    Returns (pids [B, top_k] int32 with -1 padding, scores [B, top_k] f32
    with -inf padding) and, when ``want_tokens``, additionally
    (token_scores [B, top_k, doc_cap, Q] f32, doc_lens [B, top_k] int32).
    With ``with_stats`` a final [B, 2] int32 stats array is appended:
    [:, 0] = budget-pruned slots (intended), [:, 1] = static-buffer
    overflow slots (see candidates_impl).
    Requires a fully device-resident index (dev.residuals is not None).
    """
    queries = queries.astype(jnp.float32)  # f16 wire staging -> f32 math
    doc_cap = ispec.doc_cap
    sent_pid = ispec.sentinel_pid
    r_pool = max(n_full_scores // pool_divisor, 1)
    if subset is not None and subset.shape[1] <= 2 * r_pool:
        # Direct-subset pool: when the subset fits within ~2x the normal
        # exact-rerank pool, skip the IVF cascade entirely and exact-rerank
        # EVERY subset document. Strictly better recall than the
        # reference's probe-restrict + intersect realization
        # (search.rs:494-517, 544-547) — the result equals brute-force
        # MaxSim restricted to the subset — and cheaper: the whole
        # candidate stage (probe, window gather, sort, estimate) is
        # skipped for a rerank at most 2x the unfiltered pool. Larger
        # subsets take the density-scaled cascade in candidates_impl.
        sub_s = jnp.sort(subset.astype(jnp.int32), axis=-1)
        sub_s = _dedup_sorted(sub_s, sent_pid)
        p2 = jnp.where((sub_s < 0) | (sub_s >= ispec.n_docs), sent_pid, sub_s)
        stats = (
            jnp.zeros((queries.shape[0], 2), jnp.int32) if with_stats else None
        )
    else:
        cand_out = candidates_impl(
            dev,
            queries,
            subset,
            ispec=ispec,
            n_ivf_probe=n_ivf_probe,
            n_full_scores=n_full_scores,
            mem_budget=mem_budget,
            cand_cap=cand_cap,
            approx_mode=approx_mode,
            with_stats=with_stats,
            slot_budget=slot_budget,
            use_estimate_kernel=use_estimate_kernel,
            pool_divisor=pool_divisor,
            rank_admit=rank_admit,
        )
        p2, stats = cand_out if with_stats else (cand_out, None)

    b, q, d = queries.shape
    r = p2.shape[1]

    # 4-bit prefilter tier (ops/q4cache.py): when the q4 cache is resident
    # and the bf16 cache is not, score the whole rerank pool from the q4
    # copy (DMA + shift/mask dequant — no codec select-sum) and hand the
    # exact codec rescore only the top slice. Returned scores stay
    # codec-exact; the prefilter only narrows the pool, and its ~1e-2
    # score error is far inside the 4x-top_k selection margin. Exhaustive
    # parameters are a brute-force-identity contract, so no approximate
    # narrowing applies there.
    exhaustive = n_ivf_probe >= ispec.n_partitions or (
        n_full_scores >= 2 * ispec.n_docs
    )
    # Note: prefiltering through q4 when the bf16 cache is ALSO resident
    # was measured a net loss (engine 3233 vs 3590 QPS at the bench shape)
    # — the fused rerank kernels are row-DMA-descriptor-bound, so the q4
    # pass at the full pool costs as much as the bf16 pass it replaces.
    # The tier applies only when it's the best exact-capable store around.
    q4_pool = rescue_pool(top_k)
    if (
        dev.emb_q4 is not None
        and dev.emb_cache is None
        and not dev.buckets
        and not exhaustive
        and q4_pool < r
    ):
        if use_rerank_kernel:
            from fast_plaid_tpu.ops.rerank_kernel import (
                maxsim_q4_gather_scores,
            )

            safe = jnp.clip(p2, 0, dev.doc_lengths.shape[0] - 1)
            pre = maxsim_q4_gather_scores(
                dev.emb_q4,
                dev.q4_scale,
                p2,
                dev.doc_lengths[safe],
                queries,
            )
        else:
            from fast_plaid_tpu.ops.q4cache import score_q4

            pre = score_q4(
                dev.emb_q4,
                dev.q4_scale,
                dev.doc_lengths,
                p2,
                queries,
                mem_budget=mem_budget,
            )
        s_m, i_m = jax.lax.top_k(pre, q4_pool)
        p2 = jnp.where(
            jnp.isneginf(s_m),
            sent_pid,
            jnp.take_along_axis(p2, i_m, axis=1),
        )
        r = q4_pool

    if dev.buckets:
        # Length-bucketed stage 6: per-bucket passes at the bucket cap.
        exact, qdrop = _rerank_bucketed(
            dev, queries, p2, ispec=ispec, mem_budget=mem_budget
        )
        if with_stats:
            # Bucket-quota drops are static-buffer truncation -> overflow.
            stats = stats.at[:, 1].add(qdrop)
    elif use_rerank_kernel and dev.emb_cache is not None:
        # Pallas fused gather+MaxSim (TPU only): candidate rows stream
        # HBM->VMEM once and only [B, R] scores come back — no decompressed
        # [B, R, doc_cap, D] tile ever lands in HBM (ops/rerank_kernel.py).
        # When the tile's pools overlap (small corpus against B*R), the
        # dedup variant DMAs each *unique* row once instead
        # (ops/rerank_dedup.py) — the kernels are descriptor-issue-bound,
        # so descriptor count is the cost.
        from fast_plaid_tpu.ops.rerank_dedup import (
            dedup_viable,
            maxsim_gather_scores_dedup,
        )
        from fast_plaid_tpu.ops.rerank_kernel import maxsim_gather_scores

        if dedup_viable(dev.emb_cache.shape[0], b, r, q, d):
            exact = maxsim_gather_scores_dedup(
                dev.emb_cache, p2, dev.doc_lengths[p2], queries
            )
        else:
            exact = maxsim_gather_scores(
                dev.emb_cache, p2, dev.doc_lengths[p2], queries
            )
    else:
        # Chunk over the rerank set with gathers INSIDE each chunk so the
        # [B, R, doc_cap, ...] token tensors never materialize in full.
        per_row = b * doc_cap * max(d * 4, q * 4)
        r_chunk = max(4, min(r, mem_budget // max(1, per_row)))
        rn = _chunk_count(r, r_chunk)
        p2_p = _pad_to(p2, rn * r_chunk, 1, sent_pid)
        p2_chunks = p2_p.reshape(b, rn, r_chunk).transpose(1, 0, 2)

        def exact_chunk(pids: jax.Array) -> jax.Array:
            valid = _doc_mask(dev, pids, doc_cap)
            if dev.emb_cache is not None:
                # Pre-decompressed corpus: rerank is gather + MXU only (the
                # dequant select-sum otherwise dominates, done B*R times over).
                emb = dev.emb_cache[pids]
            else:
                emb = codec.decompress(
                    dev.codes[pids],
                    gather_res(dev.residuals, pids, doc_cap),
                    dev.centroids,
                    dev.bucket_weights,
                    ispec.nbits,
                    out_dtype=RERANK_DTYPE,
                )  # [B, Rc, doc_cap, D] bf16
            sc, _ = _exact_scores(emb, queries, valid)
            return jnp.where(pids == sent_pid, NEG, sc)

        exact = jax.lax.map(exact_chunk, p2_chunks)  # [rn, B, Rc]
        exact = exact.transpose(1, 0, 2).reshape(b, -1)[:, :r]
    fp, fs = _final_topk(exact, p2, top_k)

    if not want_tokens:
        return (fp, fs, stats) if with_stats else (fp, fs)

    # Token-score matrices for the winners only (recomputed — far cheaper
    # than materializing [B, R, doc_cap, Q] for every rerank candidate).
    safe = jnp.where(fp < 0, sent_pid, fp)
    valid = _doc_mask(dev, safe, doc_cap)
    if dev.buckets:
        emb = _decompress_rows_bucketed(
            dev, safe, ispec=ispec, out_dtype=RERANK_DTYPE
        )
        _, tok = _exact_scores(emb, queries, valid)
        tok = jnp.where(valid[..., None], tok, 0.0)
    elif dev.emb_cache is not None:
        _, tok = _exact_scores(dev.emb_cache[safe], queries, valid)
        tok = jnp.where(valid[..., None], tok, 0.0)
    else:
        tok = token_matrices(
            dev.codes[safe],
            gather_res(dev.residuals, safe, doc_cap),
            valid,
            dev.centroids,
            dev.bucket_weights,
            queries,
            nbits=ispec.nbits,
        )
    doc_lens = jnp.where(fp < 0, 0, dev.doc_lengths[safe])
    if with_stats:
        return fp, fs, tok, doc_lens, stats
    return fp, fs, tok, doc_lens


search_core = jax.jit(
    search_impl,
    static_argnames=(
        "ispec",
        "top_k",
        "n_ivf_probe",
        "n_full_scores",
        "want_tokens",
        "mem_budget",
        "cand_cap",
        "approx_mode",
        "with_stats",
        "use_rerank_kernel",
        "slot_budget",
        "use_estimate_kernel",
        "pool_divisor",
        "rank_admit",
    ),
)

@functools.partial(
    jax.jit,
    static_argnames=("sentinel_pid", "pool", "mem_budget", "use_kernel"),
)
def q4_prefilter_core(
    dev: DeviceIndex,
    p2: jax.Array,  # [B, R] rerank pool (sentinel_pid padding)
    queries: jax.Array,  # [B, Q, D]
    *,
    sentinel_pid: int,
    pool: int,
    mem_budget: int = 256 * 1024 * 1024,
    use_kernel: bool = False,
) -> jax.Array:
    """Narrow the rerank pool via the q4 cache: [B, R] -> [B, pool] pids.

    The low_memory phase-2 step: scores all R candidates from the
    device-resident q4 cache and keeps the top ``pool`` for the host
    residual-row stream + codec-exact rescore — the stream shrinks by
    R / pool (~30x at defaults).
    """
    queries = queries.astype(jnp.float32)
    if use_kernel:
        from fast_plaid_tpu.ops.rerank_kernel import maxsim_q4_gather_scores

        safe = jnp.clip(p2, 0, dev.doc_lengths.shape[0] - 1)
        pre = maxsim_q4_gather_scores(
            dev.emb_q4, dev.q4_scale, p2, dev.doc_lengths[safe], queries
        )
    else:
        from fast_plaid_tpu.ops.q4cache import score_q4

        pre = score_q4(
            dev.emb_q4,
            dev.q4_scale,
            dev.doc_lengths,
            p2,
            queries,
            mem_budget=mem_budget,
        )
    s_m, i_m = jax.lax.top_k(pre, min(pool, p2.shape[1]))
    return jnp.where(
        jnp.isneginf(s_m),
        sentinel_pid,
        jnp.take_along_axis(p2, i_m, axis=1),
    )


candidates_core = jax.jit(
    candidates_impl,
    static_argnames=(
        "ispec",
        "n_ivf_probe",
        "n_full_scores",
        "mem_budget",
        "cand_cap",
        "approx_mode",
        "with_stats",
        "slot_budget",
        "use_estimate_kernel",
        "interpret_kernels",
        "pool_divisor",
        "rank_admit",
    ),
)

rerank_rows_core = jax.jit(
    rerank_rows,
    static_argnames=("nbits", "sentinel_pid", "mem_budget"),
)

token_matrices_core = jax.jit(token_matrices, static_argnames=("nbits",))

final_topk_core = jax.jit(_final_topk, static_argnames=("top_k",))


def suggest_query_tile(
    ispec: IndexSpec,
    q_cap: int,
    cand_cap: int,
    hbm_budget: int = 8 * 1024 * 1024 * 1024,
    max_tile: int = 256,
    slot_budget: int | None = None,
) -> int:
    """Queries per device tile such that the cascade's per-query working
    set (query-centroid scores + candidate buffers + slot scores with the
    doubling double-buffer) fits the HBM budget."""
    kp = ((max(ispec.n_partitions, 1) + 127) // 128) * 128
    per_query = q_cap * kp * 8  # scores_qc f32 (+ fusion headroom)
    # slot_score f32 + cell_slot i32 (x2 for chunk transposes) + misc int
    # buffers.
    per_query += cand_cap * 32
    if slot_budget is not None:
        # Budgeted chunked-window path: the [B, width, Q] bf16 per-query-
        # token slot scores (x3 for the suffix-max doubling temporaries),
        # width ~ 2*budget + cell_cap (engine.candidates_impl chunking).
        width = 2 * min(cand_cap, slot_budget) + ispec.cell_cap + 256
        per_query += width * (q_cap * 2 * 3 + 12)
    return int(max(1, min(max_tile, hbm_budget // max(per_query, 1))))


def candidate_capacity(
    ivf_lengths: "np.ndarray", n_cells: int, n_full_scores: int
) -> int:
    """Static candidate-buffer size for the compacted segmented gather.

    Worst case is the sum of the ``n_cells`` largest IVF lists; typical need
    is ~2x the expected sum. Overflow beyond the returned cap truncates
    whole tail cells (rare with the 2x margin).
    """
    import numpy as np

    lens = np.sort(np.asarray(ivf_lengths, np.int64))[::-1]
    if lens.size == 0:
        return 128
    worst = int(lens[: min(n_cells, lens.size)].sum())
    typical = int(2.0 * n_cells * float(lens.mean()))
    cap = min(worst, max(typical, 4 * n_full_scores, 1024))
    return max(128, ((cap + 127) // 128) * 128)


def suggest_slot_budget(
    ivf_lengths: "np.ndarray", n_full_scores: int, n_hubs: int = 16
) -> int:
    """Hub-aware candidate slot budget for the budgeted cells path.

    The base budget is ~n_full_scores slots of whole cells in descending
    total-score order. Real ColBERT corpora have a few giant "hub" cells
    (stopword/punctuation tokens recur near-verbatim in most documents)
    that rank top for every query and would eat the whole base budget by
    themselves, truncating the content cells that actually discriminate
    (measured on the ColBERT-proxy corpus: recall@100 0.89 at the base
    budget vs 0.98+ with the extension). Extend the budget by the EXCESS
    mass of the ``n_hubs`` largest cells over the uniform expectation
    (n_hubs * median), capped at 4x the base — a uniform corpus has no
    excess and keeps the fast-path throughput; a Zipf-skewed one gets its
    giants absorbed. The chunked window layout makes the extension cheap:
    slots are materialized at chunk (not max-cell) granularity, so budget
    growth is linear, not multiplied by the largest cell.
    """
    import numpy as np

    lens = np.sort(np.asarray(ivf_lengths, np.int64))[::-1]
    k2 = ((n_full_scores + 127) // 128) * 128
    if lens.size == 0:
        return k2
    h = min(n_hubs, lens.size)
    excess = int(lens[:h].sum()) - h * int(np.median(lens))
    return k2 + int(min(max(excess, 0), 4 * k2))


def resolve_approx_mode(
    approx_mode: str,
    ivf_lengths_host: "np.ndarray | None",
    *,
    q_cap: int,
    n_ivf_probe: int,
    n_full_scores: int,
    n_partitions: int,
    cand_cap: int | None,
    rank_admit: int | None = None,
    slot_budget: int | None = None,
    n_docs: int | None = None,
) -> tuple[str, int, int | None]:
    """Resolve "auto" to a concrete (approx_mode, rank_admit, slot_budget).

    The single source of the estimator-selection policy — the single-chip
    driver (search/searcher.py) and every sharded entry point
    (parallel/sharded.py, parallel/mesh2d.py, parallel/lm_sharded.py) call
    this with their own IVF statistics so a corpus resolves identically
    however it is distributed.

    Policy: below a 6x candidates-per-budget ratio the plain budgeted
    "cells" estimator is recall-equivalent to the untruncated one
    (measured planted hit@1 = 1.0 on adversarial uniform-random corpora
    at 5.5x; the first observed miss sits at 7.3x, and the boundary is
    noisy — 8.0x/9.1x configs pass — so 6x is the conservative floor of
    the miss region; SCALE.md round-4 crossover sweep). Past it, stay
    on the budgeted layout and
    enable rank-1 admission with the budget raised to hold the tier
    whole: every query token's top probed cell is admitted whole, which
    is exactly what an exact-match or near-duplicate document needs for
    its full per-query-max estimate. Rank-1 measured recall-perfect
    through ~15x saturation (57k at 14.7x and 523k at 15x: planted
    hit@1 = 1.0) and 1.2-1.4x faster than rank-2 (523k: 2,047 vs 1,671
    QPS), so that regime stays at rank 1. Past 32x saturation the ideal
    top-k's near-ties increasingly sit in query tokens' SECOND-rank
    cells (clustered-corpus score mass at ~50-100x: 0.966 rank-1 vs
    0.97+ rank-2 — the midscale gate regime), so auto escalates to
    rank 2 there when its budget is affordable. Fall over to
    "cells_full" only when even the tier's budget approaches the full
    candidate width (very coarse partitioning). Explicit modes pass
    through, only normalizing rank_admit/slot_budget.
    """
    import numpy as np

    if approx_mode == "auto":
        approx_mode = "cells"
        if ivf_lengths_host is not None:
            lens_h = np.asarray(ivf_lengths_host, np.float64)
            n_cells = min(q_cap * n_ivf_probe, max(n_partitions, 1))
            # Empty-IVF guard (mirrors suggest_safe_budget): a zero-cell
            # index would otherwise emit a mean-of-empty-slice warning and
            # resolve through expected = nan.
            mean_len = float(lens_h.mean()) if lens_h.size else 0.0
            expected = mean_len * n_cells
            # Tie-degeneracy guard (adversarial-sweep finding, round 5):
            # with very few partitions (probing keeps most cells for every
            # token) AND p90 cells at pool scale, cell-granular estimates
            # TIE across whole cells and the pool truncates arbitrarily
            # among the ties — no budget fixes that (measured: planted
            # hit@1 0.5-0.875 at k<=16 however the budget is sized). When
            # the token-pool (n_full/4) can cover ~a quarter of the
            # corpus, the reference-parity token-level estimator resolves
            # the ties (measured hit@1 1.0 at every k<=16 shape);
            # otherwise cells_full is the best measured option and the
            # configuration is degenerate by construction (cells hold
            # more docs than the caller's n_full_scores — the reference's
            # own estimator loses the same planted probes there).
            p90_len = float(np.quantile(lens_h, 0.9)) if lens_h.size else 0.0
            if (
                max(n_partitions, 1) <= 4 * n_ivf_probe
                and p90_len >= max(n_full_scores // 2, 1)
            ):
                if n_docs is not None and n_full_scores // 4 >= max(
                    n_docs // 4, 1
                ):
                    return "tokens", 0, slot_budget
                return "cells_full", 0, slot_budget
            if expected > 6.0 * n_full_scores:
                r_adm = 1
                if expected > 32.0 * n_full_scores:
                    affordable = max(32768, 8 * n_full_scores)
                    if (
                        suggest_safe_budget(
                            ivf_lengths_host, n_full_scores, q_cap, 2
                        )
                        <= affordable
                    ):
                        r_adm = 2
                safe = suggest_safe_budget(
                    ivf_lengths_host, n_full_scores, q_cap, r_adm
                )
                if cand_cap is not None and safe >= cand_cap:
                    # The tier's budget covers the whole candidate width:
                    # the untruncated estimator is the same work without
                    # the admission machinery.
                    approx_mode = "cells_full"
                elif rank_admit is None:
                    rank_admit = r_adm
    rank_admit = 0 if rank_admit is None else max(0, int(rank_admit))
    if rank_admit > 0 and ivf_lengths_host is not None:
        # Whether auto-chosen or forced, the admission tier needs a budget
        # sized to hold it whole (explicit larger budgets are kept).
        slot_budget = max(
            slot_budget or 0,
            suggest_safe_budget(
                ivf_lengths_host, n_full_scores, q_cap, rank_admit
            ),
        )
    return approx_mode, rank_admit, slot_budget


def suggest_safe_budget(
    ivf_lengths: "np.ndarray",
    n_full_scores: int,
    q_cap: int,
    rank_admit: int = 1,
) -> int:
    """Slot budget sized so the rank-based admission tier fits whole.

    The tier admits every query token's top-``rank_admit`` probed cells
    (up to q_cap * rank_admit cells); the p90 cell-length quantile covers
    the size bias of probed cells (probe mass concentrates on larger
    cells), on top of the hub-aware base budget. When a corpus's tail
    defeats the quantile the ordered truncation still drops the weakest
    admission rank first — safety degrades gradually, never arbitrarily.
    """
    import numpy as np

    base = suggest_slot_budget(ivf_lengths, n_full_scores)
    lens = np.asarray(ivf_lengths, np.int64)
    if lens.size == 0:
        return base
    p90 = float(np.quantile(lens, 0.90))
    need = int(q_cap * max(rank_admit, 0) * max(p90, 1.0))
    return base + ((need + 127) // 128) * 128


@functools.partial(jax.jit, static_argnames=("nbits",))
def reconstruct_rows_core(
    codes_rows: jax.Array,
    res_rows: jax.Array,
    tok_valid: jax.Array,
    centroids: jax.Array,
    bucket_weights: jax.Array,
    *,
    nbits: int,
) -> jax.Array:
    """Decompress pre-gathered token rows (low_memory reconstruction)."""
    emb = codec.decompress(codes_rows, res_rows, centroids, bucket_weights, nbits)
    return jnp.where(tok_valid[..., None], emb, 0.0)


@functools.partial(jax.jit, static_argnames=("ispec",))
def reconstruct_core(
    dev: DeviceIndex, pids: jax.Array, *, ispec: IndexSpec
) -> tuple[jax.Array, jax.Array]:
    """Decompress documents: [S] pids -> ([S, doc_cap, D] f32, [S] lengths).

    Replaces reconstruct_embeddings (reference: rust/utils/embeddings.rs:21-64,
    rayon per-doc loop) with one batched gather+decompress.
    """
    valid = _doc_mask(dev, pids, ispec.doc_cap)
    if dev.buckets:
        # Reconstruct from the exact codec path (not the bf16 emb cache):
        # get_embeddings promises full-precision decompression.
        emb = _decompress_rows_bucketed(
            dev, pids, ispec=ispec, use_cache=False
        )
    else:
        emb = codec.decompress(
            dev.codes[pids],
            gather_res(dev.residuals, pids, ispec.doc_cap),
            dev.centroids,
            dev.bucket_weights,
            ispec.nbits,
        )
    emb = jnp.where(valid[..., None], emb, 0.0)
    return emb, dev.doc_lengths[pids]
