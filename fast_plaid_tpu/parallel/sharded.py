"""Mesh-sharded search: document sharding with ICI top-k merge.

The design SURVEY.md §5.8 calls for (new capability vs the reference):
documents — codes, residuals, doc lengths and per-shard IVF — are
partitioned across the mesh; centroids and codec tables are replicated.
Each chip runs the full cascade (search/engine.py:search_impl) over its
local shard, maps local pids to global ids with its shard base, and the
final merge is one `all_gather` of per-chip [B, top_k] scores+ids over ICI
followed by a local top-k — a few KB per query, never the candidate sets.

Also provides query sharding (index replicated, batch split by the
compiler), the SPMD upgrade of the reference's host-side multi-GPU
dispatch (fast_plaid.py:894-928).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from fast_plaid_tpu.index import ivf as ivf_mod
from fast_plaid_tpu.index.layout import (
    DeviceIndex,
    IndexSpec,
    aligned_ivf_len,
    round_up,
    to_device,
)
from fast_plaid_tpu.search.engine import search_impl

__all__ = [
    "ShardedIndex",
    "build_sharded_index",
    "sharded_search",
    "query_sharded_search",
    "pad_global_subsets",
    "SUBSET_SENTINEL",
]


@dataclass
class ShardedIndex:
    """Document-sharded index: every DeviceIndex leaf has a leading shard axis."""

    dev: DeviceIndex  # leaves [n_shards, ...] sharded over mesh axis
    ispec: IndexSpec  # identical static spec for every shard
    doc_base: jax.Array  # [n_shards] int32 global id base per shard
    mesh: Mesh
    n_docs_total: int
    ivf_lengths_host: np.ndarray | None = None  # concat of shard IVF lengths


def build_sharded_index(
    *,
    centroids: np.ndarray,
    bucket_weights: np.ndarray,
    codes: np.ndarray,
    residuals: np.ndarray,
    doc_lengths: np.ndarray,
    nbits: int,
    mesh: Mesh,
) -> ShardedIndex:
    """Split documents contiguously across the mesh and build per-shard IVFs.

    All shards are padded to identical static shapes (max over shards) so a
    single SPMD program serves every chip.
    """
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    n_docs = int(len(doc_lengths))
    per = -(-n_docs // n_shards)
    doc_lengths = np.asarray(doc_lengths, np.int64)
    token_starts = np.concatenate([[0], np.cumsum(doc_lengths)])

    shards = []
    bases = []
    k = centroids.shape[0]
    for si in range(n_shards):
        # Clamp both ends: with n_docs < n_shards*per the tail shards are
        # empty and si*per can exceed n_docs.
        d0, d1 = min(si * per, n_docs), min((si + 1) * per, n_docs)
        t0, t1 = int(token_starts[d0]), int(token_starts[d1])
        lens = doc_lengths[d0:d1]
        ivf, ivf_lengths = ivf_mod.build_ivf(codes[t0:t1], lens, k)
        shards.append(
            {
                "codes": codes[t0:t1],
                "residuals": residuals[t0:t1],
                "doc_lengths": lens,
                "ivf": ivf,
                "ivf_lengths": ivf_lengths,
            }
        )
        bases.append(d0)

    doc_cap = round_up(max(int(doc_lengths.max()) if n_docs else 1, 1), 16)
    cell_cap = round_up(
        max(
            max((int(s["ivf_lengths"].max()) if k else 1) for s in shards),
            1,
        ),
        8,
    )
    pad_docs = per
    # Uniform shapes in the 128-aligned device IVF layout.
    pad_ivf = max(aligned_ivf_len(s["ivf_lengths"]) for s in shards)

    devs, ispec = [], None
    for s in shards:
        dev, ispec = to_device(
            centroids=centroids,
            bucket_weights=bucket_weights,
            codes=s["codes"],
            residuals=s["residuals"],
            doc_lengths=s["doc_lengths"],
            ivf=s["ivf"],
            ivf_lengths=s["ivf_lengths"],
            nbits=nbits,
            device=None,
            doc_cap=doc_cap,
            cell_cap=cell_cap,
            pad_docs_to=pad_docs,
            pad_ivf_to=pad_ivf,
        )
        devs.append(dev)

    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *devs)
    sharding = NamedSharding(mesh, P(axis))
    dev = jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
    doc_base = jax.device_put(np.asarray(bases, np.int32), sharding)
    return ShardedIndex(
        dev=dev,
        ispec=ispec,
        doc_base=doc_base,
        mesh=mesh,
        n_docs_total=n_docs,
        ivf_lengths_host=np.max(
            np.stack([s["ivf_lengths"] for s in shards]), axis=0
        ),
    )


def _rebase_subset(
    subset: jax.Array, base: jax.Array, ispec: IndexSpec
) -> jax.Array:
    """Globally-addressed subset rows -> this shard's local pid space.

    ``subset`` is [B, S] int32 sorted ascending with out-of-corpus
    sentinel padding (any value outside every shard's range works). Ids
    outside [base, base + shard_docs) map to the shard sentinel and the
    row is re-sorted — the per-shard form search_impl expects (sorted
    asc, sentinel_pid padding). The reference threads subsets through its
    multi-GPU dispatch the same way, minus the rebasing (its replicas
    hold the whole corpus; reference fast_plaid.py:797-928).
    """
    loc = subset - base
    ok = (loc >= 0) & (loc < ispec.n_docs)
    return jnp.sort(
        jnp.where(ok, loc, ispec.sentinel_pid).astype(jnp.int32), axis=-1
    )


def _merge_topk(gpids, scores, top_k, axis):
    """ICI merge: gather tiny [B, top_k] per-chip results, re-top-k.

    Returns (merged pids, merged scores, mi, n_shards) where ``mi``
    indexes the [B, n*k] gathered layout (used to select the winning
    shard's token matrices without gathering candidate sets).
    """
    all_p = jax.lax.all_gather(gpids, axis)  # [n, B, k]
    all_s = jax.lax.all_gather(scores, axis)
    n, b, k = all_p.shape
    all_p = all_p.transpose(1, 0, 2).reshape(b, -1)
    all_s = all_s.transpose(1, 0, 2).reshape(b, -1)
    ms, mi = jax.lax.top_k(all_s, top_k)
    mp = jnp.take_along_axis(all_p, mi, axis=1)
    mp = jnp.where(jnp.isneginf(ms), -1, mp)
    return mp, ms, mi


def _merge_tokens(tok, doc_lens, mi, axis):
    """Select the merged winners' token matrices across shards.

    all_gathers the per-shard [B, k, doc_cap, Q] winner matrices (top_k
    rows per chip — never candidate sets) and picks the rows the merged
    top-k chose. ICI payload is n_shards * B * k * doc_cap * Q * 4 bytes;
    keep query tiles small when requesting token scores on a mesh.
    """
    all_t = jax.lax.all_gather(tok, axis)  # [n, B, k, cap, Q]
    all_l = jax.lax.all_gather(doc_lens, axis)  # [n, B, k]
    n, b, k = all_l.shape
    all_t = all_t.transpose(1, 0, 2, 3, 4).reshape(b, n * k, *all_t.shape[3:])
    all_l = all_l.transpose(1, 0, 2).reshape(b, n * k)
    mt = jnp.take_along_axis(all_t, mi[..., None, None], axis=1)
    ml = jnp.take_along_axis(all_l, mi, axis=1)
    return mt, ml


@partial(
    jax.jit,
    static_argnames=(
        "ispec",
        "top_k",
        "n_ivf_probe",
        "n_full_scores",
        "mem_budget",
        "mesh",
        "cand_cap",
        "approx_mode",
        "slot_budget",
        "rank_admit",
        "pool_divisor",
        "use_estimate_kernel",
        "use_rerank_kernel",
        "want_tokens",
        "with_stats",
    ),
)
def _sharded_search_jit(
    dev: DeviceIndex,
    doc_base: jax.Array,
    queries: jax.Array,
    subset: jax.Array | None = None,  # [B, S] GLOBAL ids, sorted asc
    *,
    ispec: IndexSpec,
    top_k: int,
    n_ivf_probe: int,
    n_full_scores: int,
    mem_budget: int,
    mesh: Mesh,
    cand_cap: int | None,
    approx_mode: str = "cells",
    slot_budget: int | None = None,
    rank_admit: int = 0,
    pool_divisor: int = 2,
    use_estimate_kernel: bool = False,
    use_rerank_kernel: bool = False,
    want_tokens: bool = False,
    with_stats: bool = False,
):
    axis = mesh.axis_names[0]

    def local(dev_blk: DeviceIndex, base_blk: jax.Array, q: jax.Array, sub):
        dev_local = jax.tree.map(lambda x: x[0], dev_blk)
        sub_local = (
            None if sub is None else _rebase_subset(sub, base_blk[0], ispec)
        )
        out = search_impl(
            dev_local,
            q,
            sub_local,
            ispec=ispec,
            top_k=top_k,
            n_ivf_probe=n_ivf_probe,
            n_full_scores=n_full_scores,
            want_tokens=want_tokens,
            with_stats=with_stats,
            mem_budget=mem_budget,
            cand_cap=cand_cap,
            approx_mode=approx_mode,
            slot_budget=slot_budget,
            rank_admit=rank_admit,
            pool_divisor=pool_divisor,
            use_estimate_kernel=use_estimate_kernel,
            use_rerank_kernel=use_rerank_kernel,
        )
        out = list(out)
        stats = out.pop() if with_stats else None
        pids, scores = out[0], out[1]
        gpids = jnp.where(pids >= 0, pids + base_blk[0], -1)
        mp, ms, mi = _merge_topk(gpids, scores, top_k, axis)
        res = [mp, ms]
        if want_tokens:
            mt, ml = _merge_tokens(out[2], out[3], mi, axis)
            res += [mt, ml]
        if with_stats:
            # Global accounting: overflow on ANY shard can cost recall.
            res.append(jax.lax.psum(stats, axis))
        return tuple(res)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), dev),
            P(axis),
            P(),
            None if subset is None else P(),
        ),
        out_specs=(P(),) * (2 + 2 * want_tokens + with_stats),
        check_vma=False,
    )(dev, doc_base, queries, subset)


def _resolve_shard_params(
    ivf_lengths_host,
    ispec,
    q_cap: int,
    n_ivf_probe: int,
    n_full_scores: int,
    approx_mode: str,
    rank_admit: int | None,
):
    """Shared per-shard parameter resolution for the mesh entry points.

    Uses the same policy function as the single-chip driver
    (engine.resolve_approx_mode) over the PER-SHARD IVF statistics
    (ShardedIndex.ivf_lengths_host is the per-cell max across shards — a
    conservative basis), so a corpus resolves to the same estimator
    however it is distributed. Returns (approx_mode, rank_admit,
    slot_budget, cand_cap).
    """
    from fast_plaid_tpu.search.engine import (
        candidate_capacity,
        resolve_approx_mode,
        suggest_slot_budget,
    )

    cand_cap = None
    slot_budget = None
    if ivf_lengths_host is not None:
        n_cells = min(q_cap * n_ivf_probe, ispec.n_partitions)
        cand_cap = candidate_capacity(
            ivf_lengths_host, n_cells, n_full_scores
        )
        slot_budget = suggest_slot_budget(ivf_lengths_host, n_full_scores)
    approx_mode, rank_admit, slot_budget = resolve_approx_mode(
        approx_mode,
        ivf_lengths_host,
        q_cap=q_cap,
        n_ivf_probe=n_ivf_probe,
        n_full_scores=n_full_scores,
        n_partitions=ispec.n_partitions,
        cand_cap=cand_cap,
        rank_admit=rank_admit,
        slot_budget=slot_budget,
        n_docs=ispec.n_docs,
    )
    return approx_mode, rank_admit, slot_budget, cand_cap


def _kernel_flags(dev: DeviceIndex) -> tuple[bool, bool]:
    """(use_estimate_kernel, use_rerank_kernel) for the platform the index
    actually lives on — NOT the process default backend: a CPU-mesh test
    (or a host-fallback index) must never enable Pallas Mosaic lowering
    even when the default device is a TPU."""
    import os

    try:
        leaf = next(a for a in jax.tree.leaves(dev) if hasattr(a, "devices"))
        on_tpu = next(iter(leaf.devices())).platform == "tpu"
    except StopIteration:
        on_tpu = jax.devices()[0].platform == "tpu"
    est = on_tpu and os.environ.get("FASTPLAID_NO_ESTIMATE_KERNEL") != "1"
    rer = (
        on_tpu
        and (dev.emb_cache is not None or dev.emb_q4 is not None)
        and not dev.buckets
        and os.environ.get("FASTPLAID_NO_RERANK_KERNEL") != "1"
    )
    return est, rer


# Globally-addressed subset padding: decisively outside every shard's
# range (a per-shard rebase maps it to that shard's sentinel). Using the
# corpus size instead would alias the tail shard's first PADDING doc.
SUBSET_SENTINEL = 2**31 - 1


def pad_global_subsets(
    subsets: list[list[int]] | None, n_docs_total: int
) -> np.ndarray | None:
    """list-of-id-lists -> [B, S] int32, sorted asc, SUBSET_SENTINEL pad."""
    if subsets is None:
        return None
    s_cap = max(max((len(s) for s in subsets), default=0), 1)
    s_cap = ((s_cap + 7) // 8) * 8
    out = np.full((len(subsets), s_cap), SUBSET_SENTINEL, np.int32)
    for i, s in enumerate(subsets):
        vals = np.asarray(
            sorted(v for v in s if 0 <= v < n_docs_total), np.int32
        )
        out[i, : len(vals)] = vals
    return out


def sharded_search(
    sharded: ShardedIndex,
    queries: np.ndarray,
    *,
    top_k: int = 10,
    n_ivf_probe: int = 8,
    n_full_scores: int = 4096,
    mem_budget: int = 256 * 1024 * 1024,
    approx_mode: str = "auto",
    rank_admit: int | None = None,
    pool_divisor: int = 2,
    subset: np.ndarray | list[list[int]] | None = None,
    want_tokens: bool = False,
    with_stats: bool = False,
):
    """Doc-sharded search: [B, Q, D] queries -> ([B, top_k] ids, scores).

    ``approx_mode="auto"`` resolves through the same policy as the
    single-chip driver (engine.resolve_approx_mode) using per-shard IVF
    statistics — scaling from one chip to the mesh keeps the recall-safe
    default and the rank-admission machinery.

    ``subset``: per-query allowed GLOBAL doc ids — a [B, S] int32 array
    (sorted asc, SUBSET_SENTINEL padding) or a list of id lists; each
    shard rebases to its local pid space (the reference carries subsets
    through its multi-GPU dispatch too, fast_plaid.py:797-928).
    ``want_tokens`` appends (token_scores [B, top_k, doc_cap, Q],
    doc_lens [B, top_k]); ``with_stats`` appends the [B, 2] int32
    budget-pruned/cap-overflow accounting summed over shards.
    """
    q = jnp.asarray(queries, dtype=jnp.float32)
    if isinstance(subset, list):
        subset = pad_global_subsets(subset, sharded.n_docs_total)
    approx_mode, rank_admit, slot_budget, cand_cap = _resolve_shard_params(
        sharded.ivf_lengths_host,
        sharded.ispec,
        q.shape[1],
        n_ivf_probe,
        n_full_scores,
        approx_mode,
        rank_admit,
    )
    est_kernel, rerank_kernel = _kernel_flags(sharded.dev)
    return _sharded_search_jit(
        sharded.dev,
        sharded.doc_base,
        q,
        None if subset is None else jnp.asarray(subset, jnp.int32),
        ispec=sharded.ispec,
        top_k=top_k,
        n_ivf_probe=n_ivf_probe,
        n_full_scores=n_full_scores,
        mem_budget=mem_budget,
        mesh=sharded.mesh,
        cand_cap=cand_cap,
        approx_mode=approx_mode,
        slot_budget=slot_budget,
        rank_admit=rank_admit,
        pool_divisor=pool_divisor,
        use_estimate_kernel=est_kernel,
        use_rerank_kernel=rerank_kernel,
        want_tokens=want_tokens,
        with_stats=with_stats,
    )


def query_sharded_search(
    dev: DeviceIndex,
    ispec: IndexSpec,
    queries: np.ndarray,
    mesh: Mesh,
    *,
    top_k: int = 10,
    n_ivf_probe: int = 8,
    n_full_scores: int = 4096,
    mem_budget: int = 256 * 1024 * 1024,
    approx_mode: str = "auto",
    rank_admit: int | None = None,
    pool_divisor: int = 2,
    ivf_lengths_host: np.ndarray | None = None,
    subset: np.ndarray | list[list[int]] | None = None,
    want_tokens: bool = False,
    with_stats: bool = False,
):
    """Replicated-index data parallelism: the query batch is mesh-sharded.

    [B, Q, D] queries; batches not divisible by the mesh size are padded
    with zero queries and trimmed from the result. XLA partitions the whole
    cascade along the batch dimension — the SPMD form of the reference's
    thread-per-GPU dispatch. ``approx_mode="auto"`` resolves through the
    shared policy (engine.resolve_approx_mode); pass ``ivf_lengths_host``
    (host copy of dev.ivf_lengths) to avoid one device->host pull.

    ``subset`` rows address the full corpus (the index is replicated, so
    no rebasing): [B, S] sorted asc with sentinel_pid padding, or a list
    of id lists. ``want_tokens``/``with_stats`` append token matrices +
    doc lengths / the [B, 2] stats, as search_impl does.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    q_np = np.asarray(queries, np.float32)
    b = q_np.shape[0]
    bp = -(-b // n) * n
    if isinstance(subset, list):
        sub_np = pad_global_subsets(subset, ispec.n_docs)
        # Replicated index: local == global ids; clamp the global padding
        # sentinel to the engine's own.
        subset = np.minimum(sub_np, ispec.sentinel_pid).astype(np.int32)
    if bp != b:
        q_np = np.concatenate(
            [q_np, np.zeros((bp - b, *q_np.shape[1:]), np.float32)]
        )
        if subset is not None:
            pad_rows = np.full(
                (bp - b, subset.shape[1]), ispec.sentinel_pid, np.int32
            )
            subset = np.concatenate([np.asarray(subset, np.int32), pad_rows])
    if ivf_lengths_host is None:
        ivf_lengths_host = np.asarray(dev.ivf_lengths)[: ispec.n_partitions]
    approx_mode, rank_admit, slot_budget, cand_cap = _resolve_shard_params(
        ivf_lengths_host,
        ispec,
        q_np.shape[1],
        n_ivf_probe,
        n_full_scores,
        approx_mode,
        rank_admit,
    )
    est_kernel, rerank_kernel = _kernel_flags(dev)
    repl = NamedSharding(mesh, P())
    dev_repl = jax.tree.map(lambda x: jax.device_put(x, repl), dev)
    batch_sh = NamedSharding(mesh, P(axis))
    q = jax.device_put(jnp.asarray(q_np), batch_sh)
    sub_dev = (
        None
        if subset is None
        else jax.device_put(jnp.asarray(subset, jnp.int32), batch_sh)
    )
    fn = jax.jit(
        partial(
            search_impl,
            ispec=ispec,
            top_k=top_k,
            n_ivf_probe=n_ivf_probe,
            n_full_scores=n_full_scores,
            want_tokens=want_tokens,
            with_stats=with_stats,
            mem_budget=mem_budget,
            cand_cap=cand_cap,
            approx_mode=approx_mode,
            slot_budget=slot_budget,
            rank_admit=rank_admit,
            pool_divisor=pool_divisor,
            use_estimate_kernel=est_kernel,
            use_rerank_kernel=rerank_kernel,
        )
    )
    out = fn(dev_repl, q, sub_dev)
    return tuple(x[:b] for x in out)
