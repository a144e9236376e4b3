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
    ),
)
def _sharded_search_jit(
    dev: DeviceIndex,
    doc_base: jax.Array,
    queries: jax.Array,
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
):
    axis = mesh.axis_names[0]

    def local(dev_blk: DeviceIndex, base_blk: jax.Array, q: jax.Array):
        dev_local = jax.tree.map(lambda x: x[0], dev_blk)
        pids, scores = search_impl(
            dev_local,
            q,
            None,
            ispec=ispec,
            top_k=top_k,
            n_ivf_probe=n_ivf_probe,
            n_full_scores=n_full_scores,
            want_tokens=False,
            mem_budget=mem_budget,
            cand_cap=cand_cap,
            approx_mode=approx_mode,
            slot_budget=slot_budget,
            rank_admit=rank_admit,
            pool_divisor=pool_divisor,
            use_estimate_kernel=use_estimate_kernel,
            use_rerank_kernel=use_rerank_kernel,
        )
        gpids = jnp.where(pids >= 0, pids + base_blk[0], -1)
        # ICI merge: gather the tiny [B, top_k] per-chip results, re-top-k.
        all_p = jax.lax.all_gather(gpids, axis)  # [n, B, k]
        all_s = jax.lax.all_gather(scores, axis)
        b = q.shape[0]
        all_p = all_p.transpose(1, 0, 2).reshape(b, -1)
        all_s = all_s.transpose(1, 0, 2).reshape(b, -1)
        ms, mi = jax.lax.top_k(all_s, top_k)
        mp = jnp.take_along_axis(all_p, mi, axis=1)
        return mp, ms

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), dev),
            P(axis),
            P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(dev, doc_base, queries)


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
):
    """Doc-sharded search: [B, Q, D] queries -> ([B, top_k] ids, scores).

    ``approx_mode="auto"`` resolves through the same policy as the
    single-chip driver (engine.resolve_approx_mode) using per-shard IVF
    statistics — scaling from one chip to the mesh keeps the recall-safe
    default and the rank-admission machinery.
    """
    q = jnp.asarray(queries, dtype=jnp.float32)
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
):
    """Replicated-index data parallelism: the query batch is mesh-sharded.

    [B, Q, D] queries; batches not divisible by the mesh size are padded
    with zero queries and trimmed from the result. XLA partitions the whole
    cascade along the batch dimension — the SPMD form of the reference's
    thread-per-GPU dispatch. ``approx_mode="auto"`` resolves through the
    shared policy (engine.resolve_approx_mode); pass ``ivf_lengths_host``
    (host copy of dev.ivf_lengths) to avoid one device->host pull.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    q_np = np.asarray(queries, np.float32)
    b = q_np.shape[0]
    bp = -(-b // n) * n
    if bp != b:
        q_np = np.concatenate(
            [q_np, np.zeros((bp - b, *q_np.shape[1:]), np.float32)]
        )
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
    q = jax.device_put(jnp.asarray(q_np), NamedSharding(mesh, P(axis)))
    fn = jax.jit(
        partial(
            search_impl,
            ispec=ispec,
            top_k=top_k,
            n_ivf_probe=n_ivf_probe,
            n_full_scores=n_full_scores,
            want_tokens=False,
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
    pids, scores = fn(dev_repl, q, None)
    return pids[:b], scores[:b]
