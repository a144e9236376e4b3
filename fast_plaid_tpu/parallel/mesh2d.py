"""2-D (replica x shard) mesh search: throughput x capacity scaling.

One axis shards documents (capacity — each group of ``shard`` chips holds
one copy of the corpus, as parallel/sharded.py), the other replicates
those groups and splits the query batch across them (throughput — the
SPMD form of the reference's thread-per-GPU dispatch, fast_plaid.py:894-
928, composed with doc sharding it never had). Queries all-gather only
inside their replica's shard group; replicas never communicate — on real
topologies the shard axis should map to ICI-adjacent chips and the
replica axis can safely cross DCN.

No reference analog (SURVEY §5.8 lists multi-host scaling as the
blueprint's new-capability axis).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from fast_plaid_tpu.index.layout import DeviceIndex, IndexSpec
from fast_plaid_tpu.parallel.sharded import ShardedIndex
from fast_plaid_tpu.search.engine import search_impl

__all__ = ["make_mesh_2d", "replicate_sharded_index", "sharded_search_2d"]


def make_mesh_2d(
    n_replicas: int, n_shards: int, devices=None
) -> Mesh:
    """('r', 'd') mesh: ``n_replicas`` groups of ``n_shards`` chips."""
    need = n_replicas * n_shards
    if devices is None:
        from fast_plaid_tpu.parallel.mesh import pick_devices

        try:
            devices = pick_devices(need)
        except RuntimeError as exc:
            raise ValueError(str(exc)) from exc
    devices = np.asarray(devices)
    if devices.size < need:
        msg = f"need {need} devices, have {devices.size}"
        raise ValueError(msg)
    return Mesh(
        devices.flatten()[:need].reshape(n_replicas, n_shards), ("r", "d")
    )


def replicate_sharded_index(
    sharded: ShardedIndex, mesh2d: Mesh
) -> ShardedIndex:
    """Lay a doc-sharded index onto a 2-D mesh: shards split over 'd',
    every replica row holds a full copy (leaves stay [n_shards, ...],
    sharded over 'd' and replicated over 'r')."""
    spec = lambda _: NamedSharding(mesh2d, P("d"))  # noqa: E731
    dev = jax.tree.map(
        lambda x: jax.device_put(x, spec(x)), sharded.dev
    )
    doc_base = jax.device_put(
        sharded.doc_base, NamedSharding(mesh2d, P("d"))
    )
    return ShardedIndex(
        dev=dev,
        ispec=sharded.ispec,
        doc_base=doc_base,
        mesh=mesh2d,
        n_docs_total=sharded.n_docs_total,
        ivf_lengths_host=sharded.ivf_lengths_host,
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
def _search_2d_jit(
    dev: DeviceIndex,
    doc_base: jax.Array,
    queries: jax.Array,  # [B, Q, D], B divisible by n_replicas
    *,
    ispec: IndexSpec,
    top_k: int,
    n_ivf_probe: int,
    n_full_scores: int,
    mem_budget: int,
    mesh: Mesh,
    cand_cap: int | None,
    approx_mode: str,
    slot_budget: int | None = None,
    rank_admit: int = 0,
    pool_divisor: int = 2,
    use_estimate_kernel: bool = False,
    use_rerank_kernel: bool = False,
):
    def local(dev_blk: DeviceIndex, base_blk: jax.Array, q: jax.Array):
        # q: this replica's query slice (replicated along 'd' inside the
        # group); dev_blk: this chip's document shard.
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
        # Merge ONLY across this replica's shard group ('d'); the 'r'
        # axis carries independent query slices.
        all_p = jax.lax.all_gather(gpids, "d")  # [n_shards, b_r, k]
        all_s = jax.lax.all_gather(scores, "d")
        b_r = q.shape[0]
        all_p = all_p.transpose(1, 0, 2).reshape(b_r, -1)
        all_s = all_s.transpose(1, 0, 2).reshape(b_r, -1)
        ms, mi = jax.lax.top_k(all_s, top_k)
        return jnp.take_along_axis(all_p, mi, axis=1), ms

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("d"), dev),
            P("d"),
            P("r"),
        ),
        out_specs=(P("r"), P("r")),
        check_vma=False,
    )(dev, doc_base, queries)


def sharded_search_2d(
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
    """[B, Q, D] queries -> ([B, top_k] global ids, scores) on an
    ('r', 'd') mesh. Batches not divisible by n_replicas are padded with
    zero queries and trimmed. ``approx_mode="auto"`` resolves through the
    same policy as the single-chip driver (engine.resolve_approx_mode)."""
    from fast_plaid_tpu.parallel.sharded import (
        _kernel_flags,
        _resolve_shard_params,
    )

    mesh = sharded.mesh
    n_rep = mesh.shape["r"]
    q_np = np.asarray(queries, np.float32)
    b = q_np.shape[0]
    bp = -(-b // n_rep) * n_rep
    if bp != b:
        q_np = np.concatenate(
            [q_np, np.zeros((bp - b, *q_np.shape[1:]), np.float32)]
        )
    approx_mode, rank_admit, slot_budget, cand_cap = _resolve_shard_params(
        sharded.ivf_lengths_host,
        sharded.ispec,
        q_np.shape[1],
        n_ivf_probe,
        n_full_scores,
        approx_mode,
        rank_admit,
    )
    est_kernel, rerank_kernel = _kernel_flags(sharded.dev)
    q = jax.device_put(q_np, NamedSharding(mesh, P("r")))
    pids, scores = _search_2d_jit(
        sharded.dev,
        sharded.doc_base,
        q,
        ispec=sharded.ispec,
        top_k=top_k,
        n_ivf_probe=n_ivf_probe,
        n_full_scores=n_full_scores,
        mem_budget=mem_budget,
        mesh=mesh,
        cand_cap=cand_cap,
        approx_mode=approx_mode,
        slot_budget=slot_budget,
        rank_admit=rank_admit,
        pool_divisor=pool_divisor,
        use_estimate_kernel=est_kernel,
        use_rerank_kernel=rerank_kernel,
    )
    return pids[:b], scores[:b]
