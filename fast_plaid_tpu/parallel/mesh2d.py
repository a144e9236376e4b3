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
        "want_tokens",
        "with_stats",
    ),
)
def _search_2d_jit(
    dev: DeviceIndex,
    doc_base: jax.Array,
    queries: jax.Array,  # [B, Q, D], B divisible by n_replicas
    subset: jax.Array | None = None,  # [B, S] GLOBAL ids, sorted asc
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
    want_tokens: bool = False,
    with_stats: bool = False,
):
    from fast_plaid_tpu.parallel.sharded import (
        _merge_tokens,
        _merge_topk,
        _rebase_subset,
    )

    def local(dev_blk: DeviceIndex, base_blk: jax.Array, q: jax.Array, sub):
        # q: this replica's query slice (replicated along 'd' inside the
        # group); dev_blk: this chip's document shard.
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
        # Merge ONLY across this replica's shard group ('d'); the 'r'
        # axis carries independent query slices.
        mp, ms, mi = _merge_topk(gpids, scores, top_k, "d")
        res = [mp, ms]
        if want_tokens:
            mt, ml = _merge_tokens(out[2], out[3], mi, "d")
            res += [mt, ml]
        if with_stats:
            res.append(jax.lax.psum(stats, "d"))
        return tuple(res)

    n_out = 2 + 2 * want_tokens + with_stats
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("d"), dev),
            P("d"),
            P("r"),
            None if subset is None else P("r"),
        ),
        out_specs=(P("r"),) * n_out,
        check_vma=False,
    )(dev, doc_base, queries, subset)


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
    subset: np.ndarray | list[list[int]] | None = None,
    want_tokens: bool = False,
    with_stats: bool = False,
):
    """[B, Q, D] queries -> ([B, top_k] global ids, scores) on an
    ('r', 'd') mesh. Batches not divisible by n_replicas are padded with
    zero queries and trimmed. ``approx_mode="auto"`` resolves through the
    same policy as the single-chip driver (engine.resolve_approx_mode).

    ``subset``/``want_tokens``/``with_stats`` behave as in
    parallel.sharded.sharded_search (subsets are GLOBAL ids, rebased per
    shard; stats are summed over each replica's shard group).
    """
    from fast_plaid_tpu.parallel.sharded import (
        _kernel_flags,
        _resolve_shard_params,
        pad_global_subsets,
        SUBSET_SENTINEL,
    )

    mesh = sharded.mesh
    n_rep = mesh.shape["r"]
    q_np = np.asarray(queries, np.float32)
    b = q_np.shape[0]
    bp = -(-b // n_rep) * n_rep
    if isinstance(subset, list):
        subset = pad_global_subsets(subset, sharded.n_docs_total)
    if bp != b:
        q_np = np.concatenate(
            [q_np, np.zeros((bp - b, *q_np.shape[1:]), np.float32)]
        )
        if subset is not None:
            subset = np.concatenate(
                [
                    np.asarray(subset, np.int32),
                    np.full(
                        (bp - b, subset.shape[1]), SUBSET_SENTINEL, np.int32
                    ),
                ]
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
    sub_dev = (
        None
        if subset is None
        else jax.device_put(
            np.asarray(subset, np.int32), NamedSharding(mesh, P("r"))
        )
    )
    out = _search_2d_jit(
        sharded.dev,
        sharded.doc_base,
        q,
        sub_dev,
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
        want_tokens=want_tokens,
        with_stats=with_stats,
    )
    return tuple(x[:b] for x in out)
