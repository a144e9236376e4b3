"""User-facing multi-chip search over an on-disk index.

``ShardedFastPlaid`` is the mesh-scaled sibling of ``search.FastPlaid``:
it loads the same index directory, document-shards it across a
``jax.sharding.Mesh`` (parallel/sharded.py) and serves batched queries
with the ICI top-k merge. Read-only by design: mutations go through
``FastPlaid`` (single-chip) and a sharded instance reloads.
"""

from __future__ import annotations

import numpy as np

from fast_plaid_tpu.index.storage import load_index_data
from fast_plaid_tpu.parallel.mesh import make_mesh
from fast_plaid_tpu.parallel.sharded import build_sharded_index, sharded_search
from fast_plaid_tpu.search.searcher import normalize_queries

__all__ = ["ShardedFastPlaid"]


class ShardedFastPlaid:
    """Document-sharded, mesh-parallel search over an existing index."""

    def __init__(
        self,
        index: str,
        mesh=None,
        n_devices: int | None = None,
        mem_budget_bytes: int = 256 * 1024 * 1024,
    ) -> None:
        self.index = index
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.mem_budget = int(mem_budget_bytes)
        self.sharded = None
        self.reload()

    def reload(self) -> None:
        data = load_index_data(self.index)
        if data is None:
            msg = f"No index found in '{self.index}'."
            raise FileNotFoundError(msg)
        if data.ivf is None:
            msg = "compress_only indexes cannot be searched."
            raise ValueError(msg)
        self.sharded = build_sharded_index(
            centroids=data.centroids,
            bucket_weights=data.bucket_weights,
            codes=data.codes,
            residuals=data.residuals,
            doc_lengths=data.doc_lengths,
            nbits=data.nbits,
            mesh=self.mesh,
        )

    def search(
        self,
        queries_embeddings,
        top_k: int = 10,
        n_full_scores: int = 4096,
        n_ivf_probe: int = 8,
        approx_mode: str = "auto",
        rank_admit: int | None = None,
        pool_divisor: int = 2,
    ) -> list[list[tuple[int, float]]]:
        """Batched search; returns per query a list of (doc_id, score).

        ``approx_mode``/``rank_admit``/``pool_divisor`` mirror
        ``FastPlaid.search`` — "auto" resolves through the same policy
        (engine.resolve_approx_mode) over per-shard IVF statistics.
        """
        queries = normalize_queries(queries_embeddings)
        if not queries:
            return []
        q_cap = max(max(q.shape[0] for q in queries), 1)
        q_cap = ((q_cap + 7) // 8) * 8
        dim = self.sharded.ispec.dim
        batch = np.zeros((len(queries), q_cap, dim), np.float32)
        lens = []
        for i, q in enumerate(queries):
            batch[i, : q.shape[0]] = q
            lens.append(q.shape[0])
        pids, scores = sharded_search(
            self.sharded,
            batch,
            top_k=top_k,
            n_ivf_probe=n_ivf_probe,
            n_full_scores=n_full_scores,
            mem_budget=self.mem_budget,
            approx_mode=approx_mode,
            rank_admit=rank_admit,
            pool_divisor=pool_divisor,
        )
        pids, scores = np.asarray(pids), np.asarray(scores)
        out = []
        for b in range(pids.shape[0]):
            row = [
                (int(p), float(s))
                for p, s in zip(pids[b], scores[b])
                if p >= 0 and np.isfinite(s)
            ]
            out.append(row)
        return out
