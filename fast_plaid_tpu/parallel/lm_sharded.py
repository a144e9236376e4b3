"""Per-shard low_memory: document sharding with host-resident residuals.

Completes the scale matrix (ROADMAP "Per-shard low_memory"): corpora
beyond aggregate device HBM *and* beyond one host's worth of rerank
traffic. Documents are sliced contiguously across devices; each shard is
a normal low_memory ``LoadedIndex`` — codes/IVF/q4-prefilter on its
device, residuals as host mmap VIEWS of the merged index files (slicing
numpy mmaps keeps them disk-backed; nothing is copied) — driven by the
existing per-device pipeline (search/searcher.py: device candidates ->
q4 prefilter -> threaded host gather -> codec-exact rescore).

Unlike parallel/sharded.py (fully device-resident, single SPMD program,
ICI top-k merge), the low_memory cascade is host-in-the-loop by
construction (residual rows stream host->device per query tile), so the
shard fan-out runs one host thread per device — the same dispatch
topology as the reference's multi-GPU driver (reference
python/fast_plaid/search/fast_plaid.py:797-928) — and the final merge
is an exact host top-k over per-shard exact scores (a few KB/query).

Every shard scores its documents with the codec-exact MaxSim, so the
merged ranking equals the single-device ranking whenever both consider
the same candidates; with exhaustive parameters it equals brute force
(the same contract the single-device path pins in tests).
"""

from __future__ import annotations

import dataclasses
import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

import jax

from fast_plaid_tpu.index import ivf as ivf_mod
from fast_plaid_tpu.index.storage import IndexData, load_index_data
from fast_plaid_tpu.search.load import LoadedIndex, _construct
from fast_plaid_tpu.search.searcher import search_on_device

__all__ = ["ShardedLowMemory", "load_sharded_lm", "shard_index_data"]


@dataclass
class ShardedLowMemory:
    """Doc-sharded low_memory handle: one LoadedIndex per device."""

    shards: list[LoadedIndex]
    doc_base: list[int]  # global pid of each shard's doc 0
    n_docs_total: int

    def search(
        self,
        queries,
        *,
        top_k: int = 10,
        n_full_scores: int = 4096,
        n_ivf_probe: int = 8,
        approx_mode: str = "auto",
        mem_budget: int = 256 * 1024 * 1024,
        show_progress: bool = False,
        rank_admit: int | None = None,
        pool_divisor: int | None = None,
    ) -> list[list[tuple[int, float]]]:
        """Search every shard with the full query batch; exact host merge.

        Returns per query the global top_k as (pid, score), scores being
        the codec-exact MaxSim (identical to the single-device contract).
        Each shard runs the full single-device driver (search_on_device),
        so ``approx_mode="auto"``, ``rank_admit`` and ``pool_divisor``
        resolve per shard through the same policy as one chip.
        """
        live = [
            (ld, base)
            for ld, base in zip(self.shards, self.doc_base)
            if ld is not None
        ]

        def one(arg):
            ld, base = arg
            rows = search_on_device(
                ld,
                queries,
                top_k=top_k,
                n_full_scores=n_full_scores,
                n_ivf_probe=n_ivf_probe,
                subsets=None,
                want_tokens=False,
                mem_budget=mem_budget,
                show_progress=show_progress,
                approx_mode=approx_mode,
                rank_admit=rank_admit,
                pool_divisor=pool_divisor,
            )
            return [
                [(pid + base, score) for pid, score in row] for row in rows
            ]

        with ThreadPoolExecutor(max_workers=len(live)) as pool:
            per_shard = list(pool.map(one, live))

        merged: list[list[tuple[int, float]]] = []
        for qi in range(len(per_shard[0])):
            cand = [hit for rows in per_shard for hit in rows[qi]]
            cand.sort(key=lambda t: -t[1])
            merged.append(cand[:top_k])
        return merged


def shard_index_data(data: IndexData, n_shards: int) -> list[IndexData]:
    """Slice an IndexData into ``n_shards`` contiguous document ranges.

    Codes/residuals slices are numpy views (mmap-backed arrays stay on
    disk); each shard gets its own local IVF built from its local codes
    (pids are shard-local; the searcher's results are rebased by the
    caller). Tail shards may be empty when n_docs < n_shards.
    """
    doc_lengths = np.asarray(data.doc_lengths, np.int64)
    n_docs = len(doc_lengths)
    per = max(1, math.ceil(n_docs / n_shards))
    token_starts = np.concatenate([[0], np.cumsum(doc_lengths)])
    k = data.centroids.shape[0]

    out = []
    for si in range(n_shards):
        d0, d1 = min(si * per, n_docs), min((si + 1) * per, n_docs)
        t0, t1 = int(token_starts[d0]), int(token_starts[d1])
        lens = doc_lengths[d0:d1].astype(np.int32)
        ivf, ivf_lengths = ivf_mod.build_ivf(data.codes[t0:t1], lens, k)
        out.append(
            dataclasses.replace(
                data,
                codes=data.codes[t0:t1],
                residuals=data.residuals[t0:t1],
                doc_lengths=lens,
                ivf=ivf,
                ivf_lengths=ivf_lengths,
            )
        )
    return out


def load_sharded_lm(
    index_path: str,
    devices: list[jax.Device] | None = None,
    *,
    low_memory: bool = True,
    emb_cache_budget: int | None = None,
) -> ShardedLowMemory:
    """Load an on-disk index doc-sharded across ``devices``.

    Each device holds its shard's probe/candidate state (and q4 prefilter
    cache when it fits the budget); residuals stay in host RAM as mmap
    views when ``low_memory`` (forced off per shard on CPU devices, where
    host and device memory are the same pool — matching reload_index).
    """
    if devices is None:
        devices = jax.devices()
    data = load_index_data(index_path)
    if data is None:
        msg = f"no index at {index_path!r}"
        raise FileNotFoundError(msg)
    slices = shard_index_data(data, len(devices))
    doc_lengths = np.asarray(data.doc_lengths, np.int64)
    per = max(1, math.ceil(len(doc_lengths) / len(devices)))

    def construct(args) -> LoadedIndex | None:
        sl, device = args
        if len(sl.doc_lengths) == 0:
            return None
        return _construct(
            sl,
            device,
            low_memory and device.platform != "cpu",
            emb_cache_budget=emb_cache_budget,
            # Length buckets disabled: shards are already capacity-sliced.
            length_buckets=0,
        )

    with ThreadPoolExecutor(max_workers=len(devices)) as pool:
        shards = list(pool.map(construct, zip(slices, devices)))
    return ShardedLowMemory(
        shards=shards,
        doc_base=[si * per for si in range(len(devices))],
        n_docs_total=len(doc_lengths),
    )
