"""FastPlaid — the public API class (parity with fast_plaid.search.FastPlaid).

Orchestration mirror of the reference's Python layer (reference:
python/fast_plaid/search/fast_plaid.py:325-1186): device resolution,
create/update/search/search_token_scores/delete/get_embeddings entry points,
cross-process FileLock + mtime-triggered reload, multi-device query
dispatch. The compute path underneath is the jitted JAX cascade
(search/engine.py) instead of a Rust/libtorch extension, so there is no
shared-library discovery, no GIL management and no per-device native handle
— a LoadedIndex is a pytree of device arrays.

Embeddings in/out are numpy arrays (anything np.asarray accepts, including
CPU torch tensors, works).
"""

from __future__ import annotations

import math
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import numpy as np

import jax

from fast_plaid_tpu import filtering
from fast_plaid_tpu.index import storage
from fast_plaid_tpu.index.builder import create_index as build_index
from fast_plaid_tpu.index.deleter import delete_from_index
from fast_plaid_tpu.search import update as update_mod
from fast_plaid_tpu.search.engine import reconstruct_core
from fast_plaid_tpu.search.kmeans import compute_kmeans
from fast_plaid_tpu.search.load import LoadedIndex, reload_index
from fast_plaid_tpu.search.searcher import (
    normalize_queries,
    normalize_subset,
    search_on_device,
)
from fast_plaid_tpu.utils.locking import FileLock, Timeout

__all__ = ["FastPlaid", "resolve_devices", "default_mem_budget"]


def default_mem_budget(device: jax.Device) -> int:
    """Platform default for the per-search device working budget.

    FASTPLAID_TPU_MEM_BUDGET overrides. Accelerators get a quarter of
    reported device memory (fallback 4 GB when stats are unavailable);
    CPU hosts get 256 MB.
    """
    env = os.environ.get("FASTPLAID_TPU_MEM_BUDGET")
    if env is not None:
        return int(env)
    if device.platform == "cpu":
        return 256 * 1024 * 1024
    try:
        limit = int(device.memory_stats().get("bytes_limit", 0))
    except Exception:
        limit = 0
    return limit // 4 if limit > 0 else 4 * 1024 * 1024 * 1024


def resolve_devices(device: str | list[str] | None) -> list[jax.Device]:
    """Map device spec strings to jax devices.

    None -> every accelerator (TPU/GPU) if present, else cpu:0 — the analog
    of the reference's all-CUDA-or-cpu default (fast_plaid.py:349-362).
    Accepts "cpu", "tpu", "tpu:1", "gpu:0"; "cuda[:N]" aliases to the
    available accelerator platform for drop-in compatibility.
    """
    by_platform: dict[str, list[jax.Device]] = {}
    for d in jax.devices():
        by_platform.setdefault(d.platform, []).append(d)
    try:
        by_platform.setdefault("cpu", jax.devices("cpu"))
    except RuntimeError:
        pass
    accel = [p for p in ("tpu", "gpu") if p in by_platform]

    if device is None:
        if accel:
            return list(by_platform[accel[0]])
        return [by_platform["cpu"][0]]

    specs = [device] if isinstance(device, str) else list(device)
    out: list[jax.Device] = []
    for spec in specs:
        s = spec.lower()
        name, _, idx = s.partition(":")
        if name in ("cuda", "gpu", "tpu") and name not in by_platform:
            if not accel:
                msg = f"No accelerator available for device spec '{spec}'."
                raise RuntimeError(msg)
            name = accel[0]
        if name == "cuda":
            name = "gpu"
        pool = by_platform.get(name)
        if not pool:
            msg = f"Unknown device spec '{spec}'."
            raise RuntimeError(msg)
        out.append(pool[int(idx) if idx else 0])
    # de-dup, preserving order
    return list(dict.fromkeys(out))


def _format_embeddings(embeddings) -> list[np.ndarray]:
    """Standardize to a list of [L, D] float32 arrays (fast_plaid.py:411-425)."""
    if isinstance(embeddings, (list, tuple)):
        out = []
        for e in embeddings:
            a = np.asarray(e, dtype=np.float32)
            if a.ndim == 3:
                a = a[0]
            out.append(a)
        return out
    arr = np.asarray(embeddings, dtype=np.float32)
    if arr.ndim == 2:
        return [arr]
    return [arr[i] for i in range(arr.shape[0])]


class FastPlaid:
    """Create and search a PLAID index with concurrent safety."""

    def __init__(
        self,
        index: str,
        device: str | list[str] | None = None,
        low_memory: bool = True,
        mem_budget_bytes: int | None = None,
        emb_cache_budget_bytes: int | None = None,
        length_buckets: int = 4,
        **kwargs: Any,  # noqa: ARG002 - parity with the reference signature
    ) -> None:
        self.index = index
        self.devices = resolve_devices(device)
        self.low_memory = low_memory
        # None sizes the per-search working budget to the platform: a
        # quarter of device memory on accelerators (bigger query tiles =
        # fewer host<->device round trips per batch), a conservative
        # 256 MB on CPU hosts.
        self.mem_budget = (
            default_mem_budget(self.devices[0])
            if mem_budget_bytes is None
            else int(mem_budget_bytes)
        )
        # HBM budget for the decompressed-corpus rerank cache; None picks
        # the platform default (on for accelerators, off on CPU).
        self.emb_cache_budget = emb_cache_budget_bytes
        # Max length buckets for the rerank layout (0/1 disables; buckets
        # engage only when the corpus length skew pays for them).
        self.length_buckets = int(length_buckets)

        os.makedirs(self.index, exist_ok=True)
        self.lock_path = os.path.join(self.index, "plaid.lock")
        self.lock = FileLock(self.lock_path)
        self._index_swap_lock = threading.RLock()
        self._last_known_mtime = -1.0
        self.indices: dict[str, LoadedIndex | None] = {}
        self._check_and_reload_index(blocking=True)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def close(self) -> None:
        """Release device arrays (safe before deleting the index directory)."""
        with self._index_swap_lock:
            self.indices.clear()

    def __enter__(self) -> "FastPlaid":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()

    # ------------------------------------------------------------------
    # reload machinery (mtime double-checked locking, fast_plaid.py:427-514)
    # ------------------------------------------------------------------

    def _current_mtime(self) -> float:
        meta = os.path.join(self.index, "metadata.json")
        try:
            return os.path.getmtime(meta)
        except OSError:
            return 0.0

    def _update_mtime(self) -> None:
        self._last_known_mtime = self._current_mtime()

    def _check_and_reload_index(self, blocking: bool = True) -> bool:
        current = self._current_mtime()
        if current == self._last_known_mtime and self.indices:
            return False
        try:
            self.lock.acquire(timeout=-1.0 if blocking else 0.0)
        except Timeout:
            return False  # an update is in flight; keep serving current index
        try:
            current = self._current_mtime()
            if current == self._last_known_mtime and self.indices:
                return False
            new_indices = reload_index(
                self.index,
                self.devices,
                low_memory=self.low_memory,
                emb_cache_budget=self.emb_cache_budget,
                length_buckets=self.length_buckets,
            )
            with self._index_swap_lock:
                self.indices = new_indices
                self._last_known_mtime = current
            return True
        finally:
            self.lock.release()

    def _reload_and_swap(self) -> None:
        new_indices = reload_index(
            self.index,
            self.devices,
            low_memory=self.low_memory,
            emb_cache_budget=self.emb_cache_budget,
            length_buckets=self.length_buckets,
        )
        with self._index_swap_lock:
            self.indices = new_indices
            self._update_mtime()

    # ------------------------------------------------------------------
    # create
    # ------------------------------------------------------------------

    @staticmethod
    def _prepare_index_directory(index_path: str) -> None:
        """Purge stale *.json / *.npy artifacts (fast_plaid.py:716-741)."""
        import glob

        if os.path.isdir(index_path):
            for pattern in ("*.json", "*.npy"):
                for path in glob.glob(os.path.join(index_path, pattern)):
                    try:
                        os.remove(path)
                    except OSError:
                        pass
        else:
            os.makedirs(index_path, exist_ok=True)

    def create(
        self,
        documents_embeddings,
        kmeans_niters: int = 4,
        max_points_per_centroid: int = 256,
        nbits: int = 4,
        n_samples_kmeans: int | None = None,
        batch_size: int = 25_000,
        seed: int = 42,
        use_triton_kmeans: bool | None = None,  # noqa: ARG002 - API parity
        metadata: list[dict[str, Any]] | None = None,
        start_from_scratch: int = 1000,
        compress_only: bool = False,
        show_progress: bool = False,
    ) -> "FastPlaid":
        """Create and persist the index (fast_plaid.py:517-637)."""
        with self.lock:
            docs = _format_embeddings(documents_embeddings)
            if not docs:
                msg = "documents_embeddings must not be empty."
                raise ValueError(msg)
            dim = docs[0].shape[-1]
            self._prepare_index_directory(self.index)

            if metadata is not None:
                if len(metadata) != len(docs):
                    msg = (
                        f"The length of metadata ({len(metadata)}) must match "
                        f"the number of documents_embeddings ({len(docs)})."
                    )
                    raise ValueError(msg)
                filtering.create(index=self.index, metadata=metadata)

            if len(docs) <= start_from_scratch:
                storage.save_object_npy(
                    os.path.join(self.index, "embeddings.npy"), docs
                )

            centroids = compute_kmeans(
                documents_embeddings=docs,
                dim=dim,
                kmeans_niters=kmeans_niters,
                max_points_per_centroid=max_points_per_centroid,
                seed=seed,
                n_samples_kmeans=n_samples_kmeans,
            )
            build_index(
                self.index,
                docs,
                centroids,
                nbits=nbits,
                batch_size=batch_size,
                seed=seed,
                compress_only=compress_only,
                show_progress=show_progress,
            )
            self._reload_and_swap()
        return self

    # ------------------------------------------------------------------
    # update
    # ------------------------------------------------------------------

    def update(
        self,
        documents_embeddings,
        metadata: list[dict[str, Any]] | None = None,
        batch_size: int = 25_000,
        kmeans_niters: int = 4,
        max_points_per_centroid: int = 256,
        n_samples_kmeans: int | None = None,
        seed: int = 42,
        start_from_scratch: int = 999,
        buffer_size: int = 100,
        use_triton_kmeans: bool | None = False,  # noqa: ARG002 - API parity
    ) -> "FastPlaid":
        """Add documents to an existing index (fast_plaid.py:640-713)."""
        with self.lock:
            docs = _format_embeddings(documents_embeddings)
            update_mod.process_update(
                index_path=self.index,
                documents_embeddings=docs,
                metadata=metadata,
                batch_size=batch_size,
                kmeans_niters=kmeans_niters,
                max_points_per_centroid=max_points_per_centroid,
                n_samples_kmeans=n_samples_kmeans,
                seed=seed,
                start_from_scratch=start_from_scratch,
                buffer_size=buffer_size,
                create_fn=self.create,
                delete_fn=self.delete,
            )
            self._reload_and_swap()
        return self

    # ------------------------------------------------------------------
    # delete
    # ------------------------------------------------------------------

    def delete(
        self,
        subset: list[int],
        _delete_metadata: bool = True,
        _delete_buffer: bool = True,
    ) -> "FastPlaid":
        """Delete documents by id; remaining ids shift down (fast_plaid.py:1046-1157)."""
        with self.lock:
            subset = sorted({int(i) for i in subset})
            meta = storage.load_metadata(self.index)
            pre_num_documents = int(meta.get("num_documents", 0))

            delete_from_index(self.index, subset)

            if _delete_metadata and os.path.exists(
                os.path.join(self.index, "metadata.db")
            ):
                filtering.delete(index=self.index, subset=subset)

            # Rewrite the raw-embedding store minus deleted rows.
            emb_path = os.path.join(self.index, "embeddings.npy")
            if os.path.exists(emb_path):
                arrays = storage.load_object_npy(emb_path)
                drop = {i for i in subset if i < len(arrays)}
                remaining = [a for i, a in enumerate(arrays) if i not in drop]
                if remaining:
                    storage.save_object_npy(emb_path, remaining)
                else:
                    os.remove(emb_path)

            # Rewrite the update buffer: buffer docs are the last
            # num_buffer docs of the pre-delete index.
            buffer_path = os.path.join(self.index, "buffer.npy")
            if _delete_buffer and os.path.exists(buffer_path):
                buffered = storage.load_object_npy(buffer_path)
                buffer_start = pre_num_documents - len(buffered)
                drop_local = {
                    i - buffer_start
                    for i in subset
                    if buffer_start <= i < pre_num_documents
                }
                if drop_local:
                    remaining = [
                        a for i, a in enumerate(buffered) if i not in drop_local
                    ]
                    if remaining:
                        storage.save_object_npy(buffer_path, remaining)
                    else:
                        os.remove(buffer_path)

            self._reload_and_swap()
        return self

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def _prepare_search(self, queries_embeddings, subset):
        self._check_and_reload_index(blocking=False)
        if not os.path.exists(os.path.join(self.index, "metadata.json")):
            msg = (
                f"Index metadata not found in '{self.index}'. "
                "Please create the index before searching."
            )
            raise FileNotFoundError(msg)
        with self._index_swap_lock:
            indices = dict(self.indices)
        if any(v is None for v in indices.values()) or not indices:
            self._check_and_reload_index(blocking=True)
            with self._index_swap_lock:
                indices = dict(self.indices)
        for key, loaded in indices.items():
            if loaded is None:
                msg = f"Index could not be loaded on device '{key}'."
                raise RuntimeError(msg)
        queries = normalize_queries(queries_embeddings)
        subsets = normalize_subset(subset, len(queries))
        return indices, queries, subsets

    def _dispatch_search(
        self,
        indices: dict[str, LoadedIndex],
        queries: list[np.ndarray],
        subsets: list[list[int]] | None,
        *,
        want_tokens: bool,
        top_k: int,
        n_full_scores: int,
        n_ivf_probe: int,
        show_progress: bool,
        approx_mode: str = "auto",
        max_tile: int | None = None,
        pool_divisor: int | None = None,
        rank_admit: int | None = None,
    ) -> list:
        """Split the query batch across devices (fast_plaid.py:797-928)."""
        loaded = [indices[str(d)] for d in self.devices]
        if len(loaded) == 1 or len(queries) <= 1:
            return search_on_device(
                loaded[0],
                queries,
                top_k=top_k,
                n_full_scores=n_full_scores,
                n_ivf_probe=n_ivf_probe,
                subsets=subsets,
                want_tokens=want_tokens,
                mem_budget=self.mem_budget,
                show_progress=show_progress,
                approx_mode=approx_mode,
                max_tile=max_tile,
                pool_divisor=pool_divisor,
                rank_admit=rank_admit,
            )
        n_dev = min(len(loaded), len(queries))
        per = math.ceil(len(queries) / n_dev)
        chunks = [
            (
                loaded[i],
                queries[i * per : (i + 1) * per],
                subsets[i * per : (i + 1) * per] if subsets is not None else None,
            )
            for i in range(n_dev)
        ]
        results: list = []
        with ThreadPoolExecutor(max_workers=n_dev) as pool:
            futures = [
                pool.submit(
                    search_on_device,
                    ld,
                    qs,
                    top_k=top_k,
                    n_full_scores=n_full_scores,
                    n_ivf_probe=n_ivf_probe,
                    subsets=ss,
                    want_tokens=want_tokens,
                    mem_budget=self.mem_budget,
                    show_progress=show_progress,
                    approx_mode=approx_mode,
                    max_tile=max_tile,
                    pool_divisor=pool_divisor,
                    rank_admit=rank_admit,
                )
                for (ld, qs, ss) in chunks
                if qs
            ]
            for fut in futures:
                results.extend(fut.result())
        return results

    def search(
        self,
        queries_embeddings,
        top_k: int = 10,
        batch_size: int = 2000,
        n_full_scores: int = 4096,
        n_ivf_probe: int = 8,
        show_progress: bool = True,
        subset: list[list[int]] | list[int] | None = None,
        n_processes: int | None = None,  # noqa: ARG002 - API parity
        approx_mode: str = "auto",
        pool_divisor: int | None = None,
        rank_admit: int | None = None,
    ) -> list[list[tuple[int, float]]]:
        """Search the index; returns per query a list of (doc_id, score).

        ``batch_size`` caps the per-device query tile (a memory hint, as in
        the reference); the engine may pick a smaller tile automatically.
        approx_mode: "auto" (default — picks the recall-safe estimator
            from IVF statistics; below the measured crossover it resolves
            to the plain budgeted "cells" path, past it to "cells" with
            rank-based admission — every query token's top probed cells
            admitted whole under a budget sized to hold them — and to
            "cells_full" only on very coarse indexes where even the
            rank-1 tier approaches the full candidate width), "cells"
            (the explicit TPU-native fast slot-pruning path),
            "cells_full" (untruncated cell estimator) or "tokens"
            (reference-parity token-level approximate scoring).
        rank_admit: admission tier for the budgeted estimator (None lets
            "auto" pick from IVF statistics; an int forces it — 0
            disables). See engine.candidates_impl.
        pool_divisor: exact-rerank pool R = n_full_scores // pool_divisor
            for the budgeted estimators (default 2 — recall-first; the
            reference uses 4 with its token-level estimator,
            search.rs:614-619). On clustered real-embedding corpora 4 is
            measured nDCG-neutral and ~1.5x faster (SCALE.md); on
            unstructured corpora it visibly narrows the exact pool, so
            it is opt-in. Env override: FASTPLAID_POOL_DIV.
        """
        indices, queries, subsets = self._prepare_search(queries_embeddings, subset)
        return self._dispatch_search(
            indices,
            queries,
            subsets,
            want_tokens=False,
            top_k=top_k,
            n_full_scores=n_full_scores,
            n_ivf_probe=n_ivf_probe,
            show_progress=show_progress,
            approx_mode=approx_mode,
            max_tile=batch_size,
            pool_divisor=pool_divisor,
            rank_admit=rank_admit,
        )

    def search_token_scores(
        self,
        queries_embeddings,
        top_k: int = 10,
        batch_size: int = 2000,
        n_full_scores: int = 4096,
        n_ivf_probe: int = 8,
        show_progress: bool = True,
        subset: list[list[int]] | list[int] | None = None,
        n_processes: int | None = None,  # noqa: ARG002
        approx_mode: str = "auto",
        pool_divisor: int | None = None,
        rank_admit: int | None = None,
    ) -> list[list[tuple[int, float, np.ndarray]]]:
        """Like search() but each tuple carries a [q_tokens, doc_tokens] matrix."""
        indices, queries, subsets = self._prepare_search(queries_embeddings, subset)
        return self._dispatch_search(
            indices,
            queries,
            subsets,
            want_tokens=True,
            top_k=top_k,
            n_full_scores=n_full_scores,
            n_ivf_probe=n_ivf_probe,
            show_progress=show_progress,
            approx_mode=approx_mode,
            max_tile=batch_size,
            pool_divisor=pool_divisor,
            rank_admit=rank_admit,
        )

    # ------------------------------------------------------------------
    # reconstruction
    # ------------------------------------------------------------------

    def get_embeddings(self, subset: list[int]) -> list[np.ndarray]:
        """Reconstruct (decompress) document embeddings by id."""
        self._check_and_reload_index(blocking=False)
        if not subset:
            return []
        with self._index_swap_lock:
            loaded = self.indices.get(str(self.devices[0]))
        if loaded is None:
            msg = "Index not loaded."
            raise RuntimeError(msg)
        pids = np.asarray(subset, dtype=np.int32)
        n_docs = (
            len(loaded.host_doc_lengths)
            if loaded.low_memory
            else loaded.ispec.n_docs
        )
        bad = pids[(pids < 0) | (pids >= n_docs)]
        if bad.size:
            msg = (
                f"get_embeddings ids must be in [0, {n_docs}); got "
                f"{bad[:8].tolist()}"
            )
            raise ValueError(msg)
        block = 256
        out: list[np.ndarray] = []
        for start in range(0, len(pids), block):
            chunk = pids[start : start + block]
            padded = np.full((block,), loaded.ispec.sentinel_pid, np.int32)
            padded[: len(chunk)] = np.clip(chunk, 0, loaded.ispec.sentinel_pid)
            if loaded.low_memory:
                from fast_plaid_tpu.search.engine import reconstruct_rows_core
                from fast_plaid_tpu.search.searcher import host_gather_rows

                codes_rows, res_rows, tok_valid = host_gather_rows(
                    loaded, padded[None, :]
                )
                emb = reconstruct_rows_core(
                    jax.device_put(codes_rows, loaded.device),
                    jax.device_put(res_rows, loaded.device),
                    jax.device_put(tok_valid, loaded.device),
                    loaded.dev.centroids,
                    loaded.dev.bucket_weights,
                    nbits=loaded.ispec.nbits,
                )
                emb = np.asarray(emb)[0]
                n_docs = len(loaded.host_doc_lengths)
                lens = np.where(
                    padded >= n_docs,
                    0,
                    loaded.host_doc_lengths[np.clip(padded, 0, n_docs - 1)],
                )
            else:
                emb, lens = reconstruct_core(
                    loaded.dev,
                    jax.device_put(padded, loaded.device),
                    ispec=loaded.ispec,
                )
                emb = np.asarray(emb)
                lens = np.asarray(lens)
            for i in range(len(chunk)):
                out.append(np.asarray(emb[i, : int(lens[i])], dtype=np.float32))
        return out
