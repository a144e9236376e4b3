"""Host-side search driver: query prep, tiling, result trimming.

Replaces the reference's per-device search loop (reference:
python/fast_plaid/search/fast_plaid.py:188-322 + rust search_many,
rust/search/search.rs:219-363). Queries are padded to a static token cap,
processed in fixed-size device tiles through the jitted cascade
(search/engine.py), and trimmed back to Python result lists on the host.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from fast_plaid_tpu.index.layout import round_up
from fast_plaid_tpu.search.engine import (
    candidate_capacity,
    candidates_core,
    final_topk_core,
    q4_prefilter_core,
    rerank_rows_core,
    rescue_pool,
    search_core,
    suggest_query_tile,
    suggest_slot_budget,
    token_matrices_core,
)
from fast_plaid_tpu.search.load import LoadedIndex

__all__ = [
    "search_on_device",
    "normalize_queries",
    "normalize_subset",
    "last_search_stats",
]

# Per-call observability: candidate-buffer overflow accounting from the most
# recent search_on_device call (keyed by thread id so the multi-device
# ThreadPool dispatch doesn't interleave counters).
_LAST_STATS: dict[int, dict] = {}


def last_search_stats() -> dict:
    """Stats from the most recent search on the calling thread.

    Keys: ``queries``, ``approx_mode`` (resolved — "auto" never appears),
    ``rank_admit`` (the admission tier the resolved mode ran with),
    ``budget_pruned_slots`` (candidate slots the slot budget pruned BY
    DESIGN — the estimator working as intended, not a problem),
    ``cap_overflow_slots`` (slots the static buffers truncated beyond what
    the budget wanted — genuine overflow that can cost recall; the only
    condition that warns), and ``dropped_candidate_slots`` (legacy key:
    the TOTAL slots not scored, pruned + overflow — the meaning it had
    before the split, so pre-split consumers keep reading the same
    quantity).
    """
    import threading

    return dict(
        _LAST_STATS.get(
            threading.get_ident(),
            {
                "dropped_candidate_slots": 0,
                "budget_pruned_slots": 0,
                "cap_overflow_slots": 0,
                "queries": 0,
            },
        )
    )


def normalize_queries(queries_embeddings) -> list[np.ndarray]:
    """Accept [B, Q, D] array, [Q, D] array, or list of [Q_i, D] arrays."""
    if isinstance(queries_embeddings, (list, tuple)):
        out = []
        for q in queries_embeddings:
            arr = np.asarray(q, dtype=np.float32)
            if arr.ndim == 3:
                arr = arr[0]
            out.append(arr)
        return out
    arr = np.asarray(queries_embeddings, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[None]
    return [arr[i] for i in range(arr.shape[0])]


def normalize_subset(subset, num_queries: int) -> list[list[int]] | None:
    """int -> same list for all queries; flat list -> replicated; list of lists kept.

    Matches _prepare_search (fast_plaid.py:784-794).
    """
    if subset is None:
        return None
    if isinstance(subset, int):
        subset = [subset]
    if isinstance(subset, list) and len(subset) == 0:
        return None
    if isinstance(subset, list) and isinstance(subset[0], (int, np.integer)):
        subset = [list(subset)] * num_queries
    if len(subset) != num_queries:
        msg = "Subset length must match number of queries."
        raise ValueError(msg)
    return [list(map(int, s)) for s in subset]


def _pad_queries(
    queries: list[np.ndarray], dim: int
) -> tuple[np.ndarray, list[int]]:
    for q in queries:
        if q.ndim != 2 or q.shape[-1] != dim:
            msg = (
                f"Query embeddings must be [tokens, {dim}] to match the "
                f"index dimension; got shape {tuple(q.shape)}."
            )
            raise ValueError(msg)
    lens = [int(q.shape[0]) for q in queries]
    q_cap = round_up(max(lens + [1]), 8)
    batch = np.zeros((len(queries), q_cap, dim), dtype=np.float32)
    for i, q in enumerate(queries):
        if q.shape[0]:
            batch[i, : q.shape[0]] = q
    return batch, lens


def _pad_subsets(
    subsets: list[list[int]], n_docs: int, tile: slice
) -> np.ndarray:
    rows = subsets[tile]
    s_cap = round_up(max([len(s) for s in rows] + [1]), 8)
    out = np.full((len(rows), s_cap), n_docs, dtype=np.int32)  # sentinel pad
    for i, s in enumerate(rows):
        vals = np.asarray(sorted(v for v in s if 0 <= v < n_docs), dtype=np.int32)
        out[i, : len(vals)] = vals
    return out


def _tile_size(ispec, q_cap: int, mem_budget: int, n_queries: int) -> int:
    """Queries per device tile, sized so the [B, Q, Kp] score tensor fits."""
    kp = round_up(max(ispec.n_partitions, 1), 128)
    by_scores = max(1, mem_budget // max(1, q_cap * kp * 4 * 2))
    return int(max(1, min(256, by_scores, n_queries)))


def host_gather_rows(loaded: LoadedIndex, pids: np.ndarray):
    """Gather token windows for ``pids`` [B, R] from host-RAM arrays.

    Returns (codes_rows [B,R,doc_cap] i32, res_rows [B,R,doc_cap,PD] u8,
    tok_valid [B,R,doc_cap] bool). The low_memory streaming step: only these
    rerank rows ever cross host->device.
    """
    ispec = loaded.ispec
    doc_cap = ispec.doc_cap
    n_docs = len(loaded.host_doc_lengths)
    safe = np.clip(pids, 0, max(n_docs - 1, 0))
    lens = np.where(
        (pids < 0) | (pids >= n_docs), 0, loaded.host_doc_lengths[safe]
    )
    offs = loaded.host_doc_offsets[safe]
    iota = np.arange(doc_cap, dtype=np.int64)
    tok_valid = iota < lens[..., None]

    from fast_plaid_tpu import native

    flat_offs = offs.reshape(-1)
    flat_lens = lens.reshape(-1).astype(np.int32)
    res_nat = native.gather_windows_u8(
        loaded.host_residuals, flat_offs, flat_lens, doc_cap
    )
    codes_nat = native.gather_windows_u8(
        loaded.host_codes.view(np.uint8).reshape(-1, 4),
        flat_offs,
        flat_lens,
        doc_cap,
    )
    if res_nat is not None and codes_nat is not None:
        pd = loaded.host_residuals.shape[1]
        res_rows = res_nat.reshape(*pids.shape, doc_cap, pd)
        codes_rows = (
            codes_nat.reshape(-1).view(np.int32).reshape(*pids.shape, doc_cap)
        )
        return codes_rows, res_rows, tok_valid

    idx = offs[..., None] + iota
    t = loaded.host_codes.shape[0]
    idx = np.clip(idx, 0, max(t - 1, 0))
    codes_rows = loaded.host_codes[idx]
    res_rows = loaded.host_residuals[idx]
    return codes_rows, np.asarray(res_rows), tok_valid


def _lm_candidates(
    loaded: LoadedIndex,
    tile_dev,
    sub_dev,
    *,
    n_ivf_probe: int,
    n_full_scores: int,
    mem_budget: int,
    cand_cap: int | None,
    approx_mode: str,
    slot_budget: int | None = None,
    use_estimate_kernel: bool = False,
    pool_divisor: int = 2,
    rank_admit: int = 0,
):
    """Low_memory phase 1: dispatch the device candidate cascade (async)."""
    return candidates_core(
        loaded.dev,
        tile_dev,
        sub_dev,
        ispec=loaded.ispec,
        n_ivf_probe=n_ivf_probe,
        n_full_scores=n_full_scores,
        mem_budget=mem_budget,
        cand_cap=cand_cap,
        approx_mode=approx_mode,
        with_stats=True,
        slot_budget=slot_budget,
        use_estimate_kernel=use_estimate_kernel,
        pool_divisor=pool_divisor,
        rank_admit=rank_admit,
    )


def _lm_finish(
    loaded: LoadedIndex,
    tile_dev,
    p2,
    stats,
    rows,
    *,
    top_k: int,
    want_tokens: bool,
    mem_budget: int,
):
    """Low_memory phase 3: device rerank of pre-gathered host rows."""
    ispec = loaded.ispec
    codes_rows, res_rows, tok_valid = rows
    put = lambda x: jax.device_put(x, loaded.device)  # noqa: E731
    exact = rerank_rows_core(
        put(codes_rows),
        put(res_rows),
        put(tok_valid),
        p2,
        loaded.dev.centroids,
        loaded.dev.bucket_weights,
        tile_dev,
        nbits=ispec.nbits,
        sentinel_pid=ispec.sentinel_pid,
        mem_budget=mem_budget,
    )
    fp, fs = final_topk_core(exact, p2, top_k=top_k)
    if not want_tokens:
        return fp, fs, stats
    fp_np = np.asarray(fp)
    safe = np.where(fp_np < 0, ispec.sentinel_pid, fp_np)
    codes_k, res_k, valid_k = host_gather_rows(loaded, safe)
    tok = token_matrices_core(
        put(codes_k),
        put(res_k),
        put(valid_k),
        loaded.dev.centroids,
        loaded.dev.bucket_weights,
        tile_dev,
        nbits=ispec.nbits,
    )
    n_docs = len(loaded.host_doc_lengths)
    doc_lens = np.where(
        (fp_np < 0) | (fp_np >= n_docs),
        0,
        loaded.host_doc_lengths[np.clip(fp_np, 0, n_docs - 1)],
    )
    return fp, fs, tok, doc_lens, stats


def search_on_device(
    loaded: LoadedIndex,
    queries: list[np.ndarray],
    *,
    top_k: int,
    n_full_scores: int,
    n_ivf_probe: int,
    subsets: list[list[int]] | None,
    want_tokens: bool,
    mem_budget: int = 256 * 1024 * 1024,
    show_progress: bool = False,
    approx_mode: str = "cells",
    max_tile: int | None = None,
    pool_divisor: int | None = None,
    rank_admit: int | None = None,
) -> list:
    """Run the cascade for a list of queries on one device.

    Returns, per query, a list of (pid, score) tuples — or
    (pid, score, token_matrix [q_tokens, doc_tokens]) when ``want_tokens``.

    ``rank_admit``: admission tier for the budgeted cells estimator
    (engine.candidates_impl). None lets ``approx_mode="auto"`` pick it
    from IVF statistics (explicit modes default to 0 — unchanged
    behavior); an integer forces it.
    """
    ispec = loaded.ispec
    if not ispec.has_ivf:
        msg = (
            "This index was created with compress_only=True and has no IVF; "
            "search is unavailable (use get_embeddings)."
        )
        raise ValueError(msg)
    if not queries:
        return []
    # Per-query failure containment (reference behavior: a failing query
    # yields an empty result instead of aborting the batch,
    # rust/search/search.rs:252-268). A malformed or non-finite query is
    # zeroed out of the tile and reported as an empty result row, so one
    # poisoned query can't take down its whole batched tile.
    bad_queries: set[int] = set()
    cleaned: list[np.ndarray] = []
    for qi, q in enumerate(queries):
        a = np.asarray(q, dtype=np.float32)
        if a.ndim != 2 or a.shape[-1] != ispec.dim or not np.isfinite(a).all():
            bad_queries.add(qi)
            cleaned.append(np.zeros((0, ispec.dim), np.float32))
        else:
            cleaned.append(a)
    if len(bad_queries) == len(queries):
        # Uniformly malformed input is a caller error, not a per-query
        # failure — raise (e.g. every query has the wrong dimension).
        shapes = sorted({tuple(np.asarray(q).shape) for q in queries})
        msg = (
            f"All queries are invalid: expected [tokens, {ispec.dim}] "
            f"finite embeddings matching the index dimension; got shapes "
            f"{shapes[:4]}."
        )
        raise ValueError(msg)
    if bad_queries:
        import warnings

        preview = sorted(bad_queries)[:8]
        warnings.warn(
            f"{len(bad_queries)} quer{'y' if len(bad_queries) == 1 else 'ies'} "
            f"(indices {preview}{'...' if len(bad_queries) > 8 else ''}) had "
            f"non-finite values or a shape other than [tokens, {ispec.dim}]; "
            "returning empty results for them",
            RuntimeWarning,
            stacklevel=2,
        )
    batch, q_lens = _pad_queries(cleaned, ispec.dim)
    nq, q_cap, _ = batch.shape
    cand_cap = None
    slot_budget = None
    if loaded.ivf_lengths_host is not None:
        n_cells = min(q_cap * n_ivf_probe, ispec.n_partitions)
        cand_cap = candidate_capacity(
            loaded.ivf_lengths_host, n_cells, n_full_scores
        )
        # Hub-aware budget: giant stopword-style cells must not eat the
        # whole whole-cell slot budget (engine.suggest_slot_budget).
        slot_budget = suggest_slot_budget(
            loaded.ivf_lengths_host, n_full_scores
        )
    # Resolve "auto" (and size the budget for any admission tier) via the
    # shared policy — the sharded entry points call the same function, so
    # a corpus resolves identically on one chip and on the mesh. Policy
    # rationale lives on engine.resolve_approx_mode.
    from fast_plaid_tpu.search.engine import resolve_approx_mode

    approx_mode, rank_admit, slot_budget = resolve_approx_mode(
        approx_mode,
        loaded.ivf_lengths_host,
        q_cap=q_cap,
        n_ivf_probe=n_ivf_probe,
        n_full_scores=n_full_scores,
        n_partitions=ispec.n_partitions,
        cand_cap=cand_cap,
        rank_admit=rank_admit,
        slot_budget=slot_budget,
        n_docs=ispec.n_docs,
    )
    b_tile = _tile_size(ispec, q_cap, mem_budget, nq)
    if cand_cap is not None:
        b_tile = min(
            b_tile,
            suggest_query_tile(
                ispec, q_cap, cand_cap, slot_budget=slot_budget
            ),
        )
    if max_tile is not None:
        b_tile = min(b_tile, max(1, int(max_tile)))  # user memory hint
    # With the q4 prefilter cache resident, only the top ``rescue_pool``
    # rows per query cross host->device for the codec-exact rescore.
    exhaustive = n_ivf_probe >= ispec.n_partitions or (
        n_full_scores >= 2 * ispec.n_docs
    )
    # Exact-rerank pool R = n_full_scores // pool_divisor. The fused
    # rerank kernels are row-DMA-descriptor-bound, so rerank cost is
    # linear in R; /4 measures ~1.5x engine QPS but visibly narrows the
    # exact pool on unstructured corpora (SCALE.md pool-divisor table),
    # so the default stays at the recall-first /2 and /4 is opt-in
    # (explicit arg > FASTPLAID_POOL_DIV env > 2).
    if pool_divisor is None:
        pool_divisor = int(os.environ.get("FASTPLAID_POOL_DIV", "2"))
    pool_divisor = max(1, int(pool_divisor))
    lm_q4 = (
        loaded.low_memory
        and loaded.dev.emb_q4 is not None
        and not exhaustive
        and rescue_pool(top_k) < max(n_full_scores // pool_divisor, 1)
    )
    if loaded.low_memory:
        # Bound the streamed rerank-row buffers (codes i32 + residuals u8 +
        # valid u8 per token) by the memory budget instead of a fixed cap;
        # the pipeline keeps two tiles in flight, so each gets half.
        r_pool = (
            rescue_pool(top_k)
            if lm_q4
            else max(n_full_scores // pool_divisor, 1)
        )
        pd = loaded.host_residuals.shape[1] if loaded.host_residuals is not None else ispec.dim // 2
        per_q = r_pool * ispec.doc_cap * (pd + 5)
        b_tile = min(b_tile, max(1, (mem_budget // 2) // max(per_q, 1)))
    b_tile = max(1, min(b_tile, nq))

    results: list = []
    pruned_total = 0
    overflow_total = 0
    iterator = range(0, nq, b_tile)
    if show_progress and nq > b_tile:
        try:
            from tqdm import tqdm  # type: ignore[import-not-found]

            iterator = tqdm(iterator, desc="Searching")
        except ImportError:
            pass

    # Queries cross host->device at half width on accelerators: the API
    # path is H2D-bound on remote/PCIe links, and unit-norm query values
    # lose only ~5e-4 relative in float16 (the engine upcasts to f32 on
    # arrival). FASTPLAID_TPU_QUERY_F32=1 opts out.
    wire_dtype = (
        np.float16
        if loaded.device.platform != "cpu"
        and os.environ.get("FASTPLAID_TPU_QUERY_F32") != "1"
        else np.float32
    )

    def make_tile(start: int):
        end = min(start + b_tile, nq)
        tile = batch[start:end]
        if end - start < b_tile:  # pad tile to the static size
            tile = np.concatenate(
                [tile, np.zeros((b_tile - (end - start), q_cap, ispec.dim), np.float32)]
            )
        tile_dev = jax.device_put(tile.astype(wire_dtype), loaded.device)
        if subsets is not None:
            sub = _pad_subsets(subsets, ispec.n_docs, slice(start, end))
            if sub.shape[0] < b_tile:
                pad = np.full(
                    (b_tile - sub.shape[0], sub.shape[1]), ispec.n_docs, np.int32
                )
                sub = np.concatenate([sub, pad])
            sub_dev = jax.device_put(sub, loaded.device)
        else:
            sub_dev = None
        return end, tile_dev, sub_dev

    def emit(out, start: int, end: int) -> None:
        nonlocal pruned_total, overflow_total
        try:
            # One batched device->host fetch for the whole result tuple:
            # per-array np.asarray pays one device round trip EACH (~15 ms
            # on remote-attached devices — measured 1838 vs 2791 QPS at the
            # bench shape); jax.device_get coalesces them.
            out = jax.device_get(out)
            if want_tokens:
                pids, scores, tok, doc_lens, stats = out
            else:
                pids, scores, stats = out
                tok = doc_lens = None
        except Exception as exc:  # device-side failure: contain to this tile
            import warnings

            warnings.warn(
                f"search failed for queries [{start}, {end}) — returning "
                f"empty results for them: {exc}",
                RuntimeWarning,
                stacklevel=2,
            )
            results.extend([[] for _ in range(end - start)])
            return
        pruned_total += int(stats[: end - start, 0].sum())
        overflow_total += int(stats[: end - start, 1].sum())
        # Bulk ndarray->python conversion: one tolist() per tile instead of
        # b_tile*top_k scalar int()/float() calls (each is a numpy scalar
        # __index__/__float__ round trip; the emit loop is host-bound on
        # single-core bench hosts).
        pids_l = pids[: end - start].tolist()
        scores_l = scores[: end - start].tolist()
        for bi in range(end - start):
            if (start + bi) in bad_queries:
                results.append([])
                continue
            qlen = q_lens[start + bi]
            if want_tokens:
                row = []
                for ki, (pid, score) in enumerate(
                    zip(pids_l[bi], scores_l[bi])
                ):
                    if pid < 0:
                        continue
                    dlen = int(doc_lens[bi, ki])
                    mat = np.asarray(tok[bi, ki, :dlen, :qlen]).T.copy()
                    row.append((pid, score, mat))
            else:
                row = [
                    (pid, score)
                    for pid, score in zip(pids_l[bi], scores_l[bi])
                    if pid >= 0
                ]
            results.append(row)

    if loaded.low_memory:
        # Pipelined host/device overlap: the device candidate cascade for
        # tile i+1 is dispatched (async) before tile i's host row gather
        # completes, and the gather runs on a worker thread while the main
        # thread reranks earlier tiles — two tiles in flight, so neither
        # the host stream nor the device cascade serializes the other
        # (SURVEY §7's "prefetch that doesn't serialize the cascade"; the
        # reference instead streams per lookup, tensor.rs:299-304).
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def gather_stage(args):
            start, end, tile_dev, p2, stats = args
            rows = host_gather_rows(loaded, np.asarray(p2))
            return start, end, tile_dev, p2, stats, rows

        def finish_stage(start: int, end: int, fut) -> None:
            try:
                out = _lm_finish(
                    loaded,
                    *fut.result()[2:],
                    top_k=top_k,
                    want_tokens=want_tokens,
                    mem_budget=mem_budget,
                )
            except Exception as exc:  # contain gather/rerank failure to tile
                import warnings

                warnings.warn(
                    f"search failed for queries [{start}, {end}) — returning "
                    f"empty results for them: {exc}",
                    RuntimeWarning,
                    stacklevel=2,
                )
                results.extend([[] for _ in range(end - start)])
                return
            emit(out, start, end)

        est_kernel = (
            loaded.device.platform == "tpu"
            and os.environ.get("FASTPLAID_NO_ESTIMATE_KERNEL") != "1"
        )
        with ThreadPoolExecutor(max_workers=1) as pool:
            inflight: deque = deque()
            for start in iterator:
                end, tile_dev, sub_dev = make_tile(start)
                p2, stats = _lm_candidates(
                    loaded,
                    tile_dev,
                    sub_dev,
                    n_ivf_probe=n_ivf_probe,
                    n_full_scores=n_full_scores,
                    mem_budget=mem_budget,
                    cand_cap=cand_cap,
                    approx_mode=approx_mode,
                    slot_budget=slot_budget,
                    use_estimate_kernel=est_kernel,
                    pool_divisor=pool_divisor,
                    rank_admit=rank_admit,
                )
                if lm_q4:
                    # Phase 2: on-device q4 prefilter — only the rescue
                    # pool's rows are host-gathered and exact-rescored.
                    p2 = q4_prefilter_core(
                        loaded.dev,
                        p2,
                        tile_dev,
                        sentinel_pid=ispec.sentinel_pid,
                        pool=rescue_pool(top_k),
                        mem_budget=mem_budget,
                        use_kernel=(
                            loaded.device.platform == "tpu"
                            and os.environ.get("FASTPLAID_NO_RERANK_KERNEL")
                            != "1"
                        ),
                    )
                inflight.append(
                    (
                        start,
                        end,
                        pool.submit(
                            gather_stage, (start, end, tile_dev, p2, stats)
                        ),
                    )
                )
                if len(inflight) >= 2:
                    finish_stage(*inflight.popleft())
            while inflight:
                finish_stage(*inflight.popleft())
    else:
        # Fused Pallas rerank (gather+MaxSim in one VMEM pass) whenever the
        # decompressed-corpus cache is resident on a real TPU.
        use_kernel = (
            loaded.device.platform == "tpu"
            and (
                loaded.dev.emb_cache is not None
                or loaded.dev.emb_q4 is not None
            )
            and not loaded.dev.buckets
            and os.environ.get("FASTPLAID_NO_RERANK_KERNEL") != "1"
        )
        # Fused Pallas slot-estimate kernel (ops/estimate_kernel.py): no
        # cache requirement — any real-TPU cascade benefits.
        est_kernel = (
            loaded.device.platform == "tpu"
            and os.environ.get("FASTPLAID_NO_ESTIMATE_KERNEL") != "1"
        )
        # Dispatch ahead of conversion: emit() forces a device->host sync,
        # so converting tile i only after tile i+1 is dispatched keeps the
        # device busy (on remote-attached devices the per-sync round trip
        # otherwise dominates small-tile throughput).
        from collections import deque

        inflight: deque = deque()
        for start in iterator:
            end, tile_dev, sub_dev = make_tile(start)
            out = search_core(
                loaded.dev,
                tile_dev,
                sub_dev,
                ispec=ispec,
                top_k=top_k,
                n_ivf_probe=n_ivf_probe,
                n_full_scores=n_full_scores,
                want_tokens=want_tokens,
                mem_budget=mem_budget,
                cand_cap=cand_cap,
                approx_mode=approx_mode,
                with_stats=True,
                use_rerank_kernel=use_kernel,
                slot_budget=slot_budget,
                use_estimate_kernel=est_kernel,
                pool_divisor=pool_divisor,
                rank_admit=rank_admit,
            )
            # Start the device->host result copies NOW so that by the time
            # this tile reaches emit() (two dispatches later) the arrays
            # are already host-resident and device_get returns instantly.
            for leaf in out:
                try:
                    leaf.copy_to_host_async()
                except AttributeError:  # non-jax leaf (defensive)
                    pass
            inflight.append((out, start, end))
            if len(inflight) >= 3:
                emit(*inflight.popleft())
        while inflight:
            emit(*inflight.popleft())

    import threading

    # Evict entries for threads that no longer exist (long-lived servers
    # spawn/retire pool threads; without eviction the dict grows without
    # bound). Live thread idents are O(threads) to enumerate — cheap next
    # to a search call.
    live = {t.ident for t in threading.enumerate()}
    for ident in [k for k in _LAST_STATS if k not in live]:
        _LAST_STATS.pop(ident, None)
    _LAST_STATS[threading.get_ident()] = {
        # Legacy key: the pre-split meaning (TOTAL unscored slots).
        "dropped_candidate_slots": pruned_total + overflow_total,
        "budget_pruned_slots": pruned_total,
        "cap_overflow_slots": overflow_total,
        "queries": nq,
        "approx_mode": approx_mode,  # resolved ("auto" -> actual choice)
        "rank_admit": rank_admit,
    }
    if overflow_total:
        # Budget pruning (pruned_total) is the estimator working as
        # designed and never warns; only static-buffer truncation beyond
        # the budget's target — which can silently cost recall — does.
        import warnings

        warnings.warn(
            f"candidate buffer overflow: {overflow_total} candidate slots "
            f"(lowest-priority cells) truncated across {nq} queries beyond "
            "the slot budget's own pruning; raise mem_budget or cand_cap "
            "if recall matters more than memory",
            RuntimeWarning,
            stacklevel=2,
        )
    return results
