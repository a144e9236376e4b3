"""Request coalescing for the batch-first search engine.

The cascade amortizes dispatch over query batches (one jitted program per
tile — bench.py measures ~17x single-query throughput at batch 256), so a
server must merge concurrent single-query requests into shared tiles.
``MicroBatcher`` queues (queries, params) pairs and a dispatcher thread
drains the queue into one ``engine.search`` call per distinct parameter
set, up to ``max_batch`` queries per dispatch, waiting at most
``max_wait_ms`` for stragglers once a request is pending.

No analog in the reference (its serving story is "call search() from your
own process"); this is the deployment shape SURVEY §7 targets.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

__all__ = ["MicroBatcher", "BatchStats"]


@dataclass
class BatchStats:
    requests: int = 0
    queries: int = 0
    dispatches: int = 0
    merged_batches: int = 0  # dispatches serving >1 request
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "requests": self.requests,
                "queries": self.queries,
                "dispatches": self.dispatches,
                "merged_batches": self.merged_batches,
                "avg_batch": round(self.queries / max(self.dispatches, 1), 2),
            }


class _Pending:
    __slots__ = ("queries", "subsets", "future", "n")

    def __init__(self, queries, subsets, future):
        self.queries = queries  # list of [Lq, D] arrays
        self.subsets = subsets  # list[list[int]] | None (aligned) or None
        self.future = future
        self.n = len(queries)


class MicroBatcher:
    """Coalesce search requests; one engine.search per (params) group.

    ``search_fn(queries, subsets, params_key) -> list`` runs the actual
    search; ``params_key`` is the hashable parameter tuple the requests
    were grouped by.
    """

    def __init__(
        self,
        search_fn,
        *,
        max_batch: int = 256,
        max_wait_ms: float = 2.0,
    ):
        self._search_fn = search_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.stats = BatchStats()
        self._queues: dict[tuple, list[_Pending]] = {}
        self._cv = threading.Condition()
        self._closed = False
        self._thread = threading.Thread(
            target=self._loop, name="fastplaid-batcher", daemon=True
        )
        self._thread.start()

    def submit(self, queries, params_key: tuple, subsets=None) -> Future:
        """Enqueue a request; resolves to its list of per-query results."""
        fut: Future = Future()
        pend = _Pending(list(queries), subsets, fut)
        with self._cv:
            if self._closed:
                msg = "batcher is closed"
                raise RuntimeError(msg)
            self._queues.setdefault(params_key, []).append(pend)
            self._cv.notify()
        return fut

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join(timeout=5)

    # -- dispatcher -------------------------------------------------------

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queues and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queues:
                    return
            # Linger briefly so concurrent requests share the dispatch.
            if self.max_wait_s > 0:
                time.sleep(self.max_wait_s)
            with self._cv:
                if not self._queues:
                    continue
                key = next(iter(self._queues))
                batch: list[_Pending] = []
                total = 0
                q = self._queues[key]
                while q and total + q[0].n <= self.max_batch:
                    p = q.pop(0)
                    batch.append(p)
                    total += p.n
                if not batch and q:  # single oversized request
                    batch.append(q.pop(0))
                    total = batch[0].n
                if not q:
                    del self._queues[key]
            if not batch:
                continue
            self._dispatch(key, batch, total)

    def _dispatch(self, key: tuple, batch: list[_Pending], total: int):
        queries = [qq for p in batch for qq in p.queries]
        subsets = None
        if any(p.subsets is not None for p in batch):
            subsets = []
            for p in batch:
                subsets.extend(
                    p.subsets if p.subsets is not None else [None] * p.n
                )
        try:
            results = self._search_fn(queries, subsets, key)
        except Exception as exc:  # propagate to every caller
            for p in batch:
                p.future.set_exception(exc)
            return
        with self.stats._lock:
            self.stats.requests += len(batch)
            self.stats.queries += total
            self.stats.dispatches += 1
            self.stats.merged_batches += 1 if len(batch) > 1 else 0
        off = 0
        for p in batch:
            p.future.set_result(results[off : off + p.n])
            off += p.n
