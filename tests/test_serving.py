"""Serving layer: micro-batching correctness + the HTTP surface."""

from __future__ import annotations

import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from fast_plaid_tpu.search import FastPlaid
from fast_plaid_tpu.serving import MicroBatcher, make_server
from fast_plaid_tpu.testing import random_documents, random_queries

DIM = 32


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        calls = []

        def fake_search(queries, subsets, key):
            calls.append(len(queries))
            return [[(i, 1.0)] for i in range(len(queries))]

        mb = MicroBatcher(fake_search, max_batch=64, max_wait_ms=30)
        try:
            futs = [
                mb.submit([np.zeros((2, DIM))], ("k",)) for _ in range(10)
            ]
            outs = [f.result(timeout=10) for f in futs]
        finally:
            mb.close()
        assert all(len(o) == 1 for o in outs)
        # 10 single-query requests landed in far fewer dispatches.
        assert len(calls) < 10
        assert sum(calls) == 10
        snap = mb.stats.snapshot()
        assert snap["requests"] == 10 and snap["merged_batches"] >= 1

    def test_groups_by_params(self):
        keys_seen = []

        def fake_search(queries, subsets, key):
            keys_seen.append(key)
            return [[] for _ in queries]

        mb = MicroBatcher(fake_search, max_batch=8, max_wait_ms=10)
        try:
            fa = mb.submit([np.zeros((1, DIM))], ("a",))
            fb = mb.submit([np.zeros((1, DIM))], ("b",))
            fa.result(timeout=10), fb.result(timeout=10)
        finally:
            mb.close()
        assert set(keys_seen) == {("a",), ("b",)}

    def test_errors_propagate(self):
        def boom(queries, subsets, key):
            msg = "kaboom"
            raise ValueError(msg)

        mb = MicroBatcher(boom, max_batch=8, max_wait_ms=1)
        try:
            fut = mb.submit([np.zeros((1, DIM))], ("k",))
            with pytest.raises(ValueError, match="kaboom"):
                fut.result(timeout=10)
        finally:
            mb.close()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srv") / "idx")
    rng = np.random.default_rng(0)
    docs = random_documents(rng, 80, 12, DIM, variable=True)
    FastPlaid(index=path, device="cpu").create(documents_embeddings=docs)
    httpd, core = make_server(
        path, port=0, device="cpu", max_wait_ms=5
    )  # port=0 -> ephemeral
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, docs
    httpd.shutdown()
    core.close()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


class TestHTTP:
    def test_health(self, server):
        base, docs = server
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["n_docs"] == len(docs)

    def test_search_json_and_b64_match_engine(self, server):
        base, docs = server
        rng = np.random.default_rng(1)
        q = np.asarray(random_queries(rng, 3, 5, DIM))
        out = _post(base, "/v1/search", {"queries": q.tolist(), "top_k": 4})
        rows = out["results"]
        assert len(rows) == 3 and all(len(r) == 4 for r in rows)
        out2 = _post(
            base,
            "/v1/search",
            {
                "queries_b64": base64.b64encode(
                    q.astype(np.float32).tobytes()
                ).decode(),
                "shape": list(q.shape),
                "top_k": 4,
            },
        )
        assert out2["results"] == rows
        # Self-retrieval: query = a doc's own tokens.
        probe = docs[7][:5]
        out3 = _post(
            base, "/v1/search", {"queries": [probe.tolist()], "top_k": 3}
        )
        assert out3["results"][0][0]["id"] == 7

    def test_subset_and_errors(self, server):
        base, docs = server
        rng = np.random.default_rng(2)
        q = np.asarray(random_queries(rng, 2, 4, DIM))
        out = _post(
            base,
            "/v1/search",
            {"queries": q.tolist(), "top_k": 3, "subset": [[1, 2, 3], [4, 5]]},
        )
        ids0 = {hit["id"] for hit in out["results"][0]}
        ids1 = {hit["id"] for hit in out["results"][1]}
        assert ids0 <= {1, 2, 3} and ids1 <= {4, 5}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/v1/search", {"top_k": 3})
        assert ei.value.code == 400

    def test_concurrent_requests_batch(self, server):
        base, docs = server
        rng = np.random.default_rng(3)
        qs = [np.asarray(random_queries(rng, 1, 4, DIM)) for _ in range(12)]
        results = [None] * 12

        def hit(i):
            results[i] = _post(
                base, "/v1/search", {"queries": qs[i].tolist(), "top_k": 2}
            )

        threads = [
            threading.Thread(target=hit, args=(i,)) for i in range(12)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert all(r is not None for r in results)
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        # Coalescing happened: fewer dispatches than requests overall.
        assert h["batcher"]["dispatches"] < h["batcher"]["requests"]

    def test_update_delete_lifecycle(self, server):
        base, docs = server
        rng = np.random.default_rng(4)
        new = rng.standard_normal((2, 10, DIM)).astype(np.float32)
        flat = np.concatenate([new[0], new[1]])
        out = _post(
            base,
            "/v1/update",
            {
                "documents_b64": base64.b64encode(flat.tobytes()).decode(),
                "dim": DIM,
                "lengths": [10, 10],
            },
        )
        assert out["added"] == 2
        n_after = out["n_docs"]
        out2 = _post(base, "/v1/delete", {"subset": [0]})
        assert out2["n_docs"] == n_after - 1


class TestLanesAndMetrics:
    def test_interactive_lane_preempts_batch_lane(self):
        order = []
        gate = threading.Event()

        def slow_search(queries, subsets, key):
            order.append(key[0])
            if key[0] == "first":
                gate.wait(timeout=10)  # hold the dispatcher busy
            return [[] for _ in queries]

        mb = MicroBatcher(slow_search, max_batch=8, max_wait_ms=1)
        try:
            f0 = mb.submit([np.zeros((1, DIM))], ("first",))
            time.sleep(0.05)  # let the dispatcher pick it up and block
            # Enqueue batch-lane work FIRST, then interactive work.
            fb = [
                mb.submit([np.zeros((1, DIM))], ("bulk", i), lane=1)
                for i in range(3)
            ]
            fi = mb.submit([np.zeros((1, DIM))], ("urgent",), lane=0)
            gate.set()
            fi.result(timeout=10)
            for f in fb:
                f.result(timeout=10)
            f0.result(timeout=10)
        finally:
            mb.close()
        # The interactive request dispatched before every bulk one despite
        # arriving after them.
        assert order[1] == "urgent"
        snap = mb.stats.snapshot()
        assert snap["lane_requests"]["interactive"] == 2
        assert snap["lane_requests"]["batch"] == 3

    def test_latency_histogram_counts(self):
        def ok(queries, subsets, key):
            return [[] for _ in queries]

        mb = MicroBatcher(ok, max_batch=8, max_wait_ms=1)
        try:
            futs = [mb.submit([np.zeros((1, DIM))], ("k",)) for _ in range(5)]
            for f in futs:
                f.result(timeout=10)
        finally:
            mb.close()
        text = mb.stats.prometheus()
        assert "fastplaid_requests_total 5" in text
        assert 'le="+Inf"} 5' in text
        snap = mb.stats.snapshot()
        assert snap["avg_latency_ms"] >= 0

    def test_http_metrics_and_priority(self, server):
        base, docs = server
        rng = np.random.default_rng(9)
        q = np.asarray(random_queries(rng, 1, 4, DIM))
        _post(
            base,
            "/v1/search",
            {"queries": q.tolist(), "top_k": 2, "priority": "batch"},
        )
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "fastplaid_request_latency_seconds_bucket" in text
        assert 'fastplaid_lane_requests_total{lane="batch"}' in text
