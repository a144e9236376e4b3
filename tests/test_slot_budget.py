"""Hub-aware slot budget + chunked-window candidate path.

The budgeted cells path takes whole cells in descending total-score
order until a slot budget fills. Real corpora have giant hub cells
(stopwords) that rank top for every query; without the budget extension
they eat the base budget and truncate the discriminating content cells
(the ColBERT-proxy regression this fixes: recall@100 0.89 -> 0.97).
"""

from __future__ import annotations

import numpy as np
import pytest

from fast_plaid_tpu.search.engine import suggest_slot_budget


class TestSuggestSlotBudget:
    def test_uniform_cells_keep_base_budget(self):
        lens = np.full(4096, 30, np.int64)
        assert suggest_slot_budget(lens, 4096) == 4096

    def test_mild_variance_keeps_near_base(self):
        rng = np.random.default_rng(0)
        lens = rng.poisson(30, 4096).astype(np.int64)
        b = suggest_slot_budget(lens, 4096)
        # Poisson tails have tiny excess over the median.
        assert 4096 <= b <= 4096 + 512

    def test_zipf_hubs_extend_budget(self):
        lens = np.full(4096, 30, np.int64)
        lens[:8] = 1000  # stopword-style hub cells
        b = suggest_slot_budget(lens, 4096)
        # top-16 excess over the uniform expectation: 8 hubs + 8 normals.
        assert b == 4096 + 8 * (1000 - 30)

    def test_extension_capped_at_4x(self):
        lens = np.full(4096, 30, np.int64)
        lens[:8] = 10**6  # extreme hubs hit the 4x cap
        assert suggest_slot_budget(lens, 4096) == 4096 + 4 * 4096

    def test_uniform_giants_no_extension(self):
        # A coarse-k index (every cell huge) is not hub skew: the excess
        # over the median is zero and the base budget stands (the auto
        # estimator's cells_full crossover owns that regime).
        lens = np.full(64, 10**6, np.int64)
        assert suggest_slot_budget(lens, 4096) == 4096

    def test_empty(self):
        assert suggest_slot_budget(np.zeros(0, np.int64), 1000) == 1024

    def test_rounding(self):
        lens = np.full(128, 5, np.int64)
        assert suggest_slot_budget(lens, 1000) == 1024  # k2 rounds to 128


class TestHubCorpusRetrieval:
    """End-to-end: hub cells must not evict content cells from the pool."""

    @pytest.fixture(scope="class")
    def hub_index(self, tmp_path_factory):
        from fast_plaid_tpu.search import FastPlaid

        rng = np.random.default_rng(5)
        dim = 64
        # 400 docs: 60% hub tokens drawn from 4 near-identical vectors
        # (giant shared cells), 40% doc-unique content tokens.
        hubs = rng.standard_normal((4, dim)).astype(np.float32)
        hubs /= np.linalg.norm(hubs, axis=-1, keepdims=True)
        docs = []
        for _ in range(400):
            n = int(rng.integers(20, 40))
            tok = rng.standard_normal((n, dim)).astype(np.float32)
            tok /= np.linalg.norm(tok, axis=-1, keepdims=True)
            is_hub = rng.random(n) < 0.6
            hub_ids = rng.integers(0, 4, is_hub.sum())
            tok[is_hub] = hubs[hub_ids] + 0.01 * rng.standard_normal(
                (is_hub.sum(), dim)
            ).astype(np.float32)
            tok /= np.linalg.norm(tok, axis=-1, keepdims=True)
            docs.append(tok)
        path = str(tmp_path_factory.mktemp("hub") / "idx")
        eng = FastPlaid(index=path, device="cpu")
        eng.create(documents_embeddings=docs, show_progress=False)
        return eng, docs

    def test_planted_queries_hit_targets(self, hub_index):
        eng, docs = hub_index
        rng = np.random.default_rng(11)
        targets = rng.integers(0, len(docs), 12)
        # Queries: half near-copies of the target's CONTENT tokens, half
        # hub tokens (the adversarial mix — hub cells score top for the
        # hub half of every query).
        queries = []
        for t in targets:
            d = docs[t]
            src = rng.integers(0, len(d), 16)
            q = d[src] + 0.02 * rng.standard_normal((16, d.shape[1])).astype(
                np.float32
            )
            queries.append(q / np.linalg.norm(q, axis=-1, keepdims=True))
        res = eng.search(
            queries, top_k=5, n_full_scores=256, show_progress=False
        )
        hits = sum(int(r[0][0]) == int(t) for r, t in zip(res, targets))
        assert hits >= 11, (hits, [(r[0][0], t) for r, t in zip(res, targets)])
