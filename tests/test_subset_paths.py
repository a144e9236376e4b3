"""Subset fast paths: direct-pool exactness + density-scaled cascade.

The engine routes subset-restricted searches two ways (engine.py
search_impl): subsets that fit within 2x the exact-rerank pool are
exact-reranked wholesale (direct-subset pool — results must EQUAL
brute-force MaxSim over the decompressed subset), and larger subsets take
the budgeted cascade with a density-scaled slot budget plus membership
filtering at window granularity. Reference behavior being realized:
probe-restrict + sorted-merge intersection
(/root/reference/rust/search/search.rs:494-517, 544-547).
"""

import numpy as np
import pytest

from fast_plaid_tpu import search
from fast_plaid_tpu.testing import random_documents, random_queries

DIM = 48


def brute_force_scores(doc_embs, queries):
    out = []
    for q in queries:
        scores = []
        for d in doc_embs:
            sim = d @ q.T
            scores.append(sim.max(axis=0).sum())
        out.append(np.asarray(scores))
    return out


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    rng = np.random.default_rng(11)
    docs = random_documents(rng, 80, 12, DIM, variable=True)
    path = str(tmp_path_factory.mktemp("sub_small") / "idx")
    eng = search.FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 4, 6, DIM)
    return eng, docs, queries


def test_direct_pool_equals_subset_brute_force(small):
    """S <= 2*r_pool: results must be brute force restricted to the subset."""
    eng, docs, queries = small
    rng = np.random.default_rng(3)
    subsets = [sorted(rng.choice(80, size=17, replace=False).tolist())
               for _ in range(len(queries))]
    results = eng.search(
        queries, top_k=6, subset=subsets, show_progress=False
    )
    recon = eng.get_embeddings(list(range(80)))
    truth = brute_force_scores(recon, queries)
    for row, sub, t in zip(results, subsets, truth):
        order = [p for p in np.argsort(-t) if p in set(sub)]
        assert [p for p, _ in row] == order[: len(row)]
        for pid, score in row:
            assert abs(score - t[pid]) < 0.05


def test_direct_pool_unsorted_dup_subset(small):
    """The direct pool must tolerate unsorted / duplicated subset input."""
    eng, docs, queries = small
    messy = [9, 3, 3, 41, 7, 9, 60, 2]
    res_messy = eng.search(
        queries[:1], top_k=5, subset=messy, show_progress=False
    )[0]
    res_clean = eng.search(
        queries[:1], top_k=5, subset=sorted(set(messy)), show_progress=False
    )[0]
    assert [p for p, _ in res_messy] == [p for p, _ in res_clean]
    pids = [p for p, _ in res_messy]
    assert len(pids) == len(set(pids))  # duplicates must not repeat


@pytest.fixture(scope="module")
def mid(tmp_path_factory):
    rng = np.random.default_rng(23)
    docs = random_documents(rng, 400, 10, DIM, variable=True)
    path = str(tmp_path_factory.mktemp("sub_mid") / "idx")
    eng = search.FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 4, 6, DIM)
    return eng, docs, queries


def test_large_subset_cascade_membership_and_planted_hit(mid):
    """S > 2*r_pool: the density-scaled cascade path. Membership must be
    strict, and a planted duplicate inside the subset (query == the doc's
    own tokens, normalized embeddings -> maximal MaxSim) must come back at
    rank 1 — the same recall-safety property the `auto` policy pins
    unfiltered (test_resolve_policy)."""
    eng, docs, _ = mid
    rng = np.random.default_rng(5)
    planted = [37, 171, 266, 360]
    queries = [docs[p][:8].copy() for p in planted]
    subsets = []
    for p in planted:
        others = [x for x in rng.choice(400, size=200, replace=False) if x != p]
        subsets.append(sorted(others[:159] + [p]))
    # n_full_scores=64, pool_divisor=2 -> r_pool=32; S=160 > 64 -> cascade.
    results = eng.search(
        queries,
        top_k=5,
        subset=subsets,
        n_full_scores=64,
        show_progress=False,
    )
    for row, sub, p in zip(results, subsets, planted):
        got = [pid for pid, _ in row]
        assert all(pid in set(sub) for pid in got)
        assert got[0] == p


def test_large_subset_cascade_excludes_planted(mid):
    """Planted doc NOT in the subset: membership filtering must keep it
    out even though it is the corpus-wide top-1 for its query."""
    eng, docs, _ = mid
    rng = np.random.default_rng(9)
    planted = [37, 171]
    queries = [docs[p][:8].copy() for p in planted]
    subsets = [
        sorted(x for x in rng.choice(400, size=160, replace=False) if x != p)
        for p in planted
    ]
    results = eng.search(
        queries,
        top_k=5,
        subset=subsets,
        n_full_scores=64,
        show_progress=False,
    )
    for row, sub, p in zip(results, subsets, planted):
        got = [pid for pid, _ in row]
        assert p not in got
        assert all(pid in set(sub) for pid in got)
