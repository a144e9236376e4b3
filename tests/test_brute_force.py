"""Recall-vs-exhaustive correctness: with full probing, the cascade's top
results must match a brute-force MaxSim over DECOMPRESSED documents, and
approach the true (uncompressed) ranking in recall.

This is coverage the reference lacks (SURVEY.md §4 lists it as an
addition): the end-to-end numerical anchor beyond the token-matrix
identity.
"""

import numpy as np
import pytest

from fast_plaid_tpu import search
from fast_plaid_tpu.testing import random_documents, random_queries

DIM = 48


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    docs = random_documents(rng, 60, 14, DIM, variable=True)
    path = str(tmp_path_factory.mktemp("bf") / "idx")
    eng = search.FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 5, 6, DIM)
    return eng, docs, queries


def brute_force_scores(doc_embs, queries):
    """True MaxSim over given document embeddings: [n_docs] per query."""
    out = []
    for q in queries:
        scores = []
        for d in doc_embs:
            sim = d @ q.T  # [Ld, Lq]
            scores.append(sim.max(axis=0).sum())
        out.append(np.asarray(scores))
    return out


def test_full_probe_matches_brute_force_on_decompressed(setup):
    eng, docs, queries = setup
    n_docs = len(docs)
    # Exhaustive probing: every cell, every doc becomes a candidate.
    k = eng.indices[str(eng.devices[0])].ispec.n_partitions
    results = eng.search(
        queries,
        top_k=5,
        n_ivf_probe=k,
        n_full_scores=4 * n_docs,
        show_progress=False,
    )
    recon = eng.get_embeddings(list(range(n_docs)))
    truth = brute_force_scores(recon, queries)
    for row, t in zip(results, truth):
        order = np.argsort(-t)
        for rank, (pid, score) in enumerate(row):
            assert pid == order[rank]
            assert abs(score - t[pid]) < 0.05


def test_default_probe_recall_vs_uncompressed_truth(setup):
    """recall@5 of the default config vs exact uncompressed MaxSim >= 0.8."""
    eng, docs, queries = setup
    results = eng.search(queries, top_k=5, show_progress=False)
    truth = brute_force_scores(docs, queries)
    hits = total = 0
    for row, t in zip(results, truth):
        true_top = set(np.argsort(-t)[:5].tolist())
        got = {p for p, _ in row}
        hits += len(true_top & got)
        total += 5
    assert hits / total >= 0.8
