"""Retrieval quality on clustered synthetic data.

Random Gaussian corpora have no structure to retrieve; here documents are
drawn from a Gaussian-mixture topic model and queries are noisy samples of
a target document's tokens, so true rankings are meaningful. Both pruning
estimators must reach high recall vs uncompressed brute-force MaxSim —
the quality anchor behind the cells-mode default (PARITY.md deviation 3).
"""

import numpy as np
import pytest

from fast_plaid_tpu import search

DIM = 48
N_TOPICS = 12


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    topics = _unit(rng.standard_normal((N_TOPICS, DIM)).astype(np.float32))
    docs = []
    for _ in range(400):
        t = topics[rng.integers(0, N_TOPICS)]
        ln = int(rng.integers(8, 20))
        toks = _unit(
            (t[None, :] + 0.7 * rng.standard_normal((ln, DIM))).astype(
                np.float32
            )
        )
        docs.append(toks)
    # queries: noisy versions of random documents' token subsets
    queries, targets = [], []
    for _ in range(12):
        pid = int(rng.integers(0, len(docs)))
        base = docs[pid]
        sel = rng.choice(base.shape[0], size=min(6, base.shape[0]), replace=False)
        q = _unit(
            (base[sel] + 0.25 * rng.standard_normal((len(sel), DIM))).astype(
                np.float32
            )
        )
        queries.append(q)
        targets.append(pid)
    return docs, queries, targets


def _brute(docs, queries, k):
    out = []
    for q in queries:
        scores = np.asarray([(d @ q.T).max(axis=0).sum() for d in docs])
        out.append(np.argsort(-scores)[:k])
    return out


@pytest.mark.parametrize("mode", ["cells", "tokens"])
def test_recall_vs_uncompressed(corpus, tmp_path_factory, mode):
    docs, queries, targets = corpus
    path = str(tmp_path_factory.mktemp(f"q_{mode}") / "idx")
    eng = search.FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs)
    res = eng.search(
        queries, top_k=10, show_progress=False, approx_mode=mode
    )
    truth = _brute(docs, queries, 10)
    hits = total = 0
    target_found = 0
    for row, t, tgt in zip(res, truth, targets):
        got = {p for p, _ in row}
        hits += len(got & set(t.tolist()))
        total += 10
        if tgt in {p for p, _ in row[:3]}:
            target_found += 1
    recall = hits / total
    assert recall >= 0.7, f"{mode}: recall@10 {recall:.2f}"
    assert target_found >= 10, f"{mode}: target found in top3 {target_found}/12"
