"""nDCG parity of the PLAID cascade vs exact search (small-scale pin).

The committed large run lives in docs/benchmark/results/quality_parity.json;
this test keeps the invariant enforced in CI at a size the CPU backend
handles in seconds: on a structured (topic-model) corpus, default-parameter
cascade search must match exhaustive search over the same compressed
representation to within 0.02 nDCG@10, and beat 0.9 agreement with the
uncompressed exact truth.
"""

import numpy as np
import pytest

from fast_plaid_tpu.evaluation import evaluate
from fast_plaid_tpu.evaluation.synthetic import (
    exact_maxsim_topk,
    topic_corpus,
    truth_qrels,
)
from fast_plaid_tpu.search import FastPlaid


def _score(rows, qrels, qids):
    fmt = [[{"id": str(p), "score": s} for p, s in row] for row in rows]
    return evaluate(fmt, qrels, qids, metrics=["ndcg@10", "recall@10"])


@pytest.mark.slow
def test_cascade_ndcg_parity_with_exact(test_index_path):
    rng = np.random.default_rng(42)
    docs, queries, _ = topic_corpus(
        rng, n_docs=600, n_queries=40, dim=64, mean_len=40, max_len=90, q_len=12
    )
    truth = exact_maxsim_topk(docs, queries, top_k=50)
    qids, qrels = truth_qrels(truth, depth=10)

    engine = FastPlaid(index=test_index_path, device="cpu")
    engine.create(documents_embeddings=docs, show_progress=False)

    # Exact search over the same compressed representation: exhaustive
    # MaxSim on the decompressed embeddings (no candidate generation).
    recon = engine.get_embeddings(list(range(len(docs))))
    exact_dec = exact_maxsim_topk(recon, queries, top_k=50)
    cascade = engine.search(queries, top_k=50, show_progress=False)

    m_exact = _score(exact_dec, qrels, qids)
    m_cascade = _score(cascade, qrels, qids)

    # The cascade must not lose quality relative to exhaustive search over
    # the same compressed index (the reference's core parity claim).
    assert m_cascade["ndcg@10"] >= m_exact["ndcg@10"] - 0.02, (
        m_cascade,
        m_exact,
    )
    # And both must actually agree with the uncompressed exact ranking on
    # structured data (quantization at nbits=4 costs little).
    assert m_exact["ndcg@10"] >= 0.9, m_exact
    assert m_cascade["ndcg@10"] >= 0.9, m_cascade
