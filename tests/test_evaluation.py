"""Unit tests for the owned ranking metrics (evaluation module)."""

import math

from fast_plaid_tpu import evaluation


def test_metrics_simple_case():
    scores = [
        [{"id": "a", "score": 0.9}, {"id": "b", "score": 0.8},
         {"id": "c", "score": 0.7}],
        [{"id": "x", "score": 0.5}, {"id": "y", "score": 0.4}],
    ]
    qrels = {"q1": {"a": 1, "c": 1}, "q2": {"y": 1}}
    queries = ["q1", "q2"]
    out = evaluation.evaluate(
        scores, qrels, queries,
        metrics=["ndcg@3", "hits@1", "recall@2", "mrr@3", "precision@2", "map@3"],
    )
    # q1: gains [1,0,1]; dcg = 1 + 1/log2(4); idcg = 1 + 1/log2(3)
    ndcg_q1 = (1 + 1 / math.log2(4)) / (1 + 1 / math.log2(3))
    # q2: gains [0,1]; dcg = 1/log2(3); idcg = 1
    ndcg_q2 = 1 / math.log2(3)
    assert abs(out["ndcg@3"] - (ndcg_q1 + ndcg_q2) / 2) < 1e-9
    assert out["hits@1"] == 0.5  # q1 hit at rank 1, q2 not
    assert out["recall@2"] == (0.5 + 1.0) / 2
    assert abs(out["mrr@3"] - (1.0 + 0.5) / 2) < 1e-9
    assert out["precision@2"] == (0.5 + 0.5) / 2
    # map: q1 = (1/1 + 2/3)/2 ; q2 = (1/2)/1
    assert abs(out["map@3"] - ((1 + 2 / 3) / 2 + 0.5) / 2) < 1e-9


def test_add_duplicates():
    queries = ["a", "b", "a"]
    scores = [[{"id": "1", "score": 1.0}], [{"id": "2", "score": 1.0}]]
    out = evaluation.add_duplicates(queries, scores)
    assert len(out) == 3
    assert out[0] == out[2]


def test_unknown_metric_raises():
    import pytest

    with pytest.raises(ValueError):
        evaluation.evaluate(
            [[{"id": "a", "score": 1.0}]], {"q": {"a": 1}}, ["q"],
            metrics=["bogus@5"],
        )
