"""BEIR benchmark harness (capability parity with the reference's
docs/benchmark/benchmark.py).

Measures indexing time, QPS and retrieval quality (ndcg@10 etc.) for
fast_plaid_tpu on BEIR datasets, writing one JSON file per dataset.

Requires the optional `beir` package plus an encoder producing multi-vector
embeddings. Any encoder works; with `pylate` installed the reference model
(lightonai/GTE-ModernColBERT-v1 or answerdotai/answerai-colbert-small-v1)
is used. Run:

    python docs/benchmark/benchmark.py --dataset scifact --model \
        answerdotai/answerai-colbert-small-v1
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def encode_with_pylate(model_name: str, texts: list[str], is_query: bool):
    from pylate import models  # type: ignore[import-not-found]

    model = encode_with_pylate._cache.get(model_name)
    if model is None:
        model = models.ColBERT(model_name_or_path=model_name)
        encode_with_pylate._cache[model_name] = model
    return model.encode(
        texts, is_query=is_query, show_progress_bar=True, batch_size=32
    )


encode_with_pylate._cache = {}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="scifact")
    parser.add_argument(
        "--model", default="answerdotai/answerai-colbert-small-v1"
    )
    parser.add_argument("--top-k", type=int, default=20)
    parser.add_argument("--n-ivf-probe", type=int, default=8)
    parser.add_argument("--n-full-scores", type=int, default=4096)
    parser.add_argument("--output", default="results")
    parser.add_argument("--device", default=None)
    args = parser.parse_args()

    from fast_plaid_tpu import evaluation, search

    documents, queries, qrels, documents_ids = evaluation.load_beir(
        args.dataset, split="test"
    )
    doc_embeddings = encode_with_pylate(
        args.model, [d["text"] for d in documents], is_query=False
    )
    query_texts = list(queries.values()) if isinstance(queries, dict) else queries
    query_embeddings = encode_with_pylate(args.model, query_texts, is_query=True)

    index_path = f"bench_index_{args.dataset}"
    engine = search.FastPlaid(index=index_path, device=args.device)

    t0 = time.perf_counter()
    engine.create(documents_embeddings=[np.asarray(d) for d in doc_embeddings])
    index_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = engine.search(
        queries_embeddings=[np.asarray(q) for q in query_embeddings],
        top_k=args.top_k,
        n_ivf_probe=args.n_ivf_probe,
        n_full_scores=args.n_full_scores,
        show_progress=False,
    )
    search_s = time.perf_counter() - t0
    qps = len(query_texts) / search_s

    scores = [
        [{"id": documents_ids[pid], "score": s} for pid, s in row]
        for row in results
    ]
    metrics = evaluation.evaluate(
        scores=scores,
        qrels=qrels,
        queries=query_texts,
        metrics=["ndcg@10", "recall@10", "recall@100", "hits@1"],
    )

    os.makedirs(args.output, exist_ok=True)
    out = {
        "dataset": args.dataset,
        "model": args.model,
        "num_documents": len(documents),
        "num_queries": len(query_texts),
        "indexing_time_s": round(index_s, 2),
        "qps": round(qps, 2),
        **{k: round(v, 4) for k, v in metrics.items()},
    }
    path = os.path.join(args.output, f"{args.dataset}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
