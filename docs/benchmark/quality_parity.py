"""Retrieval-quality parity harness: PLAID cascade vs exact search.

Hermetic (no network) analog of the reference's BEIR benchmark
(/root/reference/docs/benchmark/benchmark.py): generates a topic-model
corpus with ColBERT-like statistics, takes exhaustive MaxSim as ground
truth, and reports nDCG@10 / recall@k of

  * ``exact_decompressed`` — exhaustive MaxSim over the *compressed-then-
    decompressed* embeddings (isolates quantization loss), and
  * ``cascade_default`` — the full PLAID cascade at default parameters
    (adds candidate-generation/pruning loss on top).

The parity claim mirroring the reference's "FastPlaid == PLAID nDCG"
columns (README.md:306-338) is cascade ≈ exact_decompressed to ≤0.01
nDCG@10: approximate search costs nothing over exact search on the same
compressed representation.

Usage:  python docs/benchmark/quality_parity.py [--docs 5000] [--queries 200]
Writes docs/benchmark/results/quality_parity.json.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def run(
    n_docs: int,
    n_queries: int,
    dim: int,
    seed: int,
    device: str | None,
    generator: str = "topic",
    pool_divisor: int | None = None,
    doc_len: int | None = None,
    sweep_divisors: list[int] | None = None,
):
    from fast_plaid_tpu.evaluation import evaluate
    from fast_plaid_tpu.evaluation.synthetic import (
        colbert_proxy_corpus,
        exact_maxsim_topk,
        graded_qrels,
        topic_corpus,
        truth_qrels,
    )
    from fast_plaid_tpu.search import FastPlaid

    graded = generator == "colbert_proxy_graded"
    gen = topic_corpus if generator == "topic" else colbert_proxy_corpus
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    gen_kw = {}
    if doc_len is not None:
        # BEIR regime (reference benchmark.py:47 truncates documents at
        # 300 tokens): mean at the cap's neighborhood, capped at doc_len.
        gen_kw = {"mean_len": int(doc_len * 0.8), "max_len": int(doc_len)}
    if graded:
        # Graded-relevance protocol (the reference's actual one: BEIR
        # qrels, not exhaustive MaxSim — benchmark.py evaluates against
        # dataset qrels). 5 relevant docs per query with descending
        # term-match counts; the metric ceiling is what exhaustive
        # search over the same embeddings achieves.
        gen_kw["graded_targets"] = 5
    docs, queries, targets = gen(rng, n_docs, n_queries, dim=dim, **gen_kw)
    print(f"# corpus: {n_docs} docs / {n_queries} queries "
          f"({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    truth = exact_maxsim_topk(docs, queries, top_k=100)
    if graded:
        qids, qrels = graded_qrels(targets)
    else:
        qids, qrels = truth_qrels(truth, depth=10)
    print(f"# exact truth on raw embeddings ({time.perf_counter() - t0:.1f}s)")

    with tempfile.TemporaryDirectory() as tmp:
        engine = FastPlaid(index=os.path.join(tmp, "idx"), device=device)
        t0 = time.perf_counter()
        engine.create(documents_embeddings=docs, show_progress=False)
        build_s = time.perf_counter() - t0

        # Exact search over the same compressed representation: exhaustive
        # MaxSim on the decompressed embeddings (no candidate generation).
        t0 = time.perf_counter()
        recon = engine.get_embeddings(list(range(n_docs)))
        exact_dec = exact_maxsim_topk(recon, queries, top_k=100)
        exact_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        cascade = engine.search(
            queries,
            top_k=100,
            show_progress=False,
            pool_divisor=pool_divisor,
        )
        cascade_s = time.perf_counter() - t0

        # Optional rerank-pool sweep on the SAME index/truth: quality vs
        # pool size R = n_full_scores / divisor (the rerank stage is
        # descriptor-bound, so R is the dominant search-cost knob).
        sweep = {}
        for div in sweep_divisors or []:
            t0 = time.perf_counter()
            rows = engine.search(
                queries, top_k=100, show_progress=False, pool_divisor=div
            )
            sweep[div] = (rows, time.perf_counter() - t0)

    metrics = ["ndcg@10", "recall@10", "recall@100", "mrr@10"]

    def score(rows):
        fmt = [
            [{"id": str(p), "score": s} for p, s in row] for row in rows
        ]
        return evaluate(fmt, qrels, qids, metrics=metrics)

    out = {
        "corpus": {
            "n_docs": n_docs,
            "n_queries": n_queries,
            "dim": dim,
            "seed": seed,
            "generator": f"evaluation.synthetic.{generator}",
            "doc_len": doc_len,
            "pool_divisor": pool_divisor,
        },
        "truth": (
            "generator graded qrels (5 docs/query, relevance 5..1)"
            if graded
            else "exhaustive MaxSim on raw embeddings, qrels = top-10"
        ),
        "exact_raw": score(truth) if graded else None,
        "exact_decompressed": score(exact_dec),
        "cascade_default": score(cascade),
        "timing_s": {
            "index_build": round(build_s, 2),
            "exact_decompressed_search": round(exact_s, 2),
            "cascade_search": round(cascade_s, 2),
        },
    }
    out["parity"] = {
        "ndcg10_gap_cascade_vs_exact_decompressed": round(
            out["exact_decompressed"]["ndcg@10"]
            - out["cascade_default"]["ndcg@10"],
            4,
        ),
        "target": "<= 0.01",
    }
    if sweep:
        out["pool_divisor_sweep"] = {
            str(div): {
                **score(rows),
                "cascade_search_s": round(dt, 2),
                "ndcg10_gap_vs_exact_decompressed": round(
                    out["exact_decompressed"]["ndcg@10"]
                    - score(rows)["ndcg@10"],
                    4,
                ),
            }
            for div, (rows, dt) in sweep.items()
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default=None)
    ap.add_argument("--pool-divisor", type=int, default=None)
    ap.add_argument("--doc-len", type=int, default=None)
    ap.add_argument(
        "--sweep-divisors",
        default=None,
        help="comma-separated pool divisors to additionally evaluate on "
        "the same index + truth (e.g. 4,8)",
    )
    ap.add_argument("--out", default=None, help="result file name override")
    ap.add_argument(
        "--generator",
        default="topic",
        choices=["topic", "colbert_proxy", "colbert_proxy_graded"],
        help="corpus statistics: plain topic model or the ColBERT proxy "
        "(anisotropy + hub tokens + lexical query matches + MASK padding)",
    )
    args = ap.parse_args()
    out = run(
        args.docs, args.queries, args.dim, args.seed, args.device,
        generator=args.generator, pool_divisor=args.pool_divisor,
        doc_len=args.doc_len,
        sweep_divisors=(
            [int(x) for x in args.sweep_divisors.split(",")]
            if args.sweep_divisors
            else None
        ),
    )
    os.makedirs(os.path.join(os.path.dirname(__file__), "results"), exist_ok=True)
    name = args.out or (
        "quality_parity.json"
        if args.generator == "topic"
        else "quality_parity_colbert_proxy.json"
    )
    path = os.path.join(os.path.dirname(__file__), "results", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"# written to {path}")


if __name__ == "__main__":
    main()
