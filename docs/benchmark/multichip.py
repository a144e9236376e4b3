"""Multi-chip scaling benchmark (parity with the reference's multigpus.py).

Measures doc-sharded SPMD search QPS across a device mesh on a synthetic
corpus, comparing 1-chip vs N-chip throughput.

    python docs/benchmark/multichip.py --n-devices 4 --n-docs 100000
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-devices", type=int, default=None)
    parser.add_argument("--n-docs", type=int, default=50_000)
    parser.add_argument("--doc-len", type=int, default=160)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--n-queries", type=int, default=256)
    parser.add_argument("--top-k", type=int, default=10)
    args = parser.parse_args()

    import jax

    from fast_plaid_tpu import parallel, testing
    from fast_plaid_tpu.index.builder import (
        compress_documents,
        train_codec_from_documents,
    )
    from fast_plaid_tpu.ops.kmeans import (
        num_partitions_heuristic,
        train_kmeans,
    )

    rng = np.random.default_rng(0)
    docs = testing.random_documents(
        rng, args.n_docs, args.doc_len, args.dim, variable=True
    )
    queries = testing.random_queries(rng, args.n_queries, 32, args.dim)

    flat = np.concatenate(docs)
    k = min(num_partitions_heuristic(flat.shape[0]), flat.shape[0])
    centroids = train_kmeans(flat, k=k, niters=4, seed=0)
    params = train_codec_from_documents(docs, centroids, 4, 0)
    codes, packed = compress_documents(docs, centroids, params.bucket_cutoffs, 4)
    doc_lengths = np.asarray([d.shape[0] for d in docs], np.int64)

    mesh = parallel.make_mesh(n_devices=args.n_devices)
    sharded = parallel.build_sharded_index(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        nbits=4,
        mesh=mesh,
    )
    q = jax.device_put(queries)
    out = parallel.sharded_search(sharded, q, top_k=args.top_k)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = parallel.sharded_search(sharded, q, top_k=args.top_k)
    jax.block_until_ready(out)
    qps = reps * args.n_queries / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "mesh": dict(mesh.shape),
                "n_docs": args.n_docs,
                "qps": round(qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
