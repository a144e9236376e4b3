"""Developer profiling harness: per-stage timing of the search cascade.

Builds (once) and caches a bench-scale index under /tmp/fpt_profidx, then
times: candidate stage, full search, and the implied rerank cost, plus
optional micro-probes. Not part of the product API — a tool for kernel
work, so index rebuilds don't eat iteration time.

Usage: python tools/devprof.py [--docs 57638] [--trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_index(n_docs: int, dim: int = 128, doc_len: int = 160):
    import jax.numpy as jnp

    from fast_plaid_tpu import testing
    from fast_plaid_tpu.index.layout import DeviceIndex, IndexSpec

    cache = f"/tmp/fpt_profidx_{n_docs}_{dim}_v2.npz"  # v2: flat residuals
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=False)
        dev = DeviceIndex(
            centroids=jnp.asarray(z["centroids"]),
            bucket_weights=jnp.asarray(z["bucket_weights"]),
            codes=jnp.asarray(z["codes"]),
            residuals=jnp.asarray(z["residuals"]),
            doc_lengths=jnp.asarray(z["doc_lengths"]),
            ivf=jnp.asarray(z["ivf"]),
            ivf_offsets=jnp.asarray(z["ivf_offsets"]),
            ivf_lengths=jnp.asarray(z["ivf_lengths"]),
        )
        meta = z["ispec"]
        ispec = IndexSpec(*[
            int(meta[i]) if i != 6 else bool(meta[i]) for i in range(7)
        ])
        return dev, ispec

    flat, doc_lengths = testing.random_flat_corpus_device(
        0, n_docs, doc_len, dim, variable=True
    )
    t0 = time.perf_counter()
    dev, ispec = testing.build_memory_index_flat(
        flat, doc_lengths, nbits=4, seed=0, verbose=True
    )
    print(f"# built in {time.perf_counter() - t0:.1f}s; caching to {cache}")
    np.savez(
        cache,
        centroids=np.asarray(dev.centroids),
        bucket_weights=np.asarray(dev.bucket_weights),
        codes=np.asarray(dev.codes),
        residuals=np.asarray(dev.residuals),
        doc_lengths=np.asarray(dev.doc_lengths),
        ivf=np.asarray(dev.ivf),
        ivf_offsets=np.asarray(dev.ivf_offsets),
        ivf_lengths=np.asarray(dev.ivf_lengths),
        ispec=np.asarray(
            [
                ispec.dim,
                ispec.nbits,
                ispec.n_docs,
                ispec.n_partitions,
                ispec.doc_cap,
                ispec.cell_cap,
                int(ispec.has_ivf),
            ]
        ),
    )
    return dev, ispec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57638)
    ap.add_argument("--batch", type=int, default=0, help="0 = auto tile")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-emb-cache", action="store_true")
    args = ap.parse_args()

    import jax

    from fast_plaid_tpu import testing
    from fast_plaid_tpu.index.layout import build_emb_cache
    from fast_plaid_tpu.search.engine import (
        candidate_capacity,
        candidates_core,
        search_core,
        suggest_query_tile,
    )

    dev, ispec = get_index(args.docs)
    if not args.no_emb_cache:
        t0 = time.perf_counter()
        dev = build_emb_cache(dev, ispec)
        jax.block_until_ready(dev.emb_cache)
        print(f"# emb cache built in {time.perf_counter() - t0:.1f}s")
    print(f"# {ispec}")
    rng = np.random.default_rng(1)
    q_len = 32
    ivf_lengths = np.asarray(dev.ivf_lengths)
    cand_cap = candidate_capacity(
        ivf_lengths, min(q_len * 8, ispec.n_partitions), 4096
    )
    tile_b = args.batch or min(256, suggest_query_tile(ispec, q_len, cand_cap))
    print(f"# cand_cap={cand_cap} tile_b={tile_b}")

    tiles = [
        jax.device_put(
            np.asarray(testing.random_queries(rng, tile_b, q_len, 128))
        )
        for _ in range(args.reps)
    ]

    def t_stage(name, fn):
        jax.block_until_ready(fn(tiles[0]))  # warmup/compile
        t0 = time.perf_counter()
        outs = [fn(t) for t in tiles]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.reps
        print(
            f"{name:28s} {dt * 1e3:9.2f} ms/tile  "
            f"{tile_b / dt:9.1f} QPS"
        )
        return dt

    mem_budget = 1 << 30

    def cand_fn(q):
        return candidates_core(
            dev,
            q,
            None,
            ispec=ispec,
            n_ivf_probe=8,
            n_full_scores=4096,
            mem_budget=mem_budget,
            cand_cap=cand_cap,
        )

    use_kernel = (
        jax.devices()[0].platform == "tpu" and dev.emb_cache is not None
    )

    def full_fn(q):
        return search_core(
            dev,
            q,
            None,
            ispec=ispec,
            top_k=10,
            n_ivf_probe=8,
            n_full_scores=4096,
            want_tokens=False,
            mem_budget=mem_budget,
            cand_cap=cand_cap,
            use_rerank_kernel=use_kernel,
        )

    d_cand = t_stage("candidates (stages 1-5)", cand_fn)
    d_full = t_stage(f"full search (kernel={use_kernel})", full_fn)
    print(f"{'implied rerank (6-7)':28s} {(d_full - d_cand) * 1e3:9.2f} ms/tile")

    if args.trace:
        os.makedirs("/tmp/fpt_trace", exist_ok=True)
        with jax.profiler.trace("/tmp/fpt_trace"):
            jax.block_until_ready([full_fn(t) for t in tiles[:1]])
        print("# trace written to /tmp/fpt_trace")


if __name__ == "__main__":
    main()
