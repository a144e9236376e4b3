"""MS MARCO-scale streaming-build demonstrations (BASELINE.md scale target).

Two modes, both using index/streaming.py (the corpus never exists in full
anywhere — chunks are synthesized on device per doc range):

* ``--mode mesh8``: full 8.8M-document corpus, mesh-sharded over 8
  virtual CPU devices (reduced dim/len so one CPU core can compress it).
  Validates the doc-count-scale machinery: per-shard streaming builds,
  shard assembly, global id mapping, planted-duplicate retrieval.
* ``--mode chip``: largest single-real-chip volume (default 2M docs x
  ~48 tokens x d=128 = ~96M tokens, 8.2 GB residuals device-resident)
  with measured build time and search QPS.

Examples:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scale_run.py --mode mesh8 --docs 8800000
  python tools/scale_run.py --mode chip --docs 2000000
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def corpus_spec(n_docs: int, max_len: int, dim: int, seed: int):
    """Host doc lengths + a deterministic device chunk generator.

    Token t's embedding is a pure function of its GLOBAL index (per-row
    counter-based PRNG), so any [d0, d1) range regenerates exactly the
    tokens the build indexed — required for planted-duplicate checks and
    for the streaming builder's overlap-free chunking.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    lens = rng.integers(max(max_len * 3 // 4, 1), max_len + 1, n_docs).astype(
        np.int64
    )
    starts = np.concatenate([[0], np.cumsum(lens)])
    base_key = jax.random.PRNGKey(seed)

    @jax.jit
    def gen(token_ids):
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(token_ids)
        x = jax.vmap(
            lambda kk: jax.random.normal(kk, (dim,), jnp.float32)
        )(keys)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def chunk_gen(d0: int, d1: int) -> jax.Array:
        t0, t1 = int(starts[d0]), int(starts[d1])
        return gen(jnp.arange(t0, t1, dtype=jnp.uint32))

    return lens, starts, chunk_gen


def planted_queries(chunk_gen, starts, lens, pids, q_cap, dim):
    """Queries copied from document tokens: retrieval must return them."""
    qs = np.zeros((len(pids), q_cap, dim), np.float32)
    for i, pid in enumerate(pids):
        doc = np.asarray(chunk_gen(pid, pid + 1))
        qs[i, : min(len(doc), q_cap)] = doc[:q_cap]
    return qs


def run_mesh8(args):
    import jax
    from jax.sharding import Mesh

    from fast_plaid_tpu.index.streaming import build_sharded_index_streaming
    from fast_plaid_tpu.parallel.sharded import sharded_search

    devices = jax.devices()
    assert len(devices) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu (or a real 8-chip mesh)"
    )
    mesh = Mesh(np.array(devices[:8]), ("d",))
    lens, starts, chunk_gen = corpus_spec(args.docs, args.len, args.dim, 0)

    t0 = time.perf_counter()
    sharded = build_sharded_index_streaming(
        chunk_gen,
        lens,
        mesh,
        nbits=args.nbits,
        k=args.k,
        chunk_docs=args.chunk_docs,
        verbose=True,
    )
    build_s = time.perf_counter() - t0
    print(f"# sharded build: {build_s:.1f}s  ispec={sharded.ispec}")

    rng = np.random.default_rng(1)
    probe_pids = rng.integers(0, args.docs, 16)
    queries = planted_queries(
        chunk_gen, starts, lens, probe_pids, args.len, args.dim
    )
    t0 = time.perf_counter()
    pids, scores = sharded_search(
        sharded,
        queries,
        top_k=10,
        n_ivf_probe=args.probe,
        n_full_scores=args.full,
        approx_mode=args.approx,
    )
    pids = np.asarray(pids)
    search_s = time.perf_counter() - t0
    hit1 = float(np.mean(pids[:, 0] == probe_pids))
    hit10 = float(
        np.mean([probe_pids[i] in pids[i] for i in range(len(probe_pids))])
    )
    print(
        json.dumps(
            {
                "mode": "mesh8",
                "n_docs": args.docs,
                "n_shards": 8,
                "build_s": round(build_s, 1),
                "search_s_16q": round(search_s, 1),
                "planted_hit@1": hit1,
                "planted_hit@10": hit10,
            }
        )
    )
    assert hit1 >= 0.9, "planted-duplicate retrieval degraded"


def run_chip(args):
    import jax

    from fast_plaid_tpu.index.streaming import build_memory_index_streaming
    from fast_plaid_tpu.utils.sync import value_pull
    from fast_plaid_tpu.search.engine import (
        candidate_capacity,
        resolve_approx_mode,
        search_core,
        suggest_query_tile,
        suggest_slot_budget,
    )

    lens, starts, chunk_gen = corpus_spec(args.docs, args.len, args.dim, 0)
    t0 = time.perf_counter()
    dev, ispec = build_memory_index_streaming(
        chunk_gen,
        lens,
        nbits=args.nbits,
        k=args.k,
        chunk_docs=args.chunk_docs,
        sample_docs=args.sample_docs,
        # In-build q4 cache: allocated before the IVF phase's arena churn
        # (a post-build 6 GB contiguous request fails on fragmentation at
        # 2M docs with the capacity free).
        q4_cache=args.q4_cache,
        verbose=True,
    )
    value_pull(dev.codes)  # true completion (remote svc)
    if args.emb_cache:
        import gc

        gc.collect()  # drop build temporaries before the big cache alloc
        from fast_plaid_tpu.index.layout import build_emb_cache

        if args.free_residuals:
            # Rerank/token paths read only the cache; freeing the packed
            # residuals buys HBM headroom for the cache at large corpora
            # (get_embeddings' full-precision decompression is then
            # unavailable in this process).
            cache_dev = build_emb_cache(dev, ispec)
            dev = cache_dev._replace(residuals=None)
        else:
            dev = build_emb_cache(dev, ispec)
        value_pull(dev.emb_cache)  # true completion
    build_s = time.perf_counter() - t0
    print(f"# build: {build_s:.1f}s  {ispec} emb_cache={args.emb_cache}")

    ivf_lengths = np.asarray(dev.ivf_lengths)
    q_len = 32
    cand_cap = candidate_capacity(
        ivf_lengths, min(q_len * args.probe, ispec.n_partitions), args.full
    )
    slot_budget = suggest_slot_budget(ivf_lengths, args.full)
    tile_b = min(
        args.batch,
        suggest_query_tile(ispec, q_len, cand_cap, slot_budget=slot_budget),
    )

    import jax.numpy as jnp

    @jax.jit
    def gen_q(key):
        q = jax.random.normal(key, (tile_b, q_len, args.dim), jnp.float32)
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    use_kernel = (
        jax.devices()[0].platform == "tpu"
        and (dev.emb_cache is not None or dev.emb_q4 is not None)
        and os.environ.get("FASTPLAID_NO_RERANK_KERNEL") != "1"
    )
    est_kernel = (
        jax.devices()[0].platform == "tpu"
        and os.environ.get("FASTPLAID_NO_ESTIMATE_KERNEL") != "1"
    )

    def resolve(mode):
        # "auto" (and "cells@N" = cells with rank_admit N forced) resolve
        # through the shared policy, exactly as the API driver would.
        rank_admit = None
        if "@" in mode:
            mode, _, r = mode.partition("@")
            rank_admit = int(r)
        return resolve_approx_mode(
            mode,
            ivf_lengths,
            q_cap=q_len,
            n_ivf_probe=args.probe,
            n_full_scores=args.full,
            n_partitions=ispec.n_partitions,
            cand_cap=cand_cap,
            rank_admit=rank_admit,
            slot_budget=slot_budget,
        )

    def run(batch, mode, subset=None):
        mode, rank_admit, budget = resolve(mode)
        return search_core(
            dev,
            batch,
            subset,
            ispec=ispec,
            top_k=10,
            n_ivf_probe=args.probe,
            n_full_scores=args.full,
            want_tokens=False,
            cand_cap=cand_cap,
            mem_budget=256 << 20,
            approx_mode=mode,
            use_rerank_kernel=use_kernel,
            slot_budget=budget if mode != "cells_full" else slot_budget,
            use_estimate_kernel=est_kernel,
            pool_divisor=args.pool_div,
            rank_admit=rank_admit,
        )

    tiles = [gen_q(jax.random.PRNGKey(50 + i)) for i in range(4)]
    jax.block_until_ready(tiles)
    subset = None
    if args.subset_size:
        # Per-query random sorted subsets (the C5 filtered-search workload):
        # direct-pool regime when S <= 2 * (n_full_scores / pool_divisor),
        # density-scaled cascade beyond it (engine.search_impl).
        s_rng = np.random.default_rng(7)
        sub_np = np.sort(
            np.stack([
                s_rng.choice(args.docs, args.subset_size, replace=False)
                for _ in range(tile_b)
            ]).astype(np.int32),
            axis=-1,
        )
        subset = jnp.asarray(sub_np)
    for mode in (args.approx or "cells").split(","):
        # TRUE warmup: pull a value — through a remote-compile service,
        # block_until_ready returns early while compilation is in flight
        # (see bench.py), which would let compile tail (or worse, the
        # timed executions themselves) escape the timed region.
        float(np.asarray(run(tiles[0], mode, subset)[1]).ravel()[0])
        t0 = time.perf_counter()
        outs = [run(t, mode, subset) for t in tiles[1:]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 3
        qps = tile_b / dt

        # Planted-duplicate spot check (planted pid spliced into its
        # query's subset row when filtering, so hit@1 = 1.0 stays the
        # contract).
        rng = np.random.default_rng(2)
        probe_pids = rng.integers(0, args.docs, min(tile_b, 32))
        queries = planted_queries(
            chunk_gen, starts, lens, probe_pids, q_len, args.dim
        )
        qpad = np.zeros((tile_b, q_len, args.dim), np.float32)
        qpad[: len(queries)] = queries
        p_subset = subset
        if subset is not None:
            sub_pl = np.asarray(subset).copy()
            for i, pid in enumerate(probe_pids):
                if pid not in sub_pl[i]:
                    sub_pl[i, 0] = pid
            p_subset = jnp.asarray(np.sort(sub_pl, axis=-1))
        pids = np.asarray(
            run(jnp.asarray(qpad), mode, p_subset)[0]
        )[: len(probe_pids)]
        hit1 = float(np.mean(pids[:, 0] == probe_pids))
        r_mode, r_rank, r_budget = resolve(mode)
        print(
            json.dumps(
                {
                    "mode": "chip",
                    "n_docs": args.docs,
                    "n_tokens": int(lens.sum()),
                    "build_s": round(build_s, 1),
                    "approx": mode,
                    "resolved": f"{r_mode}@{r_rank}",
                    "slot_budget": r_budget,
                    "q4_cache": bool(args.q4_cache),
                    "emb_cache": bool(args.emb_cache),
                    "qps": round(qps, 1),
                    "batch": tile_b,
                    "planted_hit@1": hit1,
                    "device": str(jax.devices()[0]),
                }
            )
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["mesh8", "chip"], required=True)
    ap.add_argument("--docs", type=int, default=None)
    ap.add_argument("--len", type=int, default=None)
    ap.add_argument("--dim", type=int, default=None)
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--k", type=int, default=None)
    # 50k docs/chunk: ~2.2M-token compress temporaries. 100k chunks OOM a
    # 16 GB chip at 2M docs once the doc-major output buffers (6.5 GB) are
    # resident; 50k costs <2% extra build time (194 vs 198 s measured).
    ap.add_argument("--chunk-docs", type=int, default=50_000)
    ap.add_argument("--probe", type=int, default=8)
    ap.add_argument("--full", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--emb-cache", action="store_true")
    ap.add_argument(
        "--pool-div",
        type=int,
        default=2,
        help="exact-rerank pool divisor (R = n_full // pool_div)",
    )
    ap.add_argument(
        "--q4-cache",
        action="store_true",
        help="build the 4-bit prefilter cache (exact rescore of top slice)",
    )
    ap.add_argument("--sample-docs", type=int, default=None)
    ap.add_argument("--free-residuals", action="store_true")
    ap.add_argument(
        "--subset-size",
        type=int,
        default=None,
        help="per-query random subset size (chip mode): measures the "
        "filtered-search paths (direct pool / density-scaled cascade)",
    )
    ap.add_argument(
        "--approx",
        default=None,
        help=(
            "pruning estimator (cells/cells_full/tokens); chip mode "
            "accepts a comma list measured against one build; mesh8 "
            "defaults to 'tokens' (coarse-k)"
        ),
    )
    args = ap.parse_args()
    if args.mode == "mesh8":
        args.docs = args.docs or 8_800_000
        args.len = args.len or 4
        args.dim = args.dim or 16
        args.k = args.k or 256
        args.full = min(args.full, 512)
        # CPU-feasible k (256) makes cells coarse: ~17k docs/cell at 8.8M
        # docs, far beyond the slot budget, where the "cells" estimator
        # ties-and-truncates (engine.candidates_impl docstring). The
        # token-level estimator discriminates within cells.
        args.approx = args.approx or "tokens"
        run_mesh8(args)
    else:
        args.docs = args.docs or 2_000_000
        args.len = args.len or 64
        args.dim = args.dim or 128
        run_chip(args)


if __name__ == "__main__":
    main()
