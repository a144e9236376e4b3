"""low_memory vs device-resident QPS on the bench corpus (one chip).

Builds the 57,638-doc synthetic index once on device, then measures
search_on_device() in both residency modes over identical query batches:

* device-resident (+ decompressed-corpus cache + fused rerank kernel);
* low_memory — residuals/codes stay in host RAM, candidates stream
  through the pipelined host-gather/device-rerank overlap
  (search/searcher.py);
* low_memory + q4 tier — the int4 corpus cache stays on device (~1/4 the
  bf16 cache) and prefilters the rerank pool there, so only the
  ``rescue_pool(top_k)`` rows per query cross host->device for the
  codec-exact rescore instead of the full n_full_scores/2 pool
  (VERDICT r3 #7: the tier's ~30x stream shrink, measured).

The host token-major flats for low_memory are derived from the doc-major
device build by one fetch (production gets them from the on-disk index).

Usage: python tools/lm_bench.py [--docs 57638] [--queries 512]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=57_638)
    ap.add_argument("--len", type=int, default=160)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--q-len", type=int, default=32)
    args = ap.parse_args()

    import jax

    from fast_plaid_tpu import testing
    from fast_plaid_tpu.index.layout import build_emb_cache, build_q4_cache
    from fast_plaid_tpu.search.engine import rescue_pool
    from fast_plaid_tpu.search.load import LoadedIndex
    from fast_plaid_tpu.search.searcher import search_on_device

    flat, lens = testing.random_flat_corpus_device(
        0, args.docs, args.len, args.dim, variable=True
    )
    t0 = time.perf_counter()
    dev, ispec = testing.build_memory_index_flat(flat, lens, nbits=4)
    jax.block_until_ready(dev.codes)
    print(f"# built in {time.perf_counter() - t0:.1f}s: {ispec}", flush=True)
    del flat

    # Token-major host flats for the low_memory mode (one fetch; the
    # production path reads these straight from the on-disk chunks).
    t0 = time.perf_counter()
    from fast_plaid_tpu.ops.codec import packed_dim

    codes2d = np.asarray(dev.codes)
    lens_np = np.asarray(lens, np.int64)
    n = args.docs
    doc_cap = ispec.doc_cap
    pd = packed_dim(ispec.dim, ispec.nbits)
    res2d = np.asarray(dev.residuals).reshape(-1, doc_cap, pd)
    mask = np.arange(doc_cap)[None, :] < lens_np[:, None]
    host_codes = codes2d[:n][mask].astype(np.int32)
    host_residuals = res2d[:n][mask]
    host_doc_offsets = np.concatenate([[0], np.cumsum(lens_np)])[:-1]
    print(f"# host flats fetched in {time.perf_counter() - t0:.1f}s", flush=True)

    device = jax.devices()[0]
    ivf_lengths_host = np.asarray(dev.ivf_lengths)

    resident = LoadedIndex(
        build_emb_cache(dev, ispec),
        ispec,
        device,
        ivf_lengths_host=ivf_lengths_host,
    )
    lm_kwargs = dict(
        ivf_lengths_host=ivf_lengths_host,
        low_memory=True,
        host_codes=host_codes,
        host_residuals=host_residuals,
        host_doc_offsets=host_doc_offsets,
        host_doc_lengths=np.minimum(lens_np, doc_cap).astype(np.int64),
    )
    lm = LoadedIndex(
        dev._replace(residuals=None, emb_cache=None), ispec, device, **lm_kwargs
    )
    # q4 tier: int4 corpus cache device-resident, residuals host-resident.
    dev_q4 = build_q4_cache(dev, ispec)
    jax.block_until_ready(dev_q4.emb_q4)
    lm_q4 = LoadedIndex(
        dev_q4._replace(residuals=None, emb_cache=None),
        ispec,
        device,
        **lm_kwargs,
    )

    # Streamed host->device bytes per query for each low_memory mode:
    # r_pool candidate docs x doc_cap rows x (packed residual + i32 code
    # + valid byte) — searcher.py sizes its tile buffers with the same
    # arithmetic.
    pool_full = max(4096 // 2, 1)
    stream_bytes = lambda r_pool: int(r_pool) * doc_cap * (pd + 5)

    rng = np.random.default_rng(7)
    out = {}
    for name, loaded in (
        ("resident", resident),
        ("low_memory", lm),
        ("low_memory_q4", lm_q4),
    ):
        qs = [
            q / np.linalg.norm(q, axis=-1, keepdims=True)
            for q in rng.standard_normal(
                (args.queries, args.q_len, args.dim)
            ).astype(np.float32)
        ]
        search_on_device(  # warmup/compile on a small slice
            loaded, qs[:16], top_k=10, n_full_scores=4096, n_ivf_probe=8,
            subsets=None, want_tokens=False,
        )
        t0 = time.perf_counter()
        res = search_on_device(
            loaded, qs, top_k=10, n_full_scores=4096, n_ivf_probe=8,
            subsets=None, want_tokens=False,
        )
        dt = time.perf_counter() - t0
        assert len(res) == args.queries and res[0][0][0] >= 0
        out[name] = round(args.queries / dt, 1)
        print(f"# {name}: {out[name]} QPS", flush=True)

    out["ratio_resident_over_lm"] = round(
        out["resident"] / out["low_memory"], 2
    )
    out["q4_tier_speedup"] = round(
        out["low_memory_q4"] / out["low_memory"], 2
    )
    out["stream_bytes_per_query"] = stream_bytes(pool_full)
    out["stream_bytes_per_query_q4"] = stream_bytes(rescue_pool(10))
    out["stream_shrink_x"] = round(pool_full / rescue_pool(10), 1)
    out["n_docs"] = args.docs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
