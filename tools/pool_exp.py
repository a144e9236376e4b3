"""Measure engine QPS + top-10 agreement at pool_divisor 2/4/8 vs 1 on-chip.

Experiment tool behind the ``pool_divisor`` default (see SCALE.md): the exact
rerank pool is ``n_full_scores / pool_divisor`` and this script quantifies the
QPS/quality trade. Run manually on real hardware; not part of the test suite.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from fast_plaid_tpu.utils.sync import value_pull
from fast_plaid_tpu import testing
from fast_plaid_tpu.index.layout import build_emb_cache
from fast_plaid_tpu.search.engine import (
    candidate_capacity, search_core, suggest_query_tile, suggest_slot_budget,
)

n_docs, doc_len, dim, q_len = 57_638, 160, 128, 32
flat, doc_lengths = testing.random_flat_corpus_device(0, n_docs, doc_len, dim, variable=True)
value_pull(flat)
t0 = time.perf_counter()
dev, ispec = testing.build_memory_index_flat(flat, doc_lengths, nbits=4, seed=0, verbose=True)
del flat
value_pull(dev.codes)
print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
dev = build_emb_cache(dev, ispec)
value_pull(dev.emb_cache)

ivf_lengths = np.asarray(dev.ivf_lengths)
cand_cap = candidate_capacity(ivf_lengths, min(q_len * 8, ispec.n_partitions), 4096)
slot_budget = suggest_slot_budget(ivf_lengths, 4096)
tile_b = min(256, suggest_query_tile(ispec, q_len, cand_cap, slot_budget=slot_budget))

@jax.jit
def gen_queries(key):
    q = jax.random.normal(key, (tile_b, q_len, dim), dtype=jnp.float32)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

tiles = [gen_queries(jax.random.PRNGKey(100 + i)) for i in range(5)]
jax.block_until_ready(tiles)

def run(batch, divisor, nfs=4096):
    return search_core(
        dev, batch, None, ispec=ispec, top_k=10, n_ivf_probe=8,
        n_full_scores=nfs, want_tokens=False, cand_cap=cand_cap,
        mem_budget=1 << 30, use_rerank_kernel=True, slot_budget=slot_budget,
        use_estimate_kernel=True, pool_divisor=divisor,
    )

res = {}
for div in (2, 4, 8):
    float(np.asarray(run(tiles[0], div)[1]).ravel()[0])  # honest warmup
    t0 = time.perf_counter()
    outs = [run(t, div) for t in tiles]
    jax.block_until_ready(outs)
    el = time.perf_counter() - t0
    qps = 5 * tile_b / el
    res[div] = (qps, [np.asarray(o[0]) for o in outs], [np.asarray(o[1]) for o in outs])
    print(f"divisor {div}: {qps:.1f} qps", flush=True)

# Quality: top-10 pid overlap + score-mass of div-N vs div-1 (pool = full n_full_scores).
# Padding slots carry pid < 0 / -inf scores; exclude them from both metrics.
float(np.asarray(run(tiles[0], 1)[1]).ravel()[0])
truth = [(np.asarray(o[0]), np.asarray(o[1])) for o in [run(t, 1) for t in tiles]]
for div in (2, 4, 8):
    ov, mass = [], []
    for (tp, ts), pp, ps in zip(truth, res[div][1], res[div][2]):
        for r in range(tp.shape[0]):
            tvalid = tp[r][tp[r] >= 0]
            pvalid = set(pp[r][pp[r] >= 0].tolist())
            if len(tvalid) == 0:
                continue
            ov.append(len(set(tvalid.tolist()) & pvalid) / len(tvalid))
            tsc = ts[r][np.isfinite(ts[r])]
            psc = ps[r][np.isfinite(ps[r])]
            ideal = tsc.sum()
            mass.append(psc.sum() / ideal if ideal > 0 else 1.0)
    print(f"divisor {div}: overlap@10={np.mean(ov):.4f} score_mass={np.mean(mass):.5f} min_mass={np.min(mass):.5f}", flush=True)
