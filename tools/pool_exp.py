"""Measure engine QPS + top-10 agreement across pool_divisor values on-chip.

Experiment tool behind the ``pool_divisor`` default (see SCALE.md): the exact
rerank pool is ``n_full_scores / pool_divisor`` and this script quantifies the
QPS/quality trade. The run configuration is the PRODUCTION one — approx_mode
resolved through engine.resolve_approx_mode (the same policy the public API
and bench use), so at the bench shape the measurement covers the rank-admitted
tier a default user actually gets. Quality is measured three ways per divisor:

* top-10 pid overlap + score mass vs divisor=1 (pool = full n_full_scores);
* planted verbatim-probe hit@1 (candidate-generation health);
* minimum per-query score mass (worst case, not the mean).

Run manually on real hardware; not part of the test suite.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from fast_plaid_tpu.utils.sync import value_pull
from fast_plaid_tpu import testing
from fast_plaid_tpu.index.layout import build_emb_cache
from fast_plaid_tpu.search.engine import (
    candidate_capacity, resolve_approx_mode, search_core, suggest_query_tile,
)

n_docs, doc_len, dim, q_len = 57_638, 160, 128, 32
flat, doc_lengths = testing.random_flat_corpus_device(0, n_docs, doc_len, dim, variable=True)
value_pull(flat)

# Planted probes: verbatim copies of document token prefixes (bench.py).
n_probes = 64
probe_rng = np.random.default_rng(7)
probe_pids = probe_rng.integers(0, n_docs, n_probes)
starts = np.concatenate([[0], np.cumsum(doc_lengths)])
probe_idx = starts[probe_pids][:, None] + np.arange(q_len)
probe_queries = np.asarray(flat[jnp.asarray(probe_idx)])

t0 = time.perf_counter()
dev, ispec = testing.build_memory_index_flat(flat, doc_lengths, nbits=4, seed=0)
del flat
value_pull(dev.codes)
print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
dev = build_emb_cache(dev, ispec)
value_pull(dev.emb_cache)

ivf_lengths = np.asarray(dev.ivf_lengths)
cand_cap = candidate_capacity(ivf_lengths, min(q_len * 8, ispec.n_partitions), 4096)
approx_mode, rank_admit, slot_budget = resolve_approx_mode(
    "auto", ivf_lengths, q_cap=q_len, n_ivf_probe=8, n_full_scores=4096,
    n_partitions=ispec.n_partitions, cand_cap=cand_cap,
)
print(f"auto -> {approx_mode}@{rank_admit} slot_budget={slot_budget}", flush=True)
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
        approx_mode=approx_mode, rank_admit=rank_admit,
    )

res = {}
for div in (2, 4, 8, 16):
    float(np.asarray(run(tiles[0], div)[1]).ravel()[0])  # honest warmup
    t0 = time.perf_counter()
    outs = [run(t, div) for t in tiles]
    jax.block_until_ready(outs)
    el = time.perf_counter() - t0
    qps = 5 * tile_b / el
    # Planted probes through the same divisor (untimed).
    qpad = np.zeros((tile_b, q_len, dim), np.float32)
    qpad[:n_probes] = probe_queries
    ep = np.asarray(run(jnp.asarray(qpad), div)[0])[:n_probes]
    hit1 = float(np.mean(ep[:, 0] == probe_pids))
    res[div] = (qps, [np.asarray(o[0]) for o in outs], [np.asarray(o[1]) for o in outs])
    print(f"divisor {div}: {qps:.1f} qps  planted_hit@1={hit1:.3f}", flush=True)

# Quality: top-10 pid overlap + score-mass of div-N vs div-1 (pool = full n_full_scores).
# Padding slots carry pid < 0 / -inf scores; exclude them from both metrics.
float(np.asarray(run(tiles[0], 1)[1]).ravel()[0])
truth = [(np.asarray(o[0]), np.asarray(o[1])) for o in [run(t, 1) for t in tiles]]
for div in (2, 4, 8, 16):
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
