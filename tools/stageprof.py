"""Microbenchmark the cells_full candidate stages at scale shapes.

Times the three wide-W stages (pid sort, fused slot-estimate kernel,
exact top-R) in isolation on the attached device, at the SCALE.md 523k/2M
shapes, to direct optimization. No index build needed — costs depend only
on shapes. Honest-warmup protocol: pull a value from each timed
executable before timing (see bench.py).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])  # warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    for b, w, c, q, r in ((64, 131072, 256, 32, 2048), (32, 172032, 256, 32, 2048)):
        print(f"== B={b} W={w} C={c} Q={q} R={r} ==", flush=True)
        key = jax.random.PRNGKey(0)
        pid = jax.random.randint(key, (b, w), 0, 2_000_000, jnp.int32)
        own = jax.random.randint(key, (b, w), 0, c, jnp.int32)
        tbl = jax.random.normal(key, (b, c, q), jnp.float32)
        est = jax.random.normal(key, (b, w), jnp.float32)
        packed = pid * c + own

        sort2 = jax.jit(lambda p, o: jax.lax.sort((p, o), dimension=-1, num_keys=1))
        sort1 = jax.jit(lambda k: jnp.sort(k, axis=-1))
        print(f"sort (pid,own) 2-array : {timeit(sort2, pid, own):8.2f} ms", flush=True)
        print(f"sort packed 1-array    : {timeit(sort1, packed):8.2f} ms", flush=True)

        topk = jax.jit(lambda e: jax.lax.top_k(e, r))
        topk_small = jax.jit(lambda e: jax.lax.top_k(e, 64))
        amax = jax.jit(lambda e: jax.lax.approx_max_k(e, r))
        sortd = jax.jit(lambda e: jax.lax.sort(e, dimension=-1))
        print(f"top_k({r})            : {timeit(topk, est):8.2f} ms", flush=True)
        print(f"top_k(64)              : {timeit(topk_small, est):8.2f} ms", flush=True)
        print(f"approx_max_k({r})     : {timeit(amax, est):8.2f} ms", flush=True)
        print(f"full sort f32          : {timeit(sortd, est):8.2f} ms", flush=True)

        if on_tpu:
            from fast_plaid_tpu.ops.estimate_kernel import segmented_estimate

            pid_s, own_s = jax.lax.sort((pid, own), dimension=-1, num_keys=1)
            pid_s, own_s = jax.block_until_ready((pid_s, own_s))
            kern = jax.jit(
                lambda p, o, t: segmented_estimate(p, o, t.astype(jnp.bfloat16))
            )
            print(f"estimate kernel        : {timeit(kern, pid_s, own_s, tbl):8.2f} ms", flush=True)

        # XLA fallback estimate path (one-hot matmul + doubling) for reference
        def est_xla(own_s, tbl):
            onehot = (own_s[..., None] == jnp.arange(c, dtype=jnp.int32)).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                onehot, tbl.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(s, axis=-1)

        try:
            print(f"est one-hot matmul only: {timeit(jax.jit(est_xla), own, tbl):8.2f} ms", flush=True)
        except Exception as e:
            print(f"est one-hot matmul only: OOM/fail ({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
