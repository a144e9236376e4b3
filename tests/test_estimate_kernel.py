"""Interpret-mode correctness for the fused segmented-estimate kernel.

The kernel (ops/estimate_kernel.py) computes, for each slot of a row-sorted
slot table, the Q-sum of the per-token max over the slot's equal-pid run
suffix — at run heads that is the candidate estimate the budgeted cascade
prunes on (engine.candidates_impl stage 4). Reference: plain numpy over
each run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fast_plaid_tpu.ops.estimate_kernel import segmented_estimate


def _reference(pid, own, table):
    """Estimate at run heads: sum_q max over the run's owner rows."""
    b, w = pid.shape
    out = np.full((b, w), np.nan, np.float64)
    tb = table.astype(np.float64)
    for bi in range(b):
        i = 0
        while i < w:
            j = i
            while j < w and pid[bi, j] == pid[bi, i]:
                j += 1
            rows = tb[bi, own[bi, i:j]]  # [run, Q]
            out[bi, i] = rows.max(axis=0).sum()
            i = j
    return out


def _run_heads(pid):
    heads = np.ones_like(pid, dtype=bool)
    heads[:, 1:] = pid[:, 1:] != pid[:, :-1]
    return heads


@pytest.mark.parametrize("w,t_tile", [(96, 32), (512, 128), (130, 64)])
def test_matches_reference(w, t_tile):
    rng = np.random.default_rng(0)
    b, c, q = 3, 12, 16
    # Sorted pids with plenty of multi-slot runs, including runs that
    # straddle tile boundaries, plus a sentinel tail.
    pid = np.sort(rng.integers(0, w // 3, (b, w)).astype(np.int32), axis=1)
    pid[:, -5:] = 10_000  # sentinel-style tail run
    own = rng.integers(0, c, (b, w)).astype(np.int32)
    table = rng.standard_normal((b, c, q)).astype(np.float32)

    got = np.asarray(
        segmented_estimate(
            jnp.asarray(pid),
            jnp.asarray(own),
            jnp.asarray(table),
            t_tile=t_tile,
            interpret=True,
        )
    )
    want = _reference(pid, own, table)
    heads = _run_heads(pid)
    # bf16 table quantization in the kernel: compare vs bf16-rounded ref.
    table16 = np.asarray(jnp.asarray(table).astype(jnp.bfloat16), np.float32)
    want16 = _reference(pid, own, table16)
    np.testing.assert_allclose(got[heads], want16[heads], rtol=0, atol=1e-5)
    # and the bf16 table stays close to the f32 truth
    np.testing.assert_allclose(want16[heads], want[heads], atol=0.1)


def test_single_giant_run_across_all_tiles():
    rng = np.random.default_rng(1)
    b, w, c, q, t = 2, 256, 7, 8, 64
    pid = np.zeros((b, w), np.int32)  # ONE run spanning every tile
    own = rng.integers(0, c, (b, w)).astype(np.int32)
    table = rng.standard_normal((b, c, q)).astype(np.float32)
    got = np.asarray(
        segmented_estimate(
            jnp.asarray(pid), jnp.asarray(own), jnp.asarray(table),
            t_tile=t, interpret=True,
        )
    )
    table16 = np.asarray(jnp.asarray(table).astype(jnp.bfloat16), np.float32)
    want = _reference(pid, own, table16)
    np.testing.assert_allclose(got[:, 0], want[:, 0], atol=1e-5)


def test_engine_budgeted_path_kernel_parity():
    """candidates through the engine with/without the estimate kernel agree.

    Interpret mode on CPU: the kernel-backed budgeted path must select the
    same rerank pool as the XLA one-hot/doubling path.
    """
    import jax

    from fast_plaid_tpu import testing
    from fast_plaid_tpu.search.engine import candidates_core

    rng = np.random.default_rng(2)
    docs = testing.random_documents(rng, 400, 24, 64, variable=True)
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=0)
    queries = testing.random_queries(rng, 4, 8, 64)

    kw = dict(
        ispec=ispec,
        n_ivf_probe=4,
        n_full_scores=64,
        cand_cap=2048,
        approx_mode="cells",
        slot_budget=128,
    )
    ref = np.asarray(
        candidates_core(dev, jnp.asarray(queries), None, **kw)
    )
    import fast_plaid_tpu.search.engine as E

    with jax.disable_jit(False):
        got = np.asarray(
            candidates_core(
                dev,
                jnp.asarray(queries),
                None,
                use_estimate_kernel=True,
                interpret_kernels=True,
                **kw,
            )
        )
    # Equal-score ties can reorder; compare the selected sets per query.
    for bi in range(ref.shape[0]):
        assert set(ref[bi].tolist()) == set(got[bi].tolist())
