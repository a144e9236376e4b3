"""Deduplicated rerank (ops/rerank_dedup.py): grouping + score identity.

The dedup kernel must be a drop-in for ops/rerank_kernel.maxsim_gather_scores:
same [B, R] scores (same bf16/f32 contraction), one row DMA per unique
candidate. Kernels run in interpret mode on the CPU backend here; the
grouping pre-pass is plain XLA and is checked against a numpy oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_plaid_tpu.ops.rerank_dedup import (
    dedup_viable,
    group_pool,
    maxsim_gather_scores_dedup,
)
from fast_plaid_tpu.ops.rerank_kernel import maxsim_gather_scores


def _pool(rng, b, r, n_docs, sentinel_frac=0.1):
    """Random rerank pool with duplicates and sentinel padding slots."""
    pids = rng.integers(0, n_docs, (b, r)).astype(np.int32)
    sent = rng.random((b, r)) < sentinel_frac
    pids[sent] = n_docs  # sentinel pid (zero-length row)
    return pids


def _lens(pids, doc_lengths):
    return doc_lengths[pids]


def test_group_pool_covers_every_slot():
    rng = np.random.default_rng(0)
    b, r, n_docs, g = 8, 64, 40, 4
    pids = _pool(rng, b, r, n_docs)
    doc_lengths = np.concatenate(
        [rng.integers(1, 7, n_docs), [0]]
    ).astype(np.int32)
    lens = _lens(pids, doc_lengths)
    n = b * r
    e_cap = min(n, n // g + n_docs + 1)
    epid, elen, eq, inv, n_entries = group_pool(
        jnp.asarray(pids), jnp.asarray(lens), g, e_cap
    )
    epid, elen, eq = np.asarray(epid), np.asarray(elen), np.asarray(eq)
    inv, n_entries = np.asarray(inv), int(n_entries)
    assert n_entries <= e_cap

    # Every (query, slot) pair maps to an entry holding its pid, with its
    # own query id at its slot, and entry lens match the doc lengths.
    seen_per_entry = {}
    for bi in range(b):
        for ri in range(r):
            e, s = inv[bi, ri] // g, inv[bi, ri] % g
            assert e < n_entries
            assert epid[e] == pids[bi, ri]
            assert eq[e, s] == bi
            assert elen[e] == doc_lengths[pids[bi, ri]]
            seen_per_entry.setdefault(e, set())
            assert s not in seen_per_entry[e], "slot collision"
            seen_per_entry[e].add(s)

    # Entry count is exactly sum(ceil(run/g)).
    _, counts = np.unique(pids.reshape(-1), return_counts=True)
    assert n_entries == int(np.sum(-(-counts // g)))


def test_dedup_matches_reference_kernel():
    rng = np.random.default_rng(1)
    b, r, n_docs, doc_cap, d, q = 16, 64, 48, 12, 128, 16
    np_rows = n_docs + 1
    doc_lengths = np.concatenate(
        [rng.integers(1, doc_cap + 1, n_docs), [0]]
    ).astype(np.int32)
    emb = rng.standard_normal((np_rows, doc_cap, d)).astype(np.float32)
    for i in range(np_rows):
        emb[i, doc_lengths[i]:] = 0.0
    emb = jnp.asarray(emb, dtype=jnp.bfloat16)
    pids = _pool(rng, b, r, n_docs)
    lens = _lens(pids, doc_lengths)
    queries = rng.standard_normal((b, q, d)).astype(np.float32)

    ref = np.asarray(
        maxsim_gather_scores(
            emb, jnp.asarray(pids), jnp.asarray(lens), jnp.asarray(queries),
            interpret=True,
        )
    )
    got = np.asarray(
        maxsim_gather_scores_dedup(
            emb, jnp.asarray(pids), jnp.asarray(lens), jnp.asarray(queries),
            g=4, e_tile=8, chunk=64, interpret=True,
        )
    )
    assert ref.shape == got.shape == (b, r)
    both_inf = np.isneginf(ref) & np.isneginf(got)
    assert np.array_equal(np.isneginf(ref), np.isneginf(got))
    np.testing.assert_allclose(
        got[~both_inf], ref[~both_inf], rtol=2e-2, atol=2e-2
    )


def test_dedup_all_sentinel_rows_are_neg_inf():
    rng = np.random.default_rng(2)
    b, r, n_docs, doc_cap, d, q = 8, 32, 16, 8, 128, 16
    emb = jnp.asarray(
        rng.standard_normal((n_docs + 1, doc_cap, d)), dtype=jnp.bfloat16
    )
    pids = np.full((b, r), n_docs, np.int32)  # every slot is padding
    lens = np.zeros((b, r), np.int32)
    queries = rng.standard_normal((b, q, d)).astype(np.float32)
    out = np.asarray(
        maxsim_gather_scores_dedup(
            emb, jnp.asarray(pids), jnp.asarray(lens), jnp.asarray(queries),
            g=4, e_tile=8, chunk=32, interpret=True,
        )
    )
    assert np.all(np.isneginf(out))


def test_dedup_viability_gate():
    # Bench shape: strongly overlapped -> viable.
    assert dedup_viable(57_640, 256, 2048, 32, 128)
    # Large corpus: pools barely overlap -> per-query kernel stays.
    assert not dedup_viable(523_000, 256, 2048, 32, 128)
    # Odd query length breaks the VMEM slice contract -> not viable.
    assert not dedup_viable(1_000, 256, 2048, 17, 128)


@pytest.mark.parametrize("seed", [3, 4])
def test_dedup_heavy_overlap_and_skew(seed):
    """Zipf-skewed pools (hub docs requested by most queries)."""
    rng = np.random.default_rng(seed)
    b, r, n_docs, doc_cap, d, q = 8, 128, 24, 10, 128, 16
    doc_lengths = np.concatenate(
        [rng.integers(1, doc_cap + 1, n_docs), [0]]
    ).astype(np.int32)
    emb = np.zeros((n_docs + 1, doc_cap, d), np.float32)
    for i in range(n_docs):
        emb[i, : doc_lengths[i]] = rng.standard_normal(
            (doc_lengths[i], d)
        )
    emb = jnp.asarray(emb, dtype=jnp.bfloat16)
    zipf = np.clip(rng.zipf(1.5, (b, r)) - 1, 0, n_docs - 1).astype(np.int32)
    lens = _lens(zipf, doc_lengths)
    queries = rng.standard_normal((b, q, d)).astype(np.float32)
    ref = np.asarray(
        maxsim_gather_scores(
            emb, jnp.asarray(zipf), jnp.asarray(lens), jnp.asarray(queries),
            interpret=True,
        )
    )
    got = np.asarray(
        maxsim_gather_scores_dedup(
            emb, jnp.asarray(zipf), jnp.asarray(lens), jnp.asarray(queries),
            g=8, e_tile=8, chunk=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
