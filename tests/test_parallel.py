"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Coverage the reference lacks entirely (its multi-GPU path has no CI,
SURVEY.md §4): doc-sharded search must agree with the single-device
cascade, and query sharding must reproduce its results.
"""

import numpy as np
import pytest

import jax

from fast_plaid_tpu import parallel, testing
from fast_plaid_tpu.search.engine import search_core


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    docs = testing.random_documents(rng, 64, 20, 32, variable=True)
    queries = testing.random_queries(rng, 8, 6, 32)
    return docs, queries


def _single_device_results(docs, queries, top_k):
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=1)
    pids, scores = search_core(
        dev,
        np.asarray(queries),
        None,
        ispec=ispec,
        top_k=top_k,
        n_ivf_probe=8,
        n_full_scores=4096,
        want_tokens=False,
    )
    return np.asarray(pids), np.asarray(scores)


def test_doc_sharded_matches_single_device(corpus):
    docs, queries = corpus
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, "tests require 8 virtual CPU devices"
    mesh = parallel.make_mesh(devices=cpus[:4])

    # Build both from identical artifacts.
    from fast_plaid_tpu.index.builder import (
        compress_documents,
        train_codec_from_documents,
    )
    from fast_plaid_tpu.ops.kmeans import train_kmeans

    flat = np.concatenate(docs)
    centroids = train_kmeans(flat, k=64, niters=4, seed=1)
    params = train_codec_from_documents(docs, centroids, 4, 1)
    codes, packed = compress_documents(docs, centroids, params.bucket_cutoffs, 4)
    doc_lengths = np.asarray([d.shape[0] for d in docs], np.int64)

    sharded = parallel.build_sharded_index(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        nbits=4,
        mesh=mesh,
    )
    pids, scores = parallel.sharded_search(sharded, queries, top_k=5)
    pids, scores = np.asarray(pids), np.asarray(scores)

    # Single-device ground truth from the same artifacts.
    from fast_plaid_tpu.index import ivf as ivf_mod
    from fast_plaid_tpu.index.layout import to_device

    ivf, ivf_lengths = ivf_mod.build_ivf(codes, doc_lengths, centroids.shape[0])
    dev, ispec = to_device(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        nbits=4,
    )
    ref_pids, ref_scores = search_core(
        dev,
        np.asarray(queries),
        None,
        ispec=ispec,
        top_k=5,
        n_ivf_probe=8,
        n_full_scores=4096,
        want_tokens=False,
    )
    ref_pids, ref_scores = np.asarray(ref_pids), np.asarray(ref_scores)

    # Sharded probing is per-shard (n_probe cells on each shard), so its
    # candidate pool is a superset per shard; scores of common winners must
    # match exactly, and the top-1 document must agree.
    for b in range(pids.shape[0]):
        assert pids[b, 0] == ref_pids[b, 0]
        np.testing.assert_allclose(scores[b, 0], ref_scores[b, 0], rtol=1e-5)
        # all returned scores sorted desc
        valid = scores[b][pids[b] >= 0]
        assert np.all(np.diff(valid) <= 1e-6)


def test_query_sharded_matches_single_device(corpus):
    docs, queries = corpus
    cpus = jax.devices("cpu")
    mesh = parallel.make_mesh(devices=cpus[:4])
    dev, ispec = testing.build_memory_index(docs, nbits=4, seed=1)
    pids, scores = parallel.query_sharded_search(
        dev, ispec, queries, mesh, top_k=5
    )
    ref_pids, ref_scores = search_core(
        dev,
        np.asarray(queries),
        None,
        ispec=ispec,
        top_k=5,
        n_ivf_probe=8,
        n_full_scores=4096,
        want_tokens=False,
    )
    np.testing.assert_array_equal(np.asarray(pids), np.asarray(ref_pids))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-5
    )


def test_sharded_auto_resolves_like_single_chip():
    """Past the candidates/budget crossover, the sharded path must engage
    the same recall machinery as the single-chip driver (VERDICT r3 #2):
    both resolve `auto` through engine.resolve_approx_mode, and a planted
    verbatim-copy query must be retrieved at rank 1 through the mesh with
    default-auto search even at a saturating n_full_scores."""
    from fast_plaid_tpu.index.builder import (
        compress_documents,
        train_codec_from_documents,
    )
    from fast_plaid_tpu.ops.kmeans import train_kmeans
    from fast_plaid_tpu.parallel.sharded import _resolve_shard_params
    from fast_plaid_tpu.search.engine import resolve_approx_mode

    rng = np.random.default_rng(9)
    docs = testing.random_documents(rng, 1500, 8, 32, variable=True)
    cpus = jax.devices("cpu")
    mesh = parallel.make_mesh(devices=cpus[:4])

    flat = np.concatenate(docs)
    centroids = train_kmeans(flat, k=64, niters=2, seed=2)
    params = train_codec_from_documents(docs, centroids, 4, 2)
    codes, packed = compress_documents(
        docs, centroids, params.bucket_cutoffs, 4
    )
    doc_lengths = np.asarray([d.shape[0] for d in docs], np.int64)
    sharded = parallel.build_sharded_index(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        nbits=4,
        mesh=mesh,
    )

    # ~1500 docs / 64 cells with a 16-slot budget saturates the crossover
    # on the per-shard statistics too.
    n_full = 16
    mode, r_adm, slot_budget, cand_cap = _resolve_shard_params(
        sharded.ivf_lengths_host,
        sharded.ispec,
        8,
        8,
        n_full,
        "auto",
        None,
    )
    assert mode == "cells_full" or r_adm > 0, (mode, r_adm)
    # Identical policy function, identical inputs -> identical resolution
    # as the single-chip driver would make on the same statistics.
    ref = resolve_approx_mode(
        "auto",
        sharded.ivf_lengths_host,
        q_cap=8,
        n_ivf_probe=8,
        n_full_scores=n_full,
        n_partitions=sharded.ispec.n_partitions,
        cand_cap=cand_cap,
    )
    assert (mode, r_adm, slot_budget) == ref

    # Planted verbatim copies must come back at rank 1 under default auto.
    probe_ids = [3, 700, 1499]
    q_cap = max(docs[i].shape[0] for i in probe_ids)
    queries = np.zeros((len(probe_ids), q_cap, 32), np.float32)
    for i, pid in enumerate(probe_ids):
        queries[i, : docs[pid].shape[0]] = docs[pid]
    pids, _ = parallel.sharded_search(
        sharded, queries, top_k=5, n_full_scores=n_full, approx_mode="auto"
    )
    pids = np.asarray(pids)
    assert list(pids[:, 0]) == probe_ids, pids[:, 0]


def test_sharded_fastplaid_from_disk(tmp_path):
    """ShardedFastPlaid loads an on-disk index over a CPU mesh and agrees
    with single-device FastPlaid on the top result."""
    import numpy as np

    from fast_plaid_tpu import search
    from fast_plaid_tpu.parallel import ShardedFastPlaid, make_mesh
    from fast_plaid_tpu.testing import random_documents, random_queries

    rng = np.random.default_rng(3)
    docs = random_documents(rng, 48, 14, 32, variable=True)
    path = str(tmp_path / "idx")
    eng = search.FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 4, 5, 32)
    ref = eng.search(queries, top_k=3, show_progress=False)

    cpus = jax.devices("cpu")
    sharded = ShardedFastPlaid(path, mesh=make_mesh(devices=cpus[:4]))
    got = sharded.search(queries, top_k=3)
    assert len(got) == 4
    for a, b in zip(got, ref):
        assert a[0][0] == b[0][0]
        assert abs(a[0][1] - b[0][1]) < 1e-3


@pytest.fixture(scope="module")
def shared_artifacts(corpus):
    """One set of build artifacts for sharded-vs-single comparisons."""
    from fast_plaid_tpu.index import ivf as ivf_mod
    from fast_plaid_tpu.index.builder import (
        compress_documents,
        train_codec_from_documents,
    )
    from fast_plaid_tpu.index.layout import to_device
    from fast_plaid_tpu.ops.kmeans import train_kmeans

    docs, queries = corpus
    flat = np.concatenate(docs)
    centroids = train_kmeans(flat, k=64, niters=4, seed=1)
    params = train_codec_from_documents(docs, centroids, 4, 1)
    codes, packed = compress_documents(docs, centroids, params.bucket_cutoffs, 4)
    doc_lengths = np.asarray([d.shape[0] for d in docs], np.int64)
    mesh = parallel.make_mesh(devices=jax.devices("cpu")[:4])
    sharded = parallel.build_sharded_index(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        nbits=4,
        mesh=mesh,
    )
    ivf, ivf_lengths = ivf_mod.build_ivf(codes, doc_lengths, centroids.shape[0])
    dev, ispec = to_device(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        nbits=4,
    )
    return sharded, dev, ispec


def test_sharded_subset_matches_single_device(shared_artifacts, corpus):
    """Mesh subsets (global ids, rebased per shard) reproduce the
    single-device subset cascade: results stay inside the subset and the
    top hits agree (VERDICT r4 #2; reference threads subsets through its
    multi-GPU dispatch, fast_plaid.py:797-928)."""
    docs, queries = corpus
    sharded, dev, ispec = shared_artifacts
    rng = np.random.default_rng(5)
    n_docs = len(docs)
    subsets = [sorted(rng.choice(n_docs, 24, replace=False).tolist())
               for _ in range(len(queries))]

    pids, scores = parallel.sharded_search(
        sharded, queries, top_k=5, subset=subsets
    )
    pids, scores = np.asarray(pids), np.asarray(scores)

    # Single-device ground truth with the same subsets.
    s_cap = 24
    sub = np.full((len(queries), s_cap), ispec.sentinel_pid, np.int32)
    for i, s in enumerate(subsets):
        sub[i, : len(s)] = np.asarray(s, np.int32)
    ref_pids, ref_scores = search_core(
        dev,
        np.asarray(queries),
        sub,
        ispec=ispec,
        top_k=5,
        n_ivf_probe=8,
        n_full_scores=4096,
        want_tokens=False,
    )
    ref_pids, ref_scores = np.asarray(ref_pids), np.asarray(ref_scores)

    for b in range(pids.shape[0]):
        got = {int(p) for p in pids[b] if p >= 0}
        assert got <= set(subsets[b]), (got, subsets[b])
        if ref_pids[b, 0] >= 0:
            assert pids[b, 0] == ref_pids[b, 0]
            np.testing.assert_allclose(
                scores[b, 0], ref_scores[b, 0], rtol=1e-5
            )


def test_sharded_token_scores_match_single_device(shared_artifacts, corpus):
    """want_tokens on the mesh: merged winners carry the same
    [doc_cap, Q] token matrices the single-device cascade computes."""
    docs, queries = corpus
    sharded, dev, ispec = shared_artifacts
    pids, scores, tok, doc_lens = parallel.sharded_search(
        sharded, queries, top_k=3, want_tokens=True
    )
    pids, tok, doc_lens = np.asarray(pids), np.asarray(tok), np.asarray(doc_lens)

    ref = search_core(
        dev,
        np.asarray(queries),
        None,
        ispec=ispec,
        top_k=3,
        n_ivf_probe=8,
        n_full_scores=4096,
        want_tokens=True,
    )
    ref_pids, _, ref_tok, ref_lens = (np.asarray(x) for x in ref)

    same = 0
    for b in range(pids.shape[0]):
        for k in range(pids.shape[1]):
            if pids[b, k] < 0 or pids[b, k] != ref_pids[b, k]:
                continue
            same += 1
            dlen = int(doc_lens[b, k])
            assert dlen == int(ref_lens[b, k])
            np.testing.assert_allclose(
                tok[b, k, :dlen], ref_tok[b, k, :dlen], rtol=1e-4, atol=1e-5
            )
    assert same >= pids.shape[0]  # at least the top-1s agree


def test_sharded_stats_overflow_accounting(shared_artifacts, corpus):
    """with_stats on the mesh returns the per-query [pruned, overflow]
    accounting summed over shards (single-chip parity: searcher stats)."""
    docs, queries = corpus
    sharded, dev, ispec = shared_artifacts
    out = parallel.sharded_search(
        sharded, queries, top_k=5, with_stats=True
    )
    assert len(out) == 3
    stats = np.asarray(out[2])
    assert stats.shape == (len(queries), 2)
    assert (stats >= 0).all()


def test_sharded_fastplaid_subset_and_tokens(tmp_path):
    """ShardedFastPlaid surfaces subsets + token scores like FastPlaid."""
    from fast_plaid_tpu import search
    from fast_plaid_tpu.parallel import ShardedFastPlaid, make_mesh
    from fast_plaid_tpu.testing import random_documents, random_queries

    rng = np.random.default_rng(7)
    docs = random_documents(rng, 48, 14, 32, variable=True)
    path = str(tmp_path / "idx")
    eng = search.FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs)
    queries = random_queries(rng, 3, 5, 32)
    subset = [list(range(0, 30))] * 3

    cpus = jax.devices("cpu")
    sharded = ShardedFastPlaid(path, mesh=make_mesh(devices=cpus[:4]))
    got = sharded.search(queries, top_k=3, subset=subset)
    ref = eng.search(queries, top_k=3, subset=subset, show_progress=False)
    for a, b in zip(got, ref):
        assert {p for p, _ in a} <= set(subset[0])
        assert a[0][0] == b[0][0]
        assert abs(a[0][1] - b[0][1]) < 1e-3

    toks = sharded.search_token_scores(queries, top_k=3)
    ref_t = eng.search_token_scores(queries, top_k=3, show_progress=False)
    for a, b in zip(toks, ref_t):
        assert a[0][0] == b[0][0]
        qa, qb = a[0][2], b[0][2]
        assert qa.shape == qb.shape
        np.testing.assert_allclose(qa, qb, rtol=1e-4, atol=1e-5)

    from fast_plaid_tpu.search.searcher import last_search_stats

    st = last_search_stats()
    assert st["queries"] == 3 and st["cap_overflow_slots"] >= 0
