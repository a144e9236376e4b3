"""Per-shard low_memory: doc-sharded search with host-resident residuals.

Runs on the conftest 8-virtual-CPU backend. Each shard is a normal
low_memory LoadedIndex over a contiguous doc slice (residuals as mmap
views of the on-disk index); the merge is an exact host top-k of the
shards' codec-exact scores, so exhaustive parameters must reproduce the
single-device exhaustive results exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from fast_plaid_tpu.parallel import load_sharded_lm
from fast_plaid_tpu.search import FastPlaid
from fast_plaid_tpu.search.load import reload_index
from fast_plaid_tpu.search.searcher import search_on_device

N_DOCS, DIM = 210, 64  # 210 docs over 4 shards: uneven last shard


@pytest.fixture(scope="module")
def disk_index(tmp_path_factory):
    rng = np.random.default_rng(4)
    docs = [
        np.asarray(
            rng.standard_normal((int(rng.integers(8, 30)), DIM)), np.float32
        )
        for _ in range(N_DOCS)
    ]
    path = str(tmp_path_factory.mktemp("lmsh") / "idx")
    eng = FastPlaid(index=path, device="cpu")
    eng.create(documents_embeddings=docs, show_progress=False)
    rng_q = np.random.default_rng(9)
    queries = [
        np.asarray(rng_q.standard_normal((12, DIM)), np.float32)
        for _ in range(6)
    ]
    return path, queries


def test_exhaustive_matches_single_device(disk_index):
    path, queries = disk_index
    devices = jax.devices("cpu")[:4]
    sharded = load_sharded_lm(path, devices)
    assert sharded.n_docs_total == N_DOCS
    kwargs = dict(
        top_k=8, n_full_scores=2 * N_DOCS, n_ivf_probe=10**6
    )  # exhaustive: brute-force contract
    got = sharded.search(queries, **kwargs)

    single = reload_index(path, [devices[0]])[str(devices[0])]
    want = search_on_device(
        single,
        queries,
        subsets=None,
        want_tokens=False,
        show_progress=False,
        **kwargs,
    )
    for g, w in zip(got, want):
        assert [p for p, _ in g] == [p for p, _ in w]
        np.testing.assert_allclose(
            [s for _, s in g], [s for _, s in w], rtol=1e-5
        )


def test_default_params_find_planted(disk_index):
    path, queries = disk_index
    sharded = load_sharded_lm(path, jax.devices("cpu")[:4])
    # Planted probes: near-copies of docs in DIFFERENT shards (incl. the
    # short last shard) must surface as top-1 with default-ish params.
    single = reload_index(path, [jax.devices("cpu")[0]])[
        str(jax.devices("cpu")[0])
    ]
    targets = [3, 60, 120, 205]
    probes = []
    from fast_plaid_tpu.search.fast_plaid import FastPlaid as _FP  # noqa: F401

    eng = FastPlaid(index=path, device="cpu")
    embs = eng.get_embeddings(targets)
    rng = np.random.default_rng(1)
    for e in embs:
        src = rng.integers(0, len(e), 12)
        q = e[src] + 0.01 * rng.standard_normal((12, e.shape[1])).astype(
            np.float32
        )
        probes.append(q.astype(np.float32))
    res = sharded.search(probes, top_k=3, n_full_scores=128, n_ivf_probe=8)
    for t, row in zip(targets, res):
        assert row[0][0] == t, (t, row)


def test_more_shards_than_docs_ok(tmp_path):
    rng = np.random.default_rng(0)
    docs = [
        np.asarray(rng.standard_normal((10, DIM)), np.float32)
        for _ in range(3)
    ]
    path = str(tmp_path / "tiny")
    FastPlaid(index=path, device="cpu").create(
        documents_embeddings=docs, show_progress=False
    )
    sharded = load_sharded_lm(path, jax.devices("cpu")[:8])
    assert sum(ld is not None for ld in sharded.shards) <= 3
    res = sharded.search(
        [np.asarray(docs[2][:6], np.float32)], top_k=2, n_full_scores=6,
        n_ivf_probe=64,
    )
    assert res[0][0][0] == 2
