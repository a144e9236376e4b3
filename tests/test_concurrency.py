"""Cross-instance concurrency: mtime reload + file locking.

Mirrors the reference's cross-process coordination contract
(fast_plaid.py:369-385, 427-514): a second FastPlaid attached to the same
index directory picks up mutations made by the first via the mtime check,
and mutation under an externally held lock does not corrupt reads.
"""

import numpy as np

from fast_plaid_tpu import search
from fast_plaid_tpu.testing import random_documents, random_queries
from fast_plaid_tpu.utils.locking import FileLock, Timeout

DIM = 32


def test_second_instance_sees_updates(test_index_path):
    rng = np.random.default_rng(0)
    eng_a = search.FastPlaid(index=test_index_path, device="cpu")
    eng_a.create(documents_embeddings=random_documents(rng, 20, 10, DIM))

    eng_b = search.FastPlaid(index=test_index_path, device="cpu")
    q = random_queries(rng, 1, 4, DIM)
    res = eng_b.search(q, top_k=30, show_progress=False)
    assert all(p < 20 for p, _ in res[0])

    # A mutates; B must observe the new corpus size on its next search.
    eng_a.update(
        documents_embeddings=random_documents(rng, 10, 10, DIM),
        start_from_scratch=0,
    )
    res = eng_b.search(q, top_k=40, show_progress=False)
    assert any(p >= 20 for p, _ in res[0]) or len(res[0]) > 0
    assert eng_b.indices[str(eng_b.devices[0])].ispec.n_docs == 30


def test_search_proceeds_when_lock_held(test_index_path):
    """Non-blocking reload: a held lock must not block searches."""
    rng = np.random.default_rng(1)
    eng = search.FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=random_documents(rng, 15, 8, DIM))

    import os

    other = FileLock(os.path.join(test_index_path, "plaid.lock"))
    other.acquire()
    try:
        # Simulate an in-flight external update: mtime changed + lock held.
        os.utime(os.path.join(test_index_path, "metadata.json"))
        res = eng.search(
            random_queries(rng, 1, 4, DIM), top_k=5, show_progress=False
        )
        assert len(res[0]) > 0  # served from the current in-memory index
    finally:
        other.release()


def test_lock_timeout(test_index_path, tmp_path):
    path = str(tmp_path / "x.lock")
    a = FileLock(path)
    a.acquire()
    try:
        b = FileLock(path)
        import pytest

        with pytest.raises(Timeout):
            b.acquire(timeout=0.1)
    finally:
        a.release()
    # Released: now acquirable.
    b = FileLock(path)
    b.acquire(timeout=0.5)
    b.release()
