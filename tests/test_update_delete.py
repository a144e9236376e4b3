"""Update / delete lifecycle tests.

Mirrors the reference TestUpdate + TestDelete (/root/reference/tests/
test.py:200-389): id growth across updates, buffered-doc accounting, id
re-sequencing after deletes, and the update->delete->update-with-metadata
phantom-buffer regression (test.py:270-343).
"""

import numpy as np
import pytest

from fast_plaid_tpu import search
from fast_plaid_tpu.index import storage
from fast_plaid_tpu.testing import random_documents, random_queries

DIM = 32


def _docs(seed, n, ln=12):
    return random_documents(np.random.default_rng(seed), n, ln, DIM)


def _queries(seed, n=2, ln=5):
    return random_queries(np.random.default_rng(seed), n, ln, DIM)


class TestUpdate:
    def test_update_grows_ids(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(0, 20))
        eng.update(documents_embeddings=_docs(1, 10))
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 30
        results = eng.search(_queries(2), top_k=30, show_progress=False)
        all_ids = {p for row in results for p, _ in row}
        assert max(all_ids) < 30

    def test_update_searchable_immediately(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(3, 30)
        eng.create(documents_embeddings=docs)
        new_docs = _docs(4, 5)
        eng.update(documents_embeddings=new_docs, start_from_scratch=0)
        # Searching for a new doc's own tokens must find its (new) id.
        res = eng.search(new_docs[2][None], top_k=3, show_progress=False)
        assert res[0][0][0] == 32

    def test_update_creates_when_missing(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.update(documents_embeddings=_docs(5, 15))
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 15

    def test_small_index_rebuild_path(self, test_index_path):
        """Updates below start_from_scratch rebuild from raw embeddings.npy."""
        import os

        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(6, 10), start_from_scratch=1000)
        assert os.path.exists(os.path.join(test_index_path, "embeddings.npy"))
        eng.update(documents_embeddings=_docs(7, 10), start_from_scratch=999)
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 20

    def test_buffer_trip_expands_centroids(self, test_index_path):
        import os

        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(8, 30), start_from_scratch=0)
        k0 = storage.load_metadata(test_index_path)["num_partitions"]
        # Below buffer: docs buffered + appended.
        eng.update(
            documents_embeddings=_docs(9, 3),
            start_from_scratch=0,
            buffer_size=10,
        )
        assert os.path.exists(os.path.join(test_index_path, "buffer.npy"))
        assert storage.load_metadata(test_index_path)["num_documents"] == 33
        # Trip the buffer: orthogonal-ish new docs should add centroids.
        eng.update(
            documents_embeddings=_docs(10, 12),
            start_from_scratch=0,
            buffer_size=10,
        )
        assert not os.path.exists(os.path.join(test_index_path, "buffer.npy"))
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 45
        assert meta["num_partitions"] >= k0

    def test_update_delete_update_with_metadata(self, test_index_path):
        """Phantom-buffer regression (reference test.py:270-343)."""
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(
            documents_embeddings=_docs(11, 20),
            metadata=[{"tag": f"c{i}"} for i in range(20)],
            start_from_scratch=0,
        )
        eng.update(
            documents_embeddings=_docs(12, 5),
            metadata=[{"tag": f"u{i}"} for i in range(5)],
            start_from_scratch=0,
            buffer_size=100,
        )
        assert storage.load_metadata(test_index_path)["num_documents"] == 25
        eng.delete(subset=[20, 21])
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 23
        eng.update(
            documents_embeddings=_docs(13, 4),
            metadata=[{"tag": f"v{i}"} for i in range(4)],
            start_from_scratch=0,
            buffer_size=100,
        )
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 27
        from fast_plaid_tpu import filtering

        rows = filtering.get(index=test_index_path)
        assert len(rows) == 27


class TestDelete:
    def test_delete_resequences_ids(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(20, 25)
        eng.create(documents_embeddings=docs)
        eng.delete(subset=[0, 5, 10])
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 22
        results = eng.search(_queries(21), top_k=25, show_progress=False)
        for row in results:
            for p, _ in row:
                assert 0 <= p < 22

    def test_delete_shifts_content(self, test_index_path):
        """After deleting doc 0, old doc 1's content answers as id 0."""
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        docs = _docs(22, 15)
        eng.create(documents_embeddings=docs)
        eng.delete(subset=[0])
        res = eng.search(docs[1][None], top_k=1, show_progress=False)
        assert res[0][0][0] == 0

    def test_delete_multiple_rounds(self, test_index_path):
        eng = search.FastPlaid(index=test_index_path, device="cpu")
        eng.create(documents_embeddings=_docs(23, 20))
        eng.delete(subset=[0, 1])
        eng.delete(subset=[0])
        meta = storage.load_metadata(test_index_path)
        assert meta["num_documents"] == 17


class TestIvfSplice:
    """Incremental IVF splice must equal a from-scratch rebuild."""

    def test_splice_matches_rebuild(self):
        import numpy as np

        from fast_plaid_tpu.index import ivf as ivf_mod

        rng = np.random.default_rng(5)
        k = 37
        old_codes = rng.integers(0, k, 400).astype(np.int32)
        old_lens = rng.integers(3, 9, 60).astype(np.int64)
        old_lens[-1] += 400 - old_lens.sum()  # make lengths consistent
        assert old_lens.sum() == 400 and (old_lens > 0).all()
        new_codes = rng.integers(0, k, 150).astype(np.int32)
        new_lens = rng.integers(3, 9, 22).astype(np.int64)
        new_lens[-1] += 150 - new_lens.sum()
        assert new_lens.sum() == 150 and (new_lens > 0).all()

        old_ivf, old_l = ivf_mod.build_ivf(old_codes, old_lens, k)
        spliced, spliced_l = ivf_mod.splice_ivf(
            old_ivf, old_l, new_codes, new_lens, pid_base=len(old_lens)
        )
        full, full_l = ivf_mod.build_ivf(
            np.concatenate([old_codes, new_codes]),
            np.concatenate([old_lens, new_lens]),
            k,
        )
        assert (spliced_l == full_l).all()
        assert (spliced == full).all()

    def test_splice_empty_new(self):
        import numpy as np

        from fast_plaid_tpu.index import ivf as ivf_mod

        old_ivf, old_l = ivf_mod.build_ivf(
            np.array([0, 1, 2, 1], np.int32), np.array([2, 2], np.int64), 4
        )
        s, sl = ivf_mod.splice_ivf(
            old_ivf, old_l, np.zeros((0,), np.int32), np.zeros((0,), np.int64), 2
        )
        assert (s == old_ivf).all() and (sl == old_l).all()


@pytest.mark.slow
def test_streamed_update_bounds_host_memory(test_index_path):
    """update_index consumes an iterable in blocks: a 100k-doc update must
    never materialize the raw batch (VERDICT r4 #7; reference bound:
    VRAM-aware micro-batching, update.rs:129-176).

    The generator yields 100k docs totalling ~400 MB of raw embeddings;
    with batch_size=10k the resident set should stay around one block
    (~40 MB raw + packed) + the running int32 codes — far under the full
    batch. RSS is allocator-noisy, so the bound is generous (half the
    raw total) while still impossible for a full materialization (raw +
    packed all at once is ~1.1x the raw total on its own).
    """
    import gc

    psutil = pytest.importorskip("psutil")

    from fast_plaid_tpu.index.appender import update_index
    from fast_plaid_tpu.search import FastPlaid

    rng = np.random.default_rng(0)
    seed_docs = random_documents(rng, 64, 8, 128, variable=True)
    eng = FastPlaid(index=test_index_path, device="cpu")
    eng.create(documents_embeddings=seed_docs)
    eng.close()

    n_docs, tok, dim = 100_000, 8, 128
    raw_total = n_docs * tok * dim * 4  # ~400 MB

    def doc_gen():
        r = np.random.default_rng(1)
        for _ in range(n_docs):
            yield r.standard_normal((tok, dim)).astype(np.float32)

    gc.collect()
    proc = psutil.Process()
    rss0 = proc.memory_info().rss
    update_index(test_index_path, doc_gen(), batch_size=10_000)
    rss_peak = proc.memory_info().rss  # post-call high-water proxy
    gc.collect()
    delta = rss_peak - rss0
    assert delta < raw_total // 2, (
        f"streamed update resident-set delta {delta / 1e6:.0f} MB "
        f"exceeds half the raw batch ({raw_total / 2e6:.0f} MB)"
    )

    # The update is structurally correct: all docs appended and findable.
    import json as _json
    import os as _os

    with open(_os.path.join(test_index_path, "metadata.json")) as f:
        meta = _json.load(f)
    assert meta["num_documents"] == 64 + n_docs
    assert meta["num_embeddings"] > n_docs * tok
