"""Merged-mmap load cache: full rewrite, reuse, incremental append."""

import json
import os

import numpy as np

from fast_plaid_tpu.index import storage


def _write_chunk(path, i, rows, cols, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (rows, cols)).astype(np.uint8)
    np.save(os.path.join(path, f"{i}.residuals.npy"), arr)
    return arr


def test_merge_and_reuse(tmp_path):
    idx = str(tmp_path)
    a = _write_chunk(idx, 0, 10, 4, 0)
    b = _write_chunk(idx, 1, 7, 4, 1)
    merged = storage.get_merged_mmap(idx, "residuals", 2)
    np.testing.assert_array_equal(np.asarray(merged), np.concatenate([a, b]))
    # Second call reuses the cache (manifest match), same contents.
    mtime = os.path.getmtime(os.path.join(idx, "merged_residuals.npy"))
    merged2 = storage.get_merged_mmap(idx, "residuals", 2)
    assert os.path.getmtime(os.path.join(idx, "merged_residuals.npy")) == mtime
    np.testing.assert_array_equal(np.asarray(merged2), np.concatenate([a, b]))


def test_incremental_append(tmp_path):
    idx = str(tmp_path)
    a = _write_chunk(idx, 0, 10, 4, 0)
    b = _write_chunk(idx, 1, 7, 4, 1)
    storage.get_merged_mmap(idx, "residuals", 2)
    c = _write_chunk(idx, 2, 5, 4, 2)
    merged = storage.get_merged_mmap(idx, "residuals", 3)
    np.testing.assert_array_equal(
        np.asarray(merged), np.concatenate([a, b, c])
    )


def test_changed_chunk_full_rewrite(tmp_path):
    idx = str(tmp_path)
    _write_chunk(idx, 0, 10, 4, 0)
    b = _write_chunk(idx, 1, 7, 4, 1)
    storage.get_merged_mmap(idx, "residuals", 2)
    a2 = _write_chunk(idx, 0, 12, 4, 3)  # chunk 0 rewritten, different rows
    merged = storage.get_merged_mmap(idx, "residuals", 2)
    np.testing.assert_array_equal(np.asarray(merged), np.concatenate([a2, b]))


def test_corrupt_manifest_recovers(tmp_path):
    idx = str(tmp_path)
    a = _write_chunk(idx, 0, 4, 4, 0)
    b = _write_chunk(idx, 1, 4, 4, 1)
    storage.get_merged_mmap(idx, "residuals", 2)
    with open(os.path.join(idx, "merged_residuals.manifest.json"), "w") as f:
        f.write("{not json")
    merged = storage.get_merged_mmap(idx, "residuals", 2)
    np.testing.assert_array_equal(np.asarray(merged), np.concatenate([a, b]))


def test_manifest_contents(tmp_path):
    idx = str(tmp_path)
    _write_chunk(idx, 0, 4, 4, 0)
    storage.get_merged_mmap(idx, "residuals", 1)
    with open(os.path.join(idx, "merged_residuals.manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["chunks"]) == 1
