"""Native C++ host kernels vs numpy reference implementations."""

import numpy as np
import pytest

from fast_plaid_tpu import native
from fast_plaid_tpu.index.ivf import build_ivf


@pytest.fixture(scope="module")
def lib_ok():
    ok = native.build_ivf_native(
        np.zeros(4, np.int32), np.asarray([2, 2], np.int64), 4
    )
    if ok is None:
        pytest.skip("native library unavailable (no toolchain)")
    return True


def test_build_ivf_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    n_docs, k = 200, 64
    doc_lengths = rng.integers(5, 30, n_docs).astype(np.int64)
    codes = rng.integers(0, k, int(doc_lengths.sum())).astype(np.int32)
    ivf_n, len_n = native.build_ivf_native(codes, doc_lengths, k)
    # numpy path (force below the size threshold by calling internals)
    pids = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lengths)
    key = codes.astype(np.int64) * n_docs + pids
    uniq = np.unique(key)
    ivf_np = (uniq % n_docs).astype(np.int32)
    len_np = np.bincount(uniq // n_docs, minlength=k).astype(np.int64)
    np.testing.assert_array_equal(ivf_n, ivf_np)
    np.testing.assert_array_equal(len_n, len_np)


def test_gather_windows(lib_ok):
    rng = np.random.default_rng(1)
    src = rng.integers(0, 255, (100, 8)).astype(np.uint8)
    indices = np.asarray([0, 10, 95, 50], np.int64)
    lengths = np.asarray([4, 6, 10, 0], np.int32)
    out = native.gather_windows_u8(src, indices, lengths, doc_cap=6)
    assert out.shape == (4, 6, 8)
    np.testing.assert_array_equal(out[0, :4], src[0:4])
    np.testing.assert_array_equal(out[0, 4:], 0)
    np.testing.assert_array_equal(out[1], src[10:16])
    # window clipped at the end of src, zero-filled beyond
    np.testing.assert_array_equal(out[2, :5], src[95:100])
    np.testing.assert_array_equal(out[2, 5:], 0)
    np.testing.assert_array_equal(out[3], 0)


def test_build_ivf_dispatch_small_uses_numpy():
    """Small builds stay on the numpy path and agree with the native one."""
    rng = np.random.default_rng(2)
    doc_lengths = rng.integers(2, 6, 10).astype(np.int64)
    codes = rng.integers(0, 8, int(doc_lengths.sum())).astype(np.int32)
    ivf, lengths = build_ivf(codes, doc_lengths, 8)
    assert lengths.sum() == len(ivf)
