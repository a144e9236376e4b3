"""Test/bench helpers: build a synthetic index fully in memory (no disk)."""

from __future__ import annotations

import numpy as np

from fast_plaid_tpu.index import ivf as ivf_mod
from fast_plaid_tpu.index.builder import (
    compress_documents,
    train_codec_from_documents,
)
from fast_plaid_tpu.index.layout import DeviceIndex, IndexSpec, to_device
from fast_plaid_tpu.ops.kmeans import num_partitions_heuristic, train_kmeans

__all__ = ["random_documents", "random_queries", "build_memory_index"]


def random_documents(
    rng: np.random.Generator, n: int, length: int, dim: int, variable: bool = False
) -> list[np.ndarray]:
    docs = []
    for _ in range(n):
        ln = int(rng.integers(max(length // 2, 1), length + 1)) if variable else length
        x = rng.standard_normal((ln, dim)).astype(np.float32)
        docs.append(x / np.linalg.norm(x, axis=-1, keepdims=True))
    return docs


def random_queries(
    rng: np.random.Generator, n: int, length: int, dim: int
) -> np.ndarray:
    x = rng.standard_normal((n, length, dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def build_memory_index(
    documents: list[np.ndarray],
    nbits: int = 4,
    seed: int = 42,
    k: int | None = None,
    kmeans_niters: int = 4,
    device=None,
    verbose: bool = False,
) -> tuple[DeviceIndex, IndexSpec]:
    """Full index build pipeline -> device arrays, skipping persistence."""
    import time

    def mark(name, t0):
        if verbose:
            print(f"#   build phase {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        return time.perf_counter()

    t = time.perf_counter()
    flat = np.concatenate(documents, axis=0)
    if k is None:
        k = min(num_partitions_heuristic(flat.shape[0]), flat.shape[0])
    t = mark("concat", t)
    centroids = train_kmeans(flat, k=k, niters=kmeans_niters, seed=seed)
    t = mark(f"kmeans k={k}", t)
    params = train_codec_from_documents(documents, centroids, nbits, seed)
    t = mark("codec", t)
    codes, packed = compress_documents(
        documents, centroids, params.bucket_cutoffs, nbits
    )
    t = mark("compress", t)
    doc_lengths = np.asarray([d.shape[0] for d in documents], np.int64)
    ivf, ivf_lengths = ivf_mod.build_ivf(codes, doc_lengths, centroids.shape[0])
    t = mark("ivf", t)
    return to_device(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        nbits=nbits,
        device=device,
    )
