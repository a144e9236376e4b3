"""Test/bench helpers: build a synthetic index fully in memory (no disk)."""

from __future__ import annotations

import numpy as np

import jax

from fast_plaid_tpu.index import ivf as ivf_mod
from fast_plaid_tpu.index.builder import (
    compress_documents,
    compress_tokens,
    train_codec_from_documents,
)
from fast_plaid_tpu.index.layout import (
    DeviceIndex,
    IndexSpec,
    build_emb_cache,
    to_device,
)
from fast_plaid_tpu.ops import codec as codec_ops
from fast_plaid_tpu.ops.kmeans import num_partitions_heuristic, train_kmeans

__all__ = [
    "random_documents",
    "random_queries",
    "random_flat_corpus",
    "random_flat_corpus_device",
    "build_memory_index",
    "build_memory_index_flat",
]


def random_flat_corpus_device(
    seed: int, n: int, length: int, dim: int, variable: bool = False
) -> tuple["jax.Array", np.ndarray]:
    """Device-generated corpus: [T, D] normalized tokens + host doc lengths.

    Benchmark corpora are synthesized with jax.random on the accelerator —
    host RNG throughput can be the build-wall-clock bottleneck on thin
    bench hosts (measured ~0.4M floats/s vs ~2B/s on a v5e), and the flat
    token array is consumed on device anyway.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    if variable:
        lens = rng.integers(max(length // 2, 1), length + 1, size=n).astype(
            np.int64
        )
    else:
        lens = np.full((n,), length, np.int64)
    t = int(lens.sum())

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (t, dim), dtype=jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    return gen(jax.random.PRNGKey(seed)), lens


def random_flat_corpus(
    rng: np.random.Generator, n: int, length: int, dim: int, variable: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Memory-lean corpus: one flat [T, D] token array + doc lengths.

    Avoids the per-document array list (3x peak RAM at large corpus sizes).
    """
    if variable:
        lens = rng.integers(max(length // 2, 1), length + 1, size=n).astype(
            np.int64
        )
    else:
        lens = np.full((n,), length, np.int64)
    t = int(lens.sum())
    flat = np.empty((t, dim), np.float32)
    block = 1 << 20
    for start in range(0, t, block):
        end = min(start + block, t)
        x = rng.standard_normal((end - start, dim)).astype(np.float32)
        flat[start:end] = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return flat, lens


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
    emb_cache: bool = False,
    length_buckets: int = 0,
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
    dev, ispec = to_device(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        nbits=nbits,
        device=device,
        length_buckets=length_buckets,
    )
    if emb_cache:
        dev = build_emb_cache(dev, ispec)
    return dev, ispec


def build_memory_index_flat(
    flat: np.ndarray,
    doc_lengths: np.ndarray,
    nbits: int = 4,
    seed: int = 42,
    k: int | None = None,
    kmeans_niters: int = 4,
    device=None,
    verbose: bool = False,
    emb_cache: bool = False,
    length_buckets: int = 0,
) -> tuple[DeviceIndex, IndexSpec]:
    """Memory-lean build from a flat token array (large-corpus benches).

    Codec training samples held-out tokens uniformly from the flat array
    instead of whole documents — statistically equivalent for quantile
    estimation, without materializing a per-document list.
    """
    import time

    import jax.numpy as jnp

    def mark(name, t0):
        if verbose:
            print(
                f"#   build phase {name}: {time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        return time.perf_counter()

    if (
        isinstance(flat, jax.Array)
        and device is None
        and length_buckets == 0
        and flat.shape[0] > 0
        and len(doc_lengths) > 0
    ):
        # Device-resident corpus: the fully on-device build never
        # round-trips corpus-sized arrays through the host.
        from fast_plaid_tpu.index.device_build import (
            build_memory_index_device,
        )

        return build_memory_index_device(
            flat,
            doc_lengths,
            nbits=nbits,
            seed=seed,
            k=k,
            kmeans_niters=kmeans_niters,
            emb_cache=emb_cache,
            verbose=verbose,
        )

    t = time.perf_counter()
    rng = np.random.default_rng(seed)
    if k is None:
        k = min(num_partitions_heuristic(flat.shape[0]), flat.shape[0])
    centroids = train_kmeans(flat, k=k, niters=kmeans_niters, seed=seed)
    centroids = np.asarray(centroids)
    t = mark(f"kmeans k={k}", t)

    heldout_n = min(50_000, flat.shape[0])
    hsel = np.sort(rng.choice(flat.shape[0], heldout_n, replace=False))
    heldout = np.asarray(flat[hsel], np.float32)  # device flats gather on-chip
    h_codes = np.asarray(
        codec_ops.assign_codes(jnp.asarray(heldout), jnp.asarray(centroids))
    )
    params = codec_ops.train_codec(heldout - centroids[h_codes], nbits)
    t = mark("codec", t)

    codes, packed = compress_tokens(flat, centroids, params.bucket_cutoffs, nbits)
    t = mark("compress", t)
    ivf, ivf_lengths = ivf_mod.build_ivf(
        codes, np.asarray(doc_lengths, np.int64), centroids.shape[0]
    )
    t = mark("ivf", t)
    dev, ispec = to_device(
        centroids=centroids,
        bucket_weights=params.bucket_weights,
        codes=codes,
        residuals=packed,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        nbits=nbits,
        device=device,
        length_buckets=length_buckets,
    )
    if emb_cache:
        dev = build_emb_cache(dev, ispec)
        t = mark("emb_cache", t)
    return dev, ispec
