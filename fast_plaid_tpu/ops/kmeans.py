"""Chunked Lloyd's k-means in pure JAX — TPU-native.

Re-owns the reference's k-means trainer (reference:
python/fast_plaid/search/kmeans.py:61-265 — a torch/Triton chunked Lloyd's
from the ``fastkmeans`` dependency) as a single jitted JAX function:

* distances via the ||x||^2 + ||c||^2 - 2 x.c expansion so the inner loop is
  one MXU matmul per (data-chunk, centroid) pair (kmeans.py:171-176),
* ``max_points_per_centroid`` subsampling before training (kmeans.py:116-123),
* empty-cluster re-init to random data points (kmeans.py:201-209),
* seeded and deterministic (kmeans.py:238-240).

Centroid means are accumulated with scatter-add (sorted-scatter on TPU)
instead of the reference's index_add loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["train_kmeans", "num_partitions_heuristic", "sample_size_heuristic"]


def num_partitions_heuristic(estimated_total_tokens: float) -> int:
    """K = 2^floor(log2(16 * sqrt(total_tokens))) (fast_plaid.py:146-154)."""
    return int(2 ** np.floor(np.log2(16 * np.sqrt(max(estimated_total_tokens, 1)))))


def sample_size_heuristic(num_documents: int) -> int:
    """Documents sampled for k-means: min(1 + 16*sqrt(120*N), N) (fast_plaid.py:109-115)."""
    return min(1 + int(16 * np.sqrt(120 * num_documents)), num_documents)


@functools.partial(jax.jit, static_argnames=("k", "niters", "chunk"))
def _lloyd(
    data: jax.Array,
    init: jax.Array,
    key: jax.Array,
    k: int,
    niters: int,
    chunk: int,
) -> jax.Array:
    """Fixed-iteration Lloyd's over [T, D] data with k centroids.

    The centroid update is a one-hot matmul segment-sum fused into the
    assignment scan — scatter-add is pathologically slow on TPU, whereas
    ``one_hot.T @ x`` rides the MXU.
    """
    t, d = data.shape
    pad = (-t) % chunk
    data_p = jnp.pad(data, ((0, pad), (0, 0)))
    valid = jnp.arange(t + pad) < t
    blocks = data_p.reshape(-1, chunk, d)
    valid_blocks = valid.reshape(-1, chunk)
    x2 = jnp.sum(blocks * blocks, axis=-1)  # [nb, chunk]

    def step(carry, _):
        centroids, key = carry
        c2 = jnp.sum(centroids * centroids, axis=-1)  # [k]

        def block_fn(acc, blk):
            x, xsq, ok = blk
            xc = jnp.dot(
                x.astype(jnp.bfloat16),
                centroids.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            dist = xsq[:, None] + c2[None, :] - 2.0 * xc
            codes = jnp.argmin(dist, axis=-1)
            onehot = (
                jax.nn.one_hot(codes, k, dtype=jnp.bfloat16)
                * ok[:, None].astype(jnp.bfloat16)
            )  # [chunk, k]
            sums_blk = jnp.dot(
                onehot.T, x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [k, d]
            counts_blk = jnp.sum(
                onehot, axis=0, dtype=jnp.float32
            )
            acc_sums, acc_counts = acc
            return (acc_sums + sums_blk, acc_counts + counts_blk), None

        init_acc = (
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k,), jnp.float32),
        )
        (sums, counts), _ = jax.lax.scan(
            block_fn, init_acc, (blocks, x2, valid_blocks)
        )
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters: re-seed from random data points.
        key, sub = jax.random.split(key)
        rand_idx = jax.random.randint(sub, (k,), 0, t)
        new_centroids = jnp.where(
            (counts > 0)[:, None], new_centroids, data[rand_idx]
        )
        return (new_centroids, key), None

    (centroids, _), _ = jax.lax.scan(step, (init, key), jnp.arange(niters))
    return centroids


def train_kmeans(
    data: np.ndarray,
    k: int,
    niters: int = 4,
    seed: int = 42,
    max_points_per_centroid: int = 256,
    chunk: int = 16384,
    normalize: bool = True,
) -> np.ndarray:
    """Train k-means centroids on [T, D] float data; returns [k, D] float32.

    Host-facing wrapper: subsamples to k * max_points_per_centroid points,
    seeds the init from a random permutation of the data, runs the jitted
    Lloyd's loop and (optionally) L2-normalizes the result — mirroring
    compute_kmeans (fast_plaid.py:71-185) end to end.
    """
    if not isinstance(data, jax.Array):
        # Host input: keep it numpy until the final transfer. Device input
        # (e.g. device-synthesized bench corpora) stays put — gathers and
        # slices below run on device, avoiding a host round-trip.
        data = np.asarray(data, dtype=np.float32)
    t = data.shape[0]
    k = int(min(k, t))
    rng = np.random.default_rng(seed)

    # Keep the [chunk, k] distance tile within ~1 GiB on device.
    max_chunk = max(1024, (1 << 30) // max(4 * k, 1))
    chunk = int(min(chunk, max_chunk))

    cap = k * max_points_per_centroid
    if t > cap:
        sel = np.sort(rng.choice(t, size=cap, replace=False))
        data = data[sel]
        t = cap

    # Trim to a whole number of chunks: the jitted Lloyd's program then has
    # a standard shape per (k, chunk), so compiles are reused across
    # corpora (dropping <1 chunk of random samples is statistically free).
    if t > chunk and t % chunk:
        t = (t // chunk) * chunk
        data = data[:t]

    init_idx = np.sort(rng.permutation(t)[:k])
    init = jnp.asarray(data[init_idx])
    key = jax.random.PRNGKey(seed)
    chunk = int(min(chunk, max(256, t)))
    centroids = _lloyd(jnp.asarray(data), init, key, k, int(niters), chunk)
    if isinstance(data, jax.Array):
        # Device input -> device output: in-memory builds keep the whole
        # pipeline on the accelerator (index/device_build.py) and a final
        # host fetch of [k, D] can dominate on remote-attached devices.
        if normalize:
            norms = jnp.linalg.norm(centroids, axis=-1, keepdims=True)
            centroids = centroids / jnp.maximum(norms, 1e-12)
        return centroids
    centroids = np.asarray(centroids, dtype=np.float32)
    if normalize:
        norms = np.linalg.norm(centroids, axis=-1, keepdims=True)
        centroids = centroids / np.maximum(norms, 1e-12)
    return centroids
