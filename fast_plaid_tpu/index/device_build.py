"""Fully device-resident in-memory index build.

The host build path (index/builder.py + layout.to_device) compresses on
device but round-trips every artifact through host RAM: fetch codes+packed
(~0.5 GB at 57k docs), re-pad to doc-major on the host, upload ~0.8 GB
back. On a directly-attached TPU that is wasted PCIe traffic; through a
remote-tunnel device it dominates the entire build (measured >5 min of a
6 min build). This module keeps every corpus-sized array on the
accelerator end to end:

* k-means, codec training (quantiles), compression — existing jitted ops,
  outputs simply never fetched;
* doc-major layout — one gather ``flat_pad[offsets[:, None] + iota]``
  instead of the host scatter in layout.to_device:197-247;
* IVF — sort-based (cell, pid) dedup + segment-sum lengths (the device
  analog of index/ivf.build_ivf, itself mirroring the reference's
  sort+bincount, rust/index/create.rs:55-132); only the [K] cell-length
  histogram is fetched (static cell_cap / candidate sizing need it).

Used for in-memory indexes (benches, tests, mesh-shard construction). The
persistent create() path still goes through index/builder.py — its output
must land in host files anyway.

Token-count limit: int32 gather indices cap a single in-memory index at
2^31 tokens (~2.1 B); the chunked on-disk path has no such limit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from fast_plaid_tpu.index.layout import (
    DeviceIndex,
    IndexSpec,
    align_ivf_device,
    build_emb_cache,
    round_up,
)
from fast_plaid_tpu.ops import codec

__all__ = ["build_memory_index_device", "DeviceCodec"]


class DeviceCodec(NamedTuple):
    """Codec parameters as device arrays (in-memory builds never persist)."""

    bucket_cutoffs: jax.Array  # [2^nbits - 1] f32
    bucket_weights: jax.Array  # [2^nbits] f32


@functools.partial(jax.jit, static_argnames=("nbits",))
def train_codec_device(
    heldout: jax.Array, centroids: jax.Array, nbits: int
) -> DeviceCodec:
    """Quantile codec training on device (semantics of codec.train_codec).

    One jitted program, one fused quantile call (jnp.quantile sorts its
    input once per call — separate cutoff/weight calls paid two sorts of
    the [heldout * D] residual flat).
    """
    codes = codec.assign_codes(heldout, centroids)
    res = (heldout - centroids[codes]).reshape(-1)
    n_options = 1 << nbits
    cut_q = np.arange(1, n_options) / n_options
    w_q = (np.arange(n_options) + 0.5) / n_options
    qs = jnp.quantile(
        res, jnp.asarray(np.concatenate([cut_q, w_q]), jnp.float32)
    ).astype(jnp.float32)
    return DeviceCodec(
        bucket_cutoffs=qs[: n_options - 1],
        bucket_weights=qs[n_options - 1 :],
    )


def _compress_device(
    flat: jax.Array,
    centroids: jax.Array,
    cutoffs: jax.Array,
    nbits: int,
    token_block: int = 1 << 20,
) -> tuple[jax.Array, jax.Array]:
    """codec.compress over fixed token blocks, outputs left on device."""
    t = flat.shape[0]
    cs, ps = [], []
    for start in range(0, t, token_block):
        end = min(start + token_block, t)
        x = flat[start:end]
        if end - start < token_block:
            x = jnp.pad(x, ((0, token_block - (end - start)), (0, 0)))
        c, p = codec.compress(x, centroids, cutoffs, nbits)
        cs.append(c[: end - start])
        ps.append(p[: end - start])
    if len(cs) == 1:
        return cs[0], ps[0]
    return jnp.concatenate(cs), jnp.concatenate(ps)


@functools.partial(jax.jit, static_argnames=("doc_cap",))
def _layout_docmajor(codes, packed, offsets, lengths, *, doc_cap):
    """Token-major flats -> doc-major (codes [Np, doc_cap], residuals
    lane-flattened [Np, doc_cap*PD]) via one gather.

    ``offsets``/``lengths`` are [Np] int32 (padding + sentinel rows have
    length 0). Out-of-range slots gather the appended zero row.
    """
    t = codes.shape[0]
    pd = packed.shape[1]
    codes_pad = jnp.concatenate([codes, jnp.zeros((1,), codes.dtype)])
    packed_pad = jnp.concatenate(
        [packed, jnp.zeros((1, pd), packed.dtype)]
    )
    iota = jnp.arange(doc_cap, dtype=jnp.int32)
    idx = jnp.where(
        iota[None, :] < lengths[:, None], offsets[:, None] + iota[None, :], t
    )
    return codes_pad[idx], packed_pad[idx].reshape(idx.shape[0], doc_cap * pd)


@functools.partial(jax.jit, static_argnames=("kp", "n_docs"))
def _ivf_device(codes, doc_starts, *, kp, n_docs):
    """Sort-based IVF: returns (pids-by-cell [T] i32, lengths [kp] i32, n_ivf).

    A document appears at most once per cell (dedup over (cell, pid) keys,
    same invariant as index/ivf.build_ivf). Tail entries beyond n_ivf hold
    the sentinel pid ``n_docs``. Within a cell, pids ascend (host-build
    parity). Caller guarantees (kp + 1) * (n_docs + 1) < 2^31: the fused
    int32 key + single-array bitonic sort is ~10x faster on TPU than the
    stable / multi-key comparator sorts (measured on v5e); _ivf_device_big
    covers corpora past the key range.
    """
    t = codes.shape[0]
    marks = jnp.zeros((t,), jnp.int32).at[doc_starts].add(1)
    doc_ids = jnp.cumsum(marks)  # doc_starts excludes doc 0's offset
    m = n_docs + 1
    key = codes * m + doc_ids
    sk = jnp.sort(key)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    sentinel_key = kp * m + n_docs  # sorts after every real (cell, pid)
    ivf_sorted = jnp.sort(jnp.where(is_first, sk, sentinel_key))
    ivf_pids = (ivf_sorted % m).astype(jnp.int32)
    cells = jnp.clip(sk // m, 0, kp - 1)
    ivf_len = jax.ops.segment_sum(
        is_first.astype(jnp.int32), cells, num_segments=kp
    )
    return ivf_pids, ivf_len, jnp.sum(is_first.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("kp", "n_docs"))
def _ivf_device_big(codes2d, lengths, *, kp, n_docs):
    """IVF for corpora whose fused (cell, pid) key exceeds int32.

    Dedup runs per document first (each doc's codes are one row of the
    doc-major layout; a batched row sort + neighbor compare marks one
    token per distinct cell), then one unstable key-value sort groups the
    survivors by cell. Within a cell pids are NOT sorted — search dedups
    and sorts candidates downstream, so only the grouping matters.
    """
    npd, cap = codes2d.shape
    iota = jnp.arange(cap, dtype=jnp.int32)
    cm = jnp.where(iota[None, :] < lengths[:, None], codes2d, kp)
    rs = jnp.sort(cm, axis=1)
    first = jnp.concatenate(
        [jnp.ones((npd, 1), bool), rs[:, 1:] != rs[:, :-1]], axis=1
    ) & (rs != kp)
    cell = jnp.where(first, rs, kp).reshape(-1)
    pid = jnp.broadcast_to(
        jnp.arange(npd, dtype=jnp.int32)[:, None], (npd, cap)
    ).reshape(-1)
    pid = jnp.where(first.reshape(-1), pid, n_docs)
    _, ivf_pids = jax.lax.sort(
        (cell, pid), dimension=0, num_keys=1, is_stable=False
    )
    ivf_len = jax.ops.segment_sum(
        first.reshape(-1).astype(jnp.int32),
        jnp.clip(cell, 0, kp - 1),
        num_segments=kp,
    )
    return ivf_pids, ivf_len, jnp.sum(first.astype(jnp.int32))


def build_memory_index_device(
    flat: jax.Array,
    doc_lengths: np.ndarray,
    *,
    nbits: int = 4,
    seed: int = 42,
    k: int | None = None,
    kmeans_niters: int = 4,
    emb_cache: bool = False,
    verbose: bool = False,
) -> tuple[DeviceIndex, IndexSpec]:
    """Build a searchable DeviceIndex from a device-resident [T, D] corpus.

    Only [K]-sized (or smaller) arrays ever touch the host; the corpus,
    its compressed form and the final doc-major layout stay on device.
    """
    import time

    from fast_plaid_tpu.ops.kmeans import (
        num_partitions_heuristic,
        sample_size_heuristic,
        train_kmeans,
    )

    def mark(name, t0, *wait):
        # Per-phase syncs run ONLY under ``verbose``: honest phase
        # walltimes need a barrier after every phase (jax.block_until_ready
        # is not sufficient — through remote-attached device services it
        # can return before execution completes, piling every phase's real
        # work onto the first later host fetch; measured 240 s
        # misattributed to a 0.2 s IVF phase — so each phase pulls one
        # VALUE from its outputs, utils.sync.value_pull). A production
        # build wants the opposite: no intermediate barriers, so the
        # phases' dispatches pipeline through the service and the only
        # syncs are the ones the build inherently needs (the [K] IVF
        # histogram fetch, and whatever the caller pulls at the end) —
        # measured 5-8 s of pure per-phase RTT saved at the bench scale.
        if verbose:
            from fast_plaid_tpu.utils.sync import value_pull

            value_pull(*wait)
            print(
                f"#   build phase {name}: {time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        return time.perf_counter()

    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    t = int(flat.shape[0])
    dim = int(flat.shape[1])
    doc_lengths = np.asarray(doc_lengths, np.int64)
    n_docs = int(len(doc_lengths))
    if k is None:
        k = min(num_partitions_heuristic(t), t)

    # Reference-parity k-means sampling: train on the token share of
    # min(1 + 16*sqrt(120*N), N) documents (fast_plaid.py:109-115), not
    # the whole corpus — k-means assignment matmuls dominate build FLOPs.
    # A strided device slice covers every document region uniformly
    # without a host-side permutation of T indices.
    frac = sample_size_heuristic(n_docs) / max(n_docs, 1)
    km_points = min(t, int(t * frac) + 1)
    km_data = flat
    if km_points < t:
        step = max(t // km_points, 1)
        km_data = jax.lax.slice(flat, (0, 0), (t, dim), (step, 1))
    centroids = train_kmeans(km_data, k=k, niters=kmeans_niters, seed=seed)
    centroids = jnp.asarray(centroids)  # device already if flat was
    t0 = mark(f"kmeans k={k}", t0, centroids)

    heldout_n = min(50_000, t)
    if heldout_n == t:
        # Every token is heldout: no sampling — keeps exact quantile
        # parity with the host builder on small corpora (and skips a
        # pointless gather).
        heldout = flat
    else:
        # Sampling WITH replacement: statistically equivalent for quantile
        # estimation at 50k of millions (collisions are rare and unbiased),
        # and O(heldout) on the host vs rng.choice's O(T) permutation —
        # measured ~1 s of pure host time at 8M tokens on a 1-core bench
        # host.
        hsel = np.sort(rng.integers(0, t, heldout_n))
        heldout = flat[jnp.asarray(hsel)]
    params = train_codec_device(heldout, centroids, nbits)
    t0 = mark("codec", t0, params)

    codes, packed = _compress_device(
        flat, centroids, params.bucket_cutoffs, nbits
    )
    t0 = mark("compress", t0, (codes, packed))

    # Doc-major layout (sentinel + 8-alignment as layout.to_device).
    doc_cap = round_up(max(int(doc_lengths.max()) if n_docs else 1, 1), 16)
    np_docs = round_up(n_docs + 1, 8)
    offsets = np.zeros((np_docs,), np.int32)
    offsets[:n_docs] = np.concatenate([[0], np.cumsum(doc_lengths)])[:-1]
    lengths = np.zeros((np_docs,), np.int32)
    lengths[:n_docs] = np.minimum(doc_lengths, doc_cap)
    offsets_dev = jnp.asarray(offsets)
    lengths_dev = jnp.asarray(lengths)
    codes2d, res2d = _layout_docmajor(
        codes, packed, offsets_dev, lengths_dev, doc_cap=doc_cap
    )
    t0 = mark("layout", t0, (codes2d, res2d))

    kp = round_up(max(k, 1), 128)
    if (kp + 1) * (n_docs + 1) < 2**31:
        doc_starts = jnp.asarray(
            (
                np.cumsum(doc_lengths)[:-1] if n_docs > 1 else np.zeros((0,))
            ).astype(np.int32)
        )
        ivf_pids, ivf_len_dev, n_ivf_dev = _ivf_device(
            codes, doc_starts, kp=kp, n_docs=n_docs
        )
    else:
        ivf_pids, ivf_len_dev, n_ivf_dev = _ivf_device_big(
            codes2d, lengths_dev, kp=kp, n_docs=n_docs
        )
    # The only host fetch of the build: [K] cell lengths (static cell_cap,
    # ivf window sizing, candidate-capacity stats all need the histogram).
    ivf_len_host = np.asarray(ivf_len_dev)
    del n_ivf_dev
    cell_cap = round_up(max(int(ivf_len_host.max()) if k else 1, 1), 8)
    # Aligned device layout (layout.align_ivf_device): candidate windows
    # become 2-D row gathers in the search engine.
    ivf_p, ivf_off, ivf_len = align_ivf_device(
        ivf_pids,
        ivf_len_host,
        k=k,
        kp=kp,
        n_docs=n_docs,
        cell_cap=cell_cap,
    )
    t0 = mark("ivf", t0)

    cent_p = jnp.zeros((kp, dim), jnp.float32).at[:k].set(centroids)
    dev = DeviceIndex(
        centroids=cent_p,
        bucket_weights=params.bucket_weights,
        codes=codes2d,
        residuals=res2d,
        doc_lengths=lengths_dev,
        ivf=ivf_p,
        ivf_offsets=jnp.asarray(ivf_off),
        ivf_lengths=jnp.asarray(ivf_len),
    )
    ispec = IndexSpec(
        dim=dim,
        nbits=nbits,
        n_docs=n_docs,
        n_partitions=k,
        doc_cap=doc_cap,
        cell_cap=cell_cap,
        has_ivf=True,
    )
    if emb_cache:
        dev = build_emb_cache(dev, ispec)
        t0 = mark("emb_cache", t0, dev.emb_cache)
    return dev, ispec
