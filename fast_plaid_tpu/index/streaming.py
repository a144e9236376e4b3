"""Streaming device-resident builds: corpora larger than any host buffer.

BASELINE's scale target (8.8M MS MARCO passages; BASELINE.md) cannot be
built by materializing the corpus: the raw [T, D] f32 tokens alone are
~270 GB. This module builds indexes from a *range-addressable chunk
source* — ``chunk_gen(d0, d1) -> [sum(lens[d0:d1]), D]`` tokens for a
contiguous doc range — compressing chunk by chunk on device and writing
straight into the final doc-major buffers (donated, so updates are
in-place; the token-major flat corpus never exists anywhere):

* ``build_memory_index_streaming`` — one device. Peak HBM = final index
  + one raw chunk.
* ``build_sharded_index_streaming`` — contiguous doc ranges per mesh
  shard (the reference has no analog; SURVEY §5.8). Each shard's buffers
  are built ON its own device and assembled into the mesh-sharded
  ShardedIndex with jax.make_array_from_single_device_arrays — the full
  index never exists on one device or on the host.

Centroids/codec are global: trained once on a token sample (k-means over
a capped subsample, quantiles on held-out residuals — the sampling
recipe of index/builder.train_codec_from_documents at corpus scale).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from fast_plaid_tpu.index.device_build import (
    DeviceCodec,
    _ivf_device_big,
    _layout_docmajor,
    train_codec_device,
)
from fast_plaid_tpu.index.layout import (
    DeviceIndex,
    IndexSpec,
    align_ivf_device,
    build_emb_cache,
    round_up,
)
from fast_plaid_tpu.ops import codec as codec_ops
from fast_plaid_tpu.ops.kmeans import num_partitions_heuristic, train_kmeans

__all__ = [
    "train_global_codec",
    "build_memory_index_streaming",
    "build_sharded_index_streaming",
]

ChunkGen = Callable[[int, int], jax.Array]


def train_global_codec(
    chunk_gen: ChunkGen,
    doc_lengths: np.ndarray,
    *,
    nbits: int,
    k: int | None = None,
    kmeans_niters: int = 4,
    max_points_per_centroid: int = 64,
    sample_docs: int | None = None,
    seed: int = 42,
) -> tuple[jax.Array, DeviceCodec, int]:
    """Train centroids + residual codec on a doc-prefix sample.

    Returns (centroids [k, D] device, DeviceCodec, k). ``sample_docs``
    defaults to the reference's 1 + 16*sqrt(120*N) document sample
    (create.rs:222-238); k to the partition heuristic on the FULL token
    count.
    """
    doc_lengths = np.asarray(doc_lengths, np.int64)
    n_docs = len(doc_lengths)
    total_tokens = int(doc_lengths.sum())
    if k is None:
        k = min(num_partitions_heuristic(total_tokens), total_tokens)
    if sample_docs is None:
        sample_docs = int(min(1 + 16.0 * math.sqrt(120.0 * n_docs), n_docs))
    sample_docs = max(1, min(sample_docs, n_docs))
    sample = chunk_gen(0, sample_docs)
    centroids = train_kmeans(
        sample,
        k=k,
        niters=kmeans_niters,
        seed=seed,
        max_points_per_centroid=max_points_per_centroid,
    )
    centroids = jnp.asarray(centroids)
    rng = np.random.default_rng(seed)
    heldout_n = min(50_000, sample.shape[0])
    hsel = np.sort(rng.choice(sample.shape[0], heldout_n, replace=False))
    params = train_codec_device(sample[jnp.asarray(hsel)], centroids, nbits)
    return centroids, params, int(k)


@partial(jax.jit, donate_argnums=(0, 1))
def _write_rows(codes2d, res2d, c_rows, p_rows, d0):
    """In-place (donated) write of one chunk's doc-major rows at row d0.

    ``res2d``/``p_rows`` are lane-flattened [*, doc_cap*PD].
    """
    codes2d = jax.lax.dynamic_update_slice(codes2d, c_rows, (d0, 0))
    res2d = jax.lax.dynamic_update_slice(res2d, p_rows, (d0, 0))
    return codes2d, res2d


def _stream_compress_into(
    chunk_gen: ChunkGen,
    doc_lengths: np.ndarray,
    centroids: jax.Array,
    cutoffs: jax.Array,
    *,
    nbits: int,
    doc_cap: int,
    np_docs: int,
    chunk_docs: int,
    device: jax.Device | None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compress doc chunks straight into doc-major buffers on ``device``.

    Returns (codes2d [np_docs, doc_cap] i32, res2d lane-flattened
    [np_docs, doc_cap*PD] u8, lengths [np_docs] i32). The final chunk is
    padded with zero-length rows up to np_docs, so every buffer row is
    written exactly once.
    """
    n_docs = len(doc_lengths)
    dim = centroids.shape[1]
    pd = codec_ops.packed_dim(dim, nbits)
    put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray

    lengths = np.zeros((np_docs,), np.int32)
    lengths[:n_docs] = np.minimum(doc_lengths, doc_cap)
    codes2d = put(jnp.zeros((np_docs, doc_cap), jnp.int32))
    res2d = put(jnp.zeros((np_docs, doc_cap * pd), jnp.uint8))
    if device is not None:
        centroids = jax.device_put(centroids, device)
        cutoffs = jax.device_put(cutoffs, device)

    # One static compress shape across chunks: pad every chunk's token
    # count to the largest chunk's (otherwise each chunk recompiles).
    bounds = list(range(0, n_docs, chunk_docs)) + [n_docs]
    tok_per_chunk = [
        int(doc_lengths[a:b].sum()) for a, b in zip(bounds[:-1], bounds[1:])
    ]
    t_pad = round_up(max(tok_per_chunk + [1]), 2048)

    for d0 in range(0, n_docs, chunk_docs):
        d1 = min(d0 + chunk_docs, n_docs)
        rows = chunk_docs if d1 - d0 == chunk_docs else np_docs - d0
        lens_c = np.zeros((rows,), np.int64)
        lens_c[: d1 - d0] = doc_lengths[d0:d1]
        flat = chunk_gen(d0, d1)
        if device is not None:
            flat = jax.device_put(flat, device)
        flat = jnp.asarray(flat)
        if flat.shape[0] < t_pad:
            flat = jnp.pad(flat, ((0, t_pad - flat.shape[0]), (0, 0)))
        c, p = codec_ops.compress(flat, centroids, cutoffs, nbits)
        offs = np.zeros((rows,), np.int32)
        offs[: d1 - d0] = np.concatenate([[0], np.cumsum(lens_c[: d1 - d0])])[
            :-1
        ]
        c_rows, p_rows = _layout_docmajor(
            c,
            p,
            put(offs),
            put(np.minimum(lens_c, doc_cap).astype(np.int32)),
            doc_cap=doc_cap,
        )
        codes2d, res2d = _write_rows(
            codes2d, res2d, c_rows, p_rows, jnp.int32(d0)
        )
        del flat, c, p, c_rows, p_rows
    return codes2d, res2d, put(lengths)


def _finalize_ivf(
    codes2d,
    lengths,
    *,
    k: int,
    kp: int,
    n_docs: int,
    cell_cap: int | None,
    pad_ivf_to: int | None,
):
    """IVF from doc-major codes; returns device arrays + host stats.

    The compact sort-based device IVF is re-laid into the 128-aligned
    layout (layout.align_ivf_device) so search fetches candidate windows
    as 2-D row gathers.
    """
    ivf_pids, ivf_len_dev, _n_ivf_dev = _ivf_device_big(
        codes2d, lengths, kp=kp, n_docs=n_docs
    )
    ivf_len_host = np.asarray(ivf_len_dev)
    if cell_cap is None:
        cell_cap = round_up(max(int(ivf_len_host.max()) if k else 1, 1), 8)
    ivf_pids, ivf_off, ivf_len = align_ivf_device(
        ivf_pids,
        ivf_len_host,
        k=k,
        kp=kp,
        n_docs=n_docs,
        cell_cap=cell_cap,
        pad_ivf_to=pad_ivf_to,
    )
    return ivf_pids, ivf_off, ivf_len, ivf_len_host, cell_cap


def build_memory_index_streaming(
    chunk_gen: ChunkGen,
    doc_lengths: np.ndarray,
    *,
    nbits: int = 4,
    k: int | None = None,
    centroids: jax.Array | None = None,
    codec_params: DeviceCodec | None = None,
    chunk_docs: int = 100_000,
    kmeans_niters: int = 4,
    sample_docs: int | None = None,
    seed: int = 42,
    emb_cache: bool = False,
    q4_cache: bool = False,
    verbose: bool = False,
) -> tuple[DeviceIndex, IndexSpec]:
    """Single-device streaming build; peak HBM = final index + one chunk.

    ``q4_cache`` builds the 4-bit prefilter cache as part of the build,
    BEFORE the IVF phase: the ~corpus-sized cache then lands in a monotone
    allocation sequence (codes, residuals, cache) ahead of the IVF sort's
    arena churn — requested after it, the contiguous allocation can fail
    on fragmentation with the capacity free (measured at 2M docs).
    """
    import time

    def mark(name, t0):
        if verbose:
            print(
                f"#   build phase {name}: {time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        return time.perf_counter()

    t0 = time.perf_counter()
    doc_lengths = np.asarray(doc_lengths, np.int64)
    n_docs = len(doc_lengths)
    if centroids is None or codec_params is None:
        centroids, codec_params, k = train_global_codec(
            chunk_gen,
            doc_lengths,
            nbits=nbits,
            k=k,
            kmeans_niters=kmeans_niters,
            sample_docs=sample_docs,
            seed=seed,
        )
        t0 = mark(f"codec+kmeans k={k}", t0)
    else:
        k = int(centroids.shape[0])
    dim = int(centroids.shape[1])
    kp = round_up(max(k, 1), 128)

    doc_cap = round_up(max(int(doc_lengths.max()) if n_docs else 1, 1), 16)
    np_docs = round_up(n_docs + 1, 8)
    q4_out = q4_scale_out = None
    if q4_cache:
        # Allocate the corpus-sized cache NOW, before compress: the chunk
        # loop's donated writes move the multi-GB codes/residual buffers
        # around the arena, after which a contiguous cache-sized request
        # can fail on fragmentation with the capacity free (measured at
        # 2M docs: 9 x 1 GB allocatable, one 6.15 GB denied).
        q4_out = jnp.zeros((np_docs * (doc_cap // 2), dim), jnp.uint8)
        q4_scale_out = jnp.zeros((np_docs,), jnp.float32)
    codes2d, res2d, lengths = _stream_compress_into(
        chunk_gen,
        doc_lengths,
        centroids,
        codec_params.bucket_cutoffs,
        nbits=nbits,
        doc_cap=doc_cap,
        np_docs=np_docs,
        chunk_docs=min(chunk_docs, n_docs),
        device=None,
    )
    t0 = mark("stream compress", t0)

    emb_q4 = q4_scale = None
    if q4_cache:
        from fast_plaid_tpu.index.layout import quantize_q4_all
        from fast_plaid_tpu.utils.sync import value_pull

        # Unpadded centroids suffice: codes < k index real rows only.
        emb_q4, q4_scale = quantize_q4_all(
            codes2d,
            res2d,
            centroids,
            codec_params.bucket_weights,
            nbits=nbits,
            out=q4_out,
            scale_out=q4_scale_out,
        )
        value_pull(emb_q4)
        t0 = mark("q4 cache", t0)

    ivf_pids, ivf_off, ivf_len, _, cell_cap = _finalize_ivf(
        codes2d,
        lengths,
        k=k,
        kp=kp,
        n_docs=n_docs,
        cell_cap=None,
        pad_ivf_to=None,
    )
    t0 = mark("ivf", t0)

    cent_p = jnp.zeros((kp, dim), jnp.float32).at[:k].set(centroids)
    dev = DeviceIndex(
        centroids=cent_p,
        bucket_weights=codec_params.bucket_weights,
        codes=codes2d,
        residuals=res2d,
        doc_lengths=lengths,
        ivf=ivf_pids,
        ivf_offsets=jnp.asarray(ivf_off),
        ivf_lengths=jnp.asarray(ivf_len),
        emb_q4=emb_q4,
        q4_scale=q4_scale,
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
        t0 = mark("emb_cache", t0)
    return dev, ispec


def build_sharded_index_streaming(
    chunk_gen: ChunkGen,
    doc_lengths: np.ndarray,
    mesh: Mesh,
    *,
    nbits: int = 4,
    k: int | None = None,
    centroids: jax.Array | None = None,
    codec_params: DeviceCodec | None = None,
    chunk_docs: int = 100_000,
    kmeans_niters: int = 4,
    sample_docs: int | None = None,
    seed: int = 42,
    verbose: bool = False,
):
    """Mesh-sharded streaming build: each shard's buffers live only on its
    device; the host holds nothing bigger than a [K] histogram.

    Documents are split into contiguous ranges (shard i owns
    [i*per, (i+1)*per)), so the existing doc_base global-id mapping and
    sharded_search (parallel/sharded.py) apply unchanged.
    """
    from fast_plaid_tpu.parallel.sharded import ShardedIndex

    doc_lengths = np.asarray(doc_lengths, np.int64)
    n_docs = len(doc_lengths)
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    devices = list(mesh.devices.flat)
    per = -(-n_docs // n_shards)

    if centroids is None or codec_params is None:
        centroids, codec_params, k = train_global_codec(
            chunk_gen,
            doc_lengths,
            nbits=nbits,
            k=k,
            kmeans_niters=kmeans_niters,
            sample_docs=sample_docs,
            seed=seed,
        )
    else:
        k = int(centroids.shape[0])
    dim = int(centroids.shape[1])
    kp = round_up(max(k, 1), 128)
    doc_cap = round_up(max(int(doc_lengths.max()) if n_docs else 1, 1), 16)
    np_docs = round_up(per + 1, 8)  # identical static shape per shard

    shard_parts = []
    for si in range(n_shards):
        d0, d1 = min(si * per, n_docs), min((si + 1) * per, n_docs)
        lens_s = doc_lengths[d0:d1]
        gen_s = lambda a, b, _d0=d0: chunk_gen(_d0 + a, _d0 + b)
        codes2d, res2d, lengths = _stream_compress_into(
            gen_s,
            lens_s,
            centroids,
            codec_params.bucket_cutoffs,
            nbits=nbits,
            doc_cap=doc_cap,
            np_docs=np_docs,
            chunk_docs=min(chunk_docs, max(len(lens_s), 1)),
            device=devices[si],
        )
        shard_parts.append(
            {"codes": codes2d, "res": res2d, "lens": lengths, "base": d0}
        )
        if verbose:
            print(f"#   shard {si}: docs [{d0}, {d1}) compressed", flush=True)

    # Shard IVFs (uniform pad: every shard has np_docs * doc_cap slots).
    cell_cap = 0
    ivf_raw = []
    for si, sp_ in enumerate(shard_parts):
        n_local = min((si + 1) * per, n_docs) - min(si * per, n_docs)
        pids, off, ln, ln_host, cc = _finalize_ivf(
            sp_["codes"],
            sp_["lens"],
            k=k,
            kp=kp,
            n_docs=n_local,
            cell_cap=None,
            pad_ivf_to=None,
        )
        ivf_raw.append((pids, off, ln, ln_host, n_local))
        cell_cap = max(cell_cap, cc)

    # Uniform per-shard static shape: the max of the shards' actual
    # aligned sizes (each already carries its own cell_cap tail padding).
    ivf_size = max(int(r[0].shape[0]) for r in ivf_raw)
    for si, (pids, off, ln, _, n_local) in enumerate(ivf_raw):
        pad = ivf_size - pids.shape[0]
        if pad > 0:
            pids = jnp.concatenate(
                [pids, jnp.full((pad,), n_local, jnp.int32)]
            )
        ivf_raw[si] = (pids[:ivf_size], off, ln, _, n_local)

    cent_host = np.zeros((kp, dim), np.float32)
    cent_host[:k] = np.asarray(centroids)
    weights_host = np.asarray(codec_params.bucket_weights, np.float32)

    shard_devs = []
    for si, sp_ in enumerate(shard_parts):
        pids, off, ln, _, n_local = ivf_raw[si]
        putd = lambda x, _d=devices[si]: jax.device_put(x, _d)
        shard_devs.append(
            DeviceIndex(
                centroids=putd(cent_host),
                bucket_weights=putd(weights_host),
                codes=sp_["codes"],
                residuals=sp_["res"],
                doc_lengths=sp_["lens"],
                ivf=putd(pids),
                ivf_offsets=putd(off),
                ivf_lengths=putd(ln),
            )
        )

    sharding = NamedSharding(mesh, P(axis))

    def assemble(*leaves):
        if leaves[0] is None:
            return None
        shape = (n_shards, *leaves[0].shape)
        return jax.make_array_from_single_device_arrays(
            shape, sharding, [x[None] for x in leaves]
        )

    dev = jax.tree.map(
        assemble, *shard_devs, is_leaf=lambda x: x is None
    )
    doc_base = jax.device_put(
        np.asarray([sp_["base"] for sp_ in shard_parts], np.int32), sharding
    )
    ispec = IndexSpec(
        dim=dim,
        nbits=nbits,
        n_docs=per,  # per-shard local id space; sentinel row `per` has
        n_partitions=k,  # length 0 in every shard (np_docs >= per + 1)
        doc_cap=doc_cap,
        cell_cap=cell_cap,
        has_ivf=True,
    )
    ivf_max = np.max(np.stack([r[3] for r in ivf_raw]), axis=0)
    return ShardedIndex(
        dev=dev,
        ispec=ispec,
        doc_base=doc_base,
        mesh=mesh,
        n_docs_total=n_docs,
        ivf_lengths_host=ivf_max,
    )
