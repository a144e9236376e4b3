"""Device-resident index layout — the TPU replacement for StridedTensor.

The reference stores jagged per-document data in a ``StridedTensor``
(reference: rust/search/tensor.rs:154-355) whose lookup picks an as_strided
view per batch. XLA wants static shapes, and TPU gathers are billed per
ROW, not per byte — so documents live in a doc-major padded layout:

* ``codes``     [Np, doc_cap]       int32 — one row gather fetches a whole
* ``residuals`` [Np, doc_cap, PD]   uint8   document's tokens
* ``doc_lengths`` [Np] int32 masks the padding tail (0 beyond n_docs)

(The flat token-major form with offset+iota windows costs one gather row
PER TOKEN — ~160x more gather descriptors per candidate.)

IVF cells keep the flat+offsets form (their gathers are one row per
candidate slot already) with a static ``cell_cap`` window. One sentinel
document (pid == n_docs, length 0) absorbs invalid candidate slots.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DeviceIndex",
    "DocBucket",
    "IndexSpec",
    "to_device",
    "round_up",
    "plan_buckets",
    "build_emb_cache",
    "emb_cache_bytes",
    "build_q4_cache",
    "q4_cache_bytes",
    "quantize_q4_rows",
    "IVF_ALIGN",
    "aligned_ivf_len",
    "align_ivf_device",
]

# Device IVF alignment: every cell's list starts on a multiple of this, so
# candidate windows are whole rows of dev.ivf.reshape(-1, IVF_ALIGN) (one
# TPU lane width of int32) and fetch as an efficient 2-D row gather instead
# of per-element unaligned slices.
IVF_ALIGN = 128


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def aligned_ivf_len(ivf_lengths: "np.ndarray") -> int:
    """Flat length of the IVF_ALIGN-aligned device layout for these cells."""
    lens = np.asarray(ivf_lengths, np.int64)
    return int((-(-lens // IVF_ALIGN)).sum()) * IVF_ALIGN


def align_ivf_device(
    ivf_pids: jax.Array,
    ivf_len_host: "np.ndarray",
    *,
    k: int,
    kp: int,
    n_docs: int,
    cell_cap: int,
    pad_ivf_to: int | None = None,
):
    """Re-lay a compact device-resident flat IVF into the aligned layout.

    ``ivf_pids`` holds the cells' pid lists back to back (the natural output
    of the sort-based device IVF build); lengths are host-known. Returns
    (aligned flat device array, aligned ivf_offsets, ivf_lengths) matching
    the host layout produced by ``to_device``. One pass of element gathers
    (O(total) one-time at build) buys row-gather candidate windows on every
    subsequent query.
    """
    lens = np.asarray(ivf_len_host[:k], np.int64)
    nrows_c = -(-lens // IVF_ALIGN)
    row_start = np.concatenate([[0], np.cumsum(nrows_c)])
    n_rows = int(row_start[-1])
    n_aligned = n_rows * IVF_ALIGN
    src_off = np.concatenate([[0], np.cumsum(lens)])[:-1]
    owner = np.repeat(np.arange(k, dtype=np.int64), nrows_c)
    local = np.arange(n_rows, dtype=np.int64) - row_start[owner]
    src_start = (src_off[owner] + IVF_ALIGN * local).astype(np.int32)
    rem = (lens[owner] - IVF_ALIGN * local).astype(np.int32)

    iota = jnp.arange(IVF_ALIGN, dtype=jnp.int32)
    idx = jnp.asarray(src_start)[:, None] + iota[None, :]
    idx = jnp.clip(idx, 0, max(int(ivf_pids.shape[0]) - 1, 0))
    rows = ivf_pids[idx]
    rows = jnp.where(
        iota[None, :] < jnp.asarray(rem)[:, None], rows, jnp.int32(n_docs)
    )
    flat = rows.reshape(-1)
    size = round_up(
        max(pad_ivf_to or n_aligned, n_aligned), IVF_ALIGN
    ) + round_up(cell_cap, IVF_ALIGN)
    if size > n_aligned:
        flat = jnp.concatenate(
            [flat, jnp.full((size - n_aligned,), n_docs, jnp.int32)]
        )
    ivf_off = np.zeros((kp + 8,), np.int32)
    ivf_off[:k] = (row_start[:-1] * IVF_ALIGN).astype(np.int32)
    ivf_off[k:] = n_aligned
    ivf_len = np.zeros((kp + 8,), np.int32)
    ivf_len[:k] = lens.astype(np.int32)
    return flat, ivf_off, ivf_len


class DocBucket(NamedTuple):
    """Doc-major token rows for one length bucket (a JAX pytree).

    The TPU analog of StridedTensor's quantile strides (reference:
    rust/search/tensor.rs:154-191): documents whose length falls in this
    bucket are stored padded to the bucket cap instead of the corpus max,
    so rerank gather bytes and MaxSim FLOPs scale with the length
    *distribution*, not the longest document. The final row of each array
    is all-zeros and absorbs sentinel/padding lookups.
    """

    codes: jax.Array  # [Nb + 1, cap_b] int32
    residuals: jax.Array | None  # [Nb + 1, cap_b * PD] u8 (lane-flattened)
    emb: jax.Array | None = None  # [Nb + 1, cap_b, D] bf16 cache


class DeviceIndex(NamedTuple):
    """All device-resident arrays of one loaded index (a JAX pytree)."""

    centroids: jax.Array  # [Kp, D] float32, rows >= K are zero
    bucket_weights: jax.Array  # [2^nbits] float32
    codes: jax.Array  # [Np, doc_cap] int32 doc-major
    # Residuals are stored LANE-FLATTENED [Np, doc_cap * PD] uint8: a
    # trailing PD (e.g. 64) below the 128-byte TPU lane width would be
    # tile-padded 2x in HBM (measured 15.3 GB for 7.6 GB of data at 2M
    # docs). gather_res() restores the [.., doc_cap, PD] view per gather.
    residuals: jax.Array | None  # [Np, doc_cap * PD] u8 (None in low_memory)
    doc_lengths: jax.Array  # [Np] int32 (0 beyond n_docs)
    ivf: jax.Array  # [Ip] int32 (pids, grouped by cell)
    ivf_offsets: jax.Array  # [Kp + 8] int32
    ivf_lengths: jax.Array  # [Kp + 8] int32 (0 beyond K)
    # Optional decompressed-corpus cache [Np, doc_cap, D] bf16 (normalized
    # embeddings). Trades HBM for rerank speed: the dominant rerank cost is
    # the per-candidate dequant select-sum (VPU-bound); with the cache the
    # rerank is gather+MXU only. Built when the corpus fits the HBM budget.
    emb_cache: jax.Array | None = None
    # Optional 4-bit prefilter cache (ops/q4cache.py): the decompressed
    # corpus re-quantized to 4 bits/dim with one f32 scale per token. 4x
    # smaller than ``emb_cache``; stage 6 scores every rerank candidate
    # from it and exact-rescores only the top slice through the codec, so
    # returned scores stay codec-exact. In low_memory mode it lives on
    # device in place of the residuals and shrinks the host->device
    # rerank stream ~30x (only the rescore slice crosses).
    emb_q4: jax.Array | None = None  # [Np * doc_cap/2, D] u8 (row 2-D)
    q4_scale: jax.Array | None = None  # [Np] f32 per-document scale
    # Length-bucketed rerank layout (ispec.bucket_caps non-empty when set):
    # residuals/emb live per bucket at the bucket cap; ``residuals`` /
    # ``emb_cache`` above are then None.
    doc_bucket: jax.Array | None = None  # [Np] int32 bucket id per pid
    doc_bucket_row: jax.Array | None = None  # [Np] int32 row within bucket
    buckets: tuple[DocBucket, ...] = ()


@dataclass(frozen=True)
class IndexSpec:
    """Static (hashable) shape/config info that accompanies a DeviceIndex."""

    dim: int
    nbits: int
    n_docs: int
    n_partitions: int  # real K (centroids rows < Kp are real)
    doc_cap: int  # static per-document token window
    cell_cap: int  # static per-IVF-cell window
    has_ivf: bool
    # Length-bucket plan (empty = single doc_cap layout). caps ascend and
    # end at doc_cap; counts are real-document counts per bucket and drive
    # the static rerank quotas (engine._bucket_quota).
    bucket_caps: tuple[int, ...] = ()
    bucket_counts: tuple[int, ...] = ()

    @property
    def sentinel_pid(self) -> int:
        return self.n_docs


def plan_buckets(
    doc_lengths: np.ndarray,
    doc_cap: int,
    max_buckets: int = 4,
    min_gain: float = 1.4,
) -> list[int] | None:
    """Choose length-bucket caps from the corpus length distribution.

    Candidate caps sit at length quantiles (the reference StridedTensor
    uses .5/.75/.9/.95 quantile strides, tensor.rs:163-177); caps too close
    to the next larger one are merged. Returns ascending caps ending at
    ``doc_cap``, or None when one bucket is within ``min_gain`` of optimal
    (uniform corpora shouldn't pay the multi-pass overhead).
    """
    lens = np.minimum(np.asarray(doc_lengths, np.int64), doc_cap)
    if lens.size == 0 or max_buckets <= 1:
        return None
    qs = np.linspace(0.5, 1.0, num=max_buckets)
    caps = sorted(
        {
            min(int(round_up(max(int(np.quantile(lens, q)), 1), 16)), doc_cap)
            for q in qs
        }
    )
    caps[-1] = doc_cap
    # Merge caps that don't save meaningfully vs the next larger cap.
    kept = [caps[-1]]
    for c in reversed(caps[:-1]):
        if c <= kept[-1] * 0.7:
            kept.append(c)
    caps = sorted(kept)
    if len(caps) == 1:
        return None
    which = np.searchsorted(caps, lens, side="left")
    padded = sum(
        int((which == i).sum()) * c for i, c in enumerate(caps)
    )
    gain = (lens.size * doc_cap) / max(padded, 1)
    return caps if gain >= min_gain else None


def to_device(
    *,
    centroids: np.ndarray,
    bucket_weights: np.ndarray,
    codes: np.ndarray,
    residuals: np.ndarray,
    doc_lengths: np.ndarray,
    ivf: np.ndarray | None,
    ivf_lengths: np.ndarray | None,
    nbits: int,
    device: jax.Device | None = None,
    doc_cap: int | None = None,
    cell_cap: int | None = None,
    pad_docs_to: int | None = None,
    pad_ivf_to: int | None = None,
    residuals_on_device: bool = True,
    length_buckets: int = 0,
) -> tuple[DeviceIndex, IndexSpec]:
    """Pad host arrays (token-major flats) into the doc-major device layout.

    The ``pad_*``/``*_cap`` overrides force common static shapes across
    shards of a mesh-sharded index (parallel/sharded.py); padding documents
    are addressable but zero-length, so they can never become candidates.

    ``length_buckets > 1`` enables the length-bucketed rerank layout (up to
    that many buckets, chosen by ``plan_buckets``): residuals are stored per
    length bucket at the bucket cap instead of one [Np, doc_cap, PD] array,
    so rerank cost tracks the length distribution rather than the longest
    document. Applied only when the corpus is skewed enough to pay off.
    """
    k, dim = centroids.shape
    n_real_docs = int(len(doc_lengths))
    n_docs = max(pad_docs_to or n_real_docs, n_real_docs)
    n_tokens = int(codes.shape[0])
    pd = residuals.shape[1] if residuals.ndim == 2 else (dim * nbits) // 8

    doc_lengths = np.asarray(doc_lengths, dtype=np.int64)
    if doc_cap is None:
        doc_cap = round_up(
            max(int(doc_lengths.max()) if n_real_docs else 1, 1), 16
        )
    kp = round_up(max(k, 1), 128)

    # Documents (+1 sentinel with length 0) in doc-major padded form.
    np_docs = round_up(n_docs + 1, 8)
    offsets = (
        np.concatenate([[0], np.cumsum(doc_lengths)])[:-1]
        if n_real_docs
        else np.zeros((0,), np.int64)
    )
    codes2d = np.zeros((np_docs, doc_cap), dtype=np.int32)
    lengths = np.zeros((np_docs,), dtype=np.int32)
    clipped = np.minimum(doc_lengths, doc_cap)
    if n_real_docs:
        doc_ids = np.repeat(np.arange(n_real_docs, dtype=np.int64), doc_lengths)
        within = np.arange(n_tokens, dtype=np.int64) - np.repeat(
            offsets, doc_lengths
        )
        keep = within < doc_cap
        dst = doc_ids[keep] * doc_cap + within[keep]
        codes_np = np.asarray(codes, np.int32)
        codes2d.reshape(-1)[dst] = codes_np[keep]
    lengths[:n_real_docs] = clipped.astype(np.int32)

    caps = (
        plan_buckets(clipped, doc_cap, max_buckets=length_buckets)
        if (length_buckets > 1 and residuals_on_device and n_real_docs)
        else None
    )
    host_buckets: list[tuple[np.ndarray, np.ndarray]] = []
    bucket_counts: list[int] = []
    doc_bucket = doc_bucket_row = None
    if caps:
        res_np = np.asarray(residuals)
        which = np.searchsorted(caps, clipped, side="left")  # [n_real]
        row_in_bucket = np.zeros((n_real_docs,), np.int64)
        for i in range(len(caps)):
            m = which == i
            bucket_counts.append(int(m.sum()))
            row_in_bucket[m] = np.arange(bucket_counts[-1])
        for i, cap_b in enumerate(caps):
            nb = bucket_counts[i]
            codes_b = np.zeros((nb + 1, cap_b), dtype=np.int32)
            res_b = np.zeros((nb + 1, cap_b, pd), dtype=np.uint8)
            in_b = (which[doc_ids] == i) & (within < cap_b)
            dst_b = row_in_bucket[doc_ids[in_b]] * cap_b + within[in_b]
            codes_b.reshape(-1)[dst_b] = codes_np[in_b]
            res_b.reshape(-1, pd)[dst_b] = res_np[in_b]
            host_buckets.append(
                (codes_b, res_b.reshape(nb + 1, cap_b * pd))
            )
        # Padding docs and the sentinel resolve to bucket 0's zero row.
        doc_bucket = np.zeros((np_docs,), np.int32)
        doc_bucket[:n_real_docs] = which
        doc_bucket_row = np.full((np_docs,), bucket_counts[0], np.int32)
        doc_bucket_row[:n_real_docs] = row_in_bucket

    if caps:
        residuals2d = None  # residuals live only in the buckets
    elif residuals_on_device:
        residuals2d = np.zeros((np_docs, doc_cap, pd), dtype=np.uint8)
        if n_real_docs:
            residuals2d.reshape(-1, pd)[dst] = np.asarray(residuals)[keep]
        residuals2d = residuals2d.reshape(np_docs, doc_cap * pd)
    else:
        # low_memory: residuals stay in host RAM (flat, possibly mmap) and
        # are streamed per query batch for the rerank stage only (the TPU
        # analog of the reference's CPU-pinned StridedTensors,
        # load.rs:141-173 + tensor.rs:299-304).
        residuals2d = None

    cent_p = np.zeros((kp, dim), dtype=np.float32)
    cent_p[:k] = centroids.astype(np.float32, copy=False)

    if ivf is not None and ivf_lengths is not None:
        # 128-ALIGNED device layout: every cell's list starts on a multiple
        # of IVF_ALIGN, so the search engine fetches candidate windows as
        # whole rows of dev.ivf.reshape(-1, IVF_ALIGN) — an efficient 2-D
        # row gather. Unaligned dynamic-slice windows lower to per-ELEMENT
        # gathers on TPU (measured 23 ms/256-query tile at the bench shape
        # vs <1 ms for the aligned row fetch). Alignment waste is bounded
        # by one row per cell (<~5% at the partition-count heuristic).
        lens64 = np.asarray(ivf_lengths, np.int64)
        if cell_cap is None:
            cell_cap = round_up(max(int(ivf_lengths.max()) if k else 1, 1), 8)
        nrows_c = -(-lens64 // IVF_ALIGN)
        row_start = np.concatenate([[0], np.cumsum(nrows_c)])
        n_aligned = int(row_start[-1]) * IVF_ALIGN
        pad_ivf = round_up(max(pad_ivf_to or n_aligned, n_aligned), IVF_ALIGN)
        ip = pad_ivf + round_up(cell_cap, IVF_ALIGN)
        ivf_p = np.full((ip,), n_docs, dtype=np.int32)  # pad -> sentinel pid
        n_ivf = int(ivf.shape[0])
        if n_ivf:
            cell_of = np.repeat(np.arange(k, dtype=np.int64), lens64)
            src_off = np.concatenate([[0], np.cumsum(lens64)])[:-1]
            within = np.arange(n_ivf, dtype=np.int64) - np.repeat(
                src_off, lens64
            )
            dst = row_start[cell_of] * IVF_ALIGN + within
            ivf_p[dst] = ivf.astype(np.int32, copy=False)
        ivf_off = np.zeros((kp + 8,), dtype=np.int32)
        ivf_len = np.zeros((kp + 8,), dtype=np.int32)
        ivf_len[:k] = ivf_lengths.astype(np.int32, copy=False)
        ivf_off[:k] = (row_start[:-1] * IVF_ALIGN).astype(np.int32)
        ivf_off[k:] = n_aligned
        has_ivf = True
    else:
        cell_cap = cell_cap or 8
        ivf_p = np.full(
            (round_up(cell_cap, IVF_ALIGN),), n_docs, dtype=np.int32
        )
        ivf_off = np.zeros((kp + 8,), dtype=np.int32)
        ivf_len = np.zeros((kp + 8,), dtype=np.int32)
        has_ivf = False

    put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
    dev = DeviceIndex(
        centroids=put(cent_p),
        bucket_weights=put(np.asarray(bucket_weights, dtype=np.float32)),
        codes=put(codes2d),
        residuals=put(residuals2d) if residuals2d is not None else None,
        doc_lengths=put(lengths),
        ivf=put(ivf_p),
        ivf_offsets=put(ivf_off),
        ivf_lengths=put(ivf_len),
        doc_bucket=put(doc_bucket) if doc_bucket is not None else None,
        doc_bucket_row=(
            put(doc_bucket_row) if doc_bucket_row is not None else None
        ),
        buckets=tuple(
            DocBucket(codes=put(cb), residuals=put(rb))
            for cb, rb in host_buckets
        ),
    )
    spec = IndexSpec(
        dim=dim,
        nbits=nbits,
        n_docs=n_docs,
        n_partitions=k,
        doc_cap=doc_cap,
        cell_cap=cell_cap,
        has_ivf=has_ivf,
        bucket_caps=tuple(caps) if caps else (),
        bucket_counts=tuple(bucket_counts),
    )
    return dev, spec


def gather_res(res_flat: jax.Array, idx: jax.Array, cap: int) -> jax.Array:
    """Row gather from the lane-flattened residual store.

    [N, cap*PD] taken at [...] indices -> [..., cap, PD] uint8.
    """
    return res_flat[idx].reshape(*idx.shape, cap, -1)


def emb_cache_bytes(ispec: IndexSpec) -> int:
    """HBM cost of the decompressed-corpus cache for this index."""
    if ispec.bucket_caps:
        return sum(
            (n + 1) * cap * ispec.dim * 2
            for n, cap in zip(ispec.bucket_counts, ispec.bucket_caps)
        )
    np_docs = round_up(ispec.n_docs + 1, 8)
    return np_docs * ispec.doc_cap * ispec.dim * 2


def build_emb_cache(
    dev: DeviceIndex, ispec: IndexSpec, block: int = 2048
) -> DeviceIndex:
    """Decompress the whole corpus once into a bf16 HBM cache.

    One pass of the same dequant the rerank would otherwise run per
    (query, candidate); afterwards stage 6 is pure gather + MXU matmul.
    Requires device-resident residuals (full-cap or length-bucketed).
    """
    if dev.buckets:
        if dev.buckets[0].emb is not None:
            return dev
        new_buckets = []
        for bk in dev.buckets:
            emb = _decompress_2d(
                bk.codes,
                bk.residuals,
                dev.centroids,
                dev.bucket_weights,
                nbits=ispec.nbits,
                block=min(block, bk.codes.shape[0]),
            )
            new_buckets.append(bk._replace(emb=emb))
        return dev._replace(buckets=tuple(new_buckets))

    if dev.residuals is None or dev.emb_cache is not None:
        return dev

    cache = _decompress_2d(
        dev.codes,
        dev.residuals,
        dev.centroids,
        dev.bucket_weights,
        nbits=ispec.nbits,
        block=min(block, dev.codes.shape[0]),
    )
    return dev._replace(emb_cache=cache)


def q4_cache_bytes(ispec: IndexSpec) -> int:
    """HBM cost of the 4-bit prefilter cache (packed data + per-doc scale)."""
    np_docs = round_up(ispec.n_docs + 1, 8)
    return np_docs * (ispec.doc_cap * ispec.dim // 2 + 4)


def build_q4_cache(
    dev: DeviceIndex, ispec: IndexSpec, block: int = 2048
) -> DeviceIndex:
    """Quantize the decompressed corpus into the 4-bit prefilter cache.

    Blockwise decompress -> quantize so the full bf16 corpus never
    materializes (that's the tier's reason to exist). Requires
    device-resident residuals in the flat (non-bucketed) layout.
    """
    if dev.residuals is None or dev.buckets or dev.emb_q4 is not None:
        return dev
    out, scale_out = quantize_q4_all(
        dev.codes,
        dev.residuals.reshape(dev.codes.shape[0], -1),
        dev.centroids,
        dev.bucket_weights,
        nbits=ispec.nbits,
        block=block,
    )
    return dev._replace(emb_q4=out, q4_scale=scale_out)


def quantize_q4_all(
    codes,
    res_flat,
    centroids,
    bucket_weights,
    *,
    nbits,
    block: int = 2048,
    out=None,
    scale_out=None,
):
    """Quantize the whole doc-major corpus into the q4 cache (in place).

    Preallocates the finished cache and DONATES it through a host-level
    segment loop: each jitted call decompresses+quantizes one ``seg``-doc
    slice and writes it with a single dynamic_update_slice into the
    donated cache, so every program's live set is residuals (input) +
    the one cache (aliased in place) + a ~0.4 GB segment temp. Both a
    stacked-scan whole-corpus program and a fori_loop carrying the cache
    double the cache live (program-result copy / while-carry ping-pong
    respectively) — measured OOM at 2M docs with residuals resident.
    Segment starts clamp to n - seg (reads AND writes together), so the
    tail segment re-processes a few docs instead of shifting them — the
    per-block read-only clamp this replaces silently misaligned the
    final partial block's docs at corpus sizes not divisible by `block`.

    The streaming builder calls this BEFORE its IVF phase: the cache is
    then the 4th large allocation in a monotone sequence (codes, res,
    cache), ahead of the IVF sort's churn — allocated after it, the
    ~6 GB contiguous request can fail on arena fragmentation even with
    the capacity free (measured at 2M docs).
    """
    n, cap = codes.shape
    blk = min(block, n)
    seg_blocks = min(64, n // blk)
    seg = blk * seg_blocks  # <= n by construction
    d2 = centroids.shape[-1]
    if out is None:
        # Callers at the HBM limit preallocate ``out``/``scale_out`` EARLY
        # (see q4_cache_buffers): donated chunk writes move multi-GB
        # buffers around this service's arena, and a late ~6 GB contiguous
        # request can fail on fragmentation with the capacity free in
        # smaller pieces (measured: 9 x 1 GB allocatable, 6.15 GB denied).
        out = jnp.zeros((n * (cap // 2), d2), jnp.uint8)
        scale_out = jnp.zeros((n,), jnp.float32)
    assert out.shape == (n * (cap // 2), d2) and scale_out is not None
    for s in range(-(-n // seg)):
        start = min(s * seg, n - seg)
        out, scale_out = _write_q4_seg(
            out,
            scale_out,
            codes,
            res_flat,
            centroids,
            bucket_weights,
            jnp.int32(start),
            nbits=nbits,
            block=blk,
            seg=seg,
        )
    return out, scale_out


@functools.partial(jax.jit, static_argnames=("nbits",))
def quantize_q4_rows(codes_rows, res_rows, centroids, bucket_weights, *, nbits):
    """Decompress + q4-quantize pre-gathered doc-major rows.

    [N, cap] codes + [N, cap, PD] residuals -> ([N * cap/2, D] u8 packed,
    [N] f32 per-doc scales). The packed store is 2-D with D on lanes —
    the exact layout the Pallas q4 kernel DMAs (doc row block =
    [pid*cap/2, (pid+1)*cap/2)); any other shape forces XLA to relayout
    the WHOLE cache at search time (measured: a 5.7 GB HLO-temp copy at
    2M docs). The low_memory cache builder streams host rows through
    this in blocks (the wire bytes equal the finished cache, so building
    costs one pass of the corpus over the interconnect).
    """
    from fast_plaid_tpu.ops import codec as codec_ops
    from fast_plaid_tpu.ops.q4cache import quantize_emb_q4

    n, cap = codes_rows.shape
    emb = codec_ops.decompress(
        codes_rows, res_rows, centroids, bucket_weights, nbits
    )
    packed, scale = quantize_emb_q4(emb)
    return packed.reshape(n * (cap // 2), -1), scale


@functools.partial(
    jax.jit, static_argnames=("nbits", "block", "seg"), donate_argnums=(0, 1)
)
def _write_q4_seg(
    out,
    scale_out,
    codes,
    res_flat,
    centroids,
    bucket_weights,
    start,
    *,
    nbits,
    block,
    seg,
):
    """Decompress+quantize one ``seg``-doc slice into the donated cache.

    ``out`` [n*(cap/2), D] u8 / ``scale_out`` [n] f32 are donated and
    updated with one dynamic_update_slice each — XLA aliases the donated
    input to the program result, so the cache exists exactly once.
    ``start`` is a traced doc offset (one compilation serves every
    segment); ``seg`` is a multiple of ``block`` and <= n, the caller
    clamps start to n - seg.
    """
    from fast_plaid_tpu.ops import codec as codec_ops
    from fast_plaid_tpu.ops.q4cache import quantize_emb_q4

    n, cap = codes.shape
    pd = res_flat.shape[1] // cap
    cc = jax.lax.dynamic_slice(codes, (start, 0), (seg, cap))
    rr = jax.lax.dynamic_slice(res_flat, (start, 0), (seg, cap * pd))

    def one(i):
        c_blk = jax.lax.dynamic_slice(cc, (i * block, 0), (block, cap))
        r_blk = jax.lax.dynamic_slice(
            rr, (i * block, 0), (block, cap * pd)
        ).reshape(block, cap, pd)
        emb = codec_ops.decompress(
            c_blk, r_blk, centroids, bucket_weights, nbits
        )
        packed, scale = quantize_emb_q4(emb)
        return packed.reshape(block * (cap // 2), -1), scale

    packed_seg, scale_seg = jax.lax.map(
        one, jnp.arange(seg // block, dtype=jnp.int32)
    )
    d2 = packed_seg.shape[-1]
    out = jax.lax.dynamic_update_slice(
        out, packed_seg.reshape(seg * (cap // 2), d2), (start * (cap // 2), 0)
    )
    scale_out = jax.lax.dynamic_update_slice(
        scale_out, scale_seg.reshape(seg), (start,)
    )
    return out, scale_out


@functools.partial(
    jax.jit, static_argnames=("nbits", "block", "seg"), donate_argnums=(0,)
)
def _write_emb_seg(
    out, codes, res_flat, centroids, bucket_weights, start, *, nbits, block, seg
):
    """Decompress one ``seg``-doc slice into the donated bf16 cache.

    Same shape as _write_q4_seg: ``out`` [n, cap, D] bf16 is donated and
    updated with one dynamic_update_slice, so XLA aliases it in place and
    the cache exists exactly once per program. ``start`` is traced (one
    compilation serves every segment); the caller clamps it to n - seg.
    """
    from fast_plaid_tpu.ops import codec as codec_ops

    n, cap = codes.shape
    pd = res_flat.shape[1] // cap
    cc = jax.lax.dynamic_slice(codes, (start, 0), (seg, cap))
    rr = jax.lax.dynamic_slice(res_flat, (start, 0), (seg, cap * pd))

    def one(i):
        c_blk = jax.lax.dynamic_slice(cc, (i * block, 0), (block, cap))
        r_blk = jax.lax.dynamic_slice(
            rr, (i * block, 0), (block, cap * pd)
        ).reshape(block, cap, pd)
        return codec_ops.decompress(
            c_blk, r_blk, centroids, bucket_weights, nbits,
            out_dtype=jnp.bfloat16,
        )

    emb_seg = jax.lax.map(one, jnp.arange(seg // block, dtype=jnp.int32))
    dim = emb_seg.shape[-1]
    return jax.lax.dynamic_update_slice(
        out, emb_seg.reshape(seg, cap, dim), (start, 0, 0)
    )


def _decompress_2d(codes, residuals, centroids, bucket_weights, *, nbits, block):
    """Decompress a whole [N, cap(, PD)] doc-major array into a bf16 cache.

    Same realization as quantize_q4_all (whose in-place pattern this
    inherits — the 4x-larger bf16 cache needs it even more): the finished
    cache is preallocated once and DONATED through a host-level segment
    loop of _write_emb_seg calls, so every program's live set is the
    inputs + the one cache (aliased in place) + one segment temp. A
    fori_loop carrying the cache ping-pongs two full-size copies
    (while-carry double buffering — the pattern quantize_q4_all measured
    OOM at 2M docs), and a stacked-scan result costs a full-size
    program-result copy. Segment starts clamp to n - seg with reads AND
    writes together, so a ragged tail re-processes a few rows instead of
    shifting them (the read-only clamp this lineage replaced misaligned
    tail docs: planted hit@1 0.641 at 3k docs).
    """
    n, cap = codes.shape
    res_flat = residuals.reshape(n, -1)  # lane-flattened or [N, cap, PD]
    dim = centroids.shape[-1]
    blk = min(block, n)
    seg_blocks = min(64, n // blk)
    seg = blk * seg_blocks  # <= n by construction
    out = jnp.zeros((n, cap, dim), jnp.bfloat16)
    for s in range(-(-n // seg)):
        start = min(s * seg, n - seg)
        out = _write_emb_seg(
            out,
            codes,
            res_flat,
            centroids,
            bucket_weights,
            jnp.int32(start),
            nbits=nbits,
            block=blk,
            seg=seg,
        )
    return out
