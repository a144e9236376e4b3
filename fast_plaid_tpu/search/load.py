"""Index loading onto devices.

Equivalent of the reference's load.py + construct_index (reference:
python/fast_plaid/search/load.py:220-427, rust/search/load.rs:124-186): read
the on-disk artifacts once on the host, then materialize the static padded
device layout (index/layout.py) on every requested device — in parallel
across devices, as the reference does with its ThreadPoolExecutor.

low_memory mode keeps the residuals (the dominant payload: 16x the codes at
nbits=4, d=128) in host RAM; the searcher streams only the R rerank rows
per query batch to the device (the reference instead pins whole
StridedTensors to CPU and streams every lookup, load.rs:141-173).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax

from fast_plaid_tpu.index.layout import (
    DeviceIndex,
    IndexSpec,
    build_emb_cache,
    build_q4_cache,
    emb_cache_bytes,
    q4_cache_bytes,
    quantize_q4_rows,
    to_device,
)
from fast_plaid_tpu.index.storage import load_index_data

__all__ = ["reload_index", "LoadedIndex", "default_emb_cache_budget"]


class LoadedIndex:
    """One device's resident index: arrays + static spec + the jax device."""

    def __init__(
        self,
        dev: DeviceIndex,
        ispec: IndexSpec,
        device: jax.Device,
        ivf_lengths_host=None,
        low_memory: bool = False,
        host_codes: np.ndarray | None = None,
        host_residuals: np.ndarray | None = None,
        host_doc_offsets: np.ndarray | None = None,
        host_doc_lengths: np.ndarray | None = None,
    ):
        self.dev = dev
        self.ispec = ispec
        self.device = device
        # Host-side IVF length stats feed candidate-capacity sizing.
        self.ivf_lengths_host = ivf_lengths_host
        self.low_memory = low_memory
        self.host_codes = host_codes
        self.host_residuals = host_residuals
        self.host_doc_offsets = host_doc_offsets
        self.host_doc_lengths = host_doc_lengths


def default_emb_cache_budget(device: jax.Device) -> int:
    """Platform default for the rerank-cache HBM budget (bf16 or q4 tier).

    Accelerators trade HBM for rerank speed by default (the dequant
    select-sum otherwise dominates stage 6); the budget is sized from the
    device's real free HBM when the runtime reports it (leaving ~2 GB of
    headroom for search temporaries), else a conservative 4 GB. On CPU
    hosts memory is the scarcer resource, so the cache is opt-in.
    """
    import os

    env = os.environ.get("FASTPLAID_TPU_EMB_CACHE_BYTES")
    if env is not None:
        return int(env)
    if device.platform == "cpu":
        return 0
    try:
        stats = device.memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        used = int(stats.get("bytes_in_use", 0))
        if limit > 0:
            return max(0, int(0.95 * (limit - used)) - 2 * 1024**3)
    except Exception:
        pass
    return 4 * 1024 * 1024 * 1024


def _construct(
    data,
    device: jax.Device,
    low_memory: bool,
    emb_cache_budget: int | None = None,
    length_buckets: int = 4,
) -> LoadedIndex:
    dev, ispec = to_device(
        centroids=data.centroids,
        bucket_weights=data.bucket_weights,
        codes=data.codes,
        residuals=data.residuals,
        doc_lengths=data.doc_lengths,
        ivf=data.ivf,
        ivf_lengths=data.ivf_lengths,
        nbits=data.nbits,
        device=device,
        residuals_on_device=not low_memory,
        length_buckets=0 if low_memory else length_buckets,
    )
    budget = (
        default_emb_cache_budget(device)
        if emb_cache_budget is None
        else emb_cache_budget
    )
    if not low_memory:
        if 0 < emb_cache_bytes(ispec) <= budget:
            dev = build_emb_cache(dev, ispec)
        elif ispec.dim % 2 == 0 and 0 < q4_cache_bytes(ispec) <= budget:
            # bf16 cache too big, q4 tier fits: prefilter from the 4x
            # smaller copy, exact-rescore the top slice via the codec.
            # (q4 re-quantizes the *decompressed* corpus, so it applies
            # at any codec nbits.) Building BOTH tiers is a measured net
            # loss — the rerank kernels are row-DMA-bound, see
            # engine.search_impl.
            dev = build_q4_cache(dev, ispec)
    host_kwargs = {}
    if low_memory:
        doc_lengths = np.asarray(data.doc_lengths, np.int64)
        offsets = np.concatenate([[0], np.cumsum(doc_lengths)])[:-1].astype(
            np.int64
        )
        host_kwargs = {
            # Keep the merged-file mmaps as-is: low_memory's host arrays can
            # stay disk-backed and page in on demand.
            "host_codes": data.codes,
            "host_residuals": data.residuals,
            "host_doc_offsets": offsets,
            "host_doc_lengths": doc_lengths.astype(np.int32),
        }
    loaded = LoadedIndex(
        dev,
        ispec,
        device,
        ivf_lengths_host=data.ivf_lengths,
        low_memory=low_memory,
        **host_kwargs,
    )
    if (
        low_memory
        and ispec.dim % 2 == 0
        and 0 < q4_cache_bytes(ispec) <= budget
    ):
        _build_q4_from_host(loaded)
    return loaded


def _build_q4_from_host(loaded: LoadedIndex, block: int = 8192) -> None:
    """Build the device q4 prefilter cache from host-resident residuals.

    low_memory keeps codes/residuals in host RAM; this streams doc-major
    row blocks to the device once (wire bytes ~= the finished cache) and
    quantizes there. Afterwards the searcher scores all rerank candidates
    on-device and host-streams only the rescue pool's rows per query —
    ~30x less per-query interconnect traffic than reranking from host
    rows alone.
    """
    import jax.numpy as jnp

    from fast_plaid_tpu.search.searcher import host_gather_rows

    dev = loaded.dev
    ispec = loaded.ispec
    np_docs = int(dev.codes.shape[0])
    packed_parts = []
    scale_parts = []
    for start in range(0, np_docs, block):
        n = min(block, np_docs - start)
        pids = np.arange(start, start + n, dtype=np.int64)[None]
        codes_rows, res_rows, _ = host_gather_rows(loaded, pids)
        cr = jax.device_put(
            np.ascontiguousarray(codes_rows[0]), loaded.device
        )
        rr = jax.device_put(np.ascontiguousarray(res_rows[0]), loaded.device)
        p, s = quantize_q4_rows(
            cr,
            rr,
            dev.centroids,
            dev.bucket_weights,
            nbits=ispec.nbits,
        )
        packed_parts.append(p)
        scale_parts.append(s)
    loaded.dev = dev._replace(
        emb_q4=jnp.concatenate(packed_parts),
        q4_scale=jnp.concatenate(scale_parts),
    )


def reload_index(
    index_path: str,
    devices: list[jax.Device],
    low_memory: bool = False,
    emb_cache_budget: int | None = None,
    length_buckets: int = 4,
) -> dict[str, LoadedIndex | None]:
    """Load the index for each device; returns {device_str: LoadedIndex|None}.

    low_memory is ignored for CPU devices (host == device memory there, as in
    the reference: the flag "has no effect when device='cpu'", README).
    ``length_buckets`` bounds the length-bucketed rerank layout (0/1
    disables; applied only when the corpus length skew pays for it).
    """
    data = load_index_data(index_path)
    if data is None:
        return {str(d): None for d in devices}

    def construct(d: jax.Device) -> LoadedIndex:
        return _construct(
            data,
            d,
            low_memory and d.platform != "cpu",
            emb_cache_budget=emb_cache_budget,
            length_buckets=length_buckets,
        )

    out: dict[str, LoadedIndex | None] = {}
    if len(devices) == 1:
        out[str(devices[0])] = construct(devices[0])
        return out
    with ThreadPoolExecutor(max_workers=len(devices)) as pool:
        futures = {str(d): pool.submit(construct, d) for d in devices}
        for key, fut in futures.items():
            try:
                out[key] = fut.result()
            except Exception as exc:  # degrade per device like load.py:414-416
                print(f"Failed to load index on {key}: {exc}")
                out[key] = None
    return out
