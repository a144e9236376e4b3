"""On-disk index persistence.

Keeps the reference's durable-state contract (SURVEY.md §5.4; reference:
rust/index/create.rs:380-582, python/fast_plaid/search/load.py) — the index
directory IS the checkpoint, every mutation is written through before the
in-memory handle swaps:

    metadata.json        {num_chunks, nbits, num_partitions, num_embeddings,
                          avg_doclen, num_documents, compress_only, dim,
                          layout_version}
    plan.json            {nbits, num_chunks}
    centroids.npy        [K, D] float32
    bucket_cutoffs.npy   [2^nbits - 1] float32
    bucket_weights.npy   [2^nbits] float32
    avg_residual.npy     [D] float32
    cluster_threshold.npy scalar float32
    {i}.codes.npy        [tokens_i] int32
    {i}.residuals.npy    [tokens_i, D*nbits/8] uint8   (our packing, v1)
    doclens.{i}.json     list[int]
    {i}.metadata.json    {num_documents, num_embeddings, embedding_offset}
    ivf.npy / ivf_lengths.npy   (absent when compress_only)
    embeddings.npy       raw doc embeddings (object array) for small indexes
    buffer.npy           pending update buffer (object array)
    metadata.db          SQLite metadata store (see filtering/)

``layout_version: 1`` marks that residual bytes use the shift/mask packing
from fast_plaid_tpu.ops.codec (NOT binary-compatible with the reference's
bit-reversed packbits layout).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

__all__ = [
    "LAYOUT_VERSION",
    "IndexData",
    "load_index_data",
    "load_metadata",
    "save_metadata",
    "save_object_npy",
    "load_object_npy",
    "chunk_paths",
]

LAYOUT_VERSION = 1


def _p(index_path: str, name: str) -> str:
    return os.path.join(index_path, name)


def load_metadata(index_path: str) -> dict:
    with open(_p(index_path, "metadata.json")) as f:
        return json.load(f)


def save_metadata(index_path: str, meta: dict) -> None:
    with open(_p(index_path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=4)


def save_object_npy(path: str, arrays: list[np.ndarray]) -> None:
    """Persist a list of [L_i, D] float arrays as a pickled object .npy.

    Same contract as the reference's save_list_tensors_on_disk
    (load.py:430-444) — used for embeddings.npy / buffer.npy.
    """
    obj = np.empty(len(arrays), dtype=object)
    for i, a in enumerate(arrays):
        obj[i] = np.asarray(a, dtype=np.float32)
    np.save(path, obj, allow_pickle=True)


def load_object_npy(path: str) -> list[np.ndarray]:
    obj = np.load(path, allow_pickle=True)
    return [np.asarray(a, dtype=np.float32) for a in obj]


def chunk_paths(index_path: str, i: int) -> tuple[str, str, str, str]:
    return (
        _p(index_path, f"{i}.codes.npy"),
        _p(index_path, f"{i}.residuals.npy"),
        _p(index_path, f"doclens.{i}.json"),
        _p(index_path, f"{i}.metadata.json"),
    )


@dataclass
class IndexData:
    """Host-side (numpy) view of a fully loaded index."""

    centroids: np.ndarray  # [K, D] f32
    bucket_cutoffs: np.ndarray  # [2^nbits - 1] f32
    bucket_weights: np.ndarray  # [2^nbits] f32
    avg_residual: np.ndarray  # [D] f32
    cluster_threshold: float
    codes: np.ndarray  # [T] int32
    residuals: np.ndarray  # [T, PD] uint8
    doc_lengths: np.ndarray  # [N] int32
    ivf: np.ndarray | None  # [I] int32
    ivf_lengths: np.ndarray | None  # [K] int64
    metadata: dict

    @property
    def nbits(self) -> int:
        return int(self.metadata["nbits"])

    @property
    def dim(self) -> int:
        return int(self.centroids.shape[1])


def load_index_data(index_path: str) -> IndexData | None:
    """Load every on-disk artifact into host memory (mmap for the big flats).

    Mirrors _load_index_tensors_cpu (reference load.py:220-322) without the
    merged-mmap cache: chunks are concatenated directly. Returns None when
    no index exists yet.
    """
    meta_path = _p(index_path, "metadata.json")
    if not os.path.exists(meta_path):
        return None
    metadata = load_metadata(index_path)
    num_chunks = int(metadata["num_chunks"])

    centroids = np.load(_p(index_path, "centroids.npy")).astype(np.float32)
    bucket_cutoffs = np.load(_p(index_path, "bucket_cutoffs.npy")).astype(np.float32)
    bucket_weights = np.load(_p(index_path, "bucket_weights.npy")).astype(np.float32)
    avg_residual = np.load(_p(index_path, "avg_residual.npy")).astype(np.float32)
    cluster_threshold = float(
        np.load(_p(index_path, "cluster_threshold.npy")).item()
    )

    codes_list, res_list, doclens = [], [], []
    for i in range(num_chunks):
        cpath, rpath, dpath, _ = chunk_paths(index_path, i)
        codes_list.append(np.load(cpath, mmap_mode="r"))
        res_list.append(np.load(rpath, mmap_mode="r"))
        with open(dpath) as f:
            doclens.extend(json.load(f))

    if codes_list:
        codes = np.concatenate([np.asarray(c, dtype=np.int32) for c in codes_list])
        residuals = np.concatenate([np.asarray(r) for r in res_list], axis=0)
    else:
        pd = (centroids.shape[1] * int(metadata["nbits"])) // 8
        codes = np.zeros((0,), dtype=np.int32)
        residuals = np.zeros((0, pd), dtype=np.uint8)
    doc_lengths = np.asarray(doclens, dtype=np.int32)

    ivf = ivf_lengths = None
    if os.path.exists(_p(index_path, "ivf.npy")):
        ivf = np.load(_p(index_path, "ivf.npy")).astype(np.int32)
        ivf_lengths = np.load(_p(index_path, "ivf_lengths.npy")).astype(np.int64)

    return IndexData(
        centroids=centroids,
        bucket_cutoffs=bucket_cutoffs,
        bucket_weights=bucket_weights,
        avg_residual=avg_residual,
        cluster_threshold=cluster_threshold,
        codes=codes,
        residuals=residuals,
        doc_lengths=doc_lengths,
        ivf=ivf,
        ivf_lengths=ivf_lengths,
        metadata=metadata,
    )
