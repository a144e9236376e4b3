"""Index loading onto devices.

Equivalent of the reference's load.py + construct_index (reference:
python/fast_plaid/search/load.py:220-427, rust/search/load.rs:124-186): read
the on-disk artifacts once on the host, then materialize the static padded
device layout (index/layout.py) on every requested device — in parallel
across devices, as the reference does with its ThreadPoolExecutor.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax

from fast_plaid_tpu.index.layout import DeviceIndex, IndexSpec, to_device
from fast_plaid_tpu.index.storage import load_index_data

__all__ = ["reload_index", "LoadedIndex"]


class LoadedIndex:
    """One device's resident index: arrays + static spec + the jax device."""

    def __init__(
        self,
        dev: DeviceIndex,
        ispec: IndexSpec,
        device: jax.Device,
        ivf_lengths_host=None,
    ):
        self.dev = dev
        self.ispec = ispec
        self.device = device
        # Host-side IVF length stats feed candidate-capacity sizing.
        self.ivf_lengths_host = ivf_lengths_host


def _construct(data, device: jax.Device) -> LoadedIndex:
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
    )
    return LoadedIndex(dev, ispec, device, ivf_lengths_host=data.ivf_lengths)


def reload_index(
    index_path: str, devices: list[jax.Device]
) -> dict[str, LoadedIndex | None]:
    """Load the index for each device; returns {device_str: LoadedIndex|None}."""
    data = load_index_data(index_path)
    if data is None:
        return {str(d): None for d in devices}

    out: dict[str, LoadedIndex | None] = {}
    if len(devices) == 1:
        out[str(devices[0])] = _construct(data, devices[0])
        return out
    with ThreadPoolExecutor(max_workers=len(devices)) as pool:
        futures = {str(d): pool.submit(_construct, data, d) for d in devices}
        for key, fut in futures.items():
            try:
                out[key] = fut.result()
            except Exception as exc:  # degrade per device like load.py:414-416
                print(f"Failed to load index on {key}: {exc}")
                out[key] = None
    return out
