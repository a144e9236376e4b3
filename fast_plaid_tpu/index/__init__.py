"""Index subsystem: on-disk storage, device layout, IVF build, create pipeline."""

from fast_plaid_tpu.index.layout import DeviceIndex, IndexSpec, to_device  # noqa: F401
from fast_plaid_tpu.index.storage import IndexData, load_index_data  # noqa: F401

__all__ = ["DeviceIndex", "IndexSpec", "to_device", "IndexData", "load_index_data"]
