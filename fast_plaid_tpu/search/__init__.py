"""Search package: FastPlaid API, engine, k-means, loading, update logic."""

from fast_plaid_tpu.search.fast_plaid import FastPlaid, resolve_devices
from fast_plaid_tpu.search.kmeans import compute_kmeans
from fast_plaid_tpu.search.searcher import search_on_device

__all__ = [
    "FastPlaid",
    "compute_kmeans",
    "resolve_devices",
    "search_on_device",
]
