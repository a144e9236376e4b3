"""Serving layer: micro-batched HTTP search server (stdlib-only)."""

from fast_plaid_tpu.serving.batcher import BatchStats, MicroBatcher
from fast_plaid_tpu.serving.server import SearchServer, make_server

__all__ = ["MicroBatcher", "BatchStats", "SearchServer", "make_server"]
