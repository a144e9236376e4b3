"""Utilities: cross-process locking, resource profiling, device helpers."""

from fast_plaid_tpu.utils.locking import FileLock  # noqa: F401
from fast_plaid_tpu.utils.profile import profile_resources  # noqa: F401

__all__ = ["FileLock", "profile_resources"]
