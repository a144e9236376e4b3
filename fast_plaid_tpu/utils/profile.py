"""Opt-in resource profiling decorator.

TPU equivalent of the reference's @profile_resources (reference:
python/fast_plaid/search/profile.py:8-69): wall time, host RSS delta via
psutil, and device (HBM) memory via jax's per-device memory_stats —
replacing torch.cuda counters. Not wired into the main path; opt-in tooling.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

__all__ = ["profile_resources"]


def _device_mem_bytes() -> int:
    try:
        import jax

        total = 0
        for dev in jax.devices():
            stats = dev.memory_stats() or {}
            total += int(stats.get("bytes_in_use", 0))
        return total
    except Exception:
        return 0


def _rss_bytes() -> int:
    try:
        import psutil

        return int(psutil.Process().memory_info().rss)
    except Exception:
        return 0


def profile_resources(func: Callable[..., Any]) -> Callable[..., Any]:
    """Print wall time, RSS delta and device-memory delta around a call."""

    @functools.wraps(func)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        rss0 = _rss_bytes()
        dev0 = _device_mem_bytes()
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        try:
            import jax

            jax.block_until_ready(result)
        except Exception:
            pass
        dt = time.perf_counter() - t0
        rss1 = _rss_bytes()
        dev1 = _device_mem_bytes()
        mib = 1024 * 1024
        print(
            f"[profile] {func.__name__}: {dt:.3f}s | "
            f"RSS {rss0 / mib:.1f}->{rss1 / mib:.1f} MiB "
            f"(delta {(rss1 - rss0) / mib:+.1f}) | "
            f"device {dev0 / mib:.1f}->{dev1 / mib:.1f} MiB "
            f"(delta {(dev1 - dev0) / mib:+.1f})"
        )
        return result

    return wrapper
