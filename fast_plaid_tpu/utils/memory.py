"""Array / device memory debug helpers.

Parity with the reference's debug-only tensor-size printer
(reference: rust/utils/memory.rs:4-20), extended with a device-memory
summary from jax's per-device stats. Opt-in tooling; not wired into the
main path.
"""

from __future__ import annotations

__all__ = ["print_array_memory", "device_memory_summary"]


def _human(n_bytes: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n_bytes) < 1024.0:
            return f"{n_bytes:.2f} {unit}"
        n_bytes /= 1024.0
    return f"{n_bytes:.2f} PiB"


def print_array_memory(name: str, array) -> None:
    """Print a human-readable size line for a numpy/jax array."""
    nbytes = getattr(array, "nbytes", None)
    if nbytes is None:
        import numpy as np

        arr = np.asarray(array)
        nbytes = arr.nbytes
    shape = tuple(getattr(array, "shape", ()))
    dtype = getattr(array, "dtype", "?")
    print(f"[memory] {name}: shape={shape} dtype={dtype} size={_human(nbytes)}")


def device_memory_summary() -> str:
    """One line per device: bytes in use / peak / limit (when reported)."""
    import jax

    lines = []
    for dev in jax.devices():
        stats = dev.memory_stats() or {}
        in_use = stats.get("bytes_in_use")
        peak = stats.get("peak_bytes_in_use")
        limit = stats.get("bytes_limit")
        parts = [f"{dev}"]
        if in_use is not None:
            parts.append(f"in_use={_human(in_use)}")
        if peak is not None:
            parts.append(f"peak={_human(peak)}")
        if limit is not None:
            parts.append(f"limit={_human(limit)}")
        lines.append(" ".join(parts))
    summary = "\n".join(lines)
    print(summary)
    return summary
