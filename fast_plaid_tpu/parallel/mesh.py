"""Device mesh helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "pick_devices"]


def pick_devices(n_devices: int | None = None) -> list[jax.Device]:
    """Choose devices for a mesh: default backend first, CPU fallback.

    When the default backend has fewer devices than requested (the common
    single-real-chip dev setup), fall back to the virtual CPU devices
    created by --xla_force_host_platform_device_count.
    """
    devs = jax.devices()
    if n_devices is None:
        return list(devs)
    if len(devs) >= n_devices:
        return list(devs[:n_devices])
    cpus = jax.devices("cpu")
    if len(cpus) >= n_devices:
        return list(cpus[:n_devices])
    msg = (
        f"Requested {n_devices} devices but only {len(devs)} "
        f"{devs[0].platform} and {len(cpus)} cpu devices exist."
    )
    raise RuntimeError(msg)


def make_mesh(
    n_devices: int | None = None,
    devices: list[jax.Device] | None = None,
    axis: str = "d",
) -> Mesh:
    """1-D mesh over ``n_devices`` (document- or query-sharding axis)."""
    if devices is None:
        devices = pick_devices(n_devices)
    return Mesh(np.asarray(devices), (axis,))
