"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Tests are host-runnable (like the reference suite, which runs on CPU —
/root/reference/tests/test.py uses device="cpu" throughout) while still
exercising the multi-chip sharding paths on a virtual 8-device mesh.
Must run before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

# This environment may pin the default backend to a (possibly remote) TPU
# via JAX_PLATFORMS; tests must stay on the host CPU backend, so route all
# uncommitted computation to cpu:0 explicitly.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def test_index_path(tmp_path):
    """Temporary index directory (mirrors the reference fixture, test.py:10-23)."""
    path = tmp_path / "test_index"
    yield str(path)
    gc.collect()
