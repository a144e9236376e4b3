"""Pallas fused gather+MaxSim kernel vs the XLA rerank path.

The kernel (ops/rerank_kernel.py) only lowers on real TPU hardware, and
conftest pins this test session to a virtual CPU mesh — so the numerical
check runs in a subprocess with the ambient (TPU) platform restored. Run
with FASTPLAID_TPU_TESTS=1 on a TPU-attached host; skipped otherwise.
The same comparison is exercised implicitly by bench.py on every round.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
from fast_plaid_tpu.ops.rerank_kernel import maxsim_gather_scores

npd, cap, d, b, r, q = 500, 48, 128, 9, 130, 24  # odd sizes exercise padding
rng = np.random.default_rng(0)
emb = jnp.asarray(rng.standard_normal((npd, cap, d)), jnp.bfloat16)
pids = jnp.asarray(rng.integers(0, npd, (b, r)), jnp.int32)
lens = jnp.asarray(rng.integers(0, cap + 1, (b, r)), jnp.int32)
qs = jnp.asarray(rng.standard_normal((b, q, d)), jnp.float32)

out = np.asarray(maxsim_gather_scores(emb, pids, lens, qs))

e = np.asarray(emb, np.float32)[np.asarray(pids)]
ts = np.einsum("brtd,bqd->brtq", e, np.asarray(qs.astype(jnp.bfloat16), np.float32))
mask = np.arange(cap)[None, None, :] < np.asarray(lens)[:, :, None]
ref = np.where(mask[..., None], ts, -np.inf).max(axis=2).sum(axis=-1)

finite = np.isfinite(ref)
assert (np.isfinite(out) == finite).all(), "empty-row -inf mismatch"
diff = np.abs(out[finite] - ref[finite]).max() if finite.any() else 0.0
assert diff < 2e-2, f"kernel vs reference MaxSim diff {diff}"
print("rerank kernel ok, max diff", diff)
"""


_Q4_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
from fast_plaid_tpu.ops.q4cache import quantize_emb_q4, score_q4
from fast_plaid_tpu.ops.rerank_kernel import maxsim_q4_gather_scores

npd, cap, d, b, r, qn = 500, 48, 128, 9, 130, 24  # odd sizes exercise padding
rng = np.random.default_rng(0)
emb = rng.standard_normal((npd, cap, d)).astype(np.float32)
lens = rng.integers(1, cap + 1, npd).astype(np.int32)
lens[-1] = 0  # zero-length sentinel row
for i in range(npd):
    emb[i, lens[i]:] = 0
packed, scale = jax.jit(quantize_emb_q4)(jnp.asarray(emb))
packed_flat = packed.reshape(npd * (cap // 2), -1)
pids = rng.integers(0, npd, (b, r)).astype(np.int32)
pids[0, :4] = npd - 1  # sentinel hits must score -inf
queries = rng.standard_normal((b, qn, d)).astype(np.float32)

ref = np.asarray(score_q4(
    packed_flat, scale, jnp.asarray(lens), jnp.asarray(pids),
    jnp.asarray(queries)))
ker = np.asarray(maxsim_q4_gather_scores(
    packed_flat, scale, jnp.asarray(pids),
    jnp.asarray(lens)[jnp.asarray(pids)], jnp.asarray(queries)))
finite = np.isfinite(ref)
assert (np.isfinite(ker) == finite).all(), "empty-row -inf mismatch"
diff = np.abs(ker[finite] - ref[finite]).max()
rel = diff / max(1e-9, np.abs(ref[finite]).max())
assert rel < 2e-2, f"q4 kernel vs XLA rel diff {rel}"
print("q4 rerank kernel ok, rel diff", rel)
"""


def _run_on_ambient_tpu(script: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Drop the conftest CPU pin (ambient JAX_PLATFORMS stays as the host
    # configured it — the real TPU backend).
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.skipif(
    os.environ.get("FASTPLAID_TPU_TESTS") != "1",
    reason="TPU-only kernel; set FASTPLAID_TPU_TESTS=1 on a TPU host",
)
def test_kernel_matches_brute_force_tpu():
    proc = _run_on_ambient_tpu(_SCRIPT)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "rerank kernel ok" in proc.stdout


@pytest.mark.skipif(
    os.environ.get("FASTPLAID_TPU_TESTS") != "1",
    reason="TPU-only kernel; set FASTPLAID_TPU_TESTS=1 on a TPU host",
)
def test_q4_kernel_matches_xla_tpu():
    proc = _run_on_ambient_tpu(_Q4_SCRIPT)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "q4 rerank kernel ok" in proc.stdout
