"""Optional encoder utilities.

The engine itself is model-agnostic: it indexes and searches multi-vector
(per-token) embeddings from any late-interaction model. The reference keeps
encoders external too (its benchmarks use pylate ColBERT models,
reference: docs/benchmark/benchmark.py:44-48). This package provides two
interchangeable ColBERT-style encoders over HuggingFace checkpoints:
``ColbertEncoder`` (torch, host CPU/GPU) and ``JaxColbertEncoder`` (pure
JAX — the forward runs as a jitted XLA program on the TPU, so encoding
shares the device with the search engine).
"""

from fast_plaid_tpu.models.encoder import ColbertEncoder

__all__ = ["ColbertEncoder", "JaxColbertEncoder"]


def __getattr__(name: str):
    # JaxColbertEncoder imports jax at module scope; keep it lazy so the
    # torch-only path never pays for (or requires) a jax session.
    if name == "JaxColbertEncoder":
        from fast_plaid_tpu.models.jax_encoder import JaxColbertEncoder

        return JaxColbertEncoder
    raise AttributeError(name)
