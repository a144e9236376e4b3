"""Optional encoder utilities.

The engine itself is model-agnostic: it indexes and searches multi-vector
(per-token) embeddings from any late-interaction model. The reference keeps
encoders external too (its benchmarks use pylate ColBERT models,
reference: docs/benchmark/benchmark.py:44-48). This package provides a
thin, optional encoder for producing ColBERT-style embeddings with a
HuggingFace checkpoint when pylate is not available.
"""

from fast_plaid_tpu.models.encoder import ColbertEncoder

__all__ = ["ColbertEncoder"]
