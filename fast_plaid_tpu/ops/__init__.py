"""TPU compute ops: residual codec, k-means, MaxSim reductions, Pallas kernels."""

from fast_plaid_tpu.ops import codec, kmeans, maxsim  # noqa: F401

__all__ = ["codec", "kmeans", "maxsim"]
