"""fast_plaid_tpu — a TPU-native multi-vector (late-interaction) search engine.

A from-scratch JAX/XLA/Pallas implementation of the PLAID algorithm with the
same capabilities as the reference engine (lightonai/fast-plaid): k-means
centroid training, n-bit residual quantization, IVF candidate generation and a
staged search cascade (centroid scoring -> IVF probe -> approximate code-based
scoring -> residual decompression + exact MaxSim rerank), plus incremental
updates with buffered centroid expansion, deletes, subset and SQLite-metadata
filtering, token-score matrices, embedding reconstruction and evaluation
tooling.

Public surface (mirrors the reference package layout,
/root/reference/python/fast_plaid/):

    from fast_plaid_tpu import search
    engine = search.FastPlaid(index="index_dir")
    engine.create(documents_embeddings=[...])
    engine.search(queries_embeddings=...)
"""

__version__ = "0.1.0"

from fast_plaid_tpu import evaluation, filtering, search  # noqa: E402,F401

__all__ = ["search", "filtering", "evaluation", "__version__"]
