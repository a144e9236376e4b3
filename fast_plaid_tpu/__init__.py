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

__version__ = "0.2.0"


def _enable_compile_cache() -> None:
    """Point JAX at a persistent compilation cache (opt-out via env).

    Index builds jit a handful of large programs (k-means scan, compress
    pipeline, search cascade); on hosts where XLA compiles are expensive
    (e.g. remote-compile TPU services) the cache turns repeat builds from
    minutes into seconds. A user-set JAX_COMPILATION_CACHE_DIR wins;
    FASTPLAID_TPU_NO_COMPILE_CACHE=1 disables entirely.
    """
    import os

    if os.environ.get("FASTPLAID_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it; jax reads the env itself
    try:
        import jax

        # Segregate the cache by compile environment: artifacts produced
        # through a remote-compile service (e.g. the axon TPU tunnel,
        # which AOT-compiles for the *service's* machine) must never be
        # deserialized by a plain local run — XLA's cpu_aot_loader warns
        # about mismatched machine features and may SIGILL.
        remote = bool(
            os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
            or "axon" in os.environ.get("JAX_PLATFORMS", "")
        )
        tag = "remote" if remote else "local"
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "fast_plaid_tpu", f"xla-{tag}"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from fast_plaid_tpu import evaluation, filtering, search  # noqa: E402,F401

__all__ = ["search", "filtering", "evaluation", "__version__"]
