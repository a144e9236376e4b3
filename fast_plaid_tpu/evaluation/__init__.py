"""Evaluation tooling: BEIR loading and retrieval metrics."""

from fast_plaid_tpu.evaluation.evaluation import (
    add_duplicates,
    evaluate,
    load_beir,
)

__all__ = ["evaluate", "load_beir", "add_duplicates"]
