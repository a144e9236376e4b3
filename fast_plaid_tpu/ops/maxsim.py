"""Masked MaxSim (ColBERT late-interaction) reductions.

TPU re-design of colbert_score_reduce + direct_pad_sequences (reference:
rust/search/search.rs:385-402, rust/search/padding.rs:61-109). Because every
array in this engine is statically padded, there is no scatter-padding step:
the reduction takes a validity mask instead.

Score convention (identical to the reference): for token-score tile
``s[..., t_doc, t_query]`` with doc-token mask ``m[..., t_doc]``,

    score = sum_q max_{t valid} s[..., t, q]

Query padding tokens are zero vectors, so they contribute exactly 0 to the
sum (max over valid doc tokens of a zero dot product) — the same behavior the
reference gets from zero-padded queries with no query mask.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["maxsim_reduce", "NEG_INF"]

NEG_INF = -9999.0  # same sentinel the reference uses (search.rs:396)


def maxsim_reduce(token_scores, doc_mask):
    """Masked MaxSim: [..., Ld, Q] scores + [..., Ld] mask -> [...] score.

    Max over doc tokens (masked positions -> NEG_INF), then sum over query
    tokens. If a row has no valid doc token the result is Q * NEG_INF,
    which callers treat as "no result".
    """
    masked = jnp.where(doc_mask[..., None], token_scores, NEG_INF)
    per_query = jnp.max(masked, axis=-2)
    return jnp.sum(per_query, axis=-1)
