"""Structured synthetic corpora for retrieval-quality evaluation.

Zero-network stand-in for BEIR-style data: a topic-model corpus whose
statistics mimic ColBERT embedding sets (unit-norm token vectors clustered
around document topics, Zipf topic popularity, variable document lengths,
queries drawn from a target document's topics with extra noise). Unlike
i.i.d. Gaussian tokens, scores between related/unrelated documents are
well separated, so nDCG against an exact-search truth is a meaningful
measure of the approximation loss of the PLAID cascade (the quantity the
reference's BEIR table tracks per dataset, reference README.md:306-338 —
those runs need network + GPU encoders; this one is hermetic).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "topic_corpus",
    "colbert_proxy_corpus",
    "exact_maxsim_topk",
    "truth_qrels",
]


def _unit(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def topic_corpus(
    rng: np.random.Generator,
    n_docs: int,
    n_queries: int,
    dim: int = 128,
    n_topics: int | None = None,
    mean_len: int = 120,
    max_len: int = 360,
    q_len: int = 32,
    topic_weight: float = 0.82,
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray]:
    """Generate (documents, queries [Nq, q_len, dim], query_targets [Nq]).

    Each document mixes 1-3 Zipf-popular topics; token = normalized
    (topic_weight * topic + (1 - topic_weight) * noise). Query i is drawn
    from document query_targets[i]'s topics with extra noise, so related
    documents (sharing topics) score high and unrelated ones low — the
    ranking problem has actual structure.
    """
    if n_topics is None:
        n_topics = max(64, n_docs // 32)
    topics = _unit(rng.standard_normal((n_topics, dim)).astype(np.float32))

    # Zipf topic popularity.
    pop = 1.0 / np.arange(1, n_topics + 1) ** 1.1
    pop /= pop.sum()

    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n_docs).astype(np.int64),
        8,
        max_len,
    )
    doc_topics = []
    docs = []
    for i in range(n_docs):
        k = int(rng.integers(1, 4))
        tids = rng.choice(n_topics, size=k, replace=False, p=pop)
        doc_topics.append(tids)
        tok_topic = tids[rng.integers(0, k, lengths[i])]
        noise = rng.standard_normal((lengths[i], dim)).astype(np.float32)
        tok = topic_weight * topics[tok_topic] + (1 - topic_weight) * noise
        docs.append(_unit(tok))

    targets = rng.integers(0, n_docs, n_queries)
    queries = np.empty((n_queries, q_len, dim), np.float32)
    for qi, t in enumerate(targets):
        tids = doc_topics[t]
        tok_topic = tids[rng.integers(0, len(tids), q_len)]
        noise = rng.standard_normal((q_len, dim)).astype(np.float32)
        queries[qi] = _unit(
            topic_weight * topics[tok_topic] + (1 - topic_weight) * 1.3 * noise
        )
    return docs, queries, targets


def colbert_proxy_corpus(
    rng: np.random.Generator,
    n_docs: int,
    n_queries: int,
    dim: int = 128,
    n_topics: int | None = None,
    mean_len: int = 120,
    max_len: int = 360,
    q_len: int = 32,
    topic_weight: float = 0.8,
    anisotropy: float = 0.35,
    hub_frac: float = 0.22,
    n_hubs: int = 32,
    lexical_frac: float = 0.5,
    mask_frac: float = 0.35,
    graded_targets: int = 0,
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray]:
    """Topic corpus upgraded with the ColBERT statistics the plain topic
    model misses — the no-network stand-in for committing real encoder
    embeddings (reference quality anchor: the BEIR table,
    /root/reference/README.md:306-338, produced by
    answerdotai/answerai-colbert-small-v1 through docs/benchmark/
    benchmark.py:44-48; no weights or egress exist in this environment).

    What is added, and the real-embedding property each one mimics:

    * **Anisotropy** (``anisotropy`` weight on a shared mean direction):
      transformer token embeddings occupy a narrow cone — random-pair
      cosine is ~0.2-0.5, not 0. Shifts every centroid toward the cone
      axis and compresses score gaps, the regime quantization actually
      operates in.
    * **Hub tokens** (``hub_frac`` of each document from ``n_hubs``
      Zipf-weighted vectors): stopwords/punctuation recur near-verbatim
      in most documents, producing the few giant IVF cells real corpora
      have — the stress case for cell_cap, candidate capacity and the
      cells estimator's tie handling.
    * **Lexical query tokens** (``lexical_frac`` of query tokens are
      near-copies of target-document tokens): ColBERT relevance is
      dominated by exact/near term matches (per-token sims near 1.0),
      unlike the purely topical similarity of the base generator.
    * **[MASK] padding** (``mask_frac`` of query slots near one shared
      mask vector): ColBERT pads queries to 32 with [MASK] tokens that
      embed near each other and probe the same cells for every query.
    * **Graded relevance** (``graded_targets`` = m > 0): the query's
      lexical tokens are split across m distinct documents with strictly
      descending counts, so m docs match k > k' > ... query terms —
      the separation structure real qrels have. Without it, every
      same-topic document's MaxSim concentrates to the same value as
      doc length grows (max over ~100+ exchangeable topic tokens), and
      ranks 2..1000 become structural near-ties that NO pruned search —
      this engine's or the reference's centroid-resolution cascade —
      can order (measured at 57,638 docs x doc_len 300: ranks 10->100
      within 2.9% of score, vs 38% for rank 1->10). Graded mode keeps
      the tie sea as background but plants a measurable ranking task
      above it, mirroring how BEIR relevance sits above the corpus
      noise floor. Returned ``targets`` has shape [Nq, m], relevance
      descending.
    """
    if n_topics is None:
        n_topics = max(64, n_docs // 32)
    axis = _unit(rng.standard_normal((1, dim)).astype(np.float32))

    def cone(x: np.ndarray) -> np.ndarray:
        return _unit(anisotropy * axis + (1.0 - anisotropy) * _unit(x))

    topics = cone(rng.standard_normal((n_topics, dim)).astype(np.float32))
    hubs = cone(rng.standard_normal((n_hubs, dim)).astype(np.float32))
    mask_vec = cone(rng.standard_normal((1, dim)).astype(np.float32))[0]

    pop = 1.0 / np.arange(1, n_topics + 1) ** 1.1
    pop /= pop.sum()
    hub_pop = 1.0 / np.arange(1, n_hubs + 1) ** 1.3
    hub_pop /= hub_pop.sum()

    lengths = np.clip(
        rng.lognormal(np.log(mean_len), 0.45, n_docs).astype(np.int64),
        8,
        max_len,
    )
    doc_topics = []
    docs = []
    for i in range(n_docs):
        k = int(rng.integers(1, 4))
        tids = rng.choice(n_topics, size=k, replace=False, p=pop)
        doc_topics.append(tids)
        n = int(lengths[i])
        tok_topic = tids[rng.integers(0, k, n)]
        noise = rng.standard_normal((n, dim)).astype(np.float32)
        tok = _unit(
            topic_weight * topics[tok_topic] + (1 - topic_weight) * noise
        )
        # Hub (stopword) tokens recur with tiny jitter: near-identical
        # vectors across documents -> giant shared IVF cells.
        is_hub = rng.random(n) < hub_frac
        hub_ids = rng.choice(n_hubs, size=int(is_hub.sum()), p=hub_pop)
        # Jitter norms are dim-independent (c / sqrt(dim) per component)
        # so near-duplicate cosines match real stopword recurrences
        # (~0.99) at any embedding width.
        jitter = (0.15 / dim**0.5) * rng.standard_normal(
            (len(hub_ids), dim)
        ).astype(np.float32)
        tok[is_hub] = _unit(hubs[hub_ids] + jitter)
        docs.append(tok)

    m = max(0, int(graded_targets))
    if m:
        targets = np.stack(
            [rng.choice(n_docs, m, replace=False) for _ in range(n_queries)]
        )
    else:
        targets = rng.integers(0, n_docs, n_queries)
    queries = np.empty((n_queries, q_len, dim), np.float32)
    for qi in range(n_queries):
        t = targets[qi, 0] if m else targets[qi]
        tids = doc_topics[t]
        tok_topic = tids[rng.integers(0, len(tids), q_len)]
        noise = rng.standard_normal((q_len, dim)).astype(np.float32)
        q = _unit(
            topic_weight * topics[tok_topic]
            + (1 - topic_weight) * 1.3 * noise
        )
        # Lexical matches: near-verbatim copies of document tokens. In
        # graded mode the budget splits across the m target docs with
        # strictly descending counts (relevance grades); otherwise all
        # lexical tokens come from the single target.
        n_lex = int(lexical_frac * q_len)
        if m:
            # e.g. m=5, n_lex=16 -> [6, 4, 3, 2, 1]: grade i matches
            # more query terms than grade i+1, always >= 1.
            w = np.arange(m, 0, -1).astype(np.float64)
            alloc = np.maximum(1, (n_lex * w / w.sum()).astype(np.int64))
            while alloc.sum() > n_lex:
                alloc[np.argmax(alloc)] -= 1
            pos = 0
            for gi in range(m):
                t_g = targets[qi, gi]
                n_g = int(alloc[gi])
                if n_g and len(docs[t_g]):
                    src = rng.integers(0, len(docs[t_g]), n_g)
                    jitter = (0.2 / dim**0.5) * rng.standard_normal(
                        (n_g, dim)
                    ).astype(np.float32)
                    q[pos : pos + n_g] = _unit(docs[t_g][src] + jitter)
                    pos += n_g
        elif n_lex and len(docs[t]):
            src = rng.integers(0, len(docs[t]), n_lex)
            jitter = (0.2 / dim**0.5) * rng.standard_normal(
                (n_lex, dim)
            ).astype(np.float32)
            q[:n_lex] = _unit(docs[t][src] + jitter)
        # [MASK] padding tail: shared vector + jitter.
        n_mask = int(mask_frac * q_len)
        if n_mask:
            jitter = (0.25 / dim**0.5) * rng.standard_normal(
                (n_mask, dim)
            ).astype(np.float32)
            q[q_len - n_mask :] = _unit(mask_vec[None, :] + jitter)
        queries[qi] = q
    return docs, queries, targets


def exact_maxsim_topk(
    documents: list[np.ndarray],
    queries: np.ndarray,
    top_k: int,
    device: bool | None = None,
) -> list[list[tuple[int, float]]]:
    """Exhaustive MaxSim ranking (the ground truth an ANN engine chases).

    Host path: blocked numpy with ``np.maximum.reduceat`` segment maxima
    (the per-document Python loop it replaces measured minutes at 10^4
    docs on a single-core host). Device path (``device=True``, or
    auto-selected when an accelerator backend is default and the corpus
    is large): blocked bf16 MaxSim on the accelerator — 28 TFLOP for the
    57k-doc BEIR-shape truth, intractable on a 1-core host. bf16 input
    rounding perturbs scores ~1e-3 relative, symmetric noise for any two
    systems ranked against the same truth.
    """
    lens = np.asarray([d.shape[0] for d in documents])
    if device is None:
        try:
            import jax

            backend_ok = jax.default_backend() not in ("cpu",)
        except Exception:
            backend_ok = False
        device = backend_ok and int(lens.sum()) * len(queries) > 2**31
    if device:
        return _exact_maxsim_topk_device(documents, queries, top_k)
    flat = np.concatenate(documents, axis=0)
    starts = np.concatenate([[0], np.cumsum(lens)])
    out = []
    for q in queries:  # [Lq, D]
        sims = flat @ q.T  # [T, Lq]
        seg_max = np.maximum.reduceat(sims, starts[:-1], axis=0)
        scores = seg_max.sum(axis=1).astype(np.float32)
        top = np.argsort(-scores)[:top_k]
        out.append([(int(p), float(scores[p])) for p in top])
    return out


def _exact_maxsim_topk_device(
    documents: list[np.ndarray],
    queries: np.ndarray,
    top_k: int,
    doc_block: int = 512,
    q_block: int = 8,
) -> list[list[tuple[int, float]]]:
    """Accelerator exhaustive MaxSim: stream padded doc blocks, score each
    against every query with MXU matmuls, keep running scores on host."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    nq, lq, dim = queries.shape
    n = len(documents)
    lens = np.asarray([d.shape[0] for d in documents], np.int32)
    cap = int(-(-int(lens.max()) // 8) * 8)
    qpad = (-nq) % q_block
    qs = jnp.asarray(
        np.pad(queries, ((0, qpad), (0, 0), (0, 0))).astype(np.float32)
    ).astype(jnp.bfloat16)
    nqp = nq + qpad

    @jax.jit
    def block_scores(blk, blk_lens, qs):
        # blk [bs, cap, D] bf16, blk_lens [bs] -> [nqp, bs] f32
        bs = blk.shape[0]
        tok_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (bs, cap), 1)
            < blk_lens[:, None]
        )
        flat = blk.reshape(bs * cap, dim)

        def one(qc):  # [q_block, Lq, D] -> [q_block, bs]
            sims = jax.lax.dot_general(
                flat,
                qc.reshape(q_block * lq, dim),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bs, cap, q_block, lq)
            sims = jnp.where(tok_ok[:, :, None, None], sims, -jnp.inf)
            per_tok = jnp.max(sims, axis=1)  # [bs, q_block, Lq]
            per_tok = jnp.where(jnp.isneginf(per_tok), 0.0, per_tok)
            return jnp.sum(per_tok, axis=-1).T  # [q_block, bs]

        out = jax.lax.map(one, qs.reshape(nqp // q_block, q_block, lq, dim))
        return out.reshape(nqp, bs)

    scores = np.empty((nq, n), np.float32)
    for s0 in range(0, n, doc_block):
        rows = documents[s0 : s0 + doc_block]
        bs = len(rows)
        # Fixed block shape (zero-length padding rows) — one compile.
        blk = np.zeros((doc_block, cap, dim), np.float32)
        blk_lens = np.zeros((doc_block,), np.int32)
        for i, d in enumerate(rows):
            blk[i, : d.shape[0]] = d
        blk_lens[:bs] = lens[s0 : s0 + bs]
        got = block_scores(
            jnp.asarray(blk.astype(ml_dtypes.bfloat16)),  # bf16 on the wire
            jnp.asarray(blk_lens),
            qs,
        )
        scores[:, s0 : s0 + bs] = np.asarray(got)[:nq, :bs]
    out = []
    for qi in range(nq):
        top = np.argsort(-scores[qi])[:top_k]
        out.append([(int(p), float(scores[qi][p])) for p in top])
    return out


def graded_qrels(targets: "np.ndarray") -> tuple[list[str], dict]:
    """Graded qrels from the generator's multi-target assignment.

    ``targets`` [Nq, m] (relevance descending): the grade-gi document
    gets relevance m - gi, mirroring BEIR's graded human qrels — the
    protocol the reference's benchmark table actually uses (its truth is
    qrels, not exhaustive MaxSim). Under this protocol tie-sea documents
    are simply non-relevant, so parity asks the right question: does the
    cascade recover the RELEVANT documents as well as exhaustive search
    over the same embeddings does?
    """
    nq, m = targets.shape
    qids = [f"q{i}" for i in range(nq)]
    qrels = {
        f"q{i}": {str(int(t)): m - gi for gi, t in enumerate(targets[i])}
        for i in range(nq)
    }
    return qids, qrels


def truth_qrels(
    truth: list[list[tuple[int, float]]], depth: int = 10
) -> tuple[list[str], dict]:
    """Binary qrels from an exact-search truth ranking (top-``depth`` docs).

    Returns (query_ids, qrels) in the shapes evaluation.evaluate expects.
    nDCG@10 of the exact ranking itself is 1.0 by construction; an ANN
    run's nDCG@10 measures its agreement with exact search.
    """
    qids = [f"q{i}" for i in range(len(truth))]
    qrels = {
        qid: {str(pid): 1 for pid, _ in row[:depth]}
        for qid, row in zip(qids, truth)
    }
    return qids, qrels
