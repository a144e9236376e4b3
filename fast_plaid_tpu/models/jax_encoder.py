"""TPU-native ColBERT encoder: a pure-JAX BERT forward over HF checkpoints.

The torch wrapper (models/encoder.py) runs encoding on host CPU/GPU; this
module runs the same computation as a jitted JAX program so encoding can
share the TPU with the search engine (ROADMAP "Capability"). It loads
standard HuggingFace BERT-family checkpoints (config.json +
model.safetensors / pytorch_model.bin) directly into a params pytree — no
torch in the forward path — and applies the ColBERT linear head when the
checkpoint ships one (the reference's benchmark models, e.g.
answerdotai/answerai-colbert-small-v1, are BERT encoders with a
``linear.weight`` retrieval projection; see reference
docs/benchmark/benchmark.py:44-48 which encodes via pylate).

TPU-first choices:

* **Static shapes.** Batches are padded to fixed (batch, length) buckets
  (powers of two up to ``max_length``) so each bucket compiles once; the
  attention mask handles the padding. No dynamic shapes reach XLA.
* **bf16 matmuls.** All dense contractions run in bfloat16 with f32
  accumulation (``preferred_element_type``) — the MXU path; LayerNorm
  statistics stay f32 for parity with the torch forward (~1e-2 token
  cosine error vs f32, far below retrieval significance; set
  ``compute_dtype=jnp.float32`` for bit-level parity testing).
* **One jitted program per bucket** covering embeddings -> L transformer
  layers -> projection -> L2-normalize; XLA fuses the elementwise chain
  into the matmuls.

ColBERT query augmentation (pad queries to a fixed length with [MASK]
tokens that the model attends to, per the original ColBERT recipe) is
available via ``query_augment=True``; it is off by default to match the
torch wrapper's behavior so the two encoders are drop-in interchangeable.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import numpy as np

__all__ = ["JaxColbertEncoder", "load_bert_checkpoint", "bert_forward"]


# ---------------------------------------------------------------------------
# Checkpoint loading: HF tensor names -> params pytree of jnp arrays.
# ---------------------------------------------------------------------------


def _read_tensors(path: str) -> dict[str, np.ndarray]:
    """Read all tensors from an HF checkpoint directory as numpy arrays."""
    st = os.path.join(path, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return load_file(st)
    pt = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(pt):
        import torch

        state = torch.load(pt, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in state.items()}
    msg = f"no model.safetensors or pytorch_model.bin under {path!r}"
    raise FileNotFoundError(msg)


def _strip_prefix(tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop a leading 'bert.' / 'model.' scope if every key carries it."""
    for prefix in ("bert.", "model."):
        if all(
            k.startswith(prefix) or "." not in k or k.startswith("linear")
            for k in tensors
        ) and any(k.startswith(prefix) for k in tensors):
            return {
                (k[len(prefix) :] if k.startswith(prefix) else k): v
                for k, v in tensors.items()
            }
    return tensors


def load_bert_checkpoint(path: str) -> tuple[dict, dict]:
    """Load (params, config) from an HF BERT checkpoint directory.

    Dense kernels are stored pre-transposed ([in, out]) so the forward is
    a plain ``x @ w + b`` — the layout XLA tiles straight onto the MXU.
    The ColBERT projection head is looked up under the names the torch
    wrapper accepts (``linear.weight`` / ``colbert_linear.weight``,
    models/encoder.py) and stored under ``params["projection"]`` or None.
    """
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    raw = _strip_prefix(_read_tensors(path))

    def dense(name: str) -> dict:
        return {
            "w": raw[f"{name}.weight"].T.copy(),
            "b": raw[f"{name}.bias"],
        }

    def ln(name: str) -> dict:
        return {"g": raw[f"{name}.weight"], "b": raw[f"{name}.bias"]}

    n_layers = int(config["num_hidden_layers"])
    layers = []
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "q": dense(f"{p}.attention.self.query"),
                "k": dense(f"{p}.attention.self.key"),
                "v": dense(f"{p}.attention.self.value"),
                "attn_out": dense(f"{p}.attention.output.dense"),
                "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
                "ffn_in": dense(f"{p}.intermediate.dense"),
                "ffn_out": dense(f"{p}.output.dense"),
                "ffn_ln": ln(f"{p}.output.LayerNorm"),
            }
        )

    # ColBERT projection head: either inside the main checkpoint or as a
    # standalone tensor file (both layouts exist in the wild; the torch
    # wrapper accepts the same set, models/encoder.py:_load_projection).
    projection = None
    for key in ("linear.weight", "colbert_linear.weight"):
        if key in raw:
            projection = raw[key].T.copy()  # [hidden, dim]
            break
    if projection is None:
        for fname in ("colbert_linear.pt", "linear.pt"):
            fpath = os.path.join(path, fname)
            if os.path.exists(fpath):
                import torch

                projection = (
                    torch.load(fpath, map_location="cpu", weights_only=True)
                    .numpy()
                    .T.copy()
                )
                break

    params = {
        "word_emb": raw["embeddings.word_embeddings.weight"],
        "pos_emb": raw["embeddings.position_embeddings.weight"],
        "type_emb": raw["embeddings.token_type_embeddings.weight"],
        "emb_ln": ln("embeddings.LayerNorm"),
        "layers": layers,
        "projection": projection,
    }
    return params, config


# ---------------------------------------------------------------------------
# Forward pass.
# ---------------------------------------------------------------------------


def _layer_norm(x, g, b, eps):
    import jax.numpy as jnp

    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _dense(x, p, compute_dtype):
    import jax.numpy as jnp

    return jax.lax.dot_general(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + p["b"]


def bert_forward(
    params: dict,
    input_ids,
    attention_mask,
    *,
    n_heads: int,
    ln_eps: float,
    compute_dtype=None,
):
    """HF BertModel.last_hidden_state + ColBERT projection + L2 norm.

    [B, L] ids + mask -> [B, L, dim] unit vectors (f32). Masked positions
    produce unspecified values — callers select by ``attention_mask``.
    """
    import jax.numpy as jnp

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    ids = input_ids.astype(jnp.int32)
    b, sl = ids.shape
    h = (
        params["word_emb"][ids]
        + params["pos_emb"][:sl][None, :, :]
        + params["type_emb"][0][None, None, :]
    )
    h = _layer_norm(h, params["emb_ln"]["g"], params["emb_ln"]["b"], ln_eps)

    # Additive attention bias: 0 for real tokens, -1e9 for padding.
    bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
    bias = bias[:, None, None, :]  # [B, 1, 1, L]

    hidden = h.shape[-1]
    head_dim = hidden // n_heads

    def split_heads(x):  # [B, L, H] -> [B, heads, L, head_dim]
        return x.reshape(b, sl, n_heads, head_dim).transpose(0, 2, 1, 3)

    for lp in params["layers"]:
        q = split_heads(_dense(h, lp["q"], compute_dtype))
        k = split_heads(_dense(h, lp["k"], compute_dtype))
        v = split_heads(_dense(h, lp["v"], compute_dtype))
        scores = (
            jnp.einsum(
                "bhqd,bhkd->bhqk",
                q.astype(compute_dtype),
                k.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            / np.sqrt(head_dim)
            + bias
        )
        att = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd",
            att.astype(compute_dtype),
            v.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sl, hidden)
        h = _layer_norm(
            h + _dense(ctx, lp["attn_out"], compute_dtype),
            lp["attn_ln"]["g"],
            lp["attn_ln"]["b"],
            ln_eps,
        )
        ffn = jax.nn.gelu(
            _dense(h, lp["ffn_in"], compute_dtype), approximate=False
        )
        h = _layer_norm(
            h + _dense(ffn, lp["ffn_out"], compute_dtype),
            lp["ffn_ln"]["g"],
            lp["ffn_ln"]["b"],
            ln_eps,
        )

    if params["projection"] is not None:
        h = jax.lax.dot_general(
            h.astype(compute_dtype),
            params["projection"].astype(compute_dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
    return (h / jnp.maximum(norm, 1e-12)).astype(jnp.float32)


class JaxColbertEncoder:
    """Drop-in JAX replacement for models/encoder.ColbertEncoder.

    Same surface — ``encode(texts, is_query, batch_size) -> list of
    [n_tokens, dim] float32`` — with the forward pass compiled by XLA on
    whatever device jax is configured for (the TPU under this framework's
    default session). Tokenization stays on host via the HF tokenizer.
    """

    def __init__(
        self,
        model_name_or_path: str,
        max_length: int = 300,
        query_prefix: str = "[Q] ",
        document_prefix: str = "[D] ",
        query_augment: bool = False,
        query_length: int = 32,
        compute_dtype=None,
    ) -> None:
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.params, self.config = load_bert_checkpoint(
            str(model_name_or_path)
        )
        self.max_length = max_length
        self.query_prefix = query_prefix
        self.document_prefix = document_prefix
        self.query_augment = query_augment
        self.query_length = query_length
        self._fwd = jax.jit(
            partial(
                bert_forward,
                n_heads=int(self.config["num_attention_heads"]),
                ln_eps=float(self.config.get("layer_norm_eps", 1e-12)),
                compute_dtype=compute_dtype,
            )
        )

    def _bucket(self, n: int) -> int:
        """Smallest power-of-two bucket >= n (caps recompiles per corpus)."""
        b = 8
        while b < n:
            b *= 2
        return min(b, self.max_length)

    def encode(
        self, texts: list[str], is_query: bool = False, batch_size: int = 32
    ) -> list[np.ndarray]:
        prefix = self.query_prefix if is_query else self.document_prefix
        out: list[np.ndarray] = []
        for start in range(0, len(texts), batch_size):
            batch = [prefix + t for t in texts[start : start + batch_size]]
            enc = self.tokenizer(
                batch,
                padding=True,
                truncation=True,
                max_length=self.max_length,
                return_tensors="np",
            )
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            if is_query and self.query_augment:
                ids, mask = self._augment(ids, mask)
            # Pad length to the bucket and batch to batch_size: one
            # compiled program per (batch_size, bucket) pair.
            sl = self._bucket(ids.shape[1])
            ids = np.pad(ids, ((0, batch_size - ids.shape[0]), (0, sl - ids.shape[1])))
            mask = np.pad(
                mask, ((0, batch_size - mask.shape[0]), (0, sl - mask.shape[1]))
            )
            vecs = np.asarray(self._fwd(self.params, ids, mask))
            for i in range(len(batch)):
                keep = mask[i].astype(bool)
                out.append(vecs[i][keep].astype(np.float32))
        return out

    def _augment(
        self, ids: np.ndarray, mask: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """ColBERT query augmentation: pad every query to ``query_length``
        with [MASK] tokens the model attends to (original ColBERT recipe —
        the augmented positions become soft query expansions)."""
        mask_id = self.tokenizer.mask_token_id
        if mask_id is None:
            return ids, mask
        b, sl = ids.shape
        ql = max(self.query_length, sl)
        ids_a = np.full((b, ql), mask_id, np.int32)
        ids_a[:, :sl] = np.where(mask.astype(bool), ids, mask_id)
        return ids_a, np.ones((b, ql), np.int32)
