"""Minimal ColBERT-style multi-vector encoder (optional utility).

Wraps a HuggingFace transformer to emit one L2-normalized vector per token,
optionally applying the checkpoint's trained linear projection when present
(ColBERT checkpoints ship a ``linear.weight`` head that maps hidden states
to the retrieval dimension). Runs on torch CPU/GPU — encoding is an
offline, model-bound step; the TPU engine consumes the resulting arrays.

For production-quality ColBERT encoding (query augmentation with [MASK]
tokens, model-specific prefixes) prefer the ``pylate`` package; this class
exists so the BEIR harness can run without it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ColbertEncoder"]


class ColbertEncoder:
    """Encode texts to [n_tokens, dim] float32 arrays, one per text."""

    def __init__(
        self,
        model_name_or_path: str,
        device: str = "cpu",
        max_length: int = 300,
        query_prefix: str = "[Q] ",
        document_prefix: str = "[D] ",
    ) -> None:
        try:
            import torch  # noqa: F401
            from transformers import AutoModel, AutoTokenizer
        except ImportError as exc:  # pragma: no cover - optional dependency
            msg = "ColbertEncoder requires torch and transformers."
            raise ImportError(msg) from exc

        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.model = AutoModel.from_pretrained(model_name_or_path)
        self.model.eval().to(device)
        self.device = device
        self.max_length = max_length
        self.query_prefix = query_prefix
        self.document_prefix = document_prefix
        self.projection = self._load_projection(model_name_or_path)

    def _load_projection(self, model_name_or_path: str):
        """Load the ColBERT linear head (linear.weight) when the checkpoint
        provides one; otherwise identity."""
        import os

        import torch

        for fname in ("colbert_linear.pt", "linear.pt"):
            path = os.path.join(str(model_name_or_path), fname)
            if os.path.exists(path):
                return torch.load(path, map_location="cpu")
        try:
            from safetensors import safe_open

            path = os.path.join(str(model_name_or_path), "model.safetensors")
            if os.path.exists(path):
                with safe_open(path, framework="pt") as f:
                    for key in ("linear.weight", "colbert_linear.weight"):
                        if key in f.keys():
                            return f.get_tensor(key)
        except ImportError:
            pass
        return None

    def encode(
        self, texts: list[str], is_query: bool = False, batch_size: int = 16
    ) -> list[np.ndarray]:
        import torch

        prefix = self.query_prefix if is_query else self.document_prefix
        out: list[np.ndarray] = []
        with torch.inference_mode():
            for start in range(0, len(texts), batch_size):
                batch = [prefix + t for t in texts[start : start + batch_size]]
                enc = self.tokenizer(
                    batch,
                    padding=True,
                    truncation=True,
                    max_length=self.max_length,
                    return_tensors="pt",
                ).to(self.device)
                hidden = self.model(**enc).last_hidden_state  # [B, L, H]
                if self.projection is not None:
                    hidden = hidden @ self.projection.T.to(hidden.device)
                hidden = torch.nn.functional.normalize(hidden, dim=-1)
                mask = enc["attention_mask"].bool()
                for i in range(hidden.shape[0]):
                    vecs = hidden[i][mask[i]]
                    out.append(vecs.cpu().numpy().astype(np.float32))
        return out
