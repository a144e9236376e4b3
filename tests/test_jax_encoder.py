"""JAX ColBERT encoder vs the torch wrapper on a tiny random checkpoint.

No network or real weights exist here, so parity is pinned against a
randomly-initialized HF BertModel saved to disk: both encoders load the
same checkpoint and must produce the same per-token unit vectors. This
validates the whole chain — checkpoint tensor-name mapping, embeddings,
attention, GELU/LayerNorm conventions, projection head, masking, and the
L2 normalization — not just a single matmul.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

TEXTS = [
    "a tiny document about token level retrieval",
    "another text, with punctuation! and more words than the first one",
    "short",
]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizerFast

    path = tmp_path_factory.mktemp("tiny_bert")
    torch.manual_seed(0)
    config = BertConfig(
        vocab_size=200,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    model = BertModel(config)
    model.eval()
    model.save_pretrained(path)

    # Minimal WordPiece vocab covering the test texts.
    words = sorted({w for t in TEXTS for w in t.lower().split()})
    # "[Q] "/"[D] " prefixes split to "[", "q"/"d", "]" — keep those in
    # vocab so query and document prefixes tokenize differently.
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += ["[", "]", "q", "d", "!", ","] + words
    vocab_file = path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    BertTokenizerFast(str(vocab_file)).save_pretrained(path)

    # ColBERT projection head alongside the encoder weights, under the
    # name both loaders look up (models/encoder.py, models/jax_encoder.py).
    proj = torch.randn(16, config.hidden_size) * 0.1
    torch.save(proj, path / "colbert_linear.pt")
    return str(path)


def _torch_encode(path, texts, is_query=False):
    from fast_plaid_tpu.models.encoder import ColbertEncoder

    return ColbertEncoder(path).encode(texts, is_query=is_query)


def _jax_encode(path, texts, is_query=False, **kw):
    import jax.numpy as jnp

    from fast_plaid_tpu.models.jax_encoder import JaxColbertEncoder

    enc = JaxColbertEncoder(path, compute_dtype=jnp.float32, **kw)
    return enc.encode(texts, is_query=is_query)


def test_matches_torch_wrapper(tiny_ckpt):
    want = _torch_encode(tiny_ckpt, TEXTS)
    got = _jax_encode(tiny_ckpt, TEXTS)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-4)
        # Unit vectors out of both paths.
        np.testing.assert_allclose(
            np.linalg.norm(g, axis=-1), 1.0, atol=1e-5
        )


def test_query_prefix_changes_output(tiny_ckpt):
    doc = _jax_encode(tiny_ckpt, TEXTS[:1], is_query=False)[0]
    qry = _jax_encode(tiny_ckpt, TEXTS[:1], is_query=True)[0]
    assert doc.shape == qry.shape
    assert not np.allclose(doc, qry)


def test_query_augmentation_pads_with_mask(tiny_ckpt):
    plain = _jax_encode(tiny_ckpt, TEXTS[:2], is_query=True)
    aug = _jax_encode(
        tiny_ckpt, TEXTS[:2], is_query=True,
        query_augment=True, query_length=16,
    )
    for p, a in zip(plain, aug):
        # Every query is padded to >= query_length (to the batch max when
        # a batch member is longer) and all [MASK] positions are attended.
        assert a.shape[0] >= max(16, p.shape[0])
    # The shortest query gains [MASK] expansion slots.
    shortest = min(range(len(plain)), key=lambda i: plain[i].shape[0])
    assert aug[shortest].shape[0] > plain[shortest].shape[0]


def test_bf16_compute_close_to_f32(tiny_ckpt):
    from fast_plaid_tpu.models.jax_encoder import JaxColbertEncoder

    f32 = _jax_encode(tiny_ckpt, TEXTS)
    bf16 = JaxColbertEncoder(tiny_ckpt).encode(TEXTS)  # default bf16 matmuls
    for a, b in zip(f32, bf16):
        cos = np.sum(a * b, axis=-1)
        assert float(cos.min()) > 0.995, float(cos.min())
