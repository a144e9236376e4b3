"""README quickstart, runnable end to end (CPU or TPU)."""

import numpy as np

from fast_plaid_tpu import filtering, search

engine = search.FastPlaid(index="quickstart_index")

embedding_dim = 128
rng = np.random.default_rng(0)
docs = [
    rng.standard_normal((300, embedding_dim)).astype("float32")
    for _ in range(100)
]
engine.create(
    documents_embeddings=docs,
    metadata=[{"year": 2000 + (i % 25)} for i in range(100)],
)

queries = rng.standard_normal((2, 50, embedding_dim)).astype("float32")
print(engine.search(queries, top_k=10, show_progress=False)[0][:3])

recent = filtering.where("quickstart_index", "year >= ?", (2020,))
print(engine.search(queries, top_k=5, subset=recent, show_progress=False)[0])

engine.update(documents_embeddings=[rng.standard_normal((300, embedding_dim)).astype("float32")])
engine.delete(subset=[0])
print("reconstructed doc 0 shape:", engine.get_embeddings([0])[0].shape)
