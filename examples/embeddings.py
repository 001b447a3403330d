"""Embeddings + similarity example (cf. kjarni-examples)."""

from kjarni_tpu import Embedder

emb = Embedder("minilm-l6-v2")
vec = emb.embed("Hello world")
print(f"dim: {len(vec)}, first 5: {vec[:5]}")
print("similarity(doctor, physician):", emb.similarity("doctor", "physician"))
ranked = emb.rank_by_similarity("doctor", ["physician", "car", "nurse"])
print("ranked:", ranked)
