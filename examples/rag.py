"""Index + hybrid search + rerank example (README Index & Search)."""

from kjarni_tpu import Indexer, Searcher

indexer = Indexer("minilm-l6-v2", quiet=True)
indexer.create("my_index", ["docs/"])

searcher = Searcher("minilm-l6-v2", reranker_model="minilm-l6-v2-cross-encoder")
for r in searcher.search("my_index", "how do returns work?", mode="hybrid"):
    print(f"  {r.score:.4f}: {r.text[:70]}")
