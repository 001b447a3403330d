"""In-memory SearchIndex tests (search_index.rs analogue)."""

import numpy as np
import pytest

from kjarni_tpu.rag.search_index import SearchIndex, hybrid_search_weighted


def unit(v):
    v = np.asarray(v, dtype=np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture
def index():
    idx = SearchIndex()
    idx.add_document("rust programming language", unit([1, 0, 0]),
                     {"source": "a.txt"})
    idx.add_document("python programming tutorial", unit([0.9, 0.3, 0]),
                     {"source": "a.txt"})
    idx.add_document("cooking pasta recipes", unit([0, 0, 1]),
                     {"source": "b.txt"})
    return idx


class TestSearchIndex:
    def test_keyword_search(self, index):
        res = index.search_keywords("programming", 10)
        assert {r.document_id for r in res} == {0, 1}

    def test_semantic_search(self, index):
        res = index.search_semantic(unit([1, 0, 0]), 2)
        assert res[0].document_id == 0

    def test_hybrid(self, index):
        res = index.search_hybrid("programming", unit([1, 0, 0]), 3)
        assert res[0].document_id in (0, 1)

    def test_hybrid_weighted_extremes(self, index):
        # all-semantic weight ranks pure-vector match first
        res = index.search_hybrid_weighted("cooking", unit([1, 0, 0]), 3,
                                           keyword_weight=0.0,
                                           semantic_weight=1.0)
        assert res[0].document_id == 0
        # all-keyword weight ranks BM25 match first
        res = index.search_hybrid_weighted("cooking", unit([1, 0, 0]), 3,
                                           keyword_weight=1.0,
                                           semantic_weight=0.0)
        assert res[0].document_id == 2

    def test_remove_by_source(self, index):
        removed = index.remove_by_source("a.txt")
        assert removed == 2
        assert len(index) == 1
        assert index.get_document(0) == "cooking pasta recipes"
        assert index.search_keywords("programming", 5) == []

    def test_json_roundtrip(self, index):
        restored = SearchIndex.from_json(index.to_json())
        assert len(restored) == 3
        assert restored.search_semantic(unit([0, 0, 1]), 1)[0].document_id == 2
        assert restored.get_metadata(0) == {"source": "a.txt"}

    def test_file_roundtrip(self, index, tmp_path):
        p = tmp_path / "index.bin"
        index.save_to_file(p)
        restored = SearchIndex.load_from_file(p)
        assert len(restored) == 3
        assert restored.dimension == 3

    def test_weighted_fusion_math(self):
        kw = [(0, 5.0), (1, 3.0)]
        sem = [(1, 0.9), (2, 0.5)]
        res = hybrid_search_weighted(kw, sem, 10, 1.0, 1.0)
        # doc 1 in both lists wins
        assert res[0][0] == 1
