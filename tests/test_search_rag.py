"""Search + RAG tests: BM25, vector store, RRF, splitter, loader, index, tasks."""

import numpy as np
import pytest

from helpers import tiny_bert_dir

from kjarni_tpu.rag.index import (IndexConfig, IndexReader, IndexWriter,
                                  MetadataFilter)
from kjarni_tpu.rag.loader import DocumentLoader, LoaderConfig
from kjarni_tpu.rag.splitter import SplitterConfig, TextSplitter
from kjarni_tpu.search.bm25 import Bm25Index, Bm25Params, tokenize
from kjarni_tpu.search.hybrid import hybrid_search
from kjarni_tpu.search.types import SearchMode
from kjarni_tpu.search.vector import VectorStore


class TestTokenize:
    def test_basic(self):
        assert tokenize("Hello World") == ["hello", "world"]

    def test_filters_short(self):
        assert tokenize("I am a test") == ["am", "test"]

    def test_punctuation(self):
        assert tokenize("hello, world! how are you?") == \
            ["hello", "world", "how", "are", "you"]

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize("   ") == []


class TestBm25:
    def test_params_default(self):
        p = Bm25Params()
        assert (p.k1, p.b, p.epsilon) == (1.2, 0.75, 0.25)

    def test_empty_index(self):
        assert Bm25Index().search("test", 10) == []

    def test_score_ordering_by_tf(self):
        idx = Bm25Index()
        idx.add_document(0, "test words here filler filler filler filler test2 pad pad")
        idx.add_document(1, "test test test filler filler filler filler pad pad pad")
        res = idx.search("test", 10)
        assert res[0][0] == 1 and res[1][0] == 0
        assert res[0][1] > res[1][1]

    def test_idf_rare_beats_common(self):
        idx = Bm25Index()
        for i in range(9):
            idx.add_document(i, "common filler words here")
        idx.add_document(9, "common rare filler words")
        rare = idx.search("rare", 10)
        common = idx.search("common", 10)
        assert rare[0][1] > max(s for _, s in common)

    def test_length_normalization(self):
        idx = Bm25Index()
        idx.add_document(0, "test short doc")
        idx.add_document(1, "test " + "filler " * 30)
        res = dict(idx.search("test", 10))
        assert res[0] > res[1]

    def test_serde_roundtrip(self):
        idx = Bm25Index()
        idx.add_document(0, "hello world")
        idx.add_document(1, "hello there")
        restored = Bm25Index.from_dict(idx.to_dict())
        assert restored.search("hello", 5) == idx.search("hello", 5)


class TestVectorStore:
    def test_search_sorted(self):
        store = VectorStore([[1, 0, 0], [0.9, 0.1, 0], [0, 1, 0]])
        res = store.search([1, 0, 0], 10)
        assert [i for i, _ in res] == [0, 1, 2]
        assert res[0][1] >= res[1][1] >= res[2][1]

    def test_dimension_mismatch_query(self):
        store = VectorStore([[1.0, 2.0, 3.0]])
        assert store.search([1.0, 2.0], 10) == []

    def test_add_and_threshold(self):
        store = VectorStore(dimension=2)
        store.add([1.0, 0.0])
        store.add([0.7, 0.7])
        store.add([0.0, 1.0])
        res = store.search_with_threshold([1.0, 0.0], 10, 0.5)
        assert len(res) == 2
        assert all(s >= 0.5 for _, s in res)

    def test_cosine_similarity_cases(self):
        assert VectorStore.cosine_similarity([1, 2, 3], [1, 2, 3]) == \
            pytest.approx(1.0, abs=1e-6)
        assert VectorStore.cosine_similarity([1, 0], [0, 1]) == \
            pytest.approx(0.0, abs=1e-6)
        assert VectorStore.cosine_similarity([1, 2, 3], [-1, -2, -3]) == \
            pytest.approx(-1.0, abs=1e-6)
        assert VectorStore.cosine_similarity([1, 2], [1, 2, 3]) == 0.0

    def test_normalize(self):
        store = VectorStore([[3.0, 4.0]])
        store.normalize()
        emb = store.get(0)
        np.testing.assert_allclose(emb, [0.6, 0.8], atol=1e-6)

    def test_dot_and_euclid(self):
        assert VectorStore.dot_product([1, 2, 3], [4, 5, 6]) == pytest.approx(32.0)
        assert VectorStore.euclidean_distance([0, 0], [3, 4]) == pytest.approx(5.0)


class TestHybrid:
    def test_doc_in_both_ranks_first(self):
        res = hybrid_search([(0, 1.0), (1, 0.5)], [(1, 0.9), (2, 0.4)], 10)
        assert res[0][0] == 1

    def test_empty(self):
        assert hybrid_search([], [], 10) == []

    def test_limit(self):
        res = hybrid_search([(0, 1.0), (1, 0.9), (2, 0.8)],
                            [(3, 0.9), (4, 0.8), (5, 0.7)], 2)
        assert len(res) == 2


class TestSplitter:
    def test_empty(self):
        assert TextSplitter().split("") == []

    def test_small_text_single_chunk(self):
        assert TextSplitter().split("hello world") == ["hello world"]

    def test_splits_on_separator(self):
        cfg = SplitterConfig(chunk_size=20, chunk_overlap=0)
        chunks = TextSplitter(cfg).split("aaaa aaaa\n\nbbbb bbbb\n\ncccc cccc")
        assert len(chunks) >= 2
        assert all(len(c) <= 20 for c in chunks)

    def test_large_section_split_with_overlap(self):
        cfg = SplitterConfig(chunk_size=10, chunk_overlap=3)
        chunks = TextSplitter(cfg).split("abcdefghijklmnopqrstuvwxyz")
        assert all(len(c) <= 10 for c in chunks)
        # overlap: consecutive chunks share 3 chars
        assert chunks[0][-3:] == chunks[1][:3]

    def test_invalid_config(self):
        with pytest.raises(ValueError):
            TextSplitter(SplitterConfig(chunk_size=0))
        with pytest.raises(ValueError):
            TextSplitter(SplitterConfig(chunk_size=10, chunk_overlap=10))

    def test_with_metadata(self):
        out = TextSplitter(SplitterConfig(chunk_size=10, chunk_overlap=0)) \
            .split_with_metadata("aaaa\n\nbbbb\n\ncccc", {"source": "x"})
        assert all(md["source"] == "x" for _, md in out)
        assert out[0][1]["chunk_index"] == "0"


class TestLoader:
    def test_supported_extensions(self):
        loader = DocumentLoader()
        from pathlib import Path
        assert loader.is_supported_extension(Path("a.txt"))
        assert loader.is_supported_extension(Path("a.py"))
        assert not loader.is_supported_extension(Path("a.exe"))
        assert not loader.is_supported_extension(Path("a"))

    def test_load_directory(self, tmp_path):
        (tmp_path / "a.txt").write_text("hello world document one")
        (tmp_path / "b.md").write_text("second document here")
        (tmp_path / "c.exe").write_text("binary junk")
        (tmp_path / ".hidden.txt").write_text("hidden")
        chunks = DocumentLoader().load_directory(tmp_path)
        sources = {c.metadata.source for c in chunks}
        assert len(sources) == 2
        assert all(".exe" not in s and "hidden" not in s for s in sources)


class TestIndexWriterReader:
    def make_index(self, tmp_path, n=6, dim=4):
        rng = np.random.default_rng(0)
        w = IndexWriter.open(tmp_path / "idx", IndexConfig(dimension=dim))
        texts = [f"document number {i} about topic{i % 3} content" for i in range(n)]
        embs = rng.standard_normal((n, dim)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        for i, t in enumerate(texts):
            w.add(t, embs[i], {"source": f"file{i % 2}.txt", "i": str(i)})
        w.commit()
        return tmp_path / "idx", texts, embs

    def test_roundtrip_semantic(self, tmp_path):
        root, texts, embs = self.make_index(tmp_path)
        r = IndexReader.open(root)
        assert len(r) == 6
        res = r.search_semantic(embs[2], 3)
        assert res[0].document_id == 2
        assert res[0].text == texts[2]

    def test_keyword_search(self, tmp_path):
        root, texts, _ = self.make_index(tmp_path)
        r = IndexReader.open(root)
        res = r.search_keywords("topic1", 5)
        assert res
        assert all("topic1" in x.text for x in res)

    def test_hybrid_search(self, tmp_path):
        root, texts, embs = self.make_index(tmp_path)
        r = IndexReader.open(root)
        res = r.search_hybrid("topic2 content", embs[2], 4)
        assert res

    def test_metadata_filter(self, tmp_path):
        root, _, embs = self.make_index(tmp_path)
        r = IndexReader.open(root)
        f = MetadataFilter().must("source", "file0.txt")
        res = r.search_semantic(embs[0], 6, filter=f)
        assert res
        assert all(x.metadata["source"] == "file0.txt" for x in res)

    def test_source_glob_filter(self, tmp_path):
        root, _, embs = self.make_index(tmp_path)
        r = IndexReader.open(root)
        f = MetadataFilter().source("*.txt")
        assert r.search_semantic(embs[0], 3, filter=f)

    def test_multi_segment(self, tmp_path):
        rng = np.random.default_rng(1)
        w = IndexWriter.open(tmp_path / "idx",
                             IndexConfig(dimension=4, max_docs_per_segment=2))
        for i in range(5):
            w.add(f"doc {i} words here", rng.standard_normal(4).astype(np.float32),
                  {})
        w.commit()
        r = IndexReader.open(tmp_path / "idx")
        assert r.segment_count() == 3
        assert len(r) == 5
        assert r.get_document(4) == "doc 4 words here"


class TestIndexerSearcherTasks:
    def test_end_to_end_index_and_search(self, tmp_path):
        model_dir = tmp_path / "model"
        tiny_bert_dir(model_dir, seed=9)
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "crypto.txt").write_text(
            "keeping data safe is the purchase of good quality service")
        (docs / "love.txt").write_text("i love this product it is the best ever made")

        from kjarni_tpu.tasks.indexer import Indexer
        from kjarni_tpu.tasks.searcher import Searcher

        indexer = Indexer(str(model_dir), quiet=True)
        stats = indexer.create(tmp_path / "myidx", [docs])
        assert stats.documents == 2 and stats.chunks >= 2

        searcher = Searcher(str(model_dir), quiet=True)
        for mode in ("semantic", "keyword", "hybrid"):
            res = searcher.search(tmp_path / "myidx", "keeping data safe",
                                  mode=mode, top_k=2)
            assert res, mode
        res = searcher.search(tmp_path / "myidx", "keeping data safe",
                              mode="keyword", top_k=2)
        assert "data safe" in res[0].text

    def test_search_with_rerank(self, tmp_path):
        model_dir = tmp_path / "model"
        tiny_bert_dir(model_dir, seed=9)
        ce_dir = tmp_path / "ce"
        tiny_bert_dir(ce_dir, num_labels=1, seed=10)
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("keeping data safe with good quality")
        (docs / "b.txt").write_text("i love this product")

        from kjarni_tpu.tasks.indexer import Indexer
        from kjarni_tpu.tasks.searcher import Searcher
        Indexer(str(model_dir), quiet=True).create(tmp_path / "idx", [docs])
        s = Searcher(str(model_dir), reranker_model=str(ce_dir), quiet=True)
        res = s.search(tmp_path / "idx", "keeping data safe", top_k=2)
        assert res
        scores = [r.score for r in res]
        assert scores == sorted(scores, reverse=True)

    def test_incremental_add(self, tmp_path):
        model_dir = tmp_path / "model"
        tiny_bert_dir(model_dir, seed=9)
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("first document words")
        from kjarni_tpu.tasks.indexer import Indexer
        idx = Indexer(str(model_dir), quiet=True)
        idx.create(tmp_path / "i", [docs / "a.txt"])
        (docs / "b.txt").write_text("second document words")
        idx.add(tmp_path / "i", [docs / "b.txt"])
        r = IndexReader.open(tmp_path / "i")
        assert len(r) == 2


class TestIndexerProgressAndCancellation:
    def test_progress_callbacks_fire_in_stage_order(self, tmp_path):
        from helpers import tiny_bert_dir
        from kjarni_tpu.tasks.indexer import Indexer
        from kjarni_tpu.rag.progress import Progress, ProgressStage
        model_dir = tmp_path / "model"
        tiny_bert_dir(model_dir, seed=9)
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("keeping data safe is a good service")

        seen: list[Progress] = []
        Indexer(str(model_dir), quiet=True).create(
            tmp_path / "idx", [docs], progress=seen.append)
        stages = [p.stage for p in seen]
        assert stages[0] == ProgressStage.SCANNING
        assert ProgressStage.EMBEDDING in stages
        assert stages[-1] == ProgressStage.COMMITTING
        assert stages == sorted(stages)  # monotone through the pipeline
        emb = [p for p in seen if p.stage == ProgressStage.EMBEDDING][-1]
        assert emb.current == emb.total  # finished all chunks

    def test_cancellation_aborts_before_commit(self, tmp_path):
        from helpers import tiny_bert_dir
        from kjarni_tpu.tasks.indexer import Indexer
        from kjarni_tpu.core.cancellation import CancellationToken
        from kjarni_tpu.core.errors import CancelledError
        from kjarni_tpu.rag.index import MANIFEST
        model_dir = tmp_path / "model"
        tiny_bert_dir(model_dir, seed=9)
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("hello world " * 50)

        tok = CancellationToken()
        tok.cancel()
        with pytest.raises(CancelledError):
            Indexer(str(model_dir), quiet=True).create(
                tmp_path / "idx2", [docs], cancellation=tok)
        assert not (tmp_path / "idx2" / MANIFEST).exists()  # nothing committed
