"""Task-API tests: builder/validation behaviour without registry downloads
(SURVEY §4 "builder/validation tests, no model load" tier)."""

import numpy as np
import pytest

from helpers import tiny_bert_dir

from kjarni_tpu.core.errors import ModelNotFoundError, TaskValidationError
from kjarni_tpu.tasks.classifier import Classifier
from kjarni_tpu.tasks.embedder import Embedder, cosine_similarity
from kjarni_tpu.tasks.reranker import Reranker
from kjarni_tpu import registry


class TestRegistry:
    def test_resolve_exact(self):
        assert registry.resolve("minilm-l6-v2").cli_name == "minilm-l6-v2"

    def test_resolve_alias(self):
        assert registry.resolve("sentence-transformers/all-MiniLM-L6-v2").cli_name == \
            "minilm-l6-v2"

    def test_resolve_substring_suggestion(self):
        with pytest.raises(ModelNotFoundError) as e:
            registry.resolve("minilm")
        assert "minilm-l6-v2" in str(e.value)

    def test_resolve_levenshtein_suggestion(self):
        with pytest.raises(ModelNotFoundError) as e:
            registry.resolve("gpt3")
        assert "gpt2" in str(e.value)

    def test_search(self):
        results = registry.search("sentiment")
        assert any(m.cli_name == "distilbert-sentiment" for m, _ in results)

    def test_model_count_matches_reference(self):
        # registry.rs:133 ModelType lists 28 curated models
        assert len(registry.MODELS) == 28

    def test_repo_id(self):
        m = registry.resolve("minilm-l6-v2")
        assert m.repo_id == "sentence-transformers/all-MiniLM-L6-v2"

    def test_format_helpers(self):
        assert registry.format_params(1540) == "1.5B"
        assert registry.format_params(22) == "22M"
        assert registry.format_size(2200) == "2.2 GB"
        assert registry.format_size(90) == "90 MB"


class TestTaskValidation:
    def test_classifier_rejects_embedding_model(self):
        with pytest.raises(TaskValidationError):
            Classifier("minilm-l6-v2", offline=True)

    def test_embedder_rejects_classifier_model(self):
        with pytest.raises(TaskValidationError):
            Embedder("distilbert-sentiment", offline=True)

    def test_reranker_rejects_embedding_model(self):
        with pytest.raises(TaskValidationError):
            Reranker("minilm-l6-v2", offline=True)

    def test_unknown_model_raises(self):
        with pytest.raises(ModelNotFoundError):
            Classifier("definitely-not-a-model", offline=True)


class TestTasksWithLocalModels:
    def test_classifier_from_path(self, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=2, seed=1)
        clf = Classifier(str(tmp_path))
        res = clf.classify("i love this product")
        assert res.label in ("NEGATIVE", "POSITIVE")
        assert "(" in str(res) and "%" in str(res)
        assert len(res.all_scores) == 2
        assert abs(sum(s for _, s in res.all_scores) - 1.0) < 1e-5

    def test_classifier_custom_labels(self, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=2, seed=2)
        clf = Classifier(str(tmp_path), labels=["BAD", "GOOD"])
        assert clf.classify("hello world").label in ("BAD", "GOOD")

    def test_classifier_wrong_label_count(self, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=2, seed=2)
        with pytest.raises(TaskValidationError):
            Classifier(str(tmp_path), labels=["A", "B", "C"])

    def test_embedder_from_path(self, tmp_path):
        tiny_bert_dir(tmp_path, seed=3)
        emb = Embedder(str(tmp_path))
        v = emb.embed("hello world")
        assert v.shape == (emb.dim,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        assert abs(emb.similarity("doctor", "doctor") - 1.0) < 1e-4

    def test_embedder_rank_by_similarity(self, tmp_path):
        tiny_bert_dir(tmp_path, seed=4)
        emb = Embedder(str(tmp_path))
        ranked = emb.rank_by_similarity("doctor", ["physician", "purchase", "doctor"])
        assert ranked[0][0] == 2  # identical text ranks first
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)

    def test_reranker_from_path(self, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=1, seed=5)
        rr = Reranker(str(tmp_path))
        results = rr.rerank_top_k("keeping data safe", ["a b c", "data safe", "x"], 2)
        assert len(results) == 2
        assert results[0].score >= results[1].score
        assert results[0].text in ("a b c", "data safe", "x")

    def test_cosine_similarity_helper(self):
        assert cosine_similarity([1, 0], [1, 0]) == pytest.approx(1.0)
        assert cosine_similarity([1, 0], [0, 1]) == pytest.approx(0.0)
        assert cosine_similarity([0, 0], [1, 0]) == 0.0
