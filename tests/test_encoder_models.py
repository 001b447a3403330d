"""Model-wrapper tests: SentenceEncoder / CrossEncoder / SequenceClassifier vs torch."""

import numpy as np
import pytest
import torch

from helpers import tiny_bert_dir

from kjarni_tpu.models.encoder_models import (CrossEncoder, SentenceEncoder,
                                              SequenceClassifier)


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bert_plain")
    model, config = tiny_bert_dir(d)
    return d, model


@pytest.fixture(scope="module")
def classifier_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bert_cls")
    model, config = tiny_bert_dir(d, num_labels=2, seed=1)
    return d, model


class TestSentenceEncoder:
    def test_embeddings_match_torch_mean_pool(self, bert_dir):
        d, model = bert_dir
        enc = SentenceEncoder(d)
        texts = ["i love this product", "terrible quality"]
        got = enc.encode_batch(texts, normalize=False)

        ids, mask = enc.tokenizer.encode_batch(texts, max_len=enc.max_seq_len)
        with torch.no_grad():
            hidden = model(torch.from_numpy(ids.astype(np.int64)),
                           attention_mask=torch.from_numpy(mask.astype(np.int64))
                           ).last_hidden_state
        m = torch.from_numpy(mask.astype(np.float32)).unsqueeze(-1)
        expected = ((hidden * m).sum(1) / m.sum(1)).numpy()
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_normalized_unit_norm(self, bert_dir):
        d, _ = bert_dir
        enc = SentenceEncoder(d)
        v = enc.encode("hello world")
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_similarity_symmetric_bounded(self, bert_dir):
        d, _ = bert_dir
        enc = SentenceEncoder(d)
        s1 = enc.similarity("doctor", "physician")
        s2 = enc.similarity("physician", "doctor")
        assert abs(s1 - s2) < 1e-5
        assert -1.001 <= s1 <= 1.001
        assert enc.similarity("doctor", "doctor") > 0.999

    def test_empty_batch(self, bert_dir):
        d, _ = bert_dir
        enc = SentenceEncoder(d)
        out = enc.encode_batch([])
        assert out.shape == (0, enc.hidden_size)

    def test_cls_pooling(self, bert_dir):
        d, model = bert_dir
        enc = SentenceEncoder(d)
        got = enc.encode_batch(["hello world"], pooling="cls", normalize=False)
        ids, mask = enc.tokenizer.encode_batch(["hello world"], max_len=enc.max_seq_len)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).last_hidden_state[:, 0].numpy()
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


class TestSequenceClassifier:
    def test_logits_match_torch(self, classifier_dir):
        d, model = classifier_dir
        clf = SequenceClassifier(d)
        texts = ["i love this product", "terrible quality"]
        got = clf.predict_logits(texts)
        ids, mask = clf.tokenizer.encode_batch(texts, max_len=clf.max_seq_len)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).logits.numpy()
        np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)

    def test_labels_loaded(self, classifier_dir):
        d, _ = classifier_dir
        clf = SequenceClassifier(d)
        assert clf.labels == ["NEGATIVE", "POSITIVE"]

    def test_classify_returns_label_and_prob(self, classifier_dir):
        d, _ = classifier_dir
        clf = SequenceClassifier(d)
        label, score = clf.classify("i love this product")
        assert label in ("NEGATIVE", "POSITIVE")
        assert 0.0 <= score <= 1.0

    def test_scores_softmax_sum_to_one(self, classifier_dir):
        d, _ = classifier_dir
        clf = SequenceClassifier(d)
        scores = clf.classify_scores_batch(["hello world"])
        assert abs(scores.sum() - 1.0) < 1e-5

    def test_multi_label_sigmoid(self, tmp_path):
        model, _ = tiny_bert_dir(tmp_path, num_labels=4, seed=3,
                                 problem_type="multi_label_classification")
        clf = SequenceClassifier(tmp_path)
        assert clf.is_multi_label
        scores = clf.classify_scores_batch(["hello world"])
        # sigmoid scores need not sum to 1
        assert ((scores > 0) & (scores < 1)).all()
        logits = clf.predict_logits(["hello world"])
        np.testing.assert_allclose(scores, 1 / (1 + np.exp(-logits)), atol=1e-6)


class TestCrossEncoder:
    def test_scores_match_torch(self, tmp_path):
        model, _ = tiny_bert_dir(tmp_path, num_labels=1, seed=5)
        ce = CrossEncoder(tmp_path)
        pairs = [("keeping data safe", "the best purchase ever"),
                 ("keeping data safe", "data safe keeping is good")]
        got = ce.predict_pairs(pairs)

        queries = [q for q, _ in pairs]
        docs = [doc for _, doc in pairs]
        ids, mask = ce.tokenizer.encode_batch(queries, pairs=docs, max_len=ce.max_seq_len)
        tt = ce._pair_type_ids(queries, docs, ids.shape[1])
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64)),
                             token_type_ids=torch.from_numpy(tt.astype(np.int64))
                             ).logits[:, 0].numpy()
        np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)

    def test_rerank_orders_by_score(self, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=1, seed=6)
        ce = CrossEncoder(tmp_path)
        docs = ["i love this", "terrible quality", "data safe keeping"]
        ranked = ce.rerank("keeping data safe", docs)
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)
        assert {i for i, _ in ranked} == {0, 1, 2}

    def test_rerank_empty(self, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=1, seed=7)
        ce = CrossEncoder(tmp_path)
        assert ce.rerank("query", []) == []
