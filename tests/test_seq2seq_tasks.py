"""Summarizer/Translator task tests over tiny checkpoints."""

import json

import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.tasks.summarizer import Summarizer
from kjarni_tpu.tasks.translator import (Translator, is_supported_language,
                                         language_code, normalize_language)
from kjarni_tpu.tasks.seq2seq import Seq2SeqOverrides


@pytest.fixture(scope="module")
def bart_dir(tmp_path_factory):
    from transformers import BartConfig, BartForConditionalGeneration
    d = tmp_path_factory.mktemp("bart_task")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = BartConfig(
        vocab_size=len(vm), d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        pad_token_id=0, bos_token_id=2, eos_token_id=3,
        decoder_start_token_id=3, forced_bos_token_id=2,
        task_specific_params={"summarization": {
            "early_stopping": True, "length_penalty": 2.0, "max_length": 16,
            "min_length": 2, "no_repeat_ngram_size": 3, "num_beams": 2}})
    torch.manual_seed(21)
    model = BartForConditionalGeneration(config).eval()
    save_torch_model(d, model, config)
    return d


@pytest.fixture(scope="module")
def t5_dir(tmp_path_factory):
    from transformers import T5Config, T5ForConditionalGeneration
    d = tmp_path_factory.mktemp("t5_task")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = T5Config(vocab_size=len(vm), d_model=32, d_kv=8, d_ff=64,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      relative_attention_num_buckets=8,
                      feed_forward_proj="gated-gelu", tie_word_embeddings=False,
                      decoder_start_token_id=0, eos_token_id=1, pad_token_id=0)
    torch.manual_seed(22)
    model = T5ForConditionalGeneration(config).eval()
    save_torch_model(d, model, config)
    return d


class TestSummarizer:
    def test_bart_summarize_returns_text(self, bart_dir):
        s = Summarizer(str(bart_dir), quiet=True)
        out = s.summarize("the quick data is safe and the service is great",
                          overrides=Seq2SeqOverrides(max_length=8, num_beams=2))
        assert isinstance(out, str)

    def test_uses_task_specific_params(self, bart_dir):
        s = Summarizer(str(bart_dir), quiet=True)
        assert "summarization" in s._gen.lm.task_params
        tp = s._gen.lm.task_params["summarization"]
        assert tp.num_beams == 2 and tp.max_length == 16

    def test_t5_gets_prefix(self, t5_dir):
        s = Summarizer(str(t5_dir), quiet=True)
        assert s._needs_prefix

    def test_stream_yields_text(self, bart_dir):
        s = Summarizer(str(bart_dir), quiet=True)
        pieces = list(s.stream("hello world the best purchase",
                               overrides=Seq2SeqOverrides(max_length=6,
                                                          num_beams=2)))
        assert isinstance("".join(pieces), str)


class TestTranslator:
    def test_language_normalization(self):
        assert normalize_language("en") == "English"
        assert normalize_language("GERMAN") == "German"
        assert normalize_language("deu") == "German"
        assert normalize_language("klingon") is None
        assert language_code("French") == "fr"
        assert is_supported_language("ja")

    def test_translate_formats_prompt(self, t5_dir):
        t = Translator(str(t5_dir), quiet=True)
        out = t.translate("hello world", "en", "de",
                          overrides=Seq2SeqOverrides(max_length=6, num_beams=2))
        assert isinstance(out, str)

    def test_unknown_language_raises(self, t5_dir):
        from kjarni_tpu.core.errors import TaskValidationError
        t = Translator(str(t5_dir), quiet=True)
        with pytest.raises(TaskValidationError):
            t.translate("hi", "klingon", "en")

    def test_translate_default_helpers(self, t5_dir):
        t = Translator(str(t5_dir), default_from="en", default_to="fr", quiet=True)
        assert t.default_from == "English" and t.default_to == "French"
