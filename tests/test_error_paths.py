"""Error-path coverage: the failure taxonomy behaves predictably
(cf. kjarni/src/common/error.rs typed errors)."""

import numpy as np
import pytest

from kjarni_tpu.core.errors import (AudioError, GenerationError,
                                    InvalidConfigError, KjarniError,
                                    ModelNotDownloadedError,
                                    ModelNotFoundError, TokenizationError,
                                    WeightLoadError)


class TestWeightErrors:
    def test_missing_dir(self, tmp_path):
        from kjarni_tpu.weights.safetensors_loader import ModelWeights
        with pytest.raises(WeightLoadError):
            ModelWeights(tmp_path / "nope")

    def test_missing_tensor(self, tmp_path):
        from safetensors.numpy import save_file
        from kjarni_tpu.weights.safetensors_loader import ModelWeights
        save_file({"a": np.zeros(3, np.float32)},
                  str(tmp_path / "model.safetensors"))
        ws = ModelWeights(tmp_path)
        with pytest.raises(WeightLoadError):
            ws.get("missing.tensor")

    def test_corrupt_gguf(self, tmp_path):
        from kjarni_tpu.weights.gguf import GgufFile
        (tmp_path / "bad.gguf").write_bytes(b"NOTG" + b"\x00" * 64)
        with pytest.raises(WeightLoadError):
            GgufFile(tmp_path / "bad.gguf")

    def test_gguf_missing_file(self, tmp_path):
        from kjarni_tpu.weights.gguf import GgufFile
        with pytest.raises(WeightLoadError):
            GgufFile(tmp_path / "absent.gguf")


class TestAudioErrors:
    def test_missing_file(self, tmp_path):
        from kjarni_tpu.audio.loader import load_audio
        with pytest.raises(AudioError):
            load_audio(tmp_path / "missing.wav")

    def test_unsupported_format(self, tmp_path):
        from kjarni_tpu.audio.loader import load_audio
        p = tmp_path / "a.mp3"
        p.write_bytes(b"\x00" * 10)
        with pytest.raises(AudioError):
            load_audio(p)

    def test_corrupt_wav(self, tmp_path):
        from kjarni_tpu.audio.loader import load_audio
        p = tmp_path / "a.wav"
        p.write_bytes(b"RIFFxxxx" + b"\x00" * 10)
        with pytest.raises(AudioError):
            load_audio(p)


class TestModelResolution:
    def test_not_downloaded_offline(self):
        from kjarni_tpu.tasks.common import DownloadPolicy, resolve_model_dir
        with pytest.raises(ModelNotDownloadedError) as e:
            resolve_model_dir("gpt2", download_policy=DownloadPolicy.OFFLINE)
        assert "gpt2" in str(e.value)

    def test_unknown_with_suggestions(self):
        from kjarni_tpu.registry import resolve
        with pytest.raises(ModelNotFoundError) as e:
            resolve("wisper-small")
        assert e.value.suggestions  # levenshtein finds whisper-small

    def test_error_hierarchy(self):
        assert issubclass(ModelNotFoundError, KjarniError)
        assert issubclass(WeightLoadError, KjarniError)
        assert issubclass(GenerationError, KjarniError)


class TestGenerationErrors:
    def test_empty_prompt(self, tmp_path):
        import torch
        from helpers import build_word_tokenizer, save_torch_model
        from transformers import LlamaConfig, LlamaForCausalLM
        from kjarni_tpu.models.decoder_lm import DecoderLM
        vm = build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64,
                             tie_word_embeddings=False)
        torch.manual_seed(1)
        save_torch_model(tmp_path, LlamaForCausalLM(config).eval(), config)
        lm = DecoderLM(tmp_path, max_context=32)
        with pytest.raises(GenerationError):
            list(lm.generate_stream(token_ids=[]))
        with pytest.raises(GenerationError):
            list(lm.generate_stream())

    def test_bad_quantize_mode(self, tmp_path):
        import torch
        from helpers import build_word_tokenizer, save_torch_model
        from transformers import LlamaConfig, LlamaForCausalLM
        from kjarni_tpu.models.decoder_lm import DecoderLM
        vm = build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64,
                             tie_word_embeddings=False)
        torch.manual_seed(1)
        save_torch_model(tmp_path, LlamaForCausalLM(config).eval(), config)
        with pytest.raises(InvalidConfigError):
            DecoderLM(tmp_path, quantize="fp4")
        with pytest.raises(InvalidConfigError):
            DecoderLM(tmp_path, kv_cache="int2")


class TestTokenizerErrors:
    def test_missing_tokenizer_file(self, tmp_path):
        from kjarni_tpu.tokenizer import KjarniTokenizer
        with pytest.raises(TokenizationError):
            KjarniTokenizer.from_file(tmp_path / "tokenizer.json")


class TestIndexErrors:
    def test_open_missing_index(self, tmp_path):
        from kjarni_tpu.core.errors import IndexError_
        from kjarni_tpu.rag.index import IndexReader
        with pytest.raises(IndexError_):
            IndexReader.open(tmp_path / "no-index")

    def test_double_commit(self, tmp_path):
        from kjarni_tpu.core.errors import IndexError_
        from kjarni_tpu.rag.index import IndexConfig, IndexWriter
        w = IndexWriter.open(tmp_path / "idx", IndexConfig(dimension=2))
        w.add("doc", np.ones(2, np.float32), {})
        w.commit()
        with pytest.raises(IndexError_):
            w.commit()
