"""CLI coverage for the generation-family subcommands with tiny local models."""

import json

import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.cli.main import main


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("cli_llama")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(61)
    save_torch_model(d, LlamaForCausalLM(config).eval(), config)
    return d


@pytest.fixture(scope="module")
def bart_dir(tmp_path_factory):
    from transformers import BartConfig, BartForConditionalGeneration
    d = tmp_path_factory.mktemp("cli_bart")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = BartConfig(vocab_size=len(vm), d_model=32, encoder_layers=1,
                        decoder_layers=1, encoder_attention_heads=2,
                        decoder_attention_heads=2, encoder_ffn_dim=64,
                        decoder_ffn_dim=64, max_position_embeddings=64,
                        pad_token_id=0, bos_token_id=2, eos_token_id=3,
                        decoder_start_token_id=3, forced_bos_token_id=2)
    torch.manual_seed(62)
    save_torch_model(d, BartForConditionalGeneration(config).eval(), config)
    return d


@pytest.fixture(scope="module")
def t5_dir(tmp_path_factory):
    from transformers import T5Config, T5ForConditionalGeneration
    d = tmp_path_factory.mktemp("cli_t5")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = T5Config(vocab_size=len(vm), d_model=32, d_kv=8, d_ff=64,
                      num_layers=1, num_decoder_layers=1, num_heads=4,
                      relative_attention_num_buckets=8,
                      feed_forward_proj="relu", decoder_start_token_id=0,
                      eos_token_id=1, pad_token_id=0)
    torch.manual_seed(63)
    save_torch_model(d, T5ForConditionalGeneration(config).eval(), config)
    return d


class TestGenerateCli:
    def test_generate_text(self, llama_dir, capsys):
        assert main(["generate", "hello world", "--model", str(llama_dir),
                     "--max-tokens", "4", "--preset", "greedy"]) == 0
        capsys.readouterr()

    def test_generate_kv_cache_int8(self, llama_dir, capsys):
        # --kv-cache int8 threads through Generator -> DecoderLM (the
        # batched long-context serving pick; BASELINE.md round-4 rule)
        assert main(["generate", "hello world", "--model", str(llama_dir),
                     "--max-tokens", "4", "--preset", "greedy",
                     "--kv-cache", "int8"]) == 0
        capsys.readouterr()

    def test_generate_json(self, llama_dir, capsys):
        assert main(["generate", "hello world", "--model", str(llama_dir),
                     "--max-tokens", "3", "--preset", "greedy",
                     "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert "text" in data

    def test_chat_single_message(self, llama_dir, capsys):
        assert main(["chat", "--model", str(llama_dir),
                     "-m", "hello world"]) == 0
        capsys.readouterr()


class TestSeq2SeqCli:
    def test_summarize(self, bart_dir, capsys):
        assert main(["summarize", "the doctor and the physician went to work",
                     "--model", str(bart_dir)]) == 0
        capsys.readouterr()

    def test_summarize_json(self, bart_dir, capsys):
        assert main(["summarize", "hello world data safe", "--model",
                     str(bart_dir), "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert "summary" in data

    def test_translate(self, t5_dir, capsys):
        assert main(["translate", "hello world", "--model", str(t5_dir),
                     "--from", "en", "--to", "de", "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert "translation" in data


class TestTranscribeCli:
    def test_transcribe_wav(self, tmp_path, capsys):
        import numpy as np
        from helpers import build_word_tokenizer
        from test_whisper import whisper_checkpoint
        from kjarni_tpu.audio.loader import create_sine_wave, write_wav
        model_dir = tmp_path / "whisper"
        model_dir.mkdir()
        whisper_checkpoint(model_dir, seed=64)
        build_word_tokenizer(model_dir / "tokenizer.json", bert_style=False)
        wav = tmp_path / "a.wav"
        write_wav(wav, create_sine_wave(440, 0.3, 16000), 16000)
        assert main(["transcribe", str(wav), "--model", str(model_dir),
                     "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert "text" in data and data["duration"] == pytest.approx(0.3, 0.01)
