"""Decoder parity vs HF torch: Llama (GQA), Qwen2 (bias), Mistral, GPT-2.

SURVEY §4 tier 4 analogue of kjarni-models/src/tests/decoder_parity_test.rs.
Also checks the prefill+decode KV-cache path against a single full forward.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import save_torch_model

from kjarni_tpu.models import gpt2 as kgpt2
from kjarni_tpu.models import llama as kllama
from kjarni_tpu.weights.safetensors_loader import ModelWeights


def llama_checkpoint(tmp_path, **over):
    from transformers import LlamaConfig, LlamaForCausalLM
    kwargs = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=3, num_attention_heads=4,
                  num_key_value_heads=2, max_position_embeddings=128,
                  rope_theta=10000.0, tie_word_embeddings=False)
    kwargs.update(over)
    config = LlamaConfig(**kwargs)
    torch.manual_seed(0)
    model = LlamaForCausalLM(config).eval()
    save_torch_model(tmp_path, model, config)
    return model, config


def load_kjarni(tmp_path):
    hf = json.loads((tmp_path / "config.json").read_text())
    cfg = kllama.DecoderConfig.from_hf(hf)
    params = kllama.load_params(ModelWeights(tmp_path), cfg)
    params = {k: v for k, v in params.items()}
    return cfg, params


class TestLlamaParity:
    def test_full_forward_logits(self, tmp_path):
        model, _ = llama_checkpoint(tmp_path)
        cfg, params = load_kjarni(tmp_path)
        ids = np.array([[5, 9, 23, 77, 41, 3]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kllama.init_cache(cfg, 1, 16)
        got, _, _ = kllama.forward_all_logits(
            params, cfg, jnp.asarray(ids), ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-3)

    def test_prefill_then_decode_matches_full_forward(self, tmp_path):
        model, _ = llama_checkpoint(tmp_path)
        cfg, params = load_kjarni(tmp_path)
        full_ids = np.array([[5, 9, 23, 77, 41, 3, 8, 102]], dtype=np.int32)
        ck, cv = kllama.init_cache(cfg, 1, 16)
        ref_logits, _, _ = kllama.forward_all_logits(
            params, cfg, jnp.asarray(full_ids), ck, cv, 0)
        ref_last = np.asarray(ref_logits)[0, -1]

        # prefill 5 tokens (padded to 8), then decode 3 one at a time
        ck, cv = kllama.init_cache(cfg, 1, 16)
        prompt = np.zeros((1, 8), dtype=np.int32)
        prompt[0, :5] = full_ids[0, :5]
        _, ck, cv = kllama.forward(params, cfg, jnp.asarray(prompt), ck, cv, 0,
                                   last_idx=4)
        logits = None
        for i in range(5, 8):
            tok = jnp.asarray([[full_ids[0, i]]])
            logits, ck, cv = kllama.forward(params, cfg, tok, ck, cv, jnp.int32(i))
        np.testing.assert_allclose(np.asarray(logits)[0], ref_last, atol=1e-3,
                                   rtol=1e-3)

    def test_llama3_rope_scaling_parity(self, tmp_path):
        model, _ = llama_checkpoint(
            tmp_path,
            rope_scaling={"rope_type": "llama3", "factor": 8.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 32},
            max_position_embeddings=128)
        cfg, params = load_kjarni(tmp_path)
        assert cfg.rope_scaling is not None
        ids = np.array([[5, 9, 23, 77]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids), ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-3)

    def test_tied_embeddings(self, tmp_path):
        model, _ = llama_checkpoint(tmp_path, tie_word_embeddings=True)
        cfg, params = load_kjarni(tmp_path)
        ids = np.array([[5, 9, 23]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids), ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-3)


class TestQwen2Parity:
    def test_qkv_bias_forward(self, tmp_path):
        from transformers import Qwen2Config, Qwen2ForCausalLM
        config = Qwen2Config(vocab_size=120, hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, max_position_embeddings=64,
                             tie_word_embeddings=False)
        torch.manual_seed(1)
        model = Qwen2ForCausalLM(config).eval()
        save_torch_model(tmp_path, model, config)
        cfg, params = load_kjarni(tmp_path)
        assert cfg.qkv_bias
        assert "b" in params["layers"]["q"]
        ids = np.array([[3, 44, 91, 12]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids), ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-3)


class TestMistralParity:
    def test_sliding_window_forward(self, tmp_path):
        from transformers import MistralConfig, MistralForCausalLM
        config = MistralConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                               num_hidden_layers=2, num_attention_heads=4,
                               num_key_value_heads=2, max_position_embeddings=64,
                               sliding_window=4, tie_word_embeddings=False)
        torch.manual_seed(2)
        model = MistralForCausalLM(config).eval()
        save_torch_model(tmp_path, model, config)
        cfg, params = load_kjarni(tmp_path)
        assert cfg.sliding_window == 4
        ids = np.array([[3, 44, 91, 12, 7, 55, 2, 19]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids), ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-3)


class TestGpt2Parity:
    def test_full_forward(self, tmp_path):
        from transformers import GPT2Config, GPT2LMHeadModel
        config = GPT2Config(vocab_size=120, n_embd=48, n_layer=2, n_head=4,
                            n_positions=64)
        torch.manual_seed(3)
        model = GPT2LMHeadModel(config).eval()
        save_torch_model(tmp_path, model, config)
        hf = json.loads((tmp_path / "config.json").read_text())
        cfg = kgpt2.Gpt2Config.from_hf(hf)
        params = kgpt2.load_params(ModelWeights(tmp_path), cfg)
        ids = np.array([[3, 44, 91, 12, 7]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kgpt2.init_cache(cfg, 1, 8)
        got, _, _ = kgpt2.forward_all_logits(params, cfg, jnp.asarray(ids), ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-3)

    def test_decode_matches_full(self, tmp_path):
        from transformers import GPT2Config, GPT2LMHeadModel
        config = GPT2Config(vocab_size=120, n_embd=48, n_layer=2, n_head=4,
                            n_positions=64)
        torch.manual_seed(4)
        model = GPT2LMHeadModel(config).eval()
        save_torch_model(tmp_path, model, config)
        hf = json.loads((tmp_path / "config.json").read_text())
        cfg = kgpt2.Gpt2Config.from_hf(hf)
        params = kgpt2.load_params(ModelWeights(tmp_path), cfg)
        ids = np.array([[3, 44, 91, 12, 7, 9]], dtype=np.int32)
        ck, cv = kgpt2.init_cache(cfg, 1, 8)
        ref, _, _ = kgpt2.forward_all_logits(params, cfg, jnp.asarray(ids), ck, cv, 0)
        ck, cv = kgpt2.init_cache(cfg, 1, 8)
        _, ck, cv = kgpt2.forward(params, cfg, jnp.asarray(ids[:, :4]), ck, cv, 0)
        logits = None
        for i in range(4, 6):
            logits, ck, cv = kgpt2.forward(params, cfg, jnp.asarray([[ids[0, i]]]),
                                           ck, cv, jnp.int32(i))
        np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref)[0, -1],
                                   atol=1e-3, rtol=1e-3)
