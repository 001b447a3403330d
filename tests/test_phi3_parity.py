"""Phi-3 parity vs HF torch: fused qkv/gate_up split + longrope scaling."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import save_torch_model

from kjarni_tpu.models import llama as kllama
from kjarni_tpu.weights.safetensors_loader import ModelWeights


def phi3_checkpoint(tmp_path, seed=0, rope_scaling=None, max_pos=64):
    from transformers import Phi3Config, Phi3ForCausalLM
    config = Phi3Config(
        vocab_size=120, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=max_pos,
        original_max_position_embeddings=32 if rope_scaling else max_pos,
        rope_scaling=rope_scaling, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(seed)
    model = Phi3ForCausalLM(config).eval()
    save_torch_model(tmp_path, model, config)
    hf = json.loads((tmp_path / "config.json").read_text())
    cfg = kllama.DecoderConfig.from_hf(hf)
    params = kllama.load_params(ModelWeights(tmp_path), cfg)
    return model, cfg, params


class TestPhi3Parity:
    def test_fused_projections_forward(self, tmp_path):
        model, cfg, params = phi3_checkpoint(tmp_path)
        assert cfg.arch == "phi3"
        # fused qkv was split at load
        assert params["layers"]["q"]["w"].shape == (2, 64, 64)
        assert params["layers"]["k"]["w"].shape == (2, 64, 32)
        ids = np.array([[5, 9, 23, 77, 41]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids),
                                              ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3,
                                   rtol=1e-3)

    def test_longrope_short_factors(self, tmp_path):
        # head_dim = 16 -> 8 factors per list
        rs = {"type": "longrope",
              "short_factor": [1.0 + 0.1 * i for i in range(8)],
              "long_factor": [2.0 + 0.2 * i for i in range(8)]}
        model, cfg, params = phi3_checkpoint(tmp_path, seed=1, rope_scaling=rs,
                                             max_pos=64)
        assert cfg.longrope_short_factor is not None
        ids = np.array([[5, 9, 23, 12]], dtype=np.int32)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        # rope cache within the original window -> short factors (matches HF
        # which picks by seq_len <= original_max_position_embeddings)
        cos, sin = kllama.rope_cache(cfg, 32)
        params = dict(params)
        params["rope_cos"], params["rope_sin"] = cos, sin
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids),
                                              ck, cv, 0)
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-3,
                                   rtol=1e-3)

    def test_decode_matches_full(self, tmp_path):
        model, cfg, params = phi3_checkpoint(tmp_path, seed=2)
        ids = np.array([[5, 9, 23, 77, 41, 3]], dtype=np.int32)
        ck, cv = kllama.init_cache(cfg, 1, 8)
        ref, _, _ = kllama.forward_all_logits(params, cfg, jnp.asarray(ids),
                                              ck, cv, 0)
        ck, cv = kllama.init_cache(cfg, 1, 8)
        _, ck, cv = kllama.forward(params, cfg, jnp.asarray(ids[:, :4]), ck, cv,
                                   0, last_idx=3)
        logits = None
        for i in range(4, 6):
            logits, ck, cv = kllama.forward(params, cfg,
                                            jnp.asarray([[ids[0, i]]]), ck, cv,
                                            jnp.int32(i))
        np.testing.assert_allclose(np.asarray(logits)[0],
                                   np.asarray(ref)[0, -1], atol=1e-3, rtol=1e-3)
