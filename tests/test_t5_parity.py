"""T5 parity vs HF torch (encoder, decoder with cache, relative bias)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import save_torch_model

from kjarni_tpu.models import t5 as kt5
from kjarni_tpu.weights.safetensors_loader import ModelWeights


def t5_checkpoint(tmp_path, gated=True, seed=0):
    from transformers import T5Config, T5ForConditionalGeneration
    config = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=not gated,
        decoder_start_token_id=0)
    torch.manual_seed(seed)
    model = T5ForConditionalGeneration(config).eval()
    save_torch_model(tmp_path, model, config)
    hf = json.loads((tmp_path / "config.json").read_text())
    cfg = kt5.T5Config.from_hf(hf)
    params = kt5.load_params(ModelWeights(tmp_path), cfg)
    return model, cfg, params


class TestT5Parity:
    @pytest.mark.parametrize("gated", [True, False])
    def test_encoder_parity(self, tmp_path, gated):
        model, cfg, params = t5_checkpoint(tmp_path, gated)
        ids = np.array([[5, 9, 23, 77, 1], [4, 8, 1, 0, 0]], dtype=np.int32)
        mask = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]], dtype=np.int32)
        with torch.no_grad():
            expected = model.encoder(
                torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64))
            ).last_hidden_state.numpy()
        got = np.asarray(kt5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
        m = mask.astype(bool)
        np.testing.assert_allclose(got[m], expected[m], atol=2e-3, rtol=1e-3)

    @pytest.mark.parametrize("gated", [True, False])
    def test_full_seq2seq_logits(self, tmp_path, gated):
        model, cfg, params = t5_checkpoint(tmp_path, gated, seed=1)
        enc_ids = np.array([[5, 9, 23, 1]], dtype=np.int32)
        enc_mask = np.ones_like(enc_ids)
        dec_ids = np.array([[0, 42, 17]], dtype=np.int32)
        with torch.no_grad():
            expected = model(
                input_ids=torch.from_numpy(enc_ids.astype(np.int64)),
                attention_mask=torch.from_numpy(enc_mask.astype(np.int64)),
                decoder_input_ids=torch.from_numpy(dec_ids.astype(np.int64)),
            ).logits.numpy()
        enc_out = kt5.encode(params, cfg, jnp.asarray(enc_ids), jnp.asarray(enc_mask))
        ck, cv = kt5.precompute_cross_kv(params, cfg, enc_out)
        sk, sv = kt5.init_self_cache(cfg, 1, 8)
        logits, _, _ = kt5.decode_step(params, cfg, jnp.asarray(dec_ids), sk, sv,
                                       ck, cv, jnp.asarray(enc_mask), 0)
        np.testing.assert_allclose(np.asarray(logits), expected, atol=2e-3, rtol=1e-3)

    def test_incremental_decode_matches_full(self, tmp_path):
        model, cfg, params = t5_checkpoint(tmp_path, gated=True, seed=2)
        enc_ids = np.array([[5, 9, 23, 1]], dtype=np.int32)
        enc_mask = np.ones_like(enc_ids)
        dec_ids = np.array([[0, 42, 17, 9]], dtype=np.int32)
        enc_out = kt5.encode(params, cfg, jnp.asarray(enc_ids), jnp.asarray(enc_mask))
        ck, cv = kt5.precompute_cross_kv(params, cfg, enc_out)

        sk, sv = kt5.init_self_cache(cfg, 1, 8)
        full, _, _ = kt5.decode_step(params, cfg, jnp.asarray(dec_ids), sk, sv,
                                     ck, cv, jnp.asarray(enc_mask), 0)
        sk, sv = kt5.init_self_cache(cfg, 1, 8)
        last = None
        for i in range(dec_ids.shape[1]):
            last, sk, sv = kt5.decode_step(
                params, cfg, jnp.asarray(dec_ids[:, i:i + 1]), sk, sv, ck, cv,
                jnp.asarray(enc_mask), jnp.int32(i))
        np.testing.assert_allclose(np.asarray(last)[0, 0], np.asarray(full)[0, -1],
                                   atol=1e-3, rtol=1e-3)
