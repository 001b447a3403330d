"""BART parity + beam-search behaviour vs HF generate (beams.rs test analogue)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.models import bart as kbart
from kjarni_tpu.models.seq2seq_lm import Seq2SeqLM
from kjarni_tpu.weights.safetensors_loader import ModelWeights


def bart_checkpoint(tmp_path, seed=0, with_tokenizer=False):
    from transformers import BartConfig, BartForConditionalGeneration
    config = BartConfig(
        vocab_size=100, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, forced_bos_token_id=0, scale_embedding=False)
    torch.manual_seed(seed)
    model = BartForConditionalGeneration(config).eval()
    save_torch_model(tmp_path, model, config)
    if with_tokenizer:
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
    hf = json.loads((tmp_path / "config.json").read_text())
    cfg = kbart.BartConfig.from_hf(hf)
    params = kbart.load_params(ModelWeights(tmp_path), cfg)
    return model, cfg, params


class TestBartParity:
    def test_encoder_parity(self, tmp_path):
        model, cfg, params = bart_checkpoint(tmp_path)
        ids = np.array([[0, 5, 9, 2], [0, 7, 2, 1]], dtype=np.int32)
        mask = np.array([[1, 1, 1, 1], [1, 1, 1, 0]], dtype=np.int32)
        with torch.no_grad():
            expected = model.model.encoder(
                torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64))
            ).last_hidden_state.numpy()
        got = np.asarray(kbart.encode(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
        m = mask.astype(bool)
        np.testing.assert_allclose(got[m], expected[m], atol=2e-3, rtol=1e-3)

    def test_seq2seq_logits_parity(self, tmp_path):
        model, cfg, params = bart_checkpoint(tmp_path, seed=1)
        enc_ids = np.array([[0, 5, 9, 2]], dtype=np.int32)
        enc_mask = np.ones_like(enc_ids)
        dec_ids = np.array([[2, 0, 42]], dtype=np.int32)
        with torch.no_grad():
            expected = model(
                input_ids=torch.from_numpy(enc_ids.astype(np.int64)),
                attention_mask=torch.from_numpy(enc_mask.astype(np.int64)),
                decoder_input_ids=torch.from_numpy(dec_ids.astype(np.int64)),
            ).logits.numpy()
        enc = kbart.encode(params, cfg, jnp.asarray(enc_ids), jnp.asarray(enc_mask))
        ck, cv = kbart.precompute_cross_kv(params, cfg, enc)
        sk, sv = kbart.init_self_cache(cfg, 1, 8)
        logits, _, _ = kbart.decode_step(params, cfg, jnp.asarray(dec_ids), sk, sv,
                                         ck, cv, jnp.asarray(enc_mask), 0)
        np.testing.assert_allclose(np.asarray(logits), expected, atol=2e-3,
                                   rtol=1e-3)

    def test_incremental_decode_matches_full(self, tmp_path):
        model, cfg, params = bart_checkpoint(tmp_path, seed=2)
        enc_ids = np.array([[0, 5, 9, 2]], dtype=np.int32)
        enc_mask = np.ones_like(enc_ids)
        dec_ids = np.array([[2, 0, 42, 17]], dtype=np.int32)
        enc = kbart.encode(params, cfg, jnp.asarray(enc_ids), jnp.asarray(enc_mask))
        ck, cv = kbart.precompute_cross_kv(params, cfg, enc)
        sk, sv = kbart.init_self_cache(cfg, 1, 8)
        full, _, _ = kbart.decode_step(params, cfg, jnp.asarray(dec_ids), sk, sv,
                                       ck, cv, jnp.asarray(enc_mask), 0)
        sk, sv = kbart.init_self_cache(cfg, 1, 8)
        last = None
        for i in range(dec_ids.shape[1]):
            last, sk, sv = kbart.decode_step(
                params, cfg, jnp.asarray(dec_ids[:, i:i + 1]), sk, sv, ck, cv,
                jnp.asarray(enc_mask), jnp.int32(i))
        np.testing.assert_allclose(np.asarray(last)[0, 0], np.asarray(full)[0, -1],
                                   atol=1e-3, rtol=1e-3)


class TestBeamSearchVsHF:
    @pytest.mark.parametrize("seed", [3, 4])
    def test_beam_output_matches_hf(self, tmp_path, seed):
        model, cfg, params = bart_checkpoint(tmp_path, seed=seed,
                                             with_tokenizer=True)
        lm = Seq2SeqLM(tmp_path)
        enc_ids = np.array([[0, 5, 9, 13, 2]], dtype=np.int32)
        with torch.no_grad():
            hf_out = model.generate(
                torch.from_numpy(enc_ids.astype(np.int64)),
                num_beams=4, max_length=12, early_stopping=True,
                length_penalty=1.0, no_repeat_ngram_size=0)
        expected_ids = hf_out[0].tolist()

        from kjarni_tpu.generate.beam import BeamSearchConfig, beam_search
        from kjarni_tpu.core.bucketing import seq_bucket
        import jax.numpy as jnp

        enc_mask = np.ones_like(enc_ids)
        _, ck, cv = lm._encode_and_cross(lm.params, jnp.asarray(enc_ids),
                                         jnp.asarray(enc_mask))
        k = 4
        ck = jnp.repeat(ck, k, axis=1)
        cv = jnp.repeat(cv, k, axis=1)
        bm = jnp.repeat(jnp.asarray(enc_mask), k, axis=0)
        sk, sv = kbart.init_self_cache(cfg, k, 16)
        state = {"sk": sk, "sv": sv}

        def step_fn(tokens, pos, parents):
            logits, state["sk"], state["sv"] = lm._step(
                lm.params, jnp.asarray(tokens[:, None]), state["sk"], state["sv"],
                ck, cv, bm, jnp.int32(pos), jnp.asarray(parents))
            return logits

        hyp = beam_search(step_fn, BeamSearchConfig(
            num_beams=4, max_length=11, length_penalty=1.0, early_stopping=True,
            eos_token_id=cfg.eos_token_id,
            decoder_start_token_id=cfg.decoder_start_token_id,
            forced_bos_token_id=cfg.forced_bos_token_id,
            forced_eos_token_id=cfg.forced_eos_token_id))
        # HF output: [decoder_start, forced_bos, ..., eos]
        expected_core = expected_ids[1:]
        if expected_core and expected_core[-1] == cfg.eos_token_id:
            expected_core = expected_core[:-1]
        assert hyp.tokens == expected_core


class TestFusedBeamEquivalence:
    @pytest.mark.parametrize("seed", [3, 4, 8, 15])
    def test_fused_matches_host_beam(self, tmp_path, seed):
        d = tmp_path / f"m{seed}"
        d.mkdir()
        model, cfg, params = bart_checkpoint(d, seed=seed, with_tokenizer=True)
        lm = Seq2SeqLM(d)
        enc_ids = np.array([[0, 5, 9, 13, 2]], dtype=np.int32)
        enc_mask = np.ones_like(enc_ids)

        from kjarni_tpu.generate.beam import BeamSearchConfig, beam_search
        import jax.numpy as jnp

        bs = BeamSearchConfig(
            num_beams=3, max_length=12, min_length=2, length_penalty=2.0,
            early_stopping=True, no_repeat_ngram_size=3,
            eos_token_id=cfg.eos_token_id,
            decoder_start_token_id=cfg.decoder_start_token_id,
            forced_bos_token_id=cfg.forced_bos_token_id,
            forced_eos_token_id=cfg.forced_eos_token_id)

        # host path
        _, ck, cv = lm._encode_and_cross(lm.params, jnp.asarray(enc_ids),
                                         jnp.asarray(enc_mask))
        k = bs.num_beams
        ck = jnp.repeat(ck, k, axis=1)
        cv = jnp.repeat(cv, k, axis=1)
        bm = jnp.repeat(jnp.asarray(enc_mask), k, axis=0)
        import kjarni_tpu.models.bart as kbart2
        sk, sv = kbart2.init_self_cache(cfg, k, 16)
        state = {"sk": sk, "sv": sv}

        def step_fn(tokens, pos, parents):
            logits, state["sk"], state["sv"] = lm._step(
                lm.params, jnp.asarray(tokens[:, None]), state["sk"],
                state["sv"], ck, cv, bm, jnp.int32(pos), jnp.asarray(parents))
            return logits

        host_hyp = beam_search(step_fn, bs)

        fused = lm._generate_fused(bs, jnp.asarray(enc_ids),
                                   jnp.asarray(enc_mask))
        assert fused == host_hyp.tokens, (seed, fused, host_hyp.tokens)
