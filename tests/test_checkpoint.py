"""Native Orbax checkpoint: convert -> fast load -> identical outputs."""

import numpy as np
import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.generate.sampling import GenerationConfig
from kjarni_tpu.models.decoder_lm import DecoderLM
from kjarni_tpu.weights.checkpoint import (convert_model, has_checkpoint,
                                           load_checkpoint, save_checkpoint)


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("ckpt_llama")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=64, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(41)
    save_torch_model(d, LlamaForCausalLM(config).eval(), config)
    return d


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path):
        params = {"a": np.ones((4, 4), np.float32),
                  "nested": {"b": np.arange(8, dtype=np.int32)}}
        save_checkpoint(params, tmp_path)
        assert has_checkpoint(tmp_path)
        restored = load_checkpoint(tmp_path)
        np.testing.assert_array_equal(np.asarray(restored["a"]), params["a"])
        np.testing.assert_array_equal(np.asarray(restored["nested"]["b"]),
                                      params["nested"]["b"])

    def test_convert_and_generate_identical(self, llama_dir, tmp_path):
        out = tmp_path / "converted"
        convert_model(llama_dir, out, dtype="f32", max_context=64)
        assert has_checkpoint(out)
        cfg = GenerationConfig.greedy(max_new_tokens=6, max_length=64)
        orig = DecoderLM(llama_dir, dtype="f32", max_context=64)
        fast = DecoderLM(out, dtype="f32", max_context=64)
        assert fast.generate("hello world", config=cfg) == \
            orig.generate("hello world", config=cfg)


class TestQuantizedCheckpoint:
    def test_convert_int8_and_generate(self, llama_dir, tmp_path):
        import jax.numpy as jnp
        out = tmp_path / "converted_int8"
        convert_model(llama_dir, out, dtype="f32", max_context=64,
                      quantize="int8")
        lm = DecoderLM(out, dtype="f32", max_context=64)
        assert lm.params["layers"]["q"]["w"].dtype == jnp.int8
        assert isinstance(lm.params["lm_head"], dict)
        text = lm.generate("hello world",
                           config=GenerationConfig.greedy(max_new_tokens=4,
                                                          max_length=64))
        assert isinstance(text, str)
