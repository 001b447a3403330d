"""Speculative decoding: greedy spec output must equal vanilla target greedy."""

import json

import numpy as np
import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.generate.sampling import GenerationConfig
from kjarni_tpu.generate.speculative import SpeculativeGenerator
from kjarni_tpu.models.decoder_lm import DecoderLM


def make_llama_dir(d, seed, layers=2, hidden=64):
    from transformers import LlamaConfig, LlamaForCausalLM
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=hidden,
                         intermediate_size=hidden * 2, num_hidden_layers=layers,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(seed)
    model = LlamaForCausalLM(config).eval()
    save_torch_model(d, model, config)
    return d


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    target_dir = make_llama_dir(tmp_path_factory.mktemp("spec_target"), seed=31,
                                layers=3)
    draft_dir = make_llama_dir(tmp_path_factory.mktemp("spec_draft"), seed=32,
                               layers=1, hidden=32)
    target = DecoderLM(target_dir, max_context=64)
    draft = DecoderLM(draft_dir, max_context=64)
    return target, draft


class TestSpeculative:
    def test_greedy_matches_vanilla(self, models):
        target, draft = models
        cfg = GenerationConfig.greedy(max_new_tokens=12, max_length=64)
        vanilla = [st.id for st in target.generate_stream("hello world the",
                                                          config=cfg)]
        spec = SpeculativeGenerator(target, draft, num_tokens=4)
        got = [st.id for st in spec.generate_stream("hello world the",
                                                    config=cfg)]
        assert got == vanilla

    def test_self_draft_accepts_everything(self, models):
        # draft == target: every proposal accepted; output still exact
        target, _ = models
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=64)
        vanilla = [st.id for st in target.generate_stream("doctor physician",
                                                          config=cfg)]
        spec = SpeculativeGenerator(target, target, num_tokens=3)
        got = [st.id for st in spec.generate_stream("doctor physician",
                                                    config=cfg)]
        assert got == vanilla

    def test_max_new_tokens_respected(self, models):
        target, draft = models
        spec = SpeculativeGenerator(target, draft, num_tokens=4)
        got = list(spec.generate_stream(
            "hello", config=GenerationConfig.greedy(max_new_tokens=5,
                                                    max_length=64)))
        assert len(got) <= 5

    def test_probabilistic_runs(self, models):
        target, draft = models
        spec = SpeculativeGenerator(target, draft, num_tokens=3,
                                    probabilistic=True)
        got = list(spec.generate_stream(
            "hello world",
            config=GenerationConfig(max_new_tokens=8, max_length=64, seed=7)))
        assert all(0 <= st.id < target.config.vocab_size for st in got)

    def test_vocab_mismatch_rejected(self, models, tmp_path):
        target, _ = models
        from kjarni_tpu.core.errors import GenerationError
        from transformers import LlamaConfig, LlamaForCausalLM
        config = LlamaConfig(vocab_size=10, hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64)
        torch.manual_seed(1)
        save_torch_model(tmp_path, LlamaForCausalLM(config).eval(), config)
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        # vocab differs (10 vs word-tokenizer size) -> must raise
        other = DecoderLM.__new__(DecoderLM)
        with pytest.raises(GenerationError):
            bad = DecoderLM(tmp_path, max_context=64)
            SpeculativeGenerator(target, bad)


class TestProductWiring:
    """Draft model reachable from Generator/Chat/CLI (VERDICT: the reference
    loads the draft inside the generator, decoder/generator.rs:56)."""

    @pytest.fixture(scope="class")
    def dirs(self, tmp_path_factory):
        target_dir = make_llama_dir(tmp_path_factory.mktemp("wire_target"),
                                    seed=41, layers=2)
        draft_dir = make_llama_dir(tmp_path_factory.mktemp("wire_draft"),
                                   seed=42, layers=1, hidden=32)
        return target_dir, draft_dir

    def test_generator_draft_model_greedy_identical(self, dirs):
        from kjarni_tpu.tasks.generator import Generator
        target_dir, draft_dir = dirs
        plain = Generator(str(target_dir), max_context=64)
        spec = Generator(str(target_dir), draft_model=str(draft_dir),
                         max_context=64, draft_num_tokens=3)
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=64)
        want = plain.generate("hello world the", config=cfg)
        got = spec.generate("hello world the", config=cfg)
        assert got == want
        assert spec.speculative is not None
        assert spec.speculative.last_rounds > 0
        assert 0.0 <= spec.speculative.last_acceptance_rate <= 1.0

    def test_generator_stream_uses_spec(self, dirs):
        from kjarni_tpu.tasks.generator import Generator
        target_dir, draft_dir = dirs
        spec = Generator(str(target_dir), draft_model=str(draft_dir),
                         max_context=64)
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
        toks = list(spec.generate_stream("doctor physician", config=cfg))
        assert toks
        assert spec.speculative.last_drafted > 0

    def test_generator_sampling_bypasses_spec(self, dirs):
        from kjarni_tpu.tasks.generator import Generator
        target_dir, draft_dir = dirs
        spec = Generator(str(target_dir), draft_model=str(draft_dir),
                         max_context=64)
        cfg = GenerationConfig(strategy="sample", max_new_tokens=5,
                               max_length=64, seed=3)
        out = spec.generate("hello", config=cfg)
        assert isinstance(out, str)
        # sampled path must not touch the speculative loop
        assert spec.speculative.last_rounds == 0

    def test_cli_generate_draft_model(self, dirs, capsys):
        from kjarni_tpu.cli.main import main
        target_dir, draft_dir = dirs
        rc = main(["generate", "hello world the", "--model", str(target_dir),
                   "--max-tokens", "8", "--preset", "greedy", "--format",
                   "json"])
        assert rc == 0
        want = json.loads(capsys.readouterr().out.strip())["text"]
        rc = main(["generate", "hello world the", "--model", str(target_dir),
                   "--draft-model", str(draft_dir), "--max-tokens", "8",
                   "--preset", "greedy", "--format", "json"])
        assert rc == 0
        got = json.loads(capsys.readouterr().out.strip())["text"]
        assert got == want

    def test_chat_draft_model(self, dirs):
        from kjarni_tpu.tasks.chat import Chat
        target_dir, draft_dir = dirs
        plain = Chat(str(target_dir), max_context=64, system_prompt=None)
        spec = Chat(str(target_dir), draft_model=str(draft_dir),
                    max_context=64, system_prompt=None)
        want = plain.send("hello world", preset="greedy", max_new_tokens=8,
                          max_length=64)
        got = spec.send("hello world", preset="greedy", max_new_tokens=8,
                        max_length=64)
        assert got == want
        assert spec.speculative.last_rounds >= 0


class TestFusedSpeculative:
    def test_fused_matches_streaming(self, models):
        target, draft = models
        cfg = GenerationConfig.greedy(max_new_tokens=12, max_length=64)
        spec = SpeculativeGenerator(target, draft, num_tokens=4)
        streamed = "".join(st.text for st in spec.generate_stream(
            "hello world the", config=cfg))
        fused = spec.generate("hello world the", config=cfg, fused=True)
        assert fused == streamed

    def test_fused_matches_vanilla_greedy(self, models):
        target, draft = models
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=64)
        vanilla = target.generate("doctor physician", config=cfg, fused=False)
        spec = SpeculativeGenerator(target, draft, num_tokens=3)
        assert spec.generate("doctor physician", config=cfg) == vanilla


class TestSpecKvBucketedDecode:
    """Speculative decode carries bucket-sized working slices of both caches
    (core/kvcache.py); shrinking the bucket step forces several segment /
    bucket crossings whose output must equal the full-cache run."""

    @pytest.fixture(scope="class")
    def dirs(self, tmp_path_factory):
        t = make_llama_dir(tmp_path_factory.mktemp("kvb_t"), seed=31, layers=3)
        d = make_llama_dir(tmp_path_factory.mktemp("kvb_d"), seed=32,
                           layers=1, hidden=32)
        return t, d

    def _spec(self, dirs, step=None):
        t, d = dirs
        target = DecoderLM(t, max_context=96)
        draft = DecoderLM(d, max_context=96)
        if step is not None:
            target._kv_bucket_step = step
            draft._kv_bucket_step = step
        return SpeculativeGenerator(target, draft, num_tokens=4)

    def test_fused_segments_match_full_cache(self, dirs):
        cfg = GenerationConfig.greedy(max_new_tokens=40, max_length=96)
        expected = self._spec(dirs).generate("hello world the", config=cfg)
        got = self._spec(dirs, step=16).generate("hello world the",
                                                 config=cfg)
        assert got == expected

    def test_fused_segments_match_vanilla(self, dirs):
        """Cross-check against the non-speculative decoder, which uses its
        own independent bucketing implementation."""
        t, _ = dirs
        cfg = GenerationConfig.greedy(max_new_tokens=40, max_length=96)
        vanilla = DecoderLM(t, max_context=96).generate(
            "doctor physician", config=cfg, fused=False)
        got = self._spec(dirs, step=16).generate("doctor physician",
                                                 config=cfg)
        assert got == vanilla

    def test_stream_bucketed_matches_full_cache(self, dirs):
        cfg = GenerationConfig.greedy(max_new_tokens=40, max_length=96)
        expected = [st.id for st in self._spec(dirs).generate_stream(
            "keeping the physician", config=cfg)]
        got = [st.id for st in self._spec(dirs, step=16).generate_stream(
            "keeping the physician", config=cfg)]
        assert got == expected

    def test_fused_eos_mid_segment(self, dirs):
        cfg = GenerationConfig.greedy(max_new_tokens=60, max_length=96)
        expected = self._spec(dirs).generate("data is safe with", config=cfg)
        got = self._spec(dirs, step=8).generate("data is safe with",
                                                config=cfg)
        assert got == expected
