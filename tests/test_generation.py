"""Generation-loop tests (SURVEY §4 "mock-model loop tests" tier): DecoderLM
greedy output vs HF generate, streaming, cancellation, stop tokens."""

import json

import numpy as np
import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.core.cancellation import CancellationToken
from kjarni_tpu.generate.sampling import GenerationConfig, SamplingParams
from kjarni_tpu.generate.stream import TokenType
from kjarni_tpu.models.decoder_lm import DecoderLM


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("llama_lm")
    vocab_map = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vocab_map), hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(7)
    model = LlamaForCausalLM(config).eval()
    save_torch_model(d, model, config)
    return d, model


class TestGreedyParity:
    def test_matches_hf_generate(self, llama_dir):
        d, model = llama_dir
        lm = DecoderLM(d, max_context=64)
        prompt = "hello world the doctor"
        ids = lm.encode_prompt(prompt, add_bos=True)
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([ids]), max_new_tokens=10, do_sample=False,
                eos_token_id=3, pad_token_id=0)
        expected = hf_out[0, len(ids):].tolist()

        tokens = [st.id for st in lm.generate_stream(
            prompt, config=GenerationConfig.greedy(max_new_tokens=10, max_length=64))]
        # HF stops at EOS including it; ours stops before yielding EOS
        if 3 in expected:
            expected = expected[:expected.index(3)]
        assert tokens == expected


class TestGenerationLoop:
    def test_max_new_tokens_respected(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        toks = list(lm.generate_stream(
            "hello world",
            config=GenerationConfig.greedy(max_new_tokens=5, max_length=64)))
        assert len(toks) <= 5

    def test_max_length_respected(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        prompt = "hello world the doctor"
        n_prompt = len(lm.encode_prompt(prompt))
        toks = list(lm.generate_stream(
            prompt, config=GenerationConfig.greedy(max_new_tokens=50,
                                                   max_length=n_prompt + 3)))
        assert len(toks) <= 3

    def test_cancellation(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        cancel = CancellationToken()
        out = []
        for st in lm.generate_stream(
                "hello world",
                config=GenerationConfig.greedy(max_new_tokens=20, max_length=64),
                cancellation=cancel):
            out.append(st)
            if len(out) == 2:
                cancel.cancel()
        assert len(out) == 2

    def test_emit_prompt_tokens(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        toks = list(lm.generate_stream(
            "hello world",
            config=GenerationConfig.greedy(max_new_tokens=2, max_length=64),
            emit_prompt=True))
        prompt_toks = [t for t in toks if t.token_type == TokenType.PROMPT]
        assert len(prompt_toks) == len(lm.encode_prompt("hello world"))

    def test_sampling_seed_reproducible(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        cfg = GenerationConfig(max_new_tokens=8, max_length=64, seed=123,
                               sampling=SamplingParams(temperature=1.0, top_k=10,
                                                       top_p=None, min_p=None))
        a = [st.id for st in lm.generate_stream("hello world", config=cfg)]
        b = [st.id for st in lm.generate_stream("hello world", config=cfg)]
        assert a == b

    def test_generate_returns_text(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        out = lm.generate("hello world",
                          config=GenerationConfig.greedy(max_new_tokens=4,
                                                         max_length=64))
        assert isinstance(out, str)

    def test_repetition_penalty_changes_output(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        base = [st.id for st in lm.generate_stream(
            "hello world", config=GenerationConfig.greedy(max_new_tokens=10,
                                                          max_length=64))]
        pen = [st.id for st in lm.generate_stream(
            "hello world", config=GenerationConfig.greedy(
                max_new_tokens=10, max_length=64, repetition_penalty=5.0))]
        # if greedy repeats anything, a huge penalty must alter the trajectory
        if len(set(base)) < len(base):
            assert base != pen


class TestChatTemplates:
    def test_llama_template_selected(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        from kjarni_tpu.chat_templates import Conversation
        conv = Conversation.with_system("be brief")
        conv.push_user("hi")
        prompt = lm.apply_chat_template(conv)
        assert prompt.startswith("<|begin_of_text|>")
        assert prompt.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


class TestFusedGenerate:
    def test_fused_matches_streaming_greedy(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=64)
        streamed = "".join(st.text for st in lm.generate_stream("hello world the",
                                                                config=cfg))
        fused = lm.generate("hello world the", config=cfg, fused=True)
        assert fused == streamed

    def test_fused_matches_streaming_sampled(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        cfg = GenerationConfig(max_new_tokens=8, max_length=64, seed=42,
                               sampling=SamplingParams(temperature=1.0, top_k=10,
                                                       top_p=None, min_p=None))
        streamed = "".join(st.text for st in lm.generate_stream("hello", config=cfg))
        fused = lm.generate("hello", config=cfg, fused=True)
        assert fused == streamed

    def test_fused_respects_max_new(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        out = lm.generate("hello world",
                          config=GenerationConfig.greedy(max_new_tokens=3,
                                                         max_length=64))
        n = len(lm.tokenizer.encode(out)) if out else 0
        assert n <= 4


class TestBatchGenerate:
    def test_batch_greedy_matches_individual(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        prompts = ["hello world", "the doctor and the physician went",
                   "keeping data safe"]
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
        batch = lm.generate_batch(prompts, config=cfg)
        singles = [lm.generate(p, config=cfg) for p in prompts]
        assert batch == singles

    def test_batch_empty(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        assert lm.generate_batch([]) == []

    def test_batch_single(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, max_context=64)
        cfg = GenerationConfig.greedy(max_new_tokens=5, max_length=64)
        assert lm.generate_batch(["hello"], config=cfg) == \
            [lm.generate("hello", config=cfg)]


class TestBatchKvBucketedDecode:
    """generate_batch decodes in kv-bucketed segments on a working slice of
    the cache (same fill-proportional mechanism as generate()); shrinking the
    bucket step forces several segment crossings whose output must equal the
    single-segment full-cache run."""

    PROMPTS = ["hello world", "the doctor and the physician went",
               "keeping data safe"]

    def test_batch_segments_match_full_cache_greedy(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=40, max_length=96)
        full = DecoderLM(d, max_context=96)          # step 512: unbucketed
        expected = full.generate_batch(self.PROMPTS, config=cfg)
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 16                      # buckets 16,32,48,...
        assert lm.generate_batch(self.PROMPTS, config=cfg) == expected

    def test_batch_segments_match_full_cache_sampled(self, llama_dir):
        """The rng/done/logits/history handoff across segment boundaries must
        be exact: a seeded sampled batch crossing buckets equals the
        unbucketed run with the same seed."""
        d, _ = llama_dir
        cfg = GenerationConfig(
            strategy="sample", max_new_tokens=40, max_length=96, seed=123,
            sampling=SamplingParams(temperature=0.9, top_k=20, top_p=0.95,
                                    min_p=0.0))
        full = DecoderLM(d, max_context=96)
        expected = full.generate_batch(self.PROMPTS, config=cfg)
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 16
        assert lm.generate_batch(self.PROMPTS, config=cfg) == expected

    def test_batch_eos_mid_segment(self, llama_dir):
        """Per-row stop tokens inside inner segments end rows exactly as the
        full-cache path does, including the all-done early exit."""
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=60, max_length=96)
        full = DecoderLM(d, max_context=96)
        expected = full.generate_batch(
            ["data is safe with", "hello"], config=cfg)
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 8
        assert lm.generate_batch(
            ["data is safe with", "hello"], config=cfg) == expected


class TestInt8Quantized:
    def test_int8_generation_close_to_f32(self, llama_dir):
        d, _ = llama_dir
        lm32 = DecoderLM(d, dtype="f32", max_context=64)
        lm8 = DecoderLM(d, dtype="f32", max_context=64, quantize="int8")
        import jax.numpy as jnp
        assert lm8.params["layers"]["q"]["w"].dtype == jnp.int8
        # logits stay close (weight-only int8 keeps high cosine)
        import numpy as np
        from kjarni_tpu.models import llama as kllama
        ids = jnp.asarray([[5, 9, 23, 12]])
        cfg = lm32.config
        ck, cv = kllama.init_cache(cfg, 1, 8)
        ref, _, _ = kllama.forward_all_logits(lm32.params, cfg, ids, ck, cv, 0)
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(lm8.params, cfg, ids, ck, cv, 0)
        r, g = np.asarray(ref).ravel(), np.asarray(got).ravel()
        cos = r @ g / (np.linalg.norm(r) * np.linalg.norm(g))
        assert cos > 0.999
        # generation runs end to end
        out = lm8.generate("hello world",
                           config=GenerationConfig.greedy(max_new_tokens=4,
                                                          max_length=64))
        assert isinstance(out, str)


class TestInt4Quantized:
    def test_int4_generation_close_to_f32(self, llama_dir):
        d, _ = llama_dir
        lm32 = DecoderLM(d, dtype="f32", max_context=64)
        lm4 = DecoderLM(d, dtype="f32", max_context=64, quantize="int4")
        import jax.numpy as jnp
        # packed representation: two int4 nibbles per int8 byte, K halved
        qw = lm4.params["layers"]["q"]
        assert "w" not in qw and qw["w4"].dtype == jnp.int8
        K = qw["w4"].shape[-2] * 2
        # group-wise scales: [L, K/g, N] (g = min(128, K))
        assert qw["scale"].shape[-2] == K // min(128, K)
        import numpy as np
        from kjarni_tpu.models import llama as kllama
        ids = jnp.asarray([[5, 9, 23, 12]])
        cfg = lm32.config
        ck, cv = kllama.init_cache(cfg, 1, 8)
        ref, _, _ = kllama.forward_all_logits(lm32.params, cfg, ids, ck, cv, 0)
        ck, cv = kllama.init_cache(cfg, 1, 8)
        got, _, _ = kllama.forward_all_logits(lm4.params, cfg, ids, ck, cv, 0)
        r, g = np.asarray(ref).ravel(), np.asarray(got).ravel()
        cos = r @ g / (np.linalg.norm(r) * np.linalg.norm(g))
        # tiny random weights are int4's worst case (K=64 -> a single
        # group = per-channel); real checkpoints measure higher
        assert cos > 0.98
        out = lm4.generate("hello world",
                           config=GenerationConfig.greedy(max_new_tokens=4,
                                                          max_length=64))
        assert isinstance(out, str)

    def test_int4_groupwise_beats_per_channel(self, llama_dir):
        """Group-wise scales must reconstruct weights better than a single
        per-channel scale at int4 (the reason Q4_K uses blocks)."""
        import numpy as np
        rng = np.random.default_rng(0)
        # heavy-tailed weights make per-channel int4 collapse
        w = rng.standard_normal((256, 64)).astype(np.float32)
        w[:8] *= 20.0
        from kjarni_tpu.models.llama import quantize_params_int4
        params = {"layers": {n: {"w": w[None]} for n in
                             ("q", "k", "v", "o", "gate", "up", "down")},
                  "lm_head": w}
        q4 = quantize_params_int4(params, group_size=64)
        from kjarni_tpu.models.llama import _unpack_int4
        unpacked = np.asarray(_unpack_int4(q4["layers"]["q"]["w4"][0]),
                              np.float32)
        deq = (unpacked.reshape(4, 64, 64) *
               q4["layers"]["q"]["scale"][0][:, None, :]).reshape(256, 64)
        err_group = np.abs(deq - w).mean()
        # per-channel int4 reference
        scale_pc = np.abs(w).max(axis=0) / 7.0
        q_pc = np.clip(np.round(w / scale_pc), -8, 7)
        err_pc = np.abs(q_pc * scale_pc - w).mean()
        assert err_group < err_pc * 0.5


class TestInt8KvCache:
    def test_kv_int8_greedy_matches_f32_cache(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=64)
        base = DecoderLM(d, dtype="f32", max_context=64)
        quant = DecoderLM(d, dtype="f32", max_context=64, kv_cache="int8")
        ref = [st.id for st in base.generate_stream("hello world the",
                                                    config=cfg)]
        got = [st.id for st in quant.generate_stream("hello world the",
                                                     config=cfg)]
        # int8 KV keeps the greedy path for short generations of tiny models
        assert got == ref

    def test_kv_int8_cache_structure(self, llama_dir):
        d, _ = llama_dir
        lm = DecoderLM(d, dtype="f32", max_context=64, kv_cache="int8")
        ck, cv = lm._ensure_cache()
        import jax.numpy as jnp
        assert ck["q"].dtype == jnp.int8
        assert ck["s"].ndim == 4

    def test_kv_int8_generate_batch_matches(self, llama_dir):
        # the measured payoff shape (1.44x at B=8/fill 3456 on v5e,
        # scripts/kv_int8_batch_bench.py): generate_batch must honor
        # kv_cache="int8" and keep greedy output.
        # Exact equality vs the f32 cache is argmax-margin-dependent (int8
        # KV is lossy): it holds on this seed-11 fixture because short
        # greedy generations keep comfortable logit margins (same caveat as
        # test_kv_int8_greedy_matches_f32_cache above). If an XLA/backend
        # change ever flips a token here, compare against an int8-KV
        # single-stream reference instead of loosening the assert.
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=48)
        prompts = ["hello world the", "good day", "hello"]
        base = DecoderLM(d, dtype="f32", max_context=64)
        quant = DecoderLM(d, dtype="f32", max_context=64, kv_cache="int8")
        assert (quant.generate_batch(prompts, config=cfg)
                == base.generate_batch(prompts, config=cfg))


class TestExecutionPlan:
    """Per-stage host offload (ExecutionPlan, execution/plan.rs:4).

    On the CPU test backend jax.memory.Space.Host resolves to the same
    memory, but the full offload code path (host-space placement, compute_on
    gather/matmul inside jit) compiles and runs — offloaded generation must be
    token-identical to the default plan.
    """

    def test_offload_ends_matches_default(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
        base = DecoderLM(d, max_context=64)
        expected = [st.id for st in base.generate_stream("hello world", config=cfg)]
        off = DecoderLM(d, max_context=64, execution_plan="offload_ends")
        assert off.config.embed_on_host and off.config.lm_head_on_host
        got = [st.id for st in off.generate_stream("hello world", config=cfg)]
        assert got == expected

    def test_offload_fused_loop(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
        base = DecoderLM(d, max_context=64)
        expected = base.generate("hello world", config=cfg, fused=True)
        off = DecoderLM(d, max_context=64, execution_plan="offload_embeddings")
        assert off.config.embed_on_host and not off.config.lm_head_on_host
        assert off.generate("hello world", config=cfg, fused=True) == expected

    def test_quantized_head_stays_on_device(self, llama_dir):
        d, _ = llama_dir
        off = DecoderLM(d, max_context=64, quantize="int8",
                        execution_plan="offload_head")
        assert not off.config.lm_head_on_host  # int8 dict head: no host path

    def test_unknown_preset_rejected(self, llama_dir):
        d, _ = llama_dir
        from kjarni_tpu.core.errors import InvalidConfigError
        with pytest.raises(InvalidConfigError):
            DecoderLM(d, max_context=64, execution_plan="offload_everything")


@pytest.fixture(scope="module")
def gpt2_dir(tmp_path_factory):
    from transformers import GPT2Config, GPT2LMHeadModel
    d = tmp_path_factory.mktemp("gpt2_lm")
    vocab_map = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = GPT2Config(vocab_size=len(vocab_map), n_embd=48, n_layer=2,
                        n_head=4, n_positions=128, bos_token_id=2,
                        eos_token_id=3)
    torch.manual_seed(11)
    model = GPT2LMHeadModel(config).eval()
    save_torch_model(d, model, config)
    return d, model


class TestGpt2BatchGenerate:
    """Regression: gpt2.forward must accept the positions/pad_mask kwargs
    that DecoderLM._batch_fns always passes (previously TypeError'd)."""

    def test_batch_greedy_matches_individual(self, gpt2_dir):
        d, _ = gpt2_dir
        lm = DecoderLM(d, max_context=64)
        prompts = ["hello world", "the doctor and the physician went"]
        cfg = GenerationConfig.greedy(max_new_tokens=6, max_length=64)
        batch = lm.generate_batch(prompts, config=cfg)
        singles = [lm.generate(p, config=cfg) for p in prompts]
        assert batch == singles


class TestLongPromptTruncation:
    """Prompts exceeding max_context keep the NEWEST tokens (tail), never the
    head (VERDICT r2 weak #6; reference hard-stops at generator.rs:322)."""

    def test_generate_keeps_tail(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=4, max_length=10_000)
        long_ids = ([5, 9, 23, 12, 7, 31, 18, 25] * 6)[:40]
        got = DecoderLM(d, max_context=32).generate(token_ids=long_ids,
                                                    config=cfg)
        want = DecoderLM(d, max_context=32).generate(token_ids=long_ids[-31:],
                                                     config=cfg)
        assert got == want

    def test_stream_keeps_tail(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=4, max_length=10_000)
        long_ids = ([5, 9, 23, 12, 7, 31, 18, 25] * 6)[:40]
        got = [st.id for st in DecoderLM(d, max_context=32).generate_stream(
            token_ids=long_ids, config=cfg)]
        want = [st.id for st in DecoderLM(d, max_context=32).generate_stream(
            token_ids=long_ids[-31:], config=cfg)]
        assert got == want

    def test_warning_emitted(self, llama_dir, caplog):
        import logging
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=2, max_length=10_000)
        lm = DecoderLM(d, max_context=32)
        with caplog.at_level(logging.WARNING,
                             logger="kjarni_tpu.models.decoder_lm"):
            lm.generate(token_ids=list(range(5, 45)), config=cfg)
        assert any("newest" in r.message for r in caplog.records)


class TestInt4Packing:
    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp
        import numpy as np
        from kjarni_tpu.models.llama import _unpack_int4, pack_int4
        rng = np.random.default_rng(1)
        q = rng.integers(-8, 8, (6, 10, 4)).astype(np.int8)
        packed = pack_int4(q)
        assert packed.shape == (6, 5, 4) and packed.dtype == np.int8
        np.testing.assert_array_equal(
            np.asarray(_unpack_int4(jnp.asarray(packed))), q)

    def test_int4_tp_matches_single_device(self, llama_dir):
        """Packed int4 + tensor parallelism compose (w4 shards like w)."""
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=6, max_length=64)
        ref = DecoderLM(d, dtype="f32", max_context=64,
                        quantize="int4").generate("hello world", config=cfg)
        got = DecoderLM(d, dtype="f32", max_context=64, quantize="int4",
                        tp=2).generate("hello world", config=cfg)
        assert got == ref


class TestKvBucketedDecode:
    """Fill-proportional decode attention: generate() decodes in segments
    whose attention reads only the current ceil-to-bucket cache slice, and
    generate_stream passes the same static bucket per token. Shrinking the
    bucket step forces several segment crossings on a tiny model; output
    must be identical to the single-segment full-cache path."""

    def test_fused_segments_match_full_cache_greedy(self, llama_dir):
        d, _ = llama_dir
        full = DecoderLM(d, max_context=96)           # 96 <= 512: unbucketed
        cfg = GenerationConfig.greedy(max_new_tokens=40, max_length=96)
        expected = full.generate("hello world the doctor", config=cfg)
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 16                       # buckets 16,32,48,...
        got = lm.generate("hello world the doctor", config=cfg)
        assert got == expected

    def test_fused_segments_match_full_cache_sampled(self, llama_dir):
        """The rng/logits/history handoff across segment boundaries must be
        exact: a seeded sampled run crossing buckets equals the unbucketed
        run with the same seed."""
        d, _ = llama_dir
        cfg = GenerationConfig(
            strategy="sample", max_new_tokens=40, max_length=96, seed=123,
            sampling=SamplingParams(temperature=0.9, top_k=20, top_p=0.95,
                                    min_p=0.0))
        full = DecoderLM(d, max_context=96)
        expected = full.generate("the doctor went", config=cfg)
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 16
        got = lm.generate("the doctor went", config=cfg)
        assert got == expected

    def test_stream_bucketed_matches_full_cache(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=40, max_length=96)
        full = DecoderLM(d, max_context=96)
        expected = [st.id for st in full.generate_stream(
            "keeping the physician", config=cfg)]
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 16
        got = [st.id for st in lm.generate_stream(
            "keeping the physician", config=cfg)]
        assert got == expected

    def test_eos_mid_segment(self, llama_dir):
        """A stop token inside an inner segment ends generation exactly as
        the full-cache path does (finish_reason parity via text equality)."""
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=60, max_length=96)
        full = DecoderLM(d, max_context=96)
        expected = full.generate("data is safe with", config=cfg)
        lm = DecoderLM(d, max_context=96)
        lm._kv_bucket_step = 8
        assert lm.generate("data is safe with", config=cfg) == expected


class TestKvBucketedInt8Cache:
    def test_bucketed_segments_with_int8_kv(self, llama_dir):
        """Working-cache slicing must handle the quantized DICT cache (q
        [L,B,Hkv,T,D] + per-position scales s [L,B,Hkv,T] both slice on the
        T axis and write back)."""
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=30, max_length=96)
        full = DecoderLM(d, dtype="f32", max_context=96, kv_cache="int8")
        expected = full.generate("hello world the doctor", config=cfg)
        lm = DecoderLM(d, dtype="f32", max_context=96, kv_cache="int8")
        lm._kv_bucket_step = 16
        got = lm.generate("hello world the doctor", config=cfg)
        assert got == expected


class TestBatchPrefixReuse:
    """generate_batch shared-prefix reuse (VERDICT r4 item 6): a batch whose
    rows share >= _min_reuse_prefix leading tokens prefills the prefix ONCE
    at B=1, broadcasts the KV into every row, and batch-prefills only the
    suffixes. Output must equal the reuse-disabled path."""

    SYS = " ".join(["the doctor and the physician went"] * 3)  # ~19 tokens

    def _prompts(self):
        return [self.SYS + " hello world", self.SYS + " keeping data",
                self.SYS + " mondays are great"]

    def test_prefix_reuse_matches_disabled(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=96)
        lm = DecoderLM(d, max_context=96)
        base = DecoderLM(d, max_context=96)
        base._min_reuse_prefix = 10**9            # force the plain path
        expected = base.generate_batch(self._prompts(), config=cfg)
        assert base._batch_prefix_len == 0
        got = lm.generate_batch(self._prompts(), config=cfg)
        assert lm._batch_prefix_len >= 16          # reuse actually engaged
        assert got == expected

    def test_prefix_reuse_matches_singles(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=6, max_length=96)
        lm = DecoderLM(d, max_context=96)
        got = lm.generate_batch(self._prompts(), config=cfg)
        assert lm._batch_prefix_len >= 16
        singles = [lm.generate(p, config=cfg) for p in self._prompts()]
        assert got == singles

    def test_short_common_prefix_stays_plain(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=4, max_length=64)
        lm = DecoderLM(d, max_context=64)
        lm.generate_batch(["hello world the", "hello doctor"], config=cfg)
        assert lm._batch_prefix_len == 0           # below _min_reuse_prefix

    def test_identical_prompts_keep_one_suffix_token(self, llama_dir):
        """All-identical rows: the common prefix must leave >= 1 suffix
        token per row so the batch prefill has a query to produce logits."""
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=5, max_length=96)
        lm = DecoderLM(d, max_context=96)
        prompts = [self.SYS, self.SYS]
        got = lm.generate_batch(prompts, config=cfg)
        ids = lm.encode_prompt(self.SYS, True)
        assert lm._batch_prefix_len == len(ids) - 1
        assert got == [lm.generate(self.SYS, config=cfg)] * 2

    def test_prefix_reuse_int8_kv(self, llama_dir):
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=6, max_length=96)
        lm = DecoderLM(d, dtype="f32", max_context=96, kv_cache="int8")
        base = DecoderLM(d, dtype="f32", max_context=96, kv_cache="int8")
        base._min_reuse_prefix = 10**9
        expected = base.generate_batch(self._prompts(), config=cfg)
        got = lm.generate_batch(self._prompts(), config=cfg)
        assert lm._batch_prefix_len >= 16
        assert got == expected

    def test_prefix_reuse_with_penalties(self, llama_dir):
        """History/penalty state is full-prompt-based, independent of the
        cache-slot shift the prefix introduces."""
        d, _ = llama_dir
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=96,
                                      repetition_penalty=1.3)
        lm = DecoderLM(d, max_context=96)
        base = DecoderLM(d, max_context=96)
        base._min_reuse_prefix = 10**9
        assert lm.generate_batch(self._prompts(), config=cfg) == \
            base.generate_batch(self._prompts(), config=cfg)
