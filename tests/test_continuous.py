"""Token-level continuous batching (generate/continuous.py): mid-flight
joins, slot reuse, correctness vs unbatched greedy generation."""

import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.generate.sampling import GenerationConfig
from kjarni_tpu.models.decoder_lm import DecoderLM


@pytest.fixture(scope="module")
def lm_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("cont_lm")
    vocab_map = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vocab_map), hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(11)
    save_torch_model(d, LlamaForCausalLM(config).eval(), config)
    return d


@pytest.fixture(scope="module")
def lm(lm_dir):
    return DecoderLM(lm_dir, max_context=96)


PROMPTS = ["hello world", "the doctor went to", "data is safe with",
           "mondays are great for", "keeping the physician"]


def reference_tokens(lm, prompt, max_new):
    cfg = GenerationConfig.greedy(max_new_tokens=max_new, max_length=96)
    return [st.id for st in lm.generate_stream(prompt, config=cfg)]


class TestContinuousEngine:
    def test_batch_matches_unbatched_greedy(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=4)
        rids = {eng.submit(p, max_new_tokens=8): p for p in PROMPTS[:4]}
        done = eng.run()
        assert len(done) == 4
        for fr in done:
            expected = reference_tokens(lm, rids[fr.request_id], 8)
            assert fr.token_ids == expected, rids[fr.request_id]

    def test_midflight_join_identical_tokens(self, lm):
        """A request joining a RUNNING decode gets the same tokens as alone."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=4)
        eng.submit(PROMPTS[0], max_new_tokens=12)
        eng.submit(PROMPTS[1], max_new_tokens=12)
        for _ in range(5):          # decode is mid-flight...
            eng.step()
        late = eng.submit(PROMPTS[2], max_new_tokens=8)   # ...now join
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[late].token_ids == reference_tokens(lm, PROMPTS[2], 8)

    def test_more_requests_than_slots(self, lm):
        """Freed slots admit waiting requests; slot-cache reuse is clean."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        rids = {eng.submit(p, max_new_tokens=6): p for p in PROMPTS}
        assert eng.num_waiting == 3   # only 2 slots
        done = eng.run()
        assert len(done) == 5
        for fr in done:
            assert fr.token_ids == reference_tokens(lm, rids[fr.request_id], 6)

    def test_finish_reasons(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        eng.submit(PROMPTS[0], max_new_tokens=4)
        done = eng.run()
        assert done[0].finish_reason in ("eos", "length")
        assert done[0].text == lm.tokenizer.decode(done[0].token_ids)

    def test_oversized_prompt_rejected(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.core.errors import GenerationError
        eng = ContinuousEngine(lm, slots=2)
        with pytest.raises(GenerationError, match="exceeds slot capacity"):
            eng.submit("hello " * 200, max_new_tokens=64)


class TestContinuousSampling:
    def test_mixed_greedy_and_sampled_slots(self, lm):
        """Greedy slots keep exact greedy output while sharing the batch with
        sampled slots; sampled output is valid and reproducible by seed."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.generate.sampling import SamplingParams
        sp = SamplingParams(temperature=0.9, top_k=20, top_p=0.95, min_p=0.0)

        def run():
            eng = ContinuousEngine(lm, slots=3)
            g = eng.submit(PROMPTS[0], max_new_tokens=8)          # greedy
            s1 = eng.submit(PROMPTS[1], max_new_tokens=8,
                            sampling=sp, seed=42)
            s2 = eng.submit(PROMPTS[2], max_new_tokens=8,
                            sampling=sp, seed=43)
            return {fr.request_id: fr.token_ids for fr in eng.run()}, (g, s1, s2)

        out_a, (g, s1, s2) = run()
        out_b, _ = run()
        assert out_a[g] == reference_tokens(lm, PROMPTS[0], 8)
        assert out_a[s1] == out_b[s1]        # same seed → same tokens
        assert out_a[s2] == out_b[s2]
        assert out_a[s1] != out_a[s2]        # different seeds diverge
        vocab = lm.config.vocab_size
        assert all(0 <= t < vocab for t in out_a[s1])

    def test_top_k_one_equals_greedy(self, lm):
        """top_k=1 sampling must collapse to greedy regardless of temperature."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.generate.sampling import SamplingParams
        eng = ContinuousEngine(lm, slots=2)
        rid = eng.submit(PROMPTS[3], max_new_tokens=8,
                         sampling=SamplingParams(temperature=1.3, top_k=1,
                                                 top_p=1.0, min_p=0.0))
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == reference_tokens(lm, PROMPTS[3], 8)


class TestContinuousPenalties:
    def test_repetition_penalty_matches_unbatched(self, lm):
        """Per-slot penalty compounding must equal DecoderLM's greedy path."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=96,
                                      repetition_penalty=1.4)
        expected = [st.id for st in lm.generate_stream(PROMPTS[0], config=cfg)]
        plain = reference_tokens(lm, PROMPTS[0], 10)
        eng = ContinuousEngine(lm, slots=2)
        rid = eng.submit(PROMPTS[0], max_new_tokens=10,
                         repetition_penalty=1.4)
        base = eng.submit(PROMPTS[1], max_new_tokens=10)  # shares the batch
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == expected
        if expected != plain:   # penalty actually changed something
            assert done[rid].token_ids != plain
        assert done[base].token_ids == reference_tokens(lm, PROMPTS[1], 10)

    def test_no_repeat_ngram_matches_unbatched(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        cfg = GenerationConfig.greedy(max_new_tokens=10, max_length=96,
                                      no_repeat_ngram_size=2)
        expected = [st.id for st in lm.generate_stream(PROMPTS[4], config=cfg)]
        eng = ContinuousEngine(lm, slots=2, no_repeat_ngram_size=2)
        rid = eng.submit(PROMPTS[4], max_new_tokens=10, no_repeat_ngram=True)
        off = eng.submit(PROMPTS[0], max_new_tokens=8)   # ngram off this slot
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == expected
        assert done[off].token_ids == reference_tokens(lm, PROMPTS[0], 8)

    def test_ngram_requires_engine_setting(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.core.errors import GenerationError
        eng = ContinuousEngine(lm, slots=2)
        with pytest.raises(GenerationError, match="no_repeat_ngram_size"):
            eng.submit("hello", no_repeat_ngram=True)


class TestContinuousGpt2:
    def test_gpt2_family_greedy_matches(self, tmp_path):
        from transformers import GPT2Config, GPT2LMHeadModel
        from kjarni_tpu.generate.continuous import ContinuousEngine
        d = tmp_path / "gpt2"
        d.mkdir()
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = GPT2Config(vocab_size=len(vm), n_embd=32, n_layer=2,
                            n_head=2, n_positions=64, bos_token_id=2,
                            eos_token_id=3)
        torch.manual_seed(13)
        save_torch_model(d, GPT2LMHeadModel(config).eval(), config)
        g = DecoderLM(d, max_context=64)
        eng = ContinuousEngine(g, slots=2)
        r1 = eng.submit("hello world", max_new_tokens=8)
        r2 = eng.submit("the doctor went", max_new_tokens=8)
        done = {fr.request_id: fr for fr in eng.run()}
        for rid, prompt in ((r1, "hello world"), (r2, "the doctor went")):
            cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
            expected = [st.id for st in g.generate_stream(prompt, config=cfg)]
            assert done[rid].token_ids == expected


class TestFusedWindow:
    """steps_per_sync>1 fuses k decode steps per dispatch (VERDICT r2 item 2):
    results must be invariant to the window size."""

    def test_window_size_invariance(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.generate.sampling import SamplingParams
        sp = SamplingParams(temperature=0.8, top_k=10, top_p=0.95, min_p=0.0)

        def run(k):
            eng = ContinuousEngine(lm, slots=3, steps_per_sync=k)
            rids = [eng.submit(PROMPTS[0], max_new_tokens=9),
                    eng.submit(PROMPTS[1], max_new_tokens=13,
                               sampling=sp, seed=7),
                    eng.submit(PROMPTS[2], max_new_tokens=5)]
            done = {fr.request_id: fr.token_ids for fr in eng.run()}
            return [done[r] for r in rids]

        assert run(1) == run(8) == run(3)

    def test_greedy_matches_unbatched_with_window(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2, steps_per_sync=4)
        rid = eng.submit(PROMPTS[3], max_new_tokens=10)
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == reference_tokens(lm, PROMPTS[3], 10)

    def test_capacity_reserves_window_overshoot(self, lm):
        from kjarni_tpu.core.errors import GenerationError
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=1, max_context=32, steps_per_sync=8)
        # 3-token prompt (bos+2) + 2 windows of 8 = 19 <= 32 fits
        eng.submit("hello world", max_new_tokens=17)
        # max_new=26 passes the naive check (3+26=29 <= 32) but needs
        # ceil(25/8)=4 full windows -> 3+32=35 > 32: must be rejected
        with pytest.raises(GenerationError, match="exceeds slot capacity"):
            eng.submit("hello world", max_new_tokens=26)
        eng.run()

    def test_join_at_window_boundary(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2, steps_per_sync=4)
        eng.submit(PROMPTS[0], max_new_tokens=16)
        eng.step()                                   # window 1 in flight
        late = eng.submit(PROMPTS[1], max_new_tokens=8)   # joins next window
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[late].token_ids == reference_tokens(lm, PROMPTS[1], 8)


class TestWorkingCacheBuckets:
    """The window step decodes on a bucket slice of the slot caches and
    writes it back (fill-proportional serving decode). Shrinking the bucket
    step forces several slice sizes and write-backs on a tiny model; output
    must equal the unbucketed engine's."""

    def test_bucketed_windows_match_unbucketed(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine

        def run(bucket_step):
            eng = ContinuousEngine(lm, slots=3, steps_per_sync=4)
            eng._kv_bucket_step = bucket_step
            rids = [eng.submit(p, max_new_tokens=14) for p in PROMPTS[:3]]
            done = {fr.request_id: fr.token_ids for fr in eng.run()}
            return [done[r] for r in rids]

        # 4096 >> max_context: every window uses the full cache (kb=None);
        # 8 crosses several buckets mid-generation; both must agree
        assert run(4096) == run(8)

    def test_bucketed_slot_reuse_clean(self, lm):
        """A freed slot re-admitted under small buckets decodes correctly:
        admission rewrites the slot's cache from position 0 through the
        full-cache path, clearing any clamped writes from dead lanes."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2, steps_per_sync=4)
        eng._kv_bucket_step = 8
        rids = {eng.submit(p, max_new_tokens=6): p for p in PROMPTS}
        done = {fr.request_id: fr for fr in eng.run()}
        for rid, prompt in rids.items():
            assert done[rid].token_ids == reference_tokens(lm, prompt, 6), \
                prompt


class TestPrefixCache:
    """register_prefix: shared-prefix prompt caching across slots — the
    prefix KV is computed once and copied into joining slots; admission
    prefills only the suffix. Outputs must equal the no-prefix engine."""

    PREFIX = "hello world the"

    def test_prefix_hit_matches_plain(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        full_prompts = [self.PREFIX + " doctor went", self.PREFIX + " data"]
        plain = ContinuousEngine(lm, slots=2)
        rids_p = {plain.submit(p, max_new_tokens=8): p for p in full_prompts}
        expect = {rids_p[r]: fr.token_ids
                  for r, fr in ((fr.request_id, fr) for fr in plain.run())}

        eng = ContinuousEngine(lm, slots=2)
        n = eng.register_prefix(self.PREFIX)
        assert n > 0
        rids = {eng.submit(p, max_new_tokens=8): p for p in full_prompts}
        done = {fr.request_id: fr for fr in eng.run()}
        for rid, prompt in rids.items():
            assert done[rid].token_ids == expect[prompt], prompt

    def test_mixed_hit_and_miss_wave(self, lm):
        """One admission wave containing both prefix-hits and misses splits
        into two dispatch groups; all outputs stay exact."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=4)
        eng.register_prefix(self.PREFIX)
        prompts = [self.PREFIX + " doctor went", "mondays are great for",
                   self.PREFIX + " physician", "data is safe with"]
        rids = {eng.submit(p, max_new_tokens=6, defer_admit=True): p
                for p in prompts}
        done = {fr.request_id: fr for fr in eng.run()}
        for rid, prompt in rids.items():
            assert done[rid].token_ids == reference_tokens(lm, prompt, 6), \
                prompt

    def test_exact_prefix_prompt_is_a_miss(self, lm):
        """A prompt EQUAL to the prefix needs its last token's logits, which
        the cached KV alone cannot give — it must take the plain path."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        eng.register_prefix(self.PREFIX)
        rid = eng.submit(self.PREFIX, max_new_tokens=6)
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == reference_tokens(lm, self.PREFIX, 6)

    def test_prefix_with_sampling_seed(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.generate.sampling import SamplingParams
        sp = SamplingParams(temperature=0.9, top_k=20, top_p=0.95, min_p=0.0)
        prompt = self.PREFIX + " doctor went"

        def run(with_prefix):
            eng = ContinuousEngine(lm, slots=2)
            if with_prefix:
                eng.register_prefix(self.PREFIX)
            rid = eng.submit(prompt, max_new_tokens=8, sampling=sp, seed=5)
            return {fr.request_id: fr for fr in eng.run()}[rid].token_ids

        assert run(True) == run(False)


class TestEngineStats:
    def test_counters(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        eng.register_prefix("hello world")
        eng.submit("hello world the doctor", max_new_tokens=6)
        eng.submit("data is safe with", max_new_tokens=6)
        eng.run()
        s = eng.stats
        assert s["submitted"] == 2 and s["finished"] == 2
        assert s["prefix_hits"] == 1
        assert s["windows"] >= 1 and s["admission_waves"] >= 2
        assert s["tokens"] <= 12

    def test_prefix_suffix_bucket_capped_at_capacity(self, lm):
        """Regression: a suffix whose padded bucket would overrun the slot
        capacity at pos_start=m must be capped (uncapped, _cache_write's
        dynamic_update_slice clamps the start index and lands the suffix KV
        at shifted positions — silently wrong output)."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        prefix = "hello world the doctor went to keeping the physician"
        long_suffix = " " + " ".join(["data is safe with mondays"] * 13)
        prompt = prefix + long_suffix
        eng = ContinuousEngine(lm, slots=1, max_context=96, steps_per_sync=4)
        n = eng.register_prefix(prefix)
        ids = lm.encode_prompt(prompt, add_bos=True)
        # the scenario only bites if the suffix's uncapped bucket overruns
        sfx = len(ids) - n
        from kjarni_tpu.core.bucketing import seq_bucket
        assert n + seq_bucket(sfx) > 96, "fixture no longer hits the corner"
        rid = eng.submit(prompt, max_new_tokens=4)
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == reference_tokens(lm, prompt, 4)


class TestAutoPrefix:
    """auto_prefix_min: the engine LEARNS a shared prompt prefix from
    traffic — two prompts sharing enough leading tokens trigger a one-time
    registration; later matching requests admit suffix-only."""

    BASE = " ".join(["hello world the doctor went"] * 7)   # ~36 tokens

    def test_auto_detection_and_equality(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        p1 = self.BASE + " data is safe"
        p2 = self.BASE + " mondays are great"
        p3 = self.BASE + " keeping the physician"
        eng = ContinuousEngine(lm, slots=2, auto_prefix_min=16)
        assert not eng._prefix_ids
        r1 = eng.submit(p1, max_new_tokens=5)
        assert not eng._prefix_ids          # first prompt = candidate only
        r2 = eng.submit(p2, max_new_tokens=5)
        assert eng._prefix_ids              # learned from the common prefix
        r3 = eng.submit(p3, max_new_tokens=5)
        done = {fr.request_id: fr for fr in eng.run()}
        for rid, p in ((r1, p1), (r2, p2), (r3, p3)):
            assert done[rid].token_ids == reference_tokens(lm, p, 5), p
        assert eng.stats["prefix_hits"] >= 1

    def test_no_detection_below_threshold(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2, auto_prefix_min=16)
        eng.submit("hello world the", max_new_tokens=4)
        eng.submit("hello world the doctor", max_new_tokens=4)
        assert not eng._prefix_ids          # common prefix is too short
        eng.run()

    def test_auto_disabled(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        p1 = self.BASE + " data"
        p2 = self.BASE + " mondays"
        eng = ContinuousEngine(lm, slots=2, auto_prefix_min=0)
        eng.submit(p1, max_new_tokens=4)
        eng.submit(p2, max_new_tokens=4)
        assert not eng._prefix_ids
        eng.run()


class TestChunkedAdmission:
    """Long-prompt admission must not materialize one [n, H, S, T] f32 score
    block (VERDICT r3 item 4): above the engine's score-byte gate the wave
    prefills the suffix in bounded chunks on a [0, kb) working slice of the
    slot caches. Forcing a tiny gate on a tiny model exercises the chunked
    variant; output must equal the default single-pass admission."""

    @pytest.fixture(scope="class")
    def big_lm(self, tmp_path_factory):
        """1024-context model: prompt buckets >= 256 are 128-divisible, so
        a forced score gate can actually pick the chunked plan (the module
        fixture's 96-token context never chunks at 128 granularity)."""
        from transformers import LlamaConfig, LlamaForCausalLM
        d = tmp_path_factory.mktemp("chunk_lm")
        vocab_map = build_word_tokenizer(d / "tokenizer.json",
                                         bert_style=False)
        config = LlamaConfig(vocab_size=len(vocab_map), hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             max_position_embeddings=1024, bos_token_id=2,
                             eos_token_id=3, tie_word_embeddings=False)
        torch.manual_seed(11)
        save_torch_model(d, LlamaForCausalLM(config).eval(), config)
        return DecoderLM(d, max_context=1024)

    LONG_IDS = [[2] + [5 + (i * 7 + s) % 20 for i in range(n)]
                for s, n in ((0, 200), (3, 170), (9, 240))]

    def test_chunked_matches_plain_admission(self, big_lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        plain = ContinuousEngine(big_lm, slots=4)
        forced = ContinuousEngine(big_lm, slots=4)
        forced._admit_score_limit = 1          # every 256-bucket wave chunks
        out_p = {}
        out_f = {}
        for eng, out in ((plain, out_p), (forced, out_f)):
            rids = {eng.submit(token_ids=ids, max_new_tokens=8): i
                    for i, ids in enumerate(self.LONG_IDS)}
            for fr in eng.run():
                out[rids[fr.request_id]] = fr.token_ids
        assert any(pl["mode"] == "chunked"
                   for pl in forced._admit_plans.values()), \
            forced._admit_plans
        assert all(pl["mode"] == "plain"
                   for pl in plain._admit_plans.values())
        assert out_f == out_p

    def test_chunked_midflight_join(self, big_lm):
        """A chunked admission joining a RUNNING decode still lands the
        same tokens (cache write-back interleaves with live slots)."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(big_lm, slots=4)
        eng._admit_score_limit = 1
        eng.submit(token_ids=self.LONG_IDS[0], max_new_tokens=12)
        for _ in range(3):
            eng.step()
        late = eng.submit(token_ids=self.LONG_IDS[2], max_new_tokens=8)
        done = {fr.request_id: fr for fr in eng.run()}
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=1024)
        expected = [st.id for st in big_lm.generate_stream(
            token_ids=self.LONG_IDS[2], config=cfg)]
        assert done[late].token_ids == expected

    def test_4k_prompt_16k_context_8_slots(self, tmp_path):
        """The headline scenario: a ~4k-token prompt admitted into an 8-slot
        engine at a 16k context. The default 2 GB gate picks the chunked
        plan on CPU (no flash): score blocks stay bounded at
        [8, H, chunk, kb] instead of [8, H, 4096, 16384]; tokens equal the
        single-stream path."""
        from transformers import LlamaConfig, LlamaForCausalLM
        d = tmp_path / "m"
        d.mkdir()
        vocab_map = build_word_tokenizer(d / "tokenizer.json",
                                         bert_style=False)
        config = LlamaConfig(vocab_size=len(vocab_map), hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             max_position_embeddings=16384, bos_token_id=2,
                             eos_token_id=3, tie_word_embeddings=False)
        torch.manual_seed(11)
        save_torch_model(d, LlamaForCausalLM(config).eval(), config)
        big = DecoderLM(d, max_context=16384)
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(big, slots=8)
        # real gate, no override: 4*4*4096*4352*8 lanes = 2.28 GB > 2 GB
        ids = [2] + [5 + (i * 7) % 20 for i in range(4000)]
        rid = eng.submit(token_ids=ids, max_new_tokens=4)
        done = {fr.request_id: fr for fr in eng.run()}
        (plan,) = eng._admit_plans.values()
        assert plan["mode"] == "chunked", plan
        assert plan["kb"] < 16384, plan                 # working slice, not T
        assert plan["chunk"] * plan["kb"] * 4 * 4 * 8 <= \
            eng._admit_score_limit, plan
        cfg = GenerationConfig.greedy(max_new_tokens=4, max_length=16384)
        expected = [st.id for st in big.generate_stream(token_ids=ids,
                                                        config=cfg)]
        assert done[rid].token_ids == expected


class TestContinuousInt8Kv:
    """kv_cache="int8" reaches the continuous engine (the round-4 decision
    rule: int8 KV for batched long-context decode — 1.44x at B=8/high fill).
    The engine must allocate quantized stacked slot caches and keep greedy
    output equal to the single-stream int8 path, which quantizes K/V the
    same way (per-(head, position) scales, llama.py _cache_write)."""

    @pytest.fixture(scope="class")
    def qlm(self, lm_dir):
        return DecoderLM(lm_dir, max_context=96, kv_cache="int8")

    def int8_reference(self, qlm, prompt, max_new):
        cfg = GenerationConfig.greedy(max_new_tokens=max_new, max_length=96)
        return [st.id for st in qlm.generate_stream(prompt, config=cfg)]

    def test_engine_allocates_int8_caches(self, qlm):
        import jax.numpy as jnp
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(qlm, slots=2)
        assert isinstance(eng.cache_k, dict)
        assert eng.cache_k["q"].dtype == jnp.int8
        assert eng.cache_k["s"].dtype == jnp.float32
        # [S, L, 1, Hkv, T] scales: position axis shared with the q leaf
        assert eng.cache_k["s"].shape == eng.cache_k["q"].shape[:-1]

    def test_int8_batch_matches_int8_single_stream(self, qlm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(qlm, slots=4)
        rids = {eng.submit(p, max_new_tokens=8): p for p in PROMPTS[:4]}
        done = eng.run()
        assert len(done) == 4
        for fr in done:
            assert fr.token_ids == self.int8_reference(
                qlm, rids[fr.request_id], 8), rids[fr.request_id]

    def test_int8_midflight_join_and_slot_reuse(self, qlm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(qlm, slots=2)
        rids = {eng.submit(p, max_new_tokens=6): p for p in PROMPTS}
        done = eng.run()
        assert len(done) == 5
        for fr in done:
            assert fr.token_ids == self.int8_reference(
                qlm, rids[fr.request_id], 6), rids[fr.request_id]

    def test_int8_working_bucket_windows(self, qlm):
        """Fill-proportional window decode slices BOTH leaves of the
        quantized cache at the same position axis; output is bucket-step
        invariant."""
        from kjarni_tpu.generate.continuous import ContinuousEngine

        def run(bucket_step):
            eng = ContinuousEngine(qlm, slots=3, steps_per_sync=4)
            eng._kv_bucket_step = bucket_step
            rids = [eng.submit(p, max_new_tokens=12) for p in PROMPTS[:3]]
            done = {fr.request_id: fr.token_ids for fr in eng.run()}
            return [done[r] for r in rids]

        assert run(4096) == run(8)

    def test_int8_prefix_cache_hit(self, qlm):
        """register_prefix under int8: the cached prefix KV is already
        quantized; broadcast-copy into joining slots preserves equality."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        prefix = "hello world the"
        prompts = [prefix + " doctor went", prefix + " data"]
        eng = ContinuousEngine(qlm, slots=2)
        assert eng.register_prefix(prefix) > 0
        rids = {eng.submit(p, max_new_tokens=8): p for p in prompts}
        done = {fr.request_id: fr for fr in eng.run()}
        assert eng.stats["prefix_hits"] == 2
        for rid, prompt in rids.items():
            assert done[rid].token_ids == self.int8_reference(
                qlm, prompt, 8), prompt

    def test_int8_sampled_slots_reproducible(self, qlm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        from kjarni_tpu.generate.sampling import SamplingParams
        sp = SamplingParams(temperature=0.9, top_k=20, top_p=0.95, min_p=0.0)

        def run():
            eng = ContinuousEngine(qlm, slots=2)
            rid = eng.submit(PROMPTS[1], max_new_tokens=8, sampling=sp,
                             seed=42)
            return {fr.request_id: fr for fr in eng.run()}[rid].token_ids

        assert run() == run()

    def test_non_llama_int8_rejected(self, tmp_path):
        """ADVICE r4: kv_cache="int8" on a family without a quantized cache
        must fail loudly, not silently run bf16."""
        from transformers import GPT2Config, GPT2LMHeadModel
        from kjarni_tpu.core.errors import InvalidConfigError
        d = tmp_path / "gpt2"
        d.mkdir()
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = GPT2Config(vocab_size=len(vm), n_embd=32, n_layer=2,
                            n_head=2, n_positions=64, bos_token_id=2,
                            eos_token_id=3)
        torch.manual_seed(13)
        save_torch_model(d, GPT2LMHeadModel(config).eval(), config)
        with pytest.raises(InvalidConfigError, match="llama-family"):
            DecoderLM(d, max_context=64, kv_cache="int8")


class TestMultiPrefixCache:
    """The prefix table (VERDICT r4 item 5): several registered prefixes —
    e.g. one per tenant's system prompt — all hit, waves group by matched
    prefix, and the admission jit-variant space stays bounded by
    (suffix bucket, prefix length)."""

    P1 = "hello world the"
    P2 = "data is safe with"

    def test_two_prefixes_both_hit(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=4)
        assert eng.register_prefix(self.P1) > 0
        assert eng.register_prefix(self.P2) > 0
        prompts = [self.P1 + " doctor went", self.P2 + " mondays",
                   self.P1 + " physician", self.P2 + " doctor"]
        rids = {eng.submit(p, max_new_tokens=6, defer_admit=True): p
                for p in prompts}
        done = {fr.request_id: fr for fr in eng.run()}
        assert eng.stats["prefix_hits"] == 4     # every request hit ITS prefix
        for rid, prompt in rids.items():
            assert done[rid].token_ids == reference_tokens(lm, prompt, 6), \
                prompt

    def test_equal_length_prefixes_share_jit_variant(self, lm):
        """Two prefixes of the same token length share one compiled
        admission variant: the prefix KV is a traced argument."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        n1 = eng.register_prefix(self.P1)
        n2 = eng.register_prefix("data is safe")
        assert n1 == n2, "fixture drifted: prefixes no longer equal length"
        eng.submit(self.P1 + " doctor went", max_new_tokens=4)
        eng.submit("data is safe mondays are", max_new_tokens=4)
        eng.run()
        hit_variants = [k for k in eng._prefill_cache if k[1] > 0]
        assert len(hit_variants) == 1, hit_variants

    def test_longest_matching_prefix_wins(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        short = eng.register_prefix("hello world")
        long = eng.register_prefix("hello world the doctor went")
        assert long > short
        ids = lm.encode_prompt("hello world the doctor went to", add_bos=True)
        pi, m = eng._match_prefix(ids)
        assert m == long
        rid = eng.submit("hello world the doctor went to", max_new_tokens=6)
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].token_ids == reference_tokens(
            lm, "hello world the doctor went to", 6)

    def test_duplicate_registration_is_idempotent(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2)
        eng.register_prefix(self.P1)
        eng.register_prefix(self.P1)
        assert len(eng._prefixes) == 1

    def test_table_cap_rejects_explicit_overflow(self, lm):
        from kjarni_tpu.core.errors import GenerationError
        from kjarni_tpu.generate.continuous import ContinuousEngine
        eng = ContinuousEngine(lm, slots=2, max_prefixes=1)
        eng.register_prefix(self.P1)
        with pytest.raises(GenerationError, match="prefix table is full"):
            eng.register_prefix(self.P2)

    def test_auto_learns_second_prefix(self, lm):
        """Auto-detection keeps learning after the first registration:
        a second family of prompts converges on its own table entry."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        base_a = " ".join(["hello world the doctor went"] * 7)
        base_b = " ".join(["data is safe with mondays"] * 7)
        eng = ContinuousEngine(lm, slots=2, auto_prefix_min=16)
        pa = [base_a + " data", base_a + " mondays"]
        pb = [base_b + " hello", base_b + " doctor"]
        rids = {}
        for p in (pa[0], pa[1], pb[0], pb[1]):
            rids[eng.submit(p, max_new_tokens=4)] = p
        assert len(eng._prefixes) == 2
        done = {fr.request_id: fr for fr in eng.run()}
        for rid, p in rids.items():
            assert done[rid].token_ids == reference_tokens(lm, p, 4), p

    def test_auto_stops_at_cap(self, lm):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        base_a = " ".join(["hello world the doctor went"] * 7)
        base_b = " ".join(["data is safe with mondays"] * 7)
        eng = ContinuousEngine(lm, slots=2, auto_prefix_min=16,
                               max_prefixes=1)
        for p in (base_a + " data", base_a + " mondays",
                  base_b + " hello", base_b + " doctor"):
            eng.submit(p, max_new_tokens=3)
        assert len(eng._prefixes) == 1      # capped: family B not learned
        eng.run()
