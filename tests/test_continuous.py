"""Token-level continuous batching (generate/continuous.py): mid-flight
joins, slot reuse, correctness vs unbatched greedy generation."""

import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model

from kjarni_tpu.generate.sampling import GenerationConfig
from kjarni_tpu.models.decoder_lm import DecoderLM


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
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
    return DecoderLM(d, max_context=96)


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
