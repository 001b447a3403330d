"""Product-surface multi-chip tests: tp/dp threaded through the task APIs.

VERDICT r2 item 1: multi-chip must be reachable from DecoderLM / Generator /
Chat / Embedder / Classifier / Reranker / CLI / serve, not just the
parallel/ library. These run on the conftest-provided 8-device virtual CPU
mesh and assert sharded output ≡ single-device output.
"""

import numpy as np
import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model, tiny_bert_dir

from kjarni_tpu.generate.sampling import GenerationConfig
from kjarni_tpu.models.decoder_lm import DecoderLM


@pytest.fixture(scope="module")
def llama_tp_dir(tmp_path_factory):
    """Tiny llama whose head/kv/ffn dims divide tp=4."""
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("llama_tp")
    vocab_map = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vocab_map), hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(11)
    model = LlamaForCausalLM(config).eval()
    save_torch_model(d, model, config)
    return d


GREEDY = GenerationConfig(strategy="greedy", max_new_tokens=12)


class TestDecoderLMTensorParallel:
    def test_generate_matches_single_device(self, llama_tp_dir):
        ref = DecoderLM(llama_tp_dir, max_context=64).generate(
            "hello world", config=GREEDY)
        lm4 = DecoderLM(llama_tp_dir, max_context=64, tp=4)
        assert lm4._mesh is not None
        assert lm4._mesh.shape == {"dp": 1, "tp": 4}
        got = lm4.generate("hello world", config=GREEDY)
        assert got == ref

    def test_params_actually_sharded(self, llama_tp_dir):
        lm4 = DecoderLM(llama_tp_dir, max_context=64, tp=4)
        q = lm4.params["layers"]["q"]["w"]
        # column-parallel: out dim split over 4 devices
        shard_shapes = {s.data.shape for s in q.addressable_shards}
        assert shard_shapes == {(q.shape[0], q.shape[1], q.shape[2] // 4)}

    def test_stream_matches_single_device(self, llama_tp_dir):
        ref = [st.id for st in DecoderLM(
            llama_tp_dir, max_context=64).generate_stream(
                "the best purchase", config=GREEDY)]
        got = [st.id for st in DecoderLM(
            llama_tp_dir, max_context=64, tp=4).generate_stream(
                "the best purchase", config=GREEDY)]
        assert got == ref

    def test_generate_batch_matches(self, llama_tp_dir):
        prompts = ["hello world", "i love this product", "the best"]
        ref = DecoderLM(llama_tp_dir, max_context=64).generate_batch(
            prompts, config=GREEDY)
        got = DecoderLM(llama_tp_dir, max_context=64, tp=4).generate_batch(
            prompts, config=GREEDY)
        assert got == ref

    def test_int8_tp_matches_int8(self, llama_tp_dir):
        ref = DecoderLM(llama_tp_dir, max_context=64,
                        quantize="int8").generate("hello world", config=GREEDY)
        got = DecoderLM(llama_tp_dir, max_context=64, quantize="int8",
                        tp=2).generate("hello world", config=GREEDY)
        assert got == ref

    def test_too_many_devices_raises(self, llama_tp_dir):
        from kjarni_tpu.core.errors import InvalidConfigError
        with pytest.raises(InvalidConfigError, match="device"):
            DecoderLM(llama_tp_dir, tp=64)

    def test_tp_with_host_offload_raises(self, llama_tp_dir):
        from kjarni_tpu.core.errors import InvalidConfigError
        with pytest.raises(InvalidConfigError, match="exclusive"):
            DecoderLM(llama_tp_dir, tp=2, execution_plan="offload_ends")


class TestTaskSurface:
    def test_generator_tp(self, llama_tp_dir):
        from kjarni_tpu.tasks.generator import Generator
        ref = Generator(str(llama_tp_dir)).generate("hello world",
                                                    config=GREEDY)
        got = Generator(str(llama_tp_dir), tp=4).generate("hello world",
                                                          config=GREEDY)
        assert got == ref

    def test_chat_tp(self, llama_tp_dir):
        from kjarni_tpu.tasks.chat import Chat
        ref = Chat(str(llama_tp_dir), system_prompt="be brief").send(
            "hello", config=GREEDY)
        got = Chat(str(llama_tp_dir), system_prompt="be brief", tp=4).send(
            "hello", config=GREEDY)
        assert got == ref

    def test_embedder_dp(self, tmp_path):
        from kjarni_tpu.tasks.embedder import Embedder
        tiny_bert_dir(tmp_path, seed=3)
        texts = [f"hello world doctor {i}" for i in range(11)]  # 11 % 8 != 0
        ref = Embedder(str(tmp_path)).embed_batch(texts)
        emb = Embedder(str(tmp_path), dp=8)
        assert emb._encoder._mesh is not None
        got = emb.embed_batch(texts)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_classifier_dp(self, tmp_path):
        from kjarni_tpu.tasks.classifier import Classifier
        tiny_bert_dir(tmp_path, num_labels=2, seed=4)
        texts = ["i love this", "terrible quality", "great service"]
        ref = [r.label for r in Classifier(str(tmp_path)).classify_batch(texts)]
        got = [r.label for r in
               Classifier(str(tmp_path), dp=8).classify_batch(texts)]
        assert got == ref

    def test_reranker_dp(self, tmp_path):
        from kjarni_tpu.tasks.reranker import Reranker
        tiny_bert_dir(tmp_path, num_labels=1, seed=5, for_pair=True)
        docs = ["the doctor was great", "terrible service", "hello world"]
        ref = Reranker(str(tmp_path)).score_pairs([("doctor", d) for d in docs])
        got = Reranker(str(tmp_path), dp=8).score_pairs(
            [("doctor", d) for d in docs])
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestServeAndCli:
    def test_cli_generate_tp(self, llama_tp_dir, capsys):
        from kjarni_tpu.cli.main import main
        rc = main(["generate", "hello world", "--model", str(llama_tp_dir),
                   "--tp", "4", "--preset", "greedy", "--max-tokens", "8",
                   "--format", "json"])
        assert rc == 0
        import json as _json
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        ref = DecoderLM(llama_tp_dir).generate(
            "hello world", config=GenerationConfig(strategy="greedy",
                                                   max_new_tokens=8))
        assert out["text"] == ref

    def test_serve_engine_tp(self, llama_tp_dir):
        from kjarni_tpu.serve import _Engine
        eng = _Engine({"generate": str(llama_tp_dir)}, tp=4)
        out = eng.handle("/v1/generate", {"prompt": "hello world",
                                          "preset": "greedy",
                                          "max_new_tokens": 8})
        gen = eng.get("generate", None)
        assert gen._lm._mesh is not None
        ref = DecoderLM(llama_tp_dir).generate(
            "hello world", config=GenerationConfig(strategy="greedy",
                                                   max_new_tokens=8))
        assert out["text"] == ref

    def test_continuous_engine_tp(self, llama_tp_dir):
        from kjarni_tpu.generate.continuous import ContinuousEngine
        ref_lm = DecoderLM(llama_tp_dir, max_context=64)
        ref = ref_lm.generate("hello world", config=GREEDY)
        lm = DecoderLM(llama_tp_dir, max_context=64, tp=4)
        eng = ContinuousEngine(lm, slots=2, max_context=64)
        rid = eng.submit("hello world", max_new_tokens=12)
        done = eng.run()
        assert done[0].request_id == rid
        assert done[0].text == ref

    def test_continuous_prefix_cache_tp(self, llama_tp_dir):
        """Cross-slot prompt-prefix caching under tensor parallelism: the
        replicated prefix KV broadcast-copies into tp-sharded slot caches."""
        from kjarni_tpu.generate.continuous import ContinuousEngine
        ref_lm = DecoderLM(llama_tp_dir, max_context=64)
        ref = ref_lm.generate("hello world the doctor", config=GREEDY)
        lm = DecoderLM(llama_tp_dir, max_context=64, tp=4)
        eng = ContinuousEngine(lm, slots=2, max_context=64)
        eng.register_prefix("hello world")
        rid = eng.submit("hello world the doctor", max_new_tokens=12)
        done = {fr.request_id: fr for fr in eng.run()}
        assert done[rid].text == ref
