"""Dynamic request batching (serve_batching.py): grouping, param isolation,
error propagation, and the HTTP /v1/generate path under concurrency."""

import threading
import time

import pytest

from kjarni_tpu.serve_batching import DynamicBatcher


class TestDynamicBatcher:
    def test_groups_concurrent_requests(self):
        calls = []

        def run_batch(prompts, **kw):
            calls.append(list(prompts))
            time.sleep(0.02)  # hold the worker so later submits pile up
            return [p.upper() for p in prompts]

        b = DynamicBatcher(run_batch, max_batch=4, max_wait_ms=100)
        results = {}
        barrier = threading.Barrier(6)

        def client(i):
            barrier.wait()
            results[i] = b.submit(f"p{i}")

        threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.shutdown()
        assert results == {i: f"P{i}" for i in range(6)}
        assert sum(len(c) for c in calls) == 6
        assert max(len(c) for c in calls) > 1   # actually batched
        assert max(len(c) for c in calls) <= 4  # respects max_batch

    def test_different_params_not_mixed(self):
        calls = []

        def run_batch(prompts, **kw):
            calls.append((list(prompts), dict(kw)))
            time.sleep(0.02)
            return [f"{p}:{kw.get('max_new_tokens')}" for p in prompts]

        b = DynamicBatcher(run_batch, max_batch=8, max_wait_ms=100)
        results = {}
        barrier = threading.Barrier(4)

        def client(i, n):
            barrier.wait()
            results[i] = b.submit(f"p{i}", max_new_tokens=n)

        threads = [threading.Thread(target=client, args=(i, 5 if i % 2 else 9))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.shutdown()
        for i in range(4):
            assert results[i] == f"p{i}:{5 if i % 2 else 9}"
        for prompts, kw in calls:
            ns = {results[int(p[1:])].split(":")[1] for p in prompts}
            assert len(ns) == 1  # one param set per batch

    def test_error_propagates_to_all_waiters(self):
        def run_batch(prompts, **kw):
            raise ValueError("model exploded")

        b = DynamicBatcher(run_batch, max_batch=4, max_wait_ms=10)
        with pytest.raises(ValueError, match="model exploded"):
            b.submit("hello")
        b.shutdown()

    def test_single_request_no_waiting_forever(self):
        b = DynamicBatcher(lambda ps, **kw: [p + "!" for p in ps],
                           max_batch=8, max_wait_ms=5)
        assert b.submit("solo") == "solo!"
        b.shutdown()

    def test_wrong_result_count_raises(self):
        b = DynamicBatcher(lambda ps, **kw: [], max_batch=2, max_wait_ms=5)
        with pytest.raises(RuntimeError, match="returned 0 results"):
            b.submit("a")
        b.shutdown()

    def test_submit_after_shutdown_rejected(self):
        b = DynamicBatcher(lambda ps, **kw: list(ps), max_batch=2,
                           max_wait_ms=5)
        b.shutdown()
        with pytest.raises(RuntimeError, match="shut down"):
            b.submit("late")


class TestServeWithBatching:
    def test_concurrent_generate_requests_batched(self, tmp_path):
        import json
        import urllib.request
        import torch
        from http.server import ThreadingHTTPServer
        from helpers import build_word_tokenizer, save_torch_model
        from transformers import LlamaConfig, LlamaForCausalLM
        from kjarni_tpu.serve import _Engine, make_handler

        d = tmp_path / "lm"
        d.mkdir()
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64, bos_token_id=2,
                             eos_token_id=3, tie_word_embeddings=False)
        torch.manual_seed(17)
        save_torch_model(d, LlamaForCausalLM(config).eval(), config)

        engine = _Engine({"generate": str(d)}, max_batch=4,
                         batch_window_ms=300)
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_port}"

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())

        # warm the model (first request compiles) so the timed window is fair
        code, single = post("/v1/generate",
                            {"prompt": "hello world", "max_new_tokens": 4,
                             "preset": "greedy"})
        assert code == 200

        results = {}
        barrier = threading.Barrier(3)

        def client(i):
            barrier.wait()
            code, out = post("/v1/generate",
                             {"prompt": "hello world", "max_new_tokens": 4,
                              "preset": "greedy"})
            results[i] = (code, out["text"])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        try:
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert all(code == 200 for code, _ in results.values())
            # greedy: batched output equals the unbatched warmup output
            assert {text for _, text in results.values()} == {single["text"]}
            code, stats = post("/v1/batch_stats", {})
            sizes = sum(stats["batch_sizes"].values(), [])
            assert sizes and max(sizes) > 1  # requests actually co-batched
        finally:
            srv.shutdown()


class TestServeContinuous:
    def test_continuous_scheduler_matches_batch_output(self, tmp_path):
        import json
        import urllib.request
        import torch
        from helpers import build_word_tokenizer, save_torch_model
        from transformers import LlamaConfig, LlamaForCausalLM
        from kjarni_tpu.serve import _Engine, KjarniHTTPServer, make_handler

        d = tmp_path / "lm"
        d.mkdir()
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64, bos_token_id=2,
                             eos_token_id=3, tie_word_embeddings=False)
        torch.manual_seed(23)
        save_torch_model(d, LlamaForCausalLM(config).eval(), config)

        def post(base, payload):
            req = urllib.request.Request(
                base + "/v1/generate", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        def start(scheduler):
            engine = _Engine({"generate": str(d)}, max_batch=4,
                             scheduler=scheduler)
            srv = KjarniHTTPServer(("127.0.0.1", 0), make_handler(engine))
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            return srv, f"http://127.0.0.1:{srv.server_port}"

        body = {"prompt": "hello world", "max_new_tokens": 6,
                "preset": "greedy"}
        srv_b, base_b = start("batch")
        expected = post(base_b, body)["text"]
        srv_b.shutdown()

        srv_c, base_c = start("continuous")
        try:
            # concurrent requests join the slot engine mid-flight
            results = {}
            barrier = threading.Barrier(3)

            def client(i):
                barrier.wait()
                results[i] = post(base_c, body)["text"]

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert set(results.values()) == {expected}
            # non-greedy presets fall back to the regular path (still 200)
            out = post(base_c, {"prompt": "hello", "max_new_tokens": 3,
                                "preset": "creative"})
            assert "text" in out
        finally:
            srv_c.shutdown()

    def test_unknown_scheduler_rejected(self):
        from kjarni_tpu.core.errors import KjarniError
        from kjarni_tpu.serve import _Engine
        with pytest.raises(KjarniError, match="unknown scheduler"):
            _Engine({}, scheduler="vllm")


class TestServePromptPrefix:
    def test_prompt_prefix_e2e(self, tmp_path):
        """serve --prompt-prefix: requests starting with the prefix reuse
        its KV (visible as prefix_hits in /v1/batch_stats) and outputs stay
        identical to a server without the prefix."""
        import json
        import urllib.request
        import torch
        from helpers import build_word_tokenizer, save_torch_model
        from transformers import LlamaConfig, LlamaForCausalLM
        from kjarni_tpu.serve import _Engine, KjarniHTTPServer, make_handler

        d = tmp_path / "lm"
        d.mkdir()
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64, bos_token_id=2,
                             eos_token_id=3, tie_word_embeddings=False)
        torch.manual_seed(24)
        save_torch_model(d, LlamaForCausalLM(config).eval(), config)

        def post(base, path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        def start(prefix):
            engine = _Engine({"generate": str(d)}, max_batch=2,
                             scheduler="continuous", prompt_prefix=prefix)
            srv = KjarniHTTPServer(("127.0.0.1", 0), make_handler(engine))
            import threading
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            return srv, f"http://127.0.0.1:{srv.server_port}"

        prompt = "hello world the doctor went"
        body = {"prompt": prompt, "max_new_tokens": 8, "preset": "greedy"}
        srv0, base0 = start(None)
        plain = post(base0, "/v1/generate", body)["text"]
        srv0.shutdown()
        srv1, base1 = start("hello world the")
        got = post(base1, "/v1/generate", body)["text"]
        stats = post(base1, "/v1/batch_stats", {})
        srv1.shutdown()
        assert got == plain
        assert any(v.get("prefix_hits", 0) >= 1
                   for v in stats["continuous"].values())

    def test_prompt_prefix_requires_continuous(self):
        from kjarni_tpu.core.errors import KjarniError
        from kjarni_tpu.serve import _Engine
        with pytest.raises(KjarniError, match="continuous"):
            _Engine({}, scheduler="batch", prompt_prefix="sys")
