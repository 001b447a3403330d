"""OpenAI-compatible endpoints (serve_openai.py): /v1/completions and
/v1/chat/completions accept the OpenAI request schema and return
OpenAI-shaped bodies/SSE chunks, so OpenAI SDK clients work by base_url."""

import json
import threading
import urllib.request

import pytest
import torch

from helpers import build_word_tokenizer, save_torch_model


def post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer
    from transformers import LlamaConfig, LlamaForCausalLM
    from kjarni_tpu.serve import _Engine, make_handler

    d = tmp_path_factory.mktemp("oai_lm")
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=2,
                         max_position_embeddings=64, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(93)
    save_torch_model(d, LlamaForCausalLM(config).eval(), config)
    engine = _Engine({"generate": str(d), "chat": str(d)})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", engine
    srv.shutdown()


class TestCompletions:
    def test_greedy_completion_shape_and_parity(self, server):
        base, engine = server
        code, out = post(base, "/v1/completions",
                         {"prompt": "hello world the doctor",
                          "max_tokens": 8, "temperature": 0})
        assert code == 200
        assert out["object"] == "text_completion"
        assert out["id"].startswith("cmpl-")
        (c,) = out["choices"]
        assert c["finish_reason"] in ("stop", "length")
        u = out["usage"]
        assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
        assert u["completion_tokens"] >= 1
        # greedy parity with the native endpoint
        code2, native = post(base, "/v1/generate",
                             {"prompt": "hello world the doctor",
                              "max_new_tokens": 8, "preset": "greedy"})
        assert code2 == 200
        assert c["text"] == native["text"]

    def test_n_choices_and_seeded_sampling(self, server):
        base, _ = server
        body = {"prompt": "the doctor went", "max_tokens": 6,
                "temperature": 0.9, "top_p": 0.95, "seed": 11, "n": 2}
        code, out = post(base, "/v1/completions", body)
        assert code == 200
        assert len(out["choices"]) == 2
        assert [c["index"] for c in out["choices"]] == [0, 1]
        # same seed -> reproducible first choice
        _, again = post(base, "/v1/completions", {**body, "n": 1})
        assert again["choices"][0]["text"] == out["choices"][0]["text"]

    def test_stop_string_truncates(self, server):
        base, _ = server
        _, full = post(base, "/v1/completions",
                       {"prompt": "hello world the doctor",
                        "max_tokens": 8, "temperature": 0})
        text = full["choices"][0]["text"]
        words = text.split()
        if len(words) < 2:
            pytest.skip("output too short to carve a stop string")
        stop = words[1]
        _, out = post(base, "/v1/completions",
                      {"prompt": "hello world the doctor",
                       "max_tokens": 8, "temperature": 0, "stop": stop})
        c = out["choices"][0]
        assert stop not in c["text"]
        assert c["finish_reason"] == "stop"
        assert text.startswith(c["text"])


class TestChatCompletions:
    def test_chat_shape(self, server):
        base, _ = server
        code, out = post(base, "/v1/chat/completions",
                         {"messages": [
                             {"role": "system", "content": "hello world"},
                             {"role": "user", "content": "the doctor went"}],
                          "max_tokens": 8, "temperature": 0})
        assert code == 200
        assert out["object"] == "chat.completion"
        (c,) = out["choices"]
        assert c["message"]["role"] == "assistant"
        assert isinstance(c["message"]["content"], str)
        assert c["finish_reason"] in ("stop", "length")
        assert out["usage"]["prompt_tokens"] > 0

    def test_bad_role_rejected(self, server):
        base, _ = server
        code, out = post(base, "/v1/chat/completions",
                         {"messages": [{"role": "tool", "content": "x"}],
                          "max_tokens": 4})
        assert code == 400
        assert "role" in out["error"]


class TestOpenAIStreaming:
    @staticmethod
    def _sse(base, path, payload, timeout=180):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        frames = []
        with urllib.request.urlopen(req, timeout=timeout) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            for line in r:
                line = line.decode().strip()
                if line.startswith("data: "):
                    frames.append(line[len("data: "):])
        return frames

    def test_stream_completion_chunks(self, server):
        base, _ = server
        frames = self._sse(base, "/v1/completions",
                           {"prompt": "hello world the doctor",
                            "max_tokens": 8, "temperature": 0,
                            "stream": True})
        assert frames[-1] == "[DONE]"
        chunks = [json.loads(f) for f in frames[:-1]]
        assert all(c["object"] == "text_completion" for c in chunks)
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
        text = "".join(c["choices"][0]["text"] for c in chunks)
        _, native = post(base, "/v1/completions",
                         {"prompt": "hello world the doctor",
                          "max_tokens": 8, "temperature": 0})
        assert text == native["choices"][0]["text"]

    def test_stream_chat_delta_protocol(self, server):
        base, _ = server
        frames = self._sse(base, "/v1/chat/completions",
                           {"messages": [{"role": "user",
                                          "content": "hello world"}],
                            "max_tokens": 6, "temperature": 0,
                            "stream": True})
        assert frames[-1] == "[DONE]"
        chunks = [json.loads(f) for f in frames[:-1]]
        assert chunks[0]["choices"][0]["delta"] == {"role": "assistant"}
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)


class TestOpenAIModels:
    def test_models_list_openai_shape(self, server):
        base, _ = server
        with urllib.request.urlopen(base + "/v1/models") as r:
            out = json.loads(r.read())
        assert out["object"] == "list"
        assert all(m["object"] == "model" for m in out["data"])
        names = {m["id"] for m in out["data"]}
        # OpenAI array lists only generation-capable models
        gen_names = {m["name"] for m in out["models"]
                     if m["task"] in ("generation", "chat", "reasoning")}
        assert names == gen_names
        assert names  # non-empty
        assert not any(m["task"] == "embedding" and m["name"] in names
                       for m in out["models"])


class TestReviewFixes:
    def test_null_fields_treated_as_defaults(self, server):
        base, _ = server
        code, out = post(base, "/v1/completions",
                         {"prompt": "hello world", "max_tokens": None,
                          "temperature": None, "top_p": None})
        assert code == 200
        assert out["choices"][0]["text"] is not None

    def test_empty_stop_string_ignored(self, server):
        base, _ = server
        code, out = post(base, "/v1/completions",
                         {"prompt": "hello world the doctor",
                          "max_tokens": 6, "temperature": 0, "stop": ""})
        assert code == 200
        assert out["choices"][0]["text"] != "" or \
            out["usage"]["completion_tokens"] == 0

    def test_n_validation(self, server):
        base, _ = server
        code, out = post(base, "/v1/completions",
                         {"prompt": "x", "n": 0, "max_tokens": 2})
        assert code == 400 and "n" in out["error"]
        code, out = post(base, "/v1/completions",
                         {"prompt": "x", "n": 20, "max_tokens": 2})
        assert code == 400

    def test_seeded_n_choices_differ(self, server):
        base, _ = server
        code, out = post(base, "/v1/completions",
                         {"prompt": "the doctor went", "max_tokens": 8,
                          "temperature": 1.2, "seed": 3, "n": 4})
        assert code == 200
        texts = [c["text"] for c in out["choices"]]
        assert len(set(texts)) > 1, "all seeded choices identical"

    def test_empty_prompt_list_rejected(self, server):
        base, _ = server
        code, out = post(base, "/v1/completions",
                         {"prompt": [], "max_tokens": 2})
        assert code == 400

    def test_stream_multi_prompt_rejected(self, server):
        base, _ = server
        code, out = post(base, "/v1/completions",
                         {"prompt": ["a", "b"], "stream": True,
                          "max_tokens": 2})
        assert code == 500 or code == 400  # rejected before streaming


class TestOpenAIContinuousScheduler:
    def test_completion_routes_through_continuous(self, tmp_path):
        """Under --scheduler continuous, OpenAI completions share the slot
        engine; output must equal the direct path."""
        import torch
        from http.server import ThreadingHTTPServer
        from transformers import LlamaConfig, LlamaForCausalLM
        from kjarni_tpu.serve import _Engine, make_handler

        d = tmp_path / "oai_cont"
        d.mkdir()
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                             intermediate_size=64, num_hidden_layers=1,
                             num_attention_heads=2, num_key_value_heads=2,
                             max_position_embeddings=64, bos_token_id=2,
                             eos_token_id=3, tie_word_embeddings=False)
        torch.manual_seed(94)
        save_torch_model(d, LlamaForCausalLM(config).eval(), config)

        def serve_with(scheduler):
            engine = _Engine({"generate": str(d), "chat": str(d)},
                             scheduler=scheduler, max_batch=4)
            srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            return srv, f"http://127.0.0.1:{srv.server_port}"

        body = {"prompt": "hello world the doctor", "max_tokens": 8,
                "temperature": 0}
        srv1, base1 = serve_with("batch")
        _, direct = post(base1, "/v1/completions", body)
        srv1.shutdown()
        srv2, base2 = serve_with("continuous")
        code, cont = post(base2, "/v1/completions", body)
        stats = post(base2, "/v1/batch_stats", {})[1]
        srv2.shutdown()
        assert code == 200
        assert cont["choices"][0]["text"] == direct["choices"][0]["text"]
        assert cont["usage"] == direct["usage"]
        # proof it actually went through the slot engine
        assert any(v.get("submitted", 0) >= 1
                   for v in stats["continuous"].values())
