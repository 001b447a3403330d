"""OpenAI-compatible API surface over the kjarni serving engine.

`/v1/completions` and `/v1/chat/completions` accept the OpenAI request
schema (prompt/messages, max_tokens, temperature, top_p, stop, n, seed,
stream) and return OpenAI-shaped responses, so existing OpenAI SDK clients
point at a kjarni server by switching base_url. Beyond-reference feature —
the reference ships no HTTP server at all; this rides the same task cache,
model locks, and watchdog as the native /v1/* endpoints (serve.py).

Chat requests are STATELESS per call (the OpenAI contract): the messages
list is templated through the model's chat template each time — unlike the
session-keeping native /v1/chat.
"""

from __future__ import annotations

import time
import uuid
from typing import Iterator

from .chat_templates import Conversation, Message
from .core.errors import KjarniError
from .generate.sampling import GenerationConfig, SamplingParams


def _gen_config(body: dict, default_max: int = 16) -> GenerationConfig:
    temp = float(body.get("temperature", 1.0))
    max_tokens = int(body.get("max_tokens", default_max))
    seed = body.get("seed")
    if temp <= 0:
        cfg = GenerationConfig.greedy(max_new_tokens=max_tokens)
        return cfg
    return GenerationConfig(
        strategy="sample", max_new_tokens=max_tokens, seed=seed,
        sampling=SamplingParams(temperature=temp,
                                top_p=float(body.get("top_p", 1.0)),
                                top_k=0, min_p=0.0))


def _stop_list(body: dict, extra: list[str] = ()) -> list[str]:
    stop = body.get("stop")
    if stop is None:
        stops = []
    elif isinstance(stop, str):
        stops = [stop]
    else:
        stops = [str(s) for s in stop[:4]]   # OpenAI caps at 4
    return stops + [s for s in extra if s]


def _truncate_at_stops(text: str, stops: list[str]) -> tuple[str, bool]:
    cut = len(text)
    for s in stops:
        i = text.find(s)
        if i != -1:
            cut = min(cut, i)
    return text[:cut], cut < len(text)


def _run_one(engine, lm, prompt: str, cfg: GenerationConfig,
             stops: list[str], cancellation=None):
    """One generation -> (text, finish_reason, completion_tokens)."""
    toks: list[int] = []
    with engine._lm_lock(lm):
        for st in lm.generate_stream(prompt, config=cfg,
                                     cancellation=cancellation):
            toks.append(st.id)
    text = lm.tokenizer.decode(toks, skip_special_tokens=True)
    text, hit = _truncate_at_stops(text, stops)
    finish = ("stop" if hit or len(toks) < (cfg.max_new_tokens or 0)
              else "length")
    return text, finish, len(toks)


def _messages_to_prompt(lm, messages: list[dict]) -> str:
    conv = Conversation()
    for msg in messages:
        role = msg.get("role")
        content = str(msg.get("content", ""))
        if role == "system":
            conv.push(Message.system(content))
        elif role == "user":
            conv.push(Message.user(content))
        elif role == "assistant":
            conv.push(Message.assistant(content))
        else:
            raise KjarniError(f"unsupported message role '{role}'")
    return lm.chat_template.apply(conv)


def _base(kind: str, model: str) -> dict:
    return {"id": f"{'cmpl' if kind == 'text_completion' else 'chatcmpl'}-"
                  + uuid.uuid4().hex[:24],
            "object": kind,
            "created": int(time.time()),
            "model": model}


def completion(engine, body: dict) -> dict:
    """POST /v1/completions (non-streaming)."""
    gen = engine.get("generate", body.get("model"))
    lm = gen._lm
    prompts = body.get("prompt", "")
    if isinstance(prompts, str):
        prompts = [prompts]
    n = min(int(body.get("n", 1)), 8)
    cfg = _gen_config(body)
    stops = _stop_list(body)
    choices = []
    total_prompt = total_completion = 0
    for prompt in prompts:
        total_prompt += len(lm.encode_prompt(prompt, True))
        for _ in range(n):
            text, finish, ct = _run_one(engine, lm, prompt, cfg, stops)
            total_completion += ct
            choices.append({"text": text, "index": len(choices),
                            "logprobs": None, "finish_reason": finish})
    out = _base("text_completion", gen.model_id)
    out["choices"] = choices
    out["usage"] = {"prompt_tokens": total_prompt,
                    "completion_tokens": total_completion,
                    "total_tokens": total_prompt + total_completion}
    return out


def chat_completion(engine, body: dict) -> dict:
    """POST /v1/chat/completions (non-streaming, stateless per call)."""
    gen = engine.get("chat", body.get("model"))
    lm = gen._lm
    prompt = _messages_to_prompt(lm, body.get("messages", []))
    n = min(int(body.get("n", 1)), 8)
    cfg = _gen_config(body, default_max=256)
    stops = _stop_list(body, lm.chat_template.stop_sequences())
    choices = []
    total_completion = 0
    for i in range(n):
        text, finish, ct = _run_one(engine, lm, prompt, cfg, stops)
        total_completion += ct
        choices.append({"index": i,
                        "message": {"role": "assistant",
                                    "content": text.strip()},
                        "finish_reason": finish})
    pt = len(lm.encode_prompt(prompt, True))
    out = _base("chat.completion", gen.model_id)
    out["choices"] = choices
    out["usage"] = {"prompt_tokens": pt,
                    "completion_tokens": total_completion,
                    "total_tokens": pt + total_completion}
    return out


def stream(engine, path: str, body: dict):
    """SSE for {"stream": true}: yields OpenAI-shaped chunk dicts (the
    serve.py SSE writer emits any dict piece verbatim). Returns
    (chunk iterator, CancellationToken)."""
    from .core.cancellation import CancellationToken
    cancel = CancellationToken()
    chat = path == "/v1/chat/completions"
    gen = engine.get("chat" if chat else "generate", body.get("model"))
    lm = gen._lm
    if chat:
        prompt = _messages_to_prompt(lm, body.get("messages", []))
        stops = _stop_list(body, lm.chat_template.stop_sequences())
        cfg = _gen_config(body, default_max=256)
        base = _base("chat.completion.chunk", gen.model_id)
    else:
        prompt = body.get("prompt", "")
        if not isinstance(prompt, str):
            prompt = prompt[0]
        stops = _stop_list(body)
        cfg = _gen_config(body)
        base = _base("text_completion", gen.model_id)
    lock = engine._lm_lock(lm)

    def chunk(piece=None, finish=None):
        if chat:
            delta = ({"content": piece} if piece is not None
                     else ({"role": "assistant"} if finish is None else {}))
            return {**base, "choices": [{"index": 0, "delta": delta,
                                         "finish_reason": finish}]}
        return {**base, "choices": [{"index": 0, "text": piece or "",
                                     "logprobs": None,
                                     "finish_reason": finish}]}

    def run() -> Iterator[dict]:
        with lock:
            if chat:
                yield chunk()            # role announcement chunk
            emitted = ""
            n_toks = 0
            stopped = False
            for st in lm.generate_stream(prompt, config=cfg,
                                         cancellation=cancel):
                n_toks += 1
                piece = st.text
                emitted += piece
                cut, hit = _truncate_at_stops(emitted, stops)
                if hit:
                    tail = cut - (len(emitted) - len(piece))
                    if tail > 0:
                        yield chunk(piece[:tail])
                    stopped = True
                    break
                yield chunk(piece)
            finish = ("stop" if stopped or n_toks < (cfg.max_new_tokens or 0)
                      else "length")
            yield chunk(finish=finish)

    return run(), cancel
