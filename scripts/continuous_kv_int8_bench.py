#!/usr/bin/env python
"""int8 KV through the SERVING path: the continuous engine at high fill.

The round-4 decision rule (BASELINE.md, scripts/kv_int8_batch_bench.py) —
"int8 KV for batched long-context decode, 1.44x at B=8 / fill 3456" — was
measured on a raw fused decode scan. Round 5 wired `kv_cache="int8"`
through ContinuousEngine (slot caches, admission fold/scatter, prefix
broadcast, working-slice windows); this bench measures the same shape
through the ACTUAL serving path: 8 slots, ~1.07B llama geometry
(kv_int8_batch_bench's GEOM minus the 128k vocab), int8 weights, prompts
filling ~3456 tokens of a 4096-token slot cache.

Method: two timed waves per cache dtype (N=32 and N=160 new tokens, same
prompts, all jit variants warmed) — the wall delta isolates steady-state
decode windows, cancelling admission/prefill cost. Token counts come from
the engine's own FinishedRequests (random weights can hit EOS early).

Usage:
    python scripts/build_serve_model.py /tmp/serve_model_1b 1b
    python scripts/continuous_kv_int8_bench.py [--model /tmp/serve_model_1b]

NOTE: do not run with PYTHONPATH set (breaks axon plugin registration).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FILL = 3456          # overridable (--fill) for CPU smoke tests
N_SHORT, N_LONG = 32, 160
SLOTS = 8


def make_prompts(vocab: int, n: int = SLOTS, fill: int = FILL) -> list:
    # distinct deterministic id streams, away from bos=2/eos=3
    lo, hi = 10, min(vocab, 2048) - 8
    return [[lo + (i * 2654435761 + j * 40503) % (hi - lo)
             for j in range(fill)] for i in range(n)]


def run(model_dir: str, kv_cache, steps_per_sync: int = 16,
        fill: int = FILL, dtype: str = "bf16", quantize="int8",
        max_context: int = 4096) -> dict:
    from kjarni_tpu.generate.continuous import ContinuousEngine
    from kjarni_tpu.models.decoder_lm import DecoderLM

    lm = DecoderLM(Path(model_dir), dtype=dtype, quantize=quantize,
                   max_context=max_context, kv_cache=kv_cache)
    eng = ContinuousEngine(lm, slots=SLOTS, max_context=max_context,
                           steps_per_sync=steps_per_sync)
    prompts = make_prompts(lm.config.vocab_size, fill=fill)

    def wave(n_new: int) -> tuple:
        for ids in prompts:
            eng.submit(token_ids=ids, max_new_tokens=n_new, defer_admit=True)
        t0 = time.perf_counter()
        done = eng.run()
        wall = time.perf_counter() - t0
        toks = sum(len(r.token_ids) for r in done)
        return wall, toks

    wave(N_SHORT)                      # compile admission + short windows
    wave(N_LONG)                       # compile/warm the long-window ladder
    ws, ts = min((wave(N_SHORT) for _ in range(2)), key=lambda x: x[0])
    wl, tl = min((wave(N_LONG) for _ in range(2)), key=lambda x: x[0])
    dt, dn = wl - ws, tl - ts
    return {"kv": kv_cache or "bf16", "wall_short_s": round(ws, 3),
            "wall_long_s": round(wl, 3), "toks_short": ts, "toks_long": tl,
            "ms_per_engine_step": round(dt / (dn / SLOTS) * 1e3, 3),
            "agg_tok_per_s": round(dn / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/serve_model_1b")
    ap.add_argument("--steps-per-sync", type=int, default=16)
    ap.add_argument("--fill", type=int, default=FILL)
    ap.add_argument("--dtype", default="bf16",
                    help="f32 for the CPU smoke path")
    ap.add_argument("--no-quantize", action="store_true")
    ap.add_argument("--max-context", type=int, default=4096)
    args = ap.parse_args()
    quant = None if args.no_quantize else "int8"

    bf16 = run(args.model, None, args.steps_per_sync, args.fill,
               args.dtype, quant, args.max_context)
    print(json.dumps(bf16), flush=True)
    q = run(args.model, "int8", args.steps_per_sync, args.fill,
            args.dtype, quant, args.max_context)
    print(json.dumps(q), flush=True)
    print(json.dumps({
        "bench": "continuous_kv_int8", "fill": args.fill, "slots": SLOTS,
        "int8kv_speedup": round(
            bf16["ms_per_engine_step"] / q["ms_per_engine_step"], 3),
        "bf16": bf16, "int8": q}))


if __name__ == "__main__":
    main()
