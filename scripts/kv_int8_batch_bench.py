#!/usr/bin/env python
"""int8 KV cache under BATCHED serving: does halving KV traffic pay at B>1?

ROADMAP "Partial / deferred" carried: "Int8 KV cache ... measured
speed-neutral at B=1; re-evaluate under batched serving." At B=1 a 1B
model is weight-bound (1.2 GB int8 weights vs ~30 MB of working-slice KV
per step), so KV dtype cannot matter. Under batch, weights amortize
across rows while KV traffic scales with B*fill — at B=8 and ~3.5k fill
KV bytes/step approach weight bytes/step and int8 KV (half the bytes,
dequant convert-fused into the attention matmuls —
models/llama.py:_cache_write) should start paying.

Geometry: llama-3.2-1B, int8 weights in BOTH arms (identical weight
traffic; synthesized on device once, shared). Allocated T=4096, decode
at fill=3456 on the ceil-to-512 working slice (3584) exactly as
generate_batch does. Arms: bf16 KV vs int8 KV, B in {1, 8}.
Methodology = bench.py bench_decode (fused 32-step scan, min of 3,
tunnel roundtrip subtracted).

Per-step KV bytes at B=8, kb=3584:
  read (attention): 16 layers * 2 (k+v) * 8 kvheads * 3584 * 64
                    * 2 B * 8 rows                                = 0.94 GB
  x2 scan-carry restack (the layer scan re-writes the working
    slice it carries every step: read + write)                    = 1.88 GB
  int8: half                                                      = 0.94 GB
Weight bytes (int8 1B): ~1.2 GB. Roofline predicts ~1.4x at B=8.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 32
T = 4096
FILL = 3456          # decode frontier; working slice = ceil-to-512 = 3584
KB = 3584

GEOM = {"vocab_size": 128256, "hidden_size": 2048, "num_layers": 16,
        "num_heads": 32, "num_kv_heads": 8, "head_dim": 64,
        "intermediate_size": 8192, "max_seq_len": 4096}


def run(cfg, params, B: int, quantized_kv: bool) -> float:
    import jax
    import jax.numpy as jnp

    from bench import _roundtrip_latency
    from kjarni_tpu.core.kvcache import slice_working, write_back
    from kjarni_tpu.models import llama as kllama

    ck, cv = kllama.init_cache(cfg, B, T, jnp.bfloat16,
                               quantized=quantized_kv)

    @jax.jit
    def decode_n(params, ck, cv, tok0, pos0):
        full_ck, full_cv = ck, cv
        ck = slice_working(ck, KB, axis=3)
        cv = slice_working(cv, KB, axis=3)

        def body(carry, i):
            tok, ck, cv = carry
            logits, ck, cv = kllama.forward(params, cfg, tok[:, None],
                                            ck, cv, pos0 + i)
            return (jnp.argmax(logits, -1).astype(jnp.int32), ck, cv), ()

        (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv), jnp.arange(N))
        return tok, write_back(full_ck, ck), write_back(full_cv, cv)

    tok0 = jnp.ones((B,), jnp.int32)
    tok, ck, cv = decode_n(params, ck, cv, tok0, jnp.int32(FILL - N - 1))
    jax.block_until_ready(tok)
    lat = _roundtrip_latency()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tok, ck, cv = decode_n(params, ck, cv, tok0, jnp.int32(FILL))
        jax.block_until_ready(tok)
        times.append(time.perf_counter() - t0)
    step_ms = (min(times) - lat) / N * 1e3
    del ck, cv
    return step_ms


def main():
    import jax

    from bench import build_llama_int8_device

    t0 = time.time()
    cfg, params = build_llama_int8_device(GEOM)
    jax.block_until_ready(params["layers"]["down"]["w"])
    print(f"param gen {time.time() - t0:.0f}s (on device)", file=sys.stderr)

    rows = []
    for B in (1, 8):
        bf16 = run(cfg, params, B, False)
        q = run(cfg, params, B, True)
        rows.append({"B": B, "fill": FILL, "bf16_ms_per_step": round(bf16, 3),
                     "int8kv_ms_per_step": round(q, 3),
                     "int8kv_speedup": round(bf16 / q, 3),
                     "agg_tok_per_s_int8kv": round(B / q * 1e3, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"bench": "kv_int8_batch", "rows": rows}))


if __name__ == "__main__":
    main()
