#!/usr/bin/env python
"""Llama-3.1-8B-geometry int8 decode tok/s on one v5e chip.

8B bf16 (16 GB) does not fit a 16 GB v5e; int8 weight-only (8 GB) does.
Round-1 measured 79 tok/s (12.7 ms/tok, ~77% of the weight-streaming
roofline) WITHOUT the fill-proportional working slice; this rerun carries
the round-3/4 512-slot slice so the per-step layer-scan restack moves
bucket-sized, not capacity-sized, cache traffic. Methodology = bench.py
bench_decode (fused 64-step greedy scan, tunnel roundtrip subtracted).
Weights synthesize on device (bench.build_llama_int8_device — host gen +
an 8 GB tunnel device_put blew the first run's timeout).

Measured 2026-08-19 (v5e-1): 90.3 tok/s, 11.07 ms/tok — ~745 GB/s
effective, ~91% of v5e HBM (BASELINE.md round-4 table).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 64
CTX = 2048
SLICE = 512

GEOM = {"vocab_size": 128256, "hidden_size": 4096, "num_layers": 32,
        "num_heads": 32, "num_kv_heads": 8, "head_dim": 128,
        "intermediate_size": 14336, "max_seq_len": 4096}


def main():
    import jax
    import jax.numpy as jnp

    from bench import _roundtrip_latency, build_llama_int8_device
    from kjarni_tpu.models import llama as kllama

    t0 = time.time()
    cfg, params = build_llama_int8_device(GEOM)
    jax.block_until_ready(params["layers"]["down"]["w"])
    print(f"param gen {time.time() - t0:.0f}s (on device)", file=sys.stderr)
    ck, cv = kllama.init_cache(cfg, 1, CTX, jnp.bfloat16)

    @jax.jit
    def decode_n(params, ck, cv, tok0, pos0):
        full_ck, full_cv = ck, cv
        ck = jax.lax.slice_in_dim(ck, 0, SLICE, axis=3)
        cv = jax.lax.slice_in_dim(cv, 0, SLICE, axis=3)

        def body(carry, i):
            tok, ck, cv = carry
            logits, ck, cv = kllama.forward(params, cfg, tok[None, None],
                                            ck, cv, pos0 + i)
            return (jnp.argmax(logits[0]).astype(jnp.int32), ck, cv), ()

        (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv), jnp.arange(N))
        ck = jax.lax.dynamic_update_slice(full_ck, ck, (0, 0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(full_cv, cv, (0, 0, 0, 0, 0))
        return tok, ck, cv

    tok, ck, cv = decode_n(params, ck, cv, jnp.int32(1), jnp.int32(128))
    int(tok)
    print(f"compile+warm {time.time() - t0:.0f}s", file=sys.stderr)
    lat = _roundtrip_latency()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tok, ck, cv = decode_n(params, ck, cv, jnp.int32(1), jnp.int32(256))
        int(tok)
        times.append(time.perf_counter() - t0)
    tps = N / (min(times) - lat)
    print(json.dumps({"metric": "llama_8b_decode_int8_tok_per_sec",
                      "value": round(tps, 1), "unit": "tok/s",
                      "ms_per_tok": round(1e3 / tps, 2),
                      "roundtrip_ms": round(lat * 1e3, 1)}))


if __name__ == "__main__":
    main()
