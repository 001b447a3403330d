#!/usr/bin/env python
"""Long-context decode: how much of a decode step is KV-cache attention?

Measures the fused 1B-geometry decode step at several cache CAPACITIES.
XLA's decode attention reads the whole fixed-shape cache every step (the
causal mask only zeroes scores), so step time grows with capacity, not
fill — the delta between capacities is exactly the bandwidth a
bucketed/flash decode-attention could recover when fill << capacity.

A/B interleaved within one process, twice (per the measurement discipline in
BASELINE.md), run WITHOUT PYTHONPATH on the axon TPU.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _random_llama
    from kjarni_tpu.models import llama as kllama

    caps = [2048, 4096, 8192, 16384]
    cfg, params = _random_llama({
        "vocab_size": 128256, "hidden_size": 2048, "num_layers": 16,
        "num_heads": 32, "num_kv_heads": 8, "head_dim": 64,
        "intermediate_size": 8192, "max_seq_len": max(caps)})
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if x.dtype == np.float32 and x.ndim > 1 else jnp.asarray(x), params)
    params["rope_cos"] = jnp.asarray(params["rope_cos"], jnp.float32)
    params["rope_sin"] = jnp.asarray(params["rope_sin"], jnp.float32)

    N = 32

    def make(T):
        ck, cv = kllama.init_cache(cfg, 1, T, jnp.bfloat16)

        @jax.jit
        def decode_n(params, ck, cv, tok0, pos0):
            def body(carry, i):
                tok, ck, cv = carry
                logits, ck, cv = kllama.forward(params, cfg, tok[None, None],
                                                ck, cv, pos0 + i)
                return (jnp.argmax(logits[0]).astype(jnp.int32), ck, cv), ()
            (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv),
                                            jnp.arange(N))
            return tok, ck, cv
        return decode_n, ck, cv

    state = {}
    for T in caps:
        fn, ck, cv = make(T)
        # decode near the end of the cache = worst-case honest fill
        tok, ck, cv = fn(params, ck, cv, jnp.int32(1), jnp.int32(T - N - 2))
        int(tok)                       # warm / compile
        state[T] = (fn, ck, cv)

    times = {T: [] for T in caps}
    for _ in range(2):                 # interleaved, twice
        for T in caps:
            fn, ck, cv = state[T]
            t0 = time.perf_counter()
            tok, ck, cv = fn(params, ck, cv, jnp.int32(1), jnp.int32(T - N - 2))
            int(tok)
            times[T].append(time.perf_counter() - t0)
            state[T] = (fn, ck, cv)

    L, Hkv, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    out = {}
    for T in caps:
        ms = min(times[T]) / N * 1e3
        kv_gb = L * 2 * Hkv * D * T * 2 / 1e9
        out[T] = {"ms_per_tok": round(ms, 3),
                  "kv_read_gb_per_step": round(kv_gb, 4),
                  "kv_roofline_ms": round(kv_gb / 755 * 1e3, 3)}
    base = out[caps[0]]["ms_per_tok"]
    for T in caps[1:]:
        out[T]["delta_vs_2k_ms"] = round(out[T]["ms_per_tok"] - base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
