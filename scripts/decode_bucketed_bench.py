#!/usr/bin/env python
"""A/B: fill-proportional decode at 16k allocated context.

Companion to decode_longctx_bench.py. Three variants at fill ~500 on a
16384-slot cache:
  full_cache   — the old path: the layer scan restacks the full capacity
  attn_slice   — slicing ONLY the attention read (measured useless: XLA
                 fuses the read into the capacity-sized cache restack)
  working_512  — what DecoderLM.generate now does: slice the WORKING cache
                 once per segment, decode on the small slice, write back
Run WITHOUT PYTHONPATH on the axon TPU.
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

    T = 16384
    cfg, params = _random_llama({
        "vocab_size": 128256, "hidden_size": 2048, "num_layers": 16,
        "num_heads": 32, "num_kv_heads": 8, "head_dim": 64,
        "intermediate_size": 8192, "max_seq_len": T})
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if x.dtype == np.float32 and x.ndim > 1 else jnp.asarray(x), params)
    params["rope_cos"] = jnp.asarray(params["rope_cos"], jnp.float32)
    params["rope_sin"] = jnp.asarray(params["rope_sin"], jnp.float32)

    N = 32

    def make(kb, working=False):
        ck, cv = kllama.init_cache(cfg, 1, T, jnp.bfloat16)

        @jax.jit
        def decode_n(params, ck, cv, tok0, pos0):
            full_ck, full_cv = ck, cv
            if working:
                ck = jax.lax.slice_in_dim(ck, 0, kb, axis=3)
                cv = jax.lax.slice_in_dim(cv, 0, kb, axis=3)

            def body(carry, i):
                tok, ck, cv = carry
                logits, ck, cv = kllama.forward(
                    params, cfg, tok[None, None], ck, cv, pos0 + i)
                return (jnp.argmax(logits[0]).astype(jnp.int32), ck, cv), ()
            (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv),
                                            jnp.arange(N))
            if working:
                ck = jax.lax.dynamic_update_slice(full_ck, ck, (0,) * 5)
                cv = jax.lax.dynamic_update_slice(full_cv, cv, (0,) * 5)
            return tok, ck, cv
        return decode_n, ck, cv

    # attn_slice (kv_bucket through the forward, slicing only the attention
    # read) measured 0.997x of full_cache — recorded in BASELINE.md; the
    # surviving variants are the old path and the shipped working-cache one
    variants = {"full_cache": (None, False), "working_512": (512, True)}
    state = {}
    for name, (kb, working) in variants.items():
        fn, ck, cv = make(kb, working)
        tok, ck, cv = fn(params, ck, cv, jnp.int32(1), jnp.int32(476))
        int(tok)
        state[name] = (fn, ck, cv)

    times = {n: [] for n in variants}
    for _ in range(2):
        for name in variants:
            fn, ck, cv = state[name]
            t0 = time.perf_counter()
            tok, ck, cv = fn(params, ck, cv, jnp.int32(1), jnp.int32(476))
            int(tok)
            times[name].append(time.perf_counter() - t0)
            state[name] = (fn, ck, cv)

    out = {n: round(min(ts) / N * 1e3, 3) for n, ts in times.items()}
    out["speedup"] = round(out["full_cache"] / out["working_512"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
