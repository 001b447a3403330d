"""Chunked-prefill flash vs materialized-scores XLA path on the real TPU.

Scenario: multi-turn chat with a 3584-token cache-resident prefix; the new
turn adds a 512-token suffix (prompt caching / prefix reuse). Round 1 fell
back to the [S, T] materialized path for any pos_start > 0.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from __graft_entry__ import _random_llama
from kjarni_tpu.models import llama as kllama

COMMON, SUFFIX, CTX = 3584, 512, 4096
if len(sys.argv) > 1:
    CTX = int(sys.argv[1])
    COMMON = CTX - 512
if len(sys.argv) > 2:
    SUFFIX = int(sys.argv[2])


def main():
    cfg, params = _random_llama({
        "vocab_size": 32000, "hidden_size": 2048, "num_layers": 16,
        "num_heads": 32, "num_kv_heads": 8, "head_dim": 64,
        "intermediate_size": 8192, "max_seq_len": CTX})
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if x.dtype == np.float32 and x.ndim > 1 else jnp.asarray(x), params)
    params["rope_cos"] = jnp.asarray(params["rope_cos"], jnp.float32)
    params["rope_sin"] = jnp.asarray(params["rope_sin"], jnp.float32)

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.integers(0, 32000, (1, COMMON)), jnp.int32)
    suffix = jnp.asarray(rng.integers(0, 32000, (1, SUFFIX)), jnp.int32)

    ck, cv = kllama.init_cache(cfg, 1, CTX, jnp.bfloat16)
    # fill with flash: the materialized path OOMs at 16k from-zero prefill
    # (f32[8,4,15872,16384] scores = 33 GB > 16 GB HBM)
    fill = jax.jit(lambda p, i, a, b: kllama.forward(
        p, cfg, i, a, b, 0, use_flash=True))
    _, ck, cv = fill(params, prefix, ck, cv)
    jax.block_until_ready(ck)

    xla = jax.jit(lambda p, i, a, b: kllama.forward(
        p, cfg, i, a, b, jnp.int32(COMMON)))
    import functools
    import os
    # optional block-size override for tuning runs (production path uses the
    # tuned 256/512 set in models/llama.py)
    if "KJARNI_FLASH_BQ" in os.environ:
        import kjarni_tpu.ops.pallas.flash_attention as fa
        fa.flash_attention = functools.partial(
            fa.flash_attention,
            block_q=int(os.environ["KJARNI_FLASH_BQ"]),
            block_k=int(os.environ["KJARNI_FLASH_BK"]))
    fl = jax.jit(lambda p, i, a, b: kllama.forward(
        p, cfg, i, a, b, jnp.int32(COMMON), use_flash=True, kv_bucket=CTX))

    lg_x, _, _ = xla(params, suffix, ck, cv)
    lg_f, _, _ = fl(params, suffix, ck, cv)
    diff = float(jnp.max(jnp.abs(lg_x.astype(jnp.float32)
                                 - lg_f.astype(jnp.float32))))
    cos = float(jnp.sum(lg_x.astype(jnp.float32) * lg_f.astype(jnp.float32))
                / (jnp.linalg.norm(lg_x.astype(jnp.float32))
                   * jnp.linalg.norm(lg_f.astype(jnp.float32))))
    print(json.dumps({"check": "logits", "max_abs_diff": round(diff, 4),
                      "cosine": round(cos, 6)}))

    def timeit(fn):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            lg, a, b = fn(params, suffix, ck, cv)
            jax.block_until_ready(lg)
            times.append(time.perf_counter() - t0)
        return min(times)

    tx = timeit(xla)
    tf = timeit(fl)
    print(json.dumps({
        "metric": "chunked_prefill_512_over_3584",
        "xla_ms": round(tx * 1e3, 2), "flash_ms": round(tf * 1e3, 2),
        "speedup": round(tx / tf, 3),
        "suffix_tok_per_sec_flash": round(SUFFIX / tf, 1)}))


if __name__ == "__main__":
    main()
