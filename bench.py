"""Headline benchmark: MiniLM-L6-v2-class embedding throughput (sentences/sec/chip).

Driver contract: print ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 10_000 — the BASELINE.json north-star target
(">=10k MiniLM sentences/sec/chip on v5e-1").

Methodology: the TPU here sits behind a tunnel with ~30ms synchronous
round-trip latency, so per-call host timing measures the tunnel, not the chip.
We run ITERS encoder forwards inside ONE jitted `lax.scan` with a data
dependency between iterations (so nothing can be elided or deduped), read back
a single scalar, and subtract the measured empty-roundtrip latency.

Model: randomly-initialized with the exact all-MiniLM-L6-v2 geometry (6 layers,
hidden 384, 12 heads, ffn 1536, vocab 30522) — throughput does not depend on
weight values. bf16 weights/activations (MXU-native), batch 256, seq bucket 64.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_minilm(dtype):
    from kjarni_tpu.models.bert import BertConfig

    cfg = BertConfig(
        flavor="bert", vocab_size=30522, hidden_size=384, num_layers=6,
        num_heads=12, intermediate_size=1536, max_position_embeddings=512,
        type_vocab_size=2, pad_token_id=0, layer_norm_eps=1e-12,
        activation="gelu")
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(dtype)

    L, H, I, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    lin = lambda i, o: {"w": w(L, i, o), "b": w(L, o)}
    norm = lambda: {"weight": np.ones((L, H), dtype), "bias": np.zeros((L, H), dtype)}
    params = {
        "embeddings": {
            "word": w(V, H),
            "position": w(cfg.max_position_embeddings, H),
            "token_type": w(2, H),
            "norm": {"weight": np.ones(H, dtype), "bias": np.zeros(H, dtype)},
        },
        "layers": {
            "q": lin(H, H), "k": lin(H, H), "v": lin(H, H), "o": lin(H, H),
            "attn_norm": norm(),
            "fc1": lin(H, I), "fc2": lin(I, H),
            "ffn_norm": norm(),
        },
        "pooler": None,
        "rel_bias": None,
    }
    return cfg, params


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from kjarni_tpu.models import bert as kbert
    from kjarni_tpu.ops.pooling import mean_pool

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = ml_dtypes.bfloat16 if on_tpu else np.float32

    cfg, params = build_minilm(dtype)
    params = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None,
        params, is_leaf=lambda x: x is None or isinstance(x, np.ndarray))

    BATCH, SEQ = 256, 64
    ITERS = 50 if on_tpu else 3
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), dtype=jnp.int32)
    mask = jnp.ones((BATCH, SEQ), dtype=jnp.int32)
    tt = jnp.zeros((BATCH, SEQ), dtype=jnp.int32)

    @jax.jit
    def bench_loop(params, ids0):
        def body(ids, _):
            hidden = kbert.encode(params, cfg, ids, mask, tt)
            pooled = mean_pool(hidden, mask)
            # zero-valued but data-dependent perturbation chains the iterations
            delta = (jnp.abs(pooled[:, :1]) * 0).astype(jnp.int32)
            return ids + delta, jnp.sum(pooled.astype(jnp.float32))
        ids, sums = jax.lax.scan(body, ids0, None, length=ITERS)
        return jnp.sum(sums)

    float(bench_loop(params, ids0))  # warmup/compile

    # empty-roundtrip latency to subtract
    f0 = jax.jit(lambda x: jnp.sum(x))
    float(f0(ids0))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f0(ids0))
    latency = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_loop(params, ids0))
        times.append(time.perf_counter() - t0)
    net = max(min(times) - latency, 1e-9)

    sentences_per_sec = BATCH * ITERS / net
    print(json.dumps({
        "metric": "minilm_l6_v2_embed_sentences_per_sec",
        "value": round(sentences_per_sec, 1),
        "unit": "sentences/s/chip",
        "vs_baseline": round(sentences_per_sec / 10_000.0, 3),
    }))


if __name__ == "__main__":
    main()
