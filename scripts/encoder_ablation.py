"""Encoder MFU ablation: measure MiniLM-geometry forward variants on the TPU.

Self-contained (does not import models/bert.py) so variants can be compared
regardless of the repo's current encode() implementation. Mirrors bench.py
methodology: ITERS chained forwards inside one jitted lax.scan, subtract the
empty-roundtrip latency.

Variants:
  sep        — separate q/k/v GEMMs, lax.scan over layers (round-1 design)
  fused      — fused [H,3H] qkv GEMM, lax.scan
  fused_unroll — fused qkv, scan(unroll=L)
  fused_unroll_bf16scores — + scores entirely in bf16 (no f32 round-trip)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SEQ, ITERS = 256, 64, 50
L, H, NH, I, V = 6, 384, 12, 1536, 30522
D = H // NH


def build_params(dtype):
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    lin = lambda i, o: {"w": w(L, i, o), "b": w(L, o)}
    norm = lambda: {"weight": jnp.ones((L, H), dtype),
                    "bias": jnp.zeros((L, H), dtype)}
    return {
        "word": w(V, H), "position": w(512, H), "token_type": w(2, H),
        "emb_norm": {"weight": jnp.ones(H, dtype), "bias": jnp.zeros(H, dtype)},
        "layers": {"q": lin(H, H), "k": lin(H, H), "v": lin(H, H),
                   "o": lin(H, H), "attn_norm": norm(),
                   "fc1": lin(H, I), "fc2": lin(I, H), "ffn_norm": norm()},
    }


def layer_norm(x, wgt, b, eps=1e-12):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype) * wgt + b


def attn(q, k, v, f32_scores=True):
    # [B, NH, S, D]
    scale = 1.0 / (D ** 0.5)
    pet = jnp.float32 if f32_scores else jnp.bfloat16
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=pet) * scale
    shifted = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(shifted.astype(jnp.bfloat16))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True).astype(jnp.bfloat16)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(q.dtype), v)


def split_heads(x):
    B, S, _ = x.shape
    return x.reshape(B, S, NH, D).transpose(0, 2, 1, 3)


def merge_heads(x):
    B, h, S, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, h * d)


def make_encode(variant):
    fused = variant != "sep"
    unroll = "unroll" in variant
    f32s = "bf16scores" not in variant

    def encode(params, ids):
        x = jnp.take(params["word"], ids, axis=0)
        x = x + params["position"][None, :SEQ]
        x = x + params["token_type"][0][None, None]
        x = layer_norm(x, params["emb_norm"]["weight"], params["emb_norm"]["bias"])
        lyr = dict(params["layers"])
        if fused:
            lyr["qkv_w"] = jnp.concatenate(
                [lyr[n]["w"] for n in ("q", "k", "v")], axis=-1)
            lyr["qkv_b"] = jnp.concatenate(
                [lyr[n]["b"] for n in ("q", "k", "v")], axis=-1)
            for n in ("q", "k", "v"):
                lyr.pop(n)

        def layer_fn(h, lp):
            if fused:
                qkv = h @ lp["qkv_w"] + lp["qkv_b"]
                q, k, v = qkv[..., :H], qkv[..., H:2 * H], qkv[..., 2 * H:]
            else:
                q = h @ lp["q"]["w"] + lp["q"]["b"]
                k = h @ lp["k"]["w"] + lp["k"]["b"]
                v = h @ lp["v"]["w"] + lp["v"]["b"]
            ctx = merge_heads(attn(split_heads(q), split_heads(k),
                                   split_heads(v), f32s))
            h = layer_norm(h + ctx @ lp["o"]["w"] + lp["o"]["b"],
                           lp["attn_norm"]["weight"], lp["attn_norm"]["bias"])
            ffn = jax.nn.gelu(h @ lp["fc1"]["w"] + lp["fc1"]["b"],
                              approximate=False) @ lp["fc2"]["w"] + lp["fc2"]["b"]
            h = layer_norm(h + ffn, lp["ffn_norm"]["weight"],
                           lp["ffn_norm"]["bias"])
            return h, None

        x, _ = jax.lax.scan(layer_fn, x, lyr, unroll=L if unroll else 1)
        return x

    return encode


def measure(variant, params, ids0):
    encode = make_encode(variant)
    mask = jnp.ones((BATCH, SEQ), jnp.float32)

    @jax.jit
    def loop(params, ids0):
        def body(ids, _):
            hidden = encode(params, ids)
            pooled = jnp.sum(hidden.astype(jnp.float32), axis=1) / SEQ
            delta = (jnp.abs(pooled[:, :1]) * 0).astype(jnp.int32)
            return ids + delta, jnp.sum(pooled)
        ids, sums = jax.lax.scan(body, ids0, None, length=ITERS)
        return jnp.sum(sums)

    float(loop(params, ids0))
    f0 = jax.jit(lambda x: jnp.sum(x))
    float(f0(ids0))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f0(ids0))
    lat = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(params, ids0))
        times.append(time.perf_counter() - t0)
    net = max(min(times) - lat, 1e-9)
    sps = BATCH * ITERS / net
    # FLOP accounting: qkv+o+fc1+fc2 + attention
    gemm = 2 * BATCH * SEQ * H * (3 * H + H + I + I)
    at = 2 * 2 * BATCH * NH * SEQ * SEQ * D
    tflops = (gemm + at) * L * (BATCH * ITERS / BATCH) / net / 1e12 / ITERS * ITERS
    flops_fwd = (gemm + at) * L
    tflops = flops_fwd * (sps / BATCH) / 1e12
    return sps, tflops


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = build_params(dtype)
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), jnp.int32)
    for variant in ("sep", "fused", "fused_unroll", "fused_unroll_bf16scores"):
        sps, tf = measure(variant, params, ids0)
        print(json.dumps({"variant": variant, "sentences_per_sec": round(sps, 1),
                          "tflops": round(tf, 1)}))


if __name__ == "__main__":
    main()
