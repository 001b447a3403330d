"""Encoder ablation round 2: isolate the repo-vs-minimal gap one flag at a time.

Flags (each variant = dict):
  fused       — fuse q/k/v into one GEMM
  bias        — add a padding bias tensor to scores (repo always does)
  gelu_tanh   — tanh-approx gelu instead of exact erf gelu
  gather_pos  — position embeddings via [B,S] gather (repo) vs slice
  unroll      — unroll the layer scan
Plus a "repo" variant calling kjarni_tpu.models.bert.encode for ground truth.
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


def attn(q, k, v, bias):
    scale = 1.0 / (D ** 0.5)
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
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


def make_encode(fl):
    def encode(params, ids, mask):
        x = jnp.take(params["word"], ids, axis=0)
        if fl.get("gather_pos"):
            positions = jnp.broadcast_to(jnp.arange(SEQ)[None, :], ids.shape)
            x = x + jnp.take(params["position"], positions, axis=0)
        else:
            x = x + params["position"][None, :SEQ]
        x = x + params["token_type"][0][None, None]
        x = layer_norm(x, params["emb_norm"]["weight"], params["emb_norm"]["bias"])

        bias = None
        if fl.get("bias"):
            bias = jnp.where(mask.astype(bool), 0.0, -1e9)[:, None, None, :]

        act = (lambda y: jax.nn.gelu(y, approximate=True)) if fl.get("gelu_tanh") \
            else (lambda y: jax.nn.gelu(y, approximate=False))

        lyr = dict(params["layers"])
        if fl.get("fused"):
            lyr["qkv_w"] = jnp.concatenate(
                [lyr[n]["w"] for n in ("q", "k", "v")], axis=-1)
            lyr["qkv_b"] = jnp.concatenate(
                [lyr[n]["b"] for n in ("q", "k", "v")], axis=-1)
            for n in ("q", "k", "v"):
                lyr.pop(n)

        def layer_fn(h, lp):
            if fl.get("fused"):
                qkv = h @ lp["qkv_w"] + lp["qkv_b"]
                q, k, v = qkv[..., :H], qkv[..., H:2 * H], qkv[..., 2 * H:]
            else:
                q = h @ lp["q"]["w"] + lp["q"]["b"]
                k = h @ lp["k"]["w"] + lp["k"]["b"]
                v = h @ lp["v"]["w"] + lp["v"]["b"]
            ctx = merge_heads(attn(split_heads(q), split_heads(k),
                                   split_heads(v), bias))
            h = layer_norm(h + ctx @ lp["o"]["w"] + lp["o"]["b"],
                           lp["attn_norm"]["weight"], lp["attn_norm"]["bias"])
            ffn = act(h @ lp["fc1"]["w"] + lp["fc1"]["b"]) @ lp["fc2"]["w"] + lp["fc2"]["b"]
            h = layer_norm(h + ffn, lp["ffn_norm"]["weight"],
                           lp["ffn_norm"]["bias"])
            return h, None

        x, _ = jax.lax.scan(layer_fn, x, lyr,
                            unroll=L if fl.get("unroll") else 1)
        return x

    return encode


def measure(encode_fn, params, ids0, mask):
    @jax.jit
    def loop(params, ids0):
        def body(ids, _):
            hidden = encode_fn(params, ids, mask)
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
    return BATCH * ITERS / max(min(times) - lat, 1e-9)


def measure_repo(params, ids0, mask):
    from kjarni_tpu.models import bert as kbert
    cfg = kbert.BertConfig(
        flavor="bert", vocab_size=V, hidden_size=H, num_layers=L,
        num_heads=NH, intermediate_size=I, max_position_embeddings=512,
        type_vocab_size=2, pad_token_id=0, activation="gelu")
    rp = {
        "embeddings": {"word": params["word"], "position": params["position"],
                       "token_type": params["token_type"],
                       "norm": params["emb_norm"]},
        "layers": params["layers"], "pooler": None, "rel_bias": None,
    }
    tt = jnp.zeros((BATCH, SEQ), jnp.int32)
    enc = lambda p, ids, m: kbert.encode(p, cfg, ids, m, tt)
    return measure(enc, rp, ids0, mask)


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = build_params(dtype)
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), jnp.int32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)

    variants = [
        ("minimal_sep", {}),
        ("sep+bias", {"bias": True}),
        ("sep+bias+gatherpos", {"bias": True, "gather_pos": True}),
        ("sep+bias+gelutanh", {"bias": True, "gelu_tanh": True}),
        ("fused+bias", {"fused": True, "bias": True}),
        ("sep+bias+unroll", {"bias": True, "unroll": True}),
        ("minimal_fused", {"fused": True}),
        ("minimal_sep_unroll", {"unroll": True}),
    ]
    for name, fl in variants:
        sps = measure(make_encode(fl), params, ids0, mask)
        print(json.dumps({"variant": name, "sentences_per_sec": round(sps, 1)}))
    sps = measure_repo(params, ids0, mask)
    print(json.dumps({"variant": "repo_encode", "sentences_per_sec": round(sps, 1)}))


if __name__ == "__main__":
    main()
