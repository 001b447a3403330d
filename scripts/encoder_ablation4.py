"""Encoder ablation round 4: residual levers on top of tanh-gelu.

Variants (all tanh-gelu, separate q/k/v, padding bias):
  control        — ablation3's winner (~70k)
  bf16_scores    — QK^T accumulates in bf16 (halves score-matrix HBM traffic)
  f32_probs      — keep probabilities f32 (round-1 default for f32 inputs)
  dpa            — jax.nn.dot_product_attention (XLA fused attention path)
  nobias         — drop the padding-bias add (upper bound; prod needs masks)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from encoder_ablation2 import (BATCH, SEQ, L, H, NH, I, D, build_params,
                               layer_norm, split_heads, merge_heads, measure)

import jax
import jax.numpy as jnp
import numpy as np


def make_encode(attn_mode):
    def attn(q, k, v, bias):
        scale = 1.0 / (D ** 0.5)
        if attn_mode == "dpa":
            # dpa takes [B, S, H, D]
            return jax.nn.dot_product_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
        pet = jnp.bfloat16 if attn_mode == "bf16_scores" else jnp.float32
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=pet) * scale
        if bias is not None and attn_mode != "nobias":
            scores = scores + bias.astype(scores.dtype)
        shifted = scores - jnp.max(scores, axis=-1, keepdims=True)
        pdt = jnp.float32 if attn_mode == "f32_probs" else jnp.bfloat16
        probs = jnp.exp(shifted.astype(pdt))
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True).astype(pdt)
        return jnp.einsum("bhst,bhtd->bhsd", probs.astype(q.dtype), v)

    def encode(params, ids, mask):
        x = jnp.take(params["word"], ids, axis=0)
        x = x + params["position"][None, :SEQ]
        x = x + params["token_type"][0][None, None]
        x = layer_norm(x, params["emb_norm"]["weight"], params["emb_norm"]["bias"])
        bias = jnp.where(mask.astype(bool), 0.0, -1e9)[:, None, None, :]

        def layer_fn(h, lp):
            q = h @ lp["q"]["w"] + lp["q"]["b"]
            k = h @ lp["k"]["w"] + lp["k"]["b"]
            v = h @ lp["v"]["w"] + lp["v"]["b"]
            ctx = merge_heads(attn(split_heads(q), split_heads(k),
                                   split_heads(v), bias))
            h = layer_norm(h + ctx @ lp["o"]["w"] + lp["o"]["b"],
                           lp["attn_norm"]["weight"], lp["attn_norm"]["bias"])
            ffn = jax.nn.gelu(h @ lp["fc1"]["w"] + lp["fc1"]["b"],
                              approximate=True) @ lp["fc2"]["w"] + lp["fc2"]["b"]
            h = layer_norm(h + ffn, lp["ffn_norm"]["weight"],
                           lp["ffn_norm"]["bias"])
            return h, None

        x, _ = jax.lax.scan(layer_fn, x, params["layers"])
        return x

    return encode


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    print("device:", jax.devices()[0].device_kind)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = build_params(dtype)
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), jnp.int32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)
    for trial in range(2):
        for mode in ("control", "bf16_scores", "f32_probs", "dpa", "nobias"):
            try:
                sps = measure(make_encode(mode), params, ids0, mask)
            except Exception as e:
                print(json.dumps({"variant": mode, "error": str(e)[:120]}),
                      flush=True)
                continue
            print(json.dumps({"trial": trial, "variant": mode,
                              "sentences_per_sec": round(sps, 1)}), flush=True)


if __name__ == "__main__":
    main()
