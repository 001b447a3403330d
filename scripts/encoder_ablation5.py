"""Encoder ablation round 5: fused Pallas encoder attention vs XLA.

Control = the production encode (tanh-gelu bf16, separate q/k/v, ~70k
sentences/s). Variant swaps the attention block for
ops/pallas/encoder_attention.py (whole-row attention in VMEM, no f32 score
round-trips to HBM). Interleaved twice for compile-nondeterminism robustness.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from encoder_ablation2 import (BATCH, SEQ, L, H, NH, I, D, build_params,
                               layer_norm, split_heads, merge_heads, measure)

import jax
import jax.numpy as jnp
import numpy as np

from kjarni_tpu.ops.pallas.encoder_attention import encoder_attention


def make_encode(fused: bool):
    def attn_xla(q, k, v, bias):
        scale = 1.0 / (D ** 0.5)
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = scores + bias.astype(scores.dtype)
        shifted = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(shifted.astype(jnp.bfloat16))
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True).astype(jnp.bfloat16)
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
            if fused:
                ctx = merge_heads(encoder_attention(
                    split_heads(q), split_heads(k), split_heads(v), mask))
            else:
                ctx = merge_heads(attn_xla(split_heads(q), split_heads(k),
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
    print("device:", jax.devices()[0].device_kind)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    params = build_params(dtype)
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), jnp.int32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)
    for trial in range(2):
        for fused in (False, True):
            sps = measure(make_encode(fused), params, ids0, mask)
            print(json.dumps({"trial": trial,
                              "variant": "fused_attn" if fused else "xla_attn",
                              "sentences_per_sec": round(sps, 1)}), flush=True)


if __name__ == "__main__":
    main()
