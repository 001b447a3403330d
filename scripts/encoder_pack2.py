"""Encoder MFU experiment (VERDICT r2 item 7): pack two S=64 rows per cell.

Hypothesis: at S=64 the MiniLM encoder sits at ~50% MFU with the residual in
f32 score round-trips + VPU work; packing two sentences into one S=128 row
(block-diagonal attention, per-half positions, per-half pooling) halves the
number of attention/softmax row-programs per sentence. Cost: the score
matrix per packed row is 128x128 = 2x the flops of two 64x64 — the
experiment decides whether the tile-efficiency win beats the flop loss.

Method per the measurement-noise rule (memory: per-process compile
nondeterminism): A/B interleaved WITHIN one process, repeated twice.

Run (TPU): python scripts/encoder_pack2.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_minilm, _roundtrip_latency
from kjarni_tpu.models import bert as kbert
from kjarni_tpu.ops.activations import get_activation
from kjarni_tpu.ops.attention import attention, merge_heads, split_heads
from kjarni_tpu.ops.norms import layer_norm

import os

BATCH = int(os.environ.get("PACK2_BATCH", 256))
SEQ = 64
ITERS = int(os.environ.get("PACK2_ITERS", 50))
NEG_INF = -1e30


def encode_packed(params, cfg, ids2, bias, positions):
    """bert.encode variant taking explicit attention bias + position ids —
    two sentences per row, block-diagonal attention."""
    emb = params["embeddings"]
    x = jnp.take(emb["word"], ids2, axis=0)
    x = x + jnp.take(emb["position"], positions, axis=0)[None]
    if emb.get("token_type") is not None:
        x = x + emb["token_type"][0][None, None]
    x = layer_norm(x, emb["norm"]["weight"], emb["norm"]["bias"],
                   cfg.layer_norm_eps)
    act = get_activation(cfg.activation)
    H = cfg.num_heads

    def layer_fn(h, lp):
        q = h @ lp["q"]["w"] + lp["q"]["b"]
        k = h @ lp["k"]["w"] + lp["k"]["b"]
        v = h @ lp["v"]["w"] + lp["v"]["b"]
        q, k, v = split_heads(q, H), split_heads(k, H), split_heads(v, H)
        ctx = merge_heads(attention(q, k, v, bias))
        attn_out = ctx @ lp["o"]["w"] + lp["o"]["b"]
        h = layer_norm(h + attn_out, lp["attn_norm"]["weight"],
                       lp["attn_norm"]["bias"], cfg.layer_norm_eps)
        ffn = act(h @ lp["fc1"]["w"] + lp["fc1"]["b"]) @ lp["fc2"]["w"] \
            + lp["fc2"]["b"]
        h = layer_norm(h + ffn, lp["ffn_norm"]["weight"],
                       lp["ffn_norm"]["bias"], cfg.layer_norm_eps)
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x


def main():
    import ml_dtypes
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = ml_dtypes.bfloat16 if on_tpu else np.float32
    cfg, params = build_minilm(dtype)
    params = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None,
        params, is_leaf=lambda x: x is None or isinstance(x, np.ndarray))

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), jnp.int32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)
    tt = jnp.zeros((BATCH, SEQ), jnp.int32)

    # packed layout: [B/2, 2*S], block-diagonal attention, positions restart
    ids2 = ids.reshape(BATCH // 2, 2 * SEQ)
    half = np.zeros((2 * SEQ, 2 * SEQ), np.float32)
    half[:SEQ, SEQ:] = NEG_INF
    half[SEQ:, :SEQ] = NEG_INF
    bias2 = jnp.asarray(half)[None, None]
    pos2 = jnp.asarray(np.concatenate([np.arange(SEQ), np.arange(SEQ)]),
                       jnp.int32)

    @jax.jit
    def run_a(params, ids0):
        def body(i, s):
            hidden = kbert.encode(params, cfg, ids0 + (s * 0).astype(jnp.int32),
                                  mask, tt)
            return s + jnp.sum(hidden.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def run_b(params, ids0):
        def body(i, s):
            hidden = encode_packed(params, cfg,
                                   ids0 + (s * 0).astype(jnp.int32),
                                   bias2, pos2)
            return s + jnp.sum(hidden.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    # numerics check: packed == plain (same tokens, block-diag attention)
    h_plain = kbert.encode(params, cfg, ids, mask, tt)
    h_packed = encode_packed(params, cfg, ids2, bias2, pos2).reshape(
        BATCH, SEQ, -1)
    diff = float(jnp.max(jnp.abs(h_plain.astype(jnp.float32)
                                 - h_packed.astype(jnp.float32))))
    print(f"max |plain - packed| = {diff:.4f}")

    float(run_a(params, ids))
    float(run_b(params, ids2))
    lat = _roundtrip_latency()

    results = {"plain": [], "packed": []}
    for round_i in range(2):
        for name, fn, arg in (("plain", run_a, ids), ("packed", run_b, ids2)):
            t0 = time.perf_counter()
            float(fn(params, arg))
            net = time.perf_counter() - t0 - lat
            sps = BATCH * ITERS / net
            results[name].append(round(sps, 1))
            print(json.dumps({"variant": name, "round": round_i,
                              "sentences_per_sec": round(sps, 1)}))
    best = {k: max(v) for k, v in results.items()}
    print(json.dumps({"best": best,
                      "packed_vs_plain": round(best["packed"] / best["plain"],
                                               3)}))


if __name__ == "__main__":
    main()
