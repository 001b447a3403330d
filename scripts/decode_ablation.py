#!/usr/bin/env python
"""Per-op itemization of the 1B int8 decode step (VERDICT r4 item 3).

bench.py --metric decode-int8 measures ~2.0 ms/step (499.9 tok/s, round 4)
while the pure int8 weight stream (~1.24 GB incl. the 262 MB lm_head) at
v5e HBM would be ~1.5 ms — the fixed ~0.4-0.5 ms residual is amortized at
8B but dominant-margin at 1B. This script decomposes it the way
encoder_ablation*.py does for the encoder: ablated step variants, each a
fused 64-step scan, min of 3, tunnel roundtrip subtracted. Deltas are
approximate (removing an op changes fusion) but bound each component.

Variants:
  full           the bench step (forward + argmax), kb=512 working slice
  inplace        fori_loop over layers, donated cache updated at ONE
                 position per layer (no lax.scan ys restack): tests whether
                 the scan's full working-slice REWRITE per step is real
                 traffic the roofline must carry
  no_lm_head     stop at final hidden (argmax over hidden keeps the data
                 dependency): isolates the 262 MB int8 lm_head + 128k argmax
  no_kv_read     attend only the fresh token's K/V (no cache read, no
                 restack): isolates ALL KV traffic
  no_ffn         skip gate/up/down: isolates the 805 MB FFN weight stream
  no_rope        skip the rotary application + table gathers
  no_norms       skip rms_norm (attn/ffn/final): bounds VPU norm cost
  product        the DecoderLM fused-loop step shape: + history scatter,
                 + stop-token check, + penalty chain (pen=1.0 traced no-op)
                 — what serving actually pays per token vs the bench step
  matmuls_only   qkvo+ffn+lm_head chain with attention/rope/norms removed:
                 the chip's actual streaming ceiling for these weight shapes
  no_argmax      full step but the readback token is a cheap hidden-state
                 reduction: isolates the 128k-vocab argmax

Run on the real TPU (no JAX_PLATFORMS override). ~10-15 min (one remote
compile per variant).
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (device-synth builders + roundtrip helper)

N = 64
KB = 512
POS0 = 256

GEOM_1B = {"vocab_size": 128256, "hidden_size": 2048, "num_layers": 16,
           "num_heads": 32, "num_kv_heads": 8, "head_dim": 64,
           "intermediate_size": 8192, "max_seq_len": 2048}


def build():
    cfg, params = bench.build_llama_int8_device(GEOM_1B)
    return cfg, params


def make_variant(cfg, mode):
    """One fused N-step decode scan with the given ablation."""
    import jax
    import jax.numpy as jnp
    from kjarni_tpu.models.llama import (NEG_INF, _mm, apply_rope, attention,
                                         merge_heads, rms_norm)

    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    def norm(x, w):
        if mode == "no_norms":
            return x
        return rms_norm(x, w, eps)

    def step_body(params, tok, ck, cv, pos):
        """One decode step over the kb-wide working slices (S=1, B=1).
        Mirrors llama._run_stack's layer math with ablation switches."""
        if mode == "matmuls_only":
            # pure weight-stream chain: same matmul shapes, no attention,
            # no rope, no norms — the streaming ceiling for this geometry
            x = jnp.take(params["embed"], tok[None, None], axis=0)

            def layer_mm(h, xs):
                lp, kc, vc = xs
                q = _mm(h, lp["q"])                 # [1, 1, H*D]
                k = _mm(h, lp["k"])                 # [1, 1, Hkv*D]
                v = _mm(h, lp["v"])
                # q IS the o-proj input; fold k/v in so their streams stay
                ctx = q + jnp.tile(k + v, (1, 1, H // Hkv))
                h = h + _mm(ctx, lp["o"])
                h = h + _mm(jax.nn.silu(_mm(h, lp["gate"])) * _mm(h, lp["up"]),
                            lp["down"])
                return h, (kc, vc)

            x, (ck, cv) = jax.lax.scan(layer_mm, x,
                                       (params["layers"], ck, cv))
            logits = _mm(x[0, -1:], params["lm_head"])[0]
            return jnp.argmax(logits).astype(jnp.int32), ck, cv
        x = jnp.take(params["embed"], tok[None, None], axis=0)
        if mode == "no_rope":
            cos = sin = None
        else:
            cos = jnp.take(params["rope_cos"], pos[None], axis=0)
            sin = jnp.take(params["rope_sin"], pos[None], axis=0)
        T = KB
        kj = jnp.arange(T)[None, :]
        bias = jnp.where(kj <= pos, 0.0, NEG_INF)[None, None, :, :]

        def layer(h, xs):
            lp, kc, vc = xs
            hn = norm(h, lp["attn_norm"])
            q = _mm(hn, lp["q"]).reshape(1, 1, H, D).transpose(0, 2, 1, 3)
            k = _mm(hn, lp["k"]).reshape(1, 1, Hkv, D).transpose(0, 2, 1, 3)
            v = _mm(hn, lp["v"]).reshape(1, 1, Hkv, D).transpose(0, 2, 1, 3)
            if mode != "no_rope":
                q, k = apply_rope(q, k, cos, sin, jnp.arange(1))
            if mode == "no_kv_read":
                # attend only the fresh token (cache untouched: no read, no
                # restack) — everything the KV subsystem costs is gone
                ctx = merge_heads(attention(q, k, v,
                                            jnp.zeros((1, 1, 1, 1))))
            else:
                kc = jax.lax.dynamic_update_slice(
                    kc, k.astype(kc.dtype), (0, 0, pos, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v.astype(vc.dtype), (0, 0, pos, 0))
                ctx = merge_heads(attention(q, kc, vc, bias))
            h = h + _mm(ctx, lp["o"])
            if mode != "no_ffn":
                hn = norm(h, lp["ffn_norm"])
                h = h + _mm(jax.nn.silu(_mm(hn, lp["gate"])) * _mm(hn, lp["up"]),
                            lp["down"])
            return h, (kc, vc)

        x, (ck, cv) = jax.lax.scan(layer, x, (params["layers"], ck, cv))
        x = norm(x, params["final_norm"])
        if mode == "no_lm_head":
            # keep a full-tensor data dependency without the 262 MB matmul
            return jnp.argmax(x[0, 0]).astype(jnp.int32) % 1000, ck, cv
        logits = _mm(x[0, -1:], params["lm_head"])[0]
        if mode == "no_argmax":
            # dependency on every logit without the 128k-vocab reduction sort
            return (jnp.sum(logits).astype(jnp.float32) * 0
                    ).astype(jnp.int32) + 1, ck, cv
        if mode == "fast_argmax":
            # the shipped two-reduction formulation (sampling.fast_argmax):
            # same-session A/B vs full's jnp.argmax in the identical step
            from kjarni_tpu.generate.sampling import fast_argmax
            return fast_argmax(logits), ck, cv
        return jnp.argmax(logits).astype(jnp.int32), ck, cv

    def step_inplace(params, tok, ck, cv, pos):
        """fori_loop over layers with the FULL [L, ...] working cache as a
        donated carry updated at one (layer, position) per iteration: the
        attention READ stays (each layer reads its kb slice) but the scan's
        per-step full restack WRITE disappears if XLA aliases the loop
        carry in place."""
        import jax.numpy as jnp
        x = jnp.take(params["embed"], tok[None, None], axis=0)
        cos = jnp.take(params["rope_cos"], pos[None], axis=0)
        sin = jnp.take(params["rope_sin"], pos[None], axis=0)
        T = KB
        kj = jnp.arange(T)[None, :]
        bias = jnp.where(kj <= pos, 0.0, NEG_INF)[None, None, :, :]
        lp_all = params["layers"]

        def body(l, state):
            x, ck, cv = state
            lp = jax.tree.map(lambda a: a[l], lp_all)
            hn = rms_norm(x, lp["attn_norm"], eps)
            q = _mm(hn, lp["q"]).reshape(1, 1, H, D).transpose(0, 2, 1, 3)
            k = _mm(hn, lp["k"]).reshape(1, 1, Hkv, D).transpose(0, 2, 1, 3)
            v = _mm(hn, lp["v"]).reshape(1, 1, Hkv, D).transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin, jnp.arange(1))
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype)[None], (l, 0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype)[None], (l, 0, 0, pos, 0))
            kc = jax.lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
            ctx = merge_heads(attention(q, kc, vc, bias))
            x = x + _mm(ctx, lp["o"])
            hn = rms_norm(x, lp["ffn_norm"], eps)
            x = x + _mm(jax.nn.silu(_mm(hn, lp["gate"])) * _mm(hn, lp["up"]),
                        lp["down"])
            return x, ck, cv

        x, ck, cv = jax.lax.fori_loop(0, cfg.num_layers, body, (x, ck, cv))
        x = rms_norm(x, params["final_norm"], eps)
        logits = _mm(x[0, -1:], params["lm_head"])[0]
        return jnp.argmax(logits).astype(jnp.int32), ck, cv

    if mode == "inplace":
        body_fn = step_inplace
    else:
        body_fn = step_body

    if mode == "product":
        from kjarni_tpu.generate.sampling import apply_repetition_penalty

        @jax.jit
        def decode_n(params, ck, cv, tok0, pos0, history, rng):
            full_ck, full_cv = ck, cv
            ck = jax.lax.slice_in_dim(ck, 0, KB, axis=3)
            cv = jax.lax.slice_in_dim(cv, 0, KB, axis=3)
            stop_ids = jnp.asarray([2], jnp.int32)

            def body(carry, i):
                tok, ck, cv, history, rng, done = carry
                nxt, ck2, cv2 = step_body(params, tok, ck, cv, pos0 + i)
                # penalty chain over the rolling history (pen=1.0 = no-op
                # but the gather/compare/scatter ops all execute)
                # re-create a [V]-sized logits proxy with a dependency on nxt
                logits = jnp.zeros((GEOM_1B["vocab_size"],),
                                   jnp.float32).at[nxt].set(1.0)
                valid = jnp.arange(history.shape[0]) < (pos0 + i)
                logits = apply_repetition_penalty(logits, history, valid,
                                                  jnp.float32(1.0))
                tok_new = jnp.argmax(logits).astype(jnp.int32)
                history = history.at[pos0 + i].set(tok_new)
                done = done | jnp.any(tok_new == stop_ids)
                return (tok_new, ck2, cv2, history, rng, done), ()

            (tok, ck, cv, history, rng, done), _ = jax.lax.scan(
                body, (tok0, ck, cv, history, rng, jnp.bool_(False)),
                jnp.arange(N))
            ck = jax.lax.dynamic_update_slice(full_ck, ck, (0,) * 5)
            cv = jax.lax.dynamic_update_slice(full_cv, cv, (0,) * 5)
            return tok, ck, cv

        return decode_n

    @jax.jit
    def decode_n(params, ck, cv, tok0, pos0):
        full_ck, full_cv = ck, cv
        if mode != "no_kv_read":
            ck = jax.lax.slice_in_dim(ck, 0, KB, axis=3)
            cv = jax.lax.slice_in_dim(cv, 0, KB, axis=3)

        def body(carry, i):
            tok, ck, cv = carry
            nxt, ck, cv = body_fn(params, tok, ck, cv, pos0 + i)
            return (nxt, ck, cv), ()

        (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv), jnp.arange(N))
        if mode != "no_kv_read":
            ck = jax.lax.dynamic_update_slice(full_ck, ck, (0,) * 5)
            cv = jax.lax.dynamic_update_slice(full_cv, cv, (0,) * 5)
        return tok, ck, cv

    return decode_n


def time_variant(name, fn, params, cfg, extra=()):
    import jax
    import jax.numpy as jnp
    from kjarni_tpu.models import llama as kllama

    ck, cv = kllama.init_cache(cfg, 1, 2048, jnp.bfloat16)
    args = (params, ck, cv, jnp.int32(1), jnp.int32(POS0)) + extra
    tok, ck, cv = fn(*args)
    int(tok)                      # compile + warm
    lat = bench._roundtrip_latency()
    times = []
    for _ in range(3):
        args = (params, ck, cv, jnp.int32(1), jnp.int32(POS0)) + extra
        t0 = time.perf_counter()
        tok, ck, cv = fn(*args)
        int(tok)
        times.append(time.perf_counter() - t0)
    ms = (min(times) - lat) / N * 1000.0
    return ms


def main():
    import jax
    import jax.numpy as jnp

    global GEOM_1B, N
    if "--tiny" in sys.argv:     # CPU smoke test of every variant
        # sitecustomize pins the axon TPU platform; the smoke test must not
        # queue behind whatever holds the single real chip
        jax.config.update("jax_platforms", "cpu")
        GEOM_1B = {"vocab_size": 512, "hidden_size": 64, "num_layers": 2,
                   "num_heads": 4, "num_kv_heads": 2, "head_dim": 16,
                   "intermediate_size": 128, "max_seq_len": 2048}
        N = 4
    cfg, params = build()
    results = {}
    order = ["full", "matmuls_only", "no_argmax", "fast_argmax", "inplace",
             "no_lm_head", "no_kv_read", "no_ffn", "no_rope", "no_norms",
             "product"]
    if "--argmax-ab" in sys.argv:   # focused A/B: alternate the two argmax
        order = ["full", "fast_argmax", "no_argmax"]
    for mode in order:
        fn = make_variant(cfg, mode)
        extra = ()
        if mode == "product":
            extra = (jnp.zeros(2048, jnp.int32), jax.random.PRNGKey(0))
        ms = time_variant(mode, fn, params, cfg, extra)
        results[mode] = ms
        delta = ms - results.get("full", ms)
        print(json.dumps({"variant": mode, "ms_per_tok": round(ms, 3),
                          "tok_per_sec": round(1000.0 / ms, 1),
                          "delta_vs_full_ms": round(delta, 3)}),
              flush=True)
    full = results["full"]
    if "--argmax-ab" in sys.argv:
        print(json.dumps({"summary": {
            "full_jnp_argmax_ms": round(full, 3),
            "fast_argmax_ms": round(results["fast_argmax"], 3),
            "no_argmax_ms": round(results["no_argmax"], 3),
            "fast_vs_jnp_ms": round(results["fast_argmax"] - full, 3),
        }}), flush=True)
        return
    print(json.dumps({
        "summary": {
            "full_ms": round(full, 3),
            "lm_head_ms": round(full - results["no_lm_head"], 3),
            "kv_total_ms": round(full - results["no_kv_read"], 3),
            "ffn_ms": round(full - results["no_ffn"], 3),
            "rope_ms": round(full - results["no_rope"], 3),
            "norms_ms": round(full - results["no_norms"], 3),
            "restack_write_ms": round(full - results["inplace"], 3),
            "product_overhead_ms": round(results["product"] - full, 3),
            "argmax_ms": round(full - results["no_argmax"], 3),
            "attn_rope_norm_overhead_ms": round(
                full - results["matmuls_only"], 3),
        }}), flush=True)


if __name__ == "__main__":
    main()
