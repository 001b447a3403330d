"""Pick the int4 matvec formulation (VERDICT r2 item 4 follow-up).

The first packed-int4 1B decode measured 48.8 tok/s vs int8's 465 — the
group-wise einsum ("...Gg,Ggn->...Gn") splits the S=1 decode matvec into
K/g tiny dots that can't tile the MXU. Candidates, measured head-to-head at
llama-1B gate/up geometry (K=2048, N=8192, B=1):

  bf16      : x @ w_bf16                      (2 B/weight HBM)
  int8      : (x @ w_i8) * scale              (1 B/weight, convert fused)
  int4-group: current grouped einsum          (0.5 B/weight, tiny dots)
  int4-deq  : x @ (unpack(w4) * scale_rows)   (0.5 B/weight, ONE dot with
              the shift/and/mul chain in the dot's operand producer — wins
              iff XLA fuses the dequant into the matmul read stream)

A/B interleaved within one process, twice (memory: per-process compile
nondeterminism). Run on TPU: python scripts/int4_formulation_bench.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

K, N, GROUP = 2048, 8192, 128
ITERS = 5000


def main():
    rng = np.random.default_rng(0)
    w32 = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

    w_bf16 = jnp.asarray(w32, jnp.bfloat16)

    # int8 per-channel
    s8 = np.abs(w32).max(axis=0) / 127.0
    q8 = np.clip(np.round(w32 / s8), -127, 127).astype(np.int8)
    w_i8, s_i8 = jnp.asarray(q8), jnp.asarray(s8.astype(np.float32))

    # int4 group-wise packed
    G = K // GROUP
    wg = w32.reshape(G, GROUP, N)
    s4 = np.abs(wg).max(axis=1) / 7.0                       # [G, N]
    q4 = np.clip(np.round(wg / s4[:, None, :]), -8, 7).reshape(K, N)
    q4 = q4.astype(np.int8)
    lo = (q4[0::2] & 0xF).astype(np.uint8)
    hi = (q4[1::2] & 0xF).astype(np.uint8)
    w4 = jnp.asarray(((hi << 4) | lo).view(np.int8))        # [K/2, N]
    s4j = jnp.asarray(s4.astype(np.float32))

    def unpack(w4):
        lo = jnp.left_shift(w4, 4) >> 4
        hi = w4 >> 4
        return jnp.stack([lo, hi], axis=1).reshape(K, N)

    def mm_bf16(x, w_bf16):
        return x @ w_bf16

    def mm_int8(x, w_i8, s_i8):
        return (x @ w_i8.astype(x.dtype)) * s_i8.astype(x.dtype)

    def mm_int4_group(x, w4, s4j):
        w = unpack(w4).astype(x.dtype).reshape(G, GROUP, N)
        xg = x.reshape(G, GROUP)
        partial = jnp.einsum("Gg,Ggn->Gn", xg, w)
        return jnp.einsum("Gn,Gn->n", partial, s4j.astype(x.dtype))[None]

    def mm_int4_deq(x, w4, s4j):
        w = unpack(w4).astype(x.dtype)
        scale_rows = jnp.repeat(s4j, GROUP, axis=0).astype(x.dtype)  # [K, N]
        return x @ (w * scale_rows)

    def mm_int4_deq_nodup(x, w4, s4j):
        # scale applied via reshape (no [K, N] repeat materialization)
        w = unpack(w4).astype(x.dtype).reshape(G, GROUP, N)
        w = (w * s4j[:, None, :].astype(x.dtype)).reshape(K, N)
        return x @ w

    def mm_int4_halves(x, w4h, s4j):
        # half-split packing: low nibble = rows 0..K/2, high = rows K/2..K.
        # No interleave/stack/reshape between unpack and dot — two clean
        # elementwise chains feeding two dots (the int8-convert fusion shape)
        lo = (jnp.left_shift(w4h, 4) >> 4).astype(x.dtype)
        hi = (w4h >> 4).astype(x.dtype)
        w_lo = (lo.reshape(G // 2, GROUP, N)
                * s4j[: G // 2, None, :].astype(x.dtype)).reshape(K // 2, N)
        w_hi = (hi.reshape(G // 2, GROUP, N)
                * s4j[G // 2:, None, :].astype(x.dtype)).reshape(K // 2, N)
        return x[:, : K // 2] @ w_lo + x[:, K // 2:] @ w_hi

    def mm_int4_pallas(x, w4h, s4j):
        from kjarni_tpu.ops.pallas.int4_matvec import int4_matvec
        return int4_matvec(x, w4h, s4j)

    def mm_int4_halves_noscale(x, w4h, s_col):
        # isolate the dequant-mul: per-column scale applied AFTER the dot —
        # only the nibble shifts ride the operand chain
        lo = (jnp.left_shift(w4h, 4) >> 4).astype(x.dtype)
        hi = (w4h >> 4).astype(x.dtype)
        y = x[:, : K // 2] @ lo + x[:, K // 2:] @ hi
        return y * s_col.astype(x.dtype)

    # NOTE: weights are ARGUMENTS, never closures — closed-over arrays bake
    # into the HLO as giant constants, which wedges the remote compiler (a
    # zero-output 50-min hang, observed 2026-08-17).
    # half-split packing (lo = rows [:K/2], hi = rows [K/2:])
    w4h = jnp.asarray((((q4[K // 2:] & 0xF).astype(np.uint8) << 4)
                       | (q4[: K // 2] & 0xF).astype(np.uint8)).view(np.int8))
    s_col = jnp.asarray(np.ones(N, np.float32))  # noscale probe only

    variants = {"bf16": (mm_bf16, (w_bf16,)),
                "int8": (mm_int8, (w_i8, s_i8)),
                "int4_group": (mm_int4_group, (w4, s4j)),
                "int4_deq": (mm_int4_deq, (w4, s4j)),
                "int4_deq_nodup": (mm_int4_deq_nodup, (w4, s4j)),
                "int4_halves": (mm_int4_halves, (w4h, s4j)),
                "int4_pallas": (mm_int4_pallas, (w4h, s4j)),
                "int4_halves_noscale": (mm_int4_halves_noscale,
                                        (w4h, s_col))}

    # correctness vs f32 reference first
    ref = (np.asarray(x, np.float32) @ w32).ravel()
    for name, (fn, args) in variants.items():
        got = np.asarray(jax.jit(fn)(x, *args), np.float32).ravel()
        cos = ref @ got / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9)
        print(json.dumps({"variant": name,
                          "cosine_vs_f32": round(float(cos), 5)}))

    loops = {}
    for name, (fn, args) in variants.items():
        @jax.jit
        def loop(x, args, fn=fn):
            def body(c, _):
                y = fn(c, *args)
                # data dependency: fold output back into the [1, K] carry
                return (c + (jnp.sum(y) * 0).astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(c)
        float(loop(x, args))          # compile
        loops[name] = (loop, args)

    probe = jax.jit(lambda v: jnp.sum(v))
    float(probe(x))
    t0 = time.perf_counter()
    for _ in range(3):
        float(probe(x))
    lat = (time.perf_counter() - t0) / 3

    results = {n: [] for n in variants}
    for round_i in range(2):
        for name, (loop, args) in loops.items():
            t0 = time.perf_counter()
            float(loop(x, args))
            net = time.perf_counter() - t0 - lat
            us = net / ITERS * 1e6
            results[name].append(us)
            print(json.dumps({"variant": name, "round": round_i,
                              "us_per_matvec": round(us, 1)}))
    bytes_per = {"bf16": 2.0, "int8": 1.0, "int4_group": 0.5,
                 "int4_deq": 0.5, "int4_deq_nodup": 0.5,
                 "int4_halves": 0.5, "int4_pallas": 0.5,
                 "int4_halves_noscale": 0.5}
    summary = {}
    for name, times in results.items():
        best = min(times)
        gbps = K * N * bytes_per[name] / (best / 1e6) / 1e9
        summary[name] = {"us": round(best, 1),
                         "effective_weight_gbps": round(gbps, 1)}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
