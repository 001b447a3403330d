"""Encoder pack-N experiment (VERDICT r3 item 8): 4 sentences per row at
short sequence lengths.

Round 3 established pack-2 at S=64 (block-diagonal attention, two sentences
per S=128 row) as the embed headline: 90,712 sentences/s. The open question
is whether short-sentence workloads (S<=32) gain another step from pack-4:
each packed row runs one attention/softmax program for N sentences (fewer
row-programs, fuller MXU tiles), but the score matrix costs N x the flops
per sentence ((N*s)^2 for N sentences vs N * s^2). Pack-2 paid that tax and
won at S=64; this script decides where the curve turns.

Variants are interleaved WITHIN one process and repeated twice (memory:
XLA compile nondeterminism makes cross-process ratios worthless), same
discipline as scripts/encoder_pack2.py.

Run (TPU): python scripts/encoder_packn.py          # S=32, packs 1/2/4
           PACKN_SEQ=64 python scripts/encoder_packn.py
           PACKN_PACKS=1,2,4,8 python scripts/encoder_packn.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_minilm, _roundtrip_latency
from kjarni_tpu.models import bert as kbert

from encoder_pack2 import encode_packed  # generic bias/positions variant

BATCH = int(os.environ.get("PACKN_BATCH", 256))
SEQ = int(os.environ.get("PACKN_SEQ", 32))
ITERS = int(os.environ.get("PACKN_ITERS", 50))
PACKS = [int(p) for p in os.environ.get("PACKN_PACKS", "1,2,4").split(",")]
NEG_INF = -1e30


def block_diag_bias(pack: int, seq: int) -> jnp.ndarray:
    """[1, 1, pack*seq, pack*seq] bias masking cross-sentence attention."""
    n = pack * seq
    b = np.full((n, n), NEG_INF, np.float32)
    for i in range(pack):
        b[i * seq:(i + 1) * seq, i * seq:(i + 1) * seq] = 0.0
    return jnp.asarray(b)[None, None]


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

    runners = {}
    for pack in PACKS:
        assert BATCH % pack == 0, (BATCH, pack)
        if pack == 1:
            @jax.jit
            def run(params, ids0, _mask=mask, _tt=tt):
                def body(i, s):
                    hidden = kbert.encode(
                        params, cfg, ids0 + (s * 0).astype(jnp.int32),
                        _mask, _tt)
                    return s + jnp.sum(hidden.astype(jnp.float32))
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
            runners[pack] = (run, ids)
            continue
        bias = block_diag_bias(pack, SEQ)
        pos = jnp.asarray(np.tile(np.arange(SEQ), pack), jnp.int32)
        idsp = ids.reshape(BATCH // pack, pack * SEQ)

        @jax.jit
        def run(params, ids0, _bias=bias, _pos=pos):
            def body(i, s):
                hidden = encode_packed(
                    params, cfg, ids0 + (s * 0).astype(jnp.int32),
                    _bias, _pos)
                return s + jnp.sum(hidden.astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        runners[pack] = (run, idsp)

    # numerics: every packed variant must equal the plain encoder
    h_plain = kbert.encode(params, cfg, ids, mask, tt)
    for pack in PACKS:
        if pack == 1:
            continue
        run, idsp = runners[pack]
        hp = encode_packed(params, cfg, idsp, block_diag_bias(pack, SEQ),
                           jnp.asarray(np.tile(np.arange(SEQ), pack),
                                       jnp.int32))
        hp = hp.reshape(BATCH, SEQ, -1)
        diff = float(jnp.max(jnp.abs(h_plain.astype(jnp.float32)
                                     - hp.astype(jnp.float32))))
        print(f"pack{pack}: max |plain - packed| = {diff:.4f}")

    for pack, (run, arg) in runners.items():
        float(run(params, arg))                      # compile
    lat = _roundtrip_latency()

    results = {p: [] for p in PACKS}
    for round_i in range(2):
        for pack, (run, arg) in runners.items():
            t0 = time.perf_counter()
            float(run(params, arg))
            net = time.perf_counter() - t0 - lat
            sps = BATCH * ITERS / net
            results[pack].append(round(sps, 1))
            print(json.dumps({"variant": f"pack{pack}", "seq": SEQ,
                              "round": round_i,
                              "sentences_per_sec": round(sps, 1)}))
    best = {f"pack{k}": max(v) for k, v in results.items()}
    base = best.get("pack1") or max(best.values())
    print(json.dumps({"seq": SEQ, "batch": BATCH, "best": best,
                      "vs_pack1": {k: round(v / base, 3)
                                   for k, v in best.items()}}))


if __name__ == "__main__":
    main()
