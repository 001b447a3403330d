"""8B-geometry tensor-parallel decode cost analysis on a virtual mesh.

VERDICT r2 item 10: real multi-chip hardware is unavailable, so record
XLA's own cost model for the tp=1/2/4/8 sharded single-token decode step at
Llama-3.1-8B geometry — bytes accessed and FLOPs per step per chip — and
derive where tp stops paying at B=1 against the measured single-chip numbers
(BASELINE.md: 12.7 ms/token int8 at 1B).

Compiles against abstract ShapeDtypeStructs (no 8B of host RAM needed).

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/tp_cost_analysis.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kjarni_tpu.models import llama as kllama
from kjarni_tpu.parallel.mesh import (cache_sharding, llama_param_sharding,
                                      make_mesh, _match_structure)

# Llama-3.1-8B geometry
CFG = kllama.DecoderConfig(
    arch="llama", vocab_size=128256, hidden_size=4096, num_layers=32,
    num_heads=32, num_kv_heads=8, head_dim=128, intermediate_size=14336,
    max_seq_len=4096, rope_theta=500000.0)

CTX = 4096          # cache length the decode step attends over
DTYPE = jnp.bfloat16

# v5e roofline constants for the derived model
HBM_GBPS = 819.0    # per chip
ICI_GBPS = 45.0     # per link direction (2D torus, v5e)


def param_shapes(cfg):
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hid, inter, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    f = lambda *s: jax.ShapeDtypeStruct(s, DTYPE)
    return {
        "embed": f(V, hid),
        "layers": {
            "q": {"w": f(L, hid, H * D)},
            "k": {"w": f(L, hid, Hkv * D)},
            "v": {"w": f(L, hid, Hkv * D)},
            "o": {"w": f(L, H * D, hid)},
            "gate": {"w": f(L, hid, inter)},
            "up": {"w": f(L, hid, inter)},
            "down": {"w": f(L, inter, hid)},
            "attn_norm": f(L, hid), "ffn_norm": f(L, hid),
        },
        "final_norm": f(hid),
        "lm_head": f(hid, V),
        "rope_cos": jax.ShapeDtypeStruct((cfg.max_seq_len, D), jnp.float32),
        "rope_sin": jax.ShapeDtypeStruct((cfg.max_seq_len, D), jnp.float32),
    }


def analyze(tp: int) -> dict:
    mesh = make_mesh(tp, dp=1, tp=tp)
    params = param_shapes(CFG)
    psh = _match_structure(params, llama_param_sharding(mesh), mesh)
    params = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params, psh)
    cs = cache_sharding(mesh)
    cshape = (CFG.num_layers, 1, CFG.num_kv_heads, CTX, CFG.head_dim)
    ck = jax.ShapeDtypeStruct(cshape, DTYPE, sharding=cs)
    cv = jax.ShapeDtypeStruct(cshape, DTYPE, sharding=cs)
    rep = NamedSharding(mesh, P())
    tok = jax.ShapeDtypeStruct((1, 1), jnp.int32, sharding=rep)

    def step(p, t, a, b):
        return kllama.forward(p, CFG, t, a, b, jnp.int32(CTX - 1))

    compiled = jax.jit(step).lower(params, tok, ck, cv).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "tp": tp,
        "flops": ca.get("flops", 0.0),
        "bytes": ca.get("bytes accessed", 0.0),
    }


def main():
    rows = []
    for tp in (1, 2, 4, 8):
        r = analyze(tp)
        # derived per-chip times at the roofline
        hbm_ms = r["bytes"] / 1e9 / HBM_GBPS * 1e3
        rows.append({**r, "hbm_ms_roofline": round(hbm_ms, 3)})
        print(json.dumps(rows[-1]))

    base = rows[0]
    print("\n| tp | GFLOP/step | GB accessed/chip | HBM-roofline ms/tok | "
          "speedup vs tp=1 |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['tp']} | {r['flops']/1e9:.2f} | {r['bytes']/1e9:.3f} | "
              f"{r['hbm_ms_roofline']:.3f} | "
              f"{base['hbm_ms_roofline']/r['hbm_ms_roofline']:.2f}x |")


if __name__ == "__main__":
    main()
