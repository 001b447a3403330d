"""Encoder ablation round 3: repeated interleaved trials on a quiet box.

Resolves the round-1/2 discrepancy (same config measured 47k and 69k in
different processes) by interleaving variants twice within one process.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from encoder_ablation2 import (BATCH, SEQ, build_params, make_encode, measure,
                               measure_repo)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = build_params(dtype)
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), jnp.int32)
    mask = jnp.ones((BATCH, SEQ), jnp.int32)

    variants = [
        ("sep_erf", {"bias": True}),
        ("sep_tanh", {"bias": True, "gelu_tanh": True}),
        ("fused_tanh", {"bias": True, "gelu_tanh": True, "fused": True}),
        ("sep_tanh_unroll", {"bias": True, "gelu_tanh": True, "unroll": True}),
    ]
    for trial in range(2):
        for name, fl in variants:
            sps = measure(make_encode(fl), params, ids0, mask)
            print(json.dumps({"trial": trial, "variant": name,
                              "sentences_per_sec": round(sps, 1)}), flush=True)
    sps = measure_repo(params, ids0, mask)
    print(json.dumps({"variant": "repo_encode_current",
                      "sentences_per_sec": round(sps, 1)}), flush=True)


if __name__ == "__main__":
    main()
