"""Greedy-argmax formulation microbench (round-5 decode-residual follow-up).

BASELINE.md round-5 decode ablation itemized the 1B int8 decode residual:
the 128k-vocab f32 argmax in the greedy sampling chain costs ~0.098 ms/tok
(5.1% of the 1.909 ms step). Hypothesis: XLA lowers jnp.argmax to a variadic
(value, index)-pair reduction that vectorizes poorly on the VPU; the same
result is computable with two trivial reductions that vectorize perfectly:

  m   = max(logits)                      # plain f32 max-reduce
  idx = min(where(logits == m, iota, V)) # plain int32 min-reduce

Tie-breaking is identical to jnp.argmax (first occurrence): among the
positions achieving the max, the minimum index wins. Bit-exact, no parity
risk (tested in tests/test_sampling.py::test_fast_argmax_*).

Methodology = bench.py decode benches: fused N-step fori_loop per dispatch
(data dependence threaded through the carry so steps can't collapse),
min of R timed passes after a warm pass, tunnel roundtrip amortized by N.

Run: python scripts/argmax_bench.py            (defaults V=128256, N=256)
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

V = 128256
N = 256          # argmax evaluations per dispatch
R = 5            # timed repeats, min taken


def two_pass_argmax(x):
    m = jnp.max(x)
    idx = jnp.where(x == m, jnp.arange(x.shape[0], dtype=jnp.int32),
                    jnp.int32(x.shape[0]))
    return jnp.min(idx)


def make_loop(fn):
    # perturb one lane per step with the previous result so the reduction
    # is re-evaluated N times (carry dependence), like the decode loop does
    def body(i, carry):
        x, acc = carry
        x = x.at[acc % V].add(1e-6)
        t = fn(x).astype(jnp.int32)
        return (x, acc + t)

    @jax.jit
    def run(x):
        x, acc = jax.lax.fori_loop(0, N, body, (x, jnp.int32(0)))
        return acc

    return run


def time_variant(name, fn, x):
    run = make_loop(fn)
    run(x).block_until_ready()                     # compile + warm
    best = float("inf")
    for _ in range(R):
        t0 = time.perf_counter()
        run(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / N)
    print(json.dumps({"variant": name, "us_per_argmax": round(best * 1e6, 2),
                      "V": V, "N": N}))
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (V,), dtype=jnp.float32)

    variants = {
        "jnp_argmax": lambda v: jnp.argmax(v),
        "two_pass_max_minidx": two_pass_argmax,
        # blocked: reduce [V] as [1002, 128] rows then across — probes
        # whether shaping helps XLA's variadic reduce
        "blocked_argmax": lambda v: jnp.argmax(v),  # placeholder replaced below
    }

    def blocked(v):
        pad = (-v.shape[0]) % 128
        vv = jnp.pad(v, (0, pad), constant_values=-jnp.inf).reshape(-1, 128)
        row_max = jnp.max(vv, axis=1)          # [rows]
        r = jnp.argmax(row_max)
        c = jnp.argmax(vv[r])
        return (r * 128 + c).astype(jnp.int32)

    variants["blocked_argmax"] = blocked

    # correctness gate before timing
    for name, fn in variants.items():
        got = int(jax.jit(fn)(x))
        ref = int(jnp.argmax(x))
        assert got == ref, f"{name}: {got} != {ref}"

    results = {name: time_variant(name, fn, x)
               for name, fn in variants.items()}
    base = results["jnp_argmax"]
    best = min(results, key=results.get)
    print(json.dumps({"winner": best,
                      "speedup_vs_jnp_argmax":
                          round(base / results[best], 3)}))


if __name__ == "__main__":
    main()
