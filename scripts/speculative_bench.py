#!/usr/bin/env python
"""Speculative-decoding round cost on the TPU (1B target + small draft).

Random weights cannot show a real acceptance rate (a random draft never
agrees with a random target), so this measures what hardware actually
determines: the cost of one speculation round vs plain decode, from which
the breakeven acceptance follows analytically. Pieces timed (fused
R-round loops, tunnel roundtrip subtracted, same methodology as bench.py):

  plain     — target greedy scan, ms/token           (the baseline)
  round     — draft k+1-step scan + target [1,k+1] verify pass + greedy
              accept, pos advanced k+1 (full-acceptance cost; acceptance
              only changes how many of the k+1 positions are KEPT, not
              what a round costs)
  draft     — the draft scan alone (attribution)
  verify    — the target batched pass alone (attribution)

A round yields E(a) = sum_{i=0..k} a^i kept tokens at iid greedy
acceptance a, so speculation wins when ms_round / E(a) < ms_plain.
Cf. kjarni-transformers/src/cpu/decoder/speculation.rs:42 (the reference's
draft/verify loop; it publishes no numbers — this records the rebuild's).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 4          # drafted tokens per round
ROUNDS = 16    # fused rounds per timed dispatch
N_PLAIN = 64   # plain decode steps per timed dispatch
CTX = 2048
SLICE = 512    # working-slice bucket (fill stays far below it here)


def main():
    tiny = "--tiny" in sys.argv  # CPU smoke test of the bench itself

    import jax
    import jax.numpy as jnp

    from bench import build_llama_bf16_device, _roundtrip_latency
    from kjarni_tpu.models import llama as kllama

    # weights synthesize on device (bench.build_llama_bf16_device): host
    # gen + a 2.5 GB tunnel device_put previously dominated bench wall time
    if tiny:
        t_kwargs = {"vocab_size": 1024, "hidden_size": 256, "num_layers": 4,
                    "num_heads": 8, "num_kv_heads": 4, "head_dim": 32,
                    "intermediate_size": 512, "max_seq_len": 4096}
        d_kwargs = {"vocab_size": 1024, "hidden_size": 128, "num_layers": 2,
                    "num_heads": 4, "num_kv_heads": 2, "head_dim": 32,
                    "intermediate_size": 256, "max_seq_len": 4096}
    else:
        t_kwargs = {"vocab_size": 128256, "hidden_size": 2048,
                    "num_layers": 16, "num_heads": 32, "num_kv_heads": 8,
                    "head_dim": 64, "intermediate_size": 8192,
                    "max_seq_len": 4096}
        d_kwargs = {"vocab_size": 128256, "hidden_size": 1024,
                    "num_layers": 8, "num_heads": 16, "num_kv_heads": 4,
                    "head_dim": 64, "intermediate_size": 4096,
                    "max_seq_len": 4096}
    t_cfg, t_params = build_llama_bf16_device(t_kwargs, salt0=0)
    d_cfg, d_params = build_llama_bf16_device(d_kwargs, salt0=1)
    n_draft = sum(int(x.size) for x in jax.tree.leaves(d_params))
    print(f"draft params: {n_draft / 1e9:.3f}B", file=sys.stderr)

    tck, tcv = kllama.init_cache(t_cfg, 1, CTX, jnp.bfloat16)
    dck, dcv = kllama.init_cache(d_cfg, 1, CTX, jnp.bfloat16)

    def sliced(c):
        return jax.lax.slice_in_dim(c, 0, SLICE, axis=3)

    @jax.jit
    def plain_n(params, ck, cv, tok0, pos0):
        ck, cv = sliced(ck), sliced(cv)

        def body(carry, i):
            tok, ck, cv = carry
            logits, ck, cv = kllama.forward(params, t_cfg, tok[None, None],
                                            ck, cv, pos0 + i)
            return (jnp.argmax(logits[0]).astype(jnp.int32), ck, cv), ()
        (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv),
                                        jnp.arange(N_PLAIN))
        return tok

    def draft_round(params, ck, cv, cur, pos):
        def body(carry, i):
            tok, ck, cv = carry
            logits, ck, cv = kllama.forward(params, d_cfg, tok[None, None],
                                            ck, cv, pos + i)
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            return (nxt, ck, cv), nxt
        (_, ck, cv), toks = jax.lax.scan(body, (cur, ck, cv),
                                         jnp.arange(K + 1))
        return toks[:K], ck, cv

    @jax.jit
    def spec_rounds(t_params, d_params, tck, tcv, dck, dcv, cur0, pos0):
        tck, tcv = sliced(tck), sliced(tcv)
        dck, dcv = sliced(dck), sliced(dcv)

        def body(carry, r):
            cur, pos, tck, tcv, dck, dcv = carry
            drafted, dck, dcv = draft_round(d_params, dck, dcv, cur, pos)
            tokens = jnp.concatenate([cur[None], drafted])  # [k+1]
            logits, tck, tcv = kllama.forward_all_logits(
                t_params, t_cfg, tokens[None], tck, tcv, pos)
            preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            matches = preds[:K] == drafted
            n_acc = jnp.argmin(jnp.concatenate(
                [matches, jnp.array([False])]).astype(jnp.int32))
            nxt = preds[n_acc]
            # cost bench: advance the full k+1 regardless of n_acc (a real
            # loop advances n_acc+1; the ROUND cost is identical)
            return (nxt, pos + K + 1, tck, tcv, dck, dcv), n_acc
        (tok, *_), accs = jax.lax.scan(
            body, (cur0, pos0, tck, tcv, dck, dcv), jnp.arange(ROUNDS))
        return tok, accs.sum()

    @jax.jit
    def draft_rounds(d_params, dck, dcv, cur0, pos0):
        dck, dcv = sliced(dck), sliced(dcv)

        def body(carry, r):
            cur, pos, dck, dcv = carry
            drafted, dck, dcv = draft_round(d_params, dck, dcv, cur, pos)
            return (drafted[-1], pos + K + 1, dck, dcv), ()
        (tok, *_), _ = jax.lax.scan(body, (cur0, pos0, dck, dcv),
                                    jnp.arange(ROUNDS))
        return tok

    @jax.jit
    def verify_rounds(t_params, tck, tcv, cur0, pos0):
        tck, tcv = sliced(tck), sliced(tcv)

        def body(carry, r):
            cur, pos, tck, tcv = carry
            tokens = jnp.full((K + 1,), 0, jnp.int32).at[0].set(cur)
            logits, tck, tcv = kllama.forward_all_logits(
                t_params, t_cfg, tokens[None], tck, tcv, pos)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (nxt, pos + K + 1, tck, tcv), ()
        (tok, *_), _ = jax.lax.scan(body, (cur0, pos0, tck, tcv),
                                    jnp.arange(ROUNDS))
        return tok

    def timed(fn, *args, reps=3):
        int(jax.tree.leaves(fn(*args))[0])  # compile + warm
        lat = _roundtrip_latency()
        best = min(_time_one(fn, args) for _ in range(reps))
        return best - lat

    def _time_one(fn, args):
        t0 = time.perf_counter()
        out = fn(*args)
        int(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    tok0, pos0 = jnp.int32(1), jnp.int32(128)
    t_plain = timed(plain_n, t_params, tck, tcv, tok0, pos0) / N_PLAIN
    t_round = timed(spec_rounds, t_params, d_params, tck, tcv, dck, dcv,
                    tok0, pos0) / ROUNDS
    t_draft = timed(draft_rounds, d_params, dck, dcv, tok0, pos0) / ROUNDS
    t_verify = timed(verify_rounds, t_params, tck, tcv, tok0, pos0) / ROUNDS

    def expected_tokens(a):
        return sum(a ** i for i in range(K + 1))

    # breakeven: smallest acceptance where ms_round / E(a) < ms_plain
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if t_round / expected_tokens(mid) < t_plain:
            hi = mid
        else:
            lo = mid
    breakeven = hi
    speedup_at = {a: round(t_plain * expected_tokens(a) / t_round, 2)
                  for a in (0.5, 0.7, 0.8, 0.9, 1.0)}
    print(json.dumps({
        "k": K, "target": "llama-1B bf16", "draft_params_b": round(n_draft / 1e9, 3),
        "plain_ms_per_tok": round(t_plain * 1e3, 2),
        "round_ms": round(t_round * 1e3, 2),
        "draft_scan_ms": round(t_draft * 1e3, 2),
        "verify_pass_ms": round(t_verify * 1e3, 2),
        "breakeven_acceptance": round(breakeven, 3),
        "speedup_at_acceptance": speedup_at,
    }))


if __name__ == "__main__":
    main()
