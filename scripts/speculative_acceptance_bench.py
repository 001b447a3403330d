#!/usr/bin/env python
"""Speculative decoding with a MEASURED acceptance rate (not an analytic curve).

VERDICT r4 weak item 7: random draft + random target can never agree, so the
round-4 speculative numbers were cost decompositions plus the E(a) curve —
"curves, not measurements". This bench removes the curve by CONSTRUCTING the
relationship distillation creates in practice: a target that contains the
draft as an exact subnetwork, plus a dialable perturbation.

Construction (duplicated-lanes embedding, bit-exact-grade at eps=0):

  target hidden state  x_t = [x_d, x_d]          (draft state, twice)
  read  weights        W_in_t  = [W_d/2; W_d/2]  (contraction == draft's)
  write weights        W_out_t = [W_d, W_d]      (restores the duplication)
  rms_norm             mean(x_t^2) == mean(x_d^2), weights [w_d, w_d] — exact,
                       same eps, no scale compensation needed
  extra q heads        zero q -> uniform attention over zero v -> zero context
  extra kv heads/ffn   zero in-columns -> silu(0)*0 = 0
  upper L_d layers     o_proj = eps * random, down_proj = eps * random
                       (identity residual at eps=0; full-size matmuls always)
  lm_head              [W_d/2; W_d/2] -> logits == draft logits exactly

All halvings/duplications are exact in bf16 (powers of two / bit copies), so
at eps=0 the target's greedy stream equals the draft's up to f32 accumulation
order inside the MXU dots — measured acceptance ~1.0. eps>0 injects
random residual writes through the upper layers (read the REAL hidden state,
write everywhere), smoothly dialing target/draft agreement down toward chance
while every matmul keeps its full 1B-geometry cost. hash-uniform weights,
scale 0.02 (bench._device_hash_builders); eps=1 makes the upper writes the
same magnitude as real layers.

What is measured, per eps, all through kjarni_tpu.generate.SpeculativeGenerator
(the PRODUCT fused path — kv-bucketed segments, on-device while_loop):

  acceptance   — gen.last_acceptance_rate (accepted drafts / drafted)
  spec tok/s   — wall clock of gen.generate for MAX_NEW greedy tokens
  plain tok/s  — target-only fused greedy scan, same prompt/length/protocol
  greedy parity — spec token stream == target-only stream (the speculative
                 decoding invariant), asserted before timing; on TPU the
                 k-token verify matmul accumulates differently than the
                 1-token decode matmul, so ONE provable near-tie argmax
                 flip (both streams' tokens within TIE_MARGIN of the
                 recomputed max) is tolerated

Geometry matches scripts/speculative_bench.py (target 2048x16L ~1.1B bf16,
draft 1024x8L ~0.2B, V=128256) so the round-cost decomposition banked in
BASELINE.md round 4 (7.59 ms = 3.72 draft + 3.55 verify, breakeven a=0.576)
predicts these end-to-end numbers — the bench tests that prediction.

Cf. /root/reference/crates/kjarni-transformers/src/cpu/decoder/speculation.rs:42
(the reference's draft/verify loop; it publishes no acceptance numbers either).

Dtype: `--f32` runs both models in f32. This is the mode that produces a
MEANINGFUL acceptance number on TPU: measured in bf16 at 1B geometry the
hash-random logit landscape is nearly flat at the max (~2000 tokens within
0.05 of it), so the verify-vs-decode accumulation-order difference argmax-
flips constantly — acceptance read 0.248 at eps=0 where the construction
guarantees ~1.0, i.e. the measurement was numeric noise, not disagreement
(tpu run 2026-08-20, tie_band_size 1966-3463). In f32 the reassociation
noise (~1e-6) sits far below the top-2 gaps, so acceptance measures the
CONSTRUCTION. Throughput in f32 is not the product's bf16 number — the
round-cost decomposition in scripts/speculative_bench.py stays the perf
receipt; this bench's deliverable is acceptance and the speedup RATIO at
that acceptance (both arms share the dtype).

Run: python scripts/speculative_acceptance_bench.py --f32    (TPU, ~5 min)
     python scripts/speculative_acceptance_bench.py --tiny   (CPU smoke)
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 4            # drafted tokens per round
PROMPT_LEN = 32
MAX_NEW = 256
EPS_SWEEP = (0.0, 0.05, 0.25, 1.0)


def build_embedded_target(d_cfg, d_params, eps, salt0=7):
    """Target = draft embedded as an exact subnetwork + eps-noise upper half.

    Doubles hidden/heads/kv_heads/intermediate/layers; head_dim, vocab, rope
    are shared. Returns (t_cfg, t_params) with every tensor built on device.
    """
    import jax.numpy as jnp

    from bench import _device_hash_builders
    from kjarni_tpu.models import llama as kllama

    _, hbf16 = _device_hash_builders()
    t_cfg = kllama.DecoderConfig(
        arch="llama", rope_theta=d_cfg.rope_theta,
        vocab_size=d_cfg.vocab_size, hidden_size=2 * d_cfg.hidden_size,
        num_layers=2 * d_cfg.num_layers, num_heads=2 * d_cfg.num_heads,
        num_kv_heads=2 * d_cfg.num_kv_heads, head_dim=d_cfg.head_dim,
        intermediate_size=2 * d_cfg.intermediate_size,
        max_seq_len=d_cfg.max_seq_len, rms_norm_eps=d_cfg.rms_norm_eps)
    L = d_cfg.num_layers
    dl = d_params["layers"]

    def dup_in(w):
        # [L, Kin, N] -> [L, 2*Kin, N]: x_t=[x,x] contracts to the draft value
        return jnp.concatenate([w, w], axis=1) * jnp.asarray(0.5, w.dtype)

    def dup_out(w):
        # [L, Kin, N] -> [L, Kin, 2*N]: output written to both lanes
        return jnp.concatenate([w, w], axis=2)

    def pad_cols(w, n2):
        L_, k_, n_ = w.shape
        return jnp.zeros((L_, k_, n2), w.dtype).at[:, :, :n_].set(w)

    def pad_rows(w, k2):
        L_, k_, n_ = w.shape
        return jnp.zeros((L_, k2, n_), w.dtype).at[:, :k_, :].set(w)

    hid_t, int_t = t_cfg.hidden_size, t_cfg.intermediate_size
    q_out = t_cfg.num_heads * t_cfg.head_dim
    kv_out = t_cfg.num_kv_heads * t_cfg.head_dim

    lower = {
        # extra q/kv heads get zero columns: their context is exactly zero
        "q": pad_cols(dup_in(dl["q"]["w"]), q_out),
        "k": pad_cols(dup_in(dl["k"]["w"]), kv_out),
        "v": pad_cols(dup_in(dl["v"]["w"]), kv_out),
        # o reads the merged heads (draft heads first), writes both lanes
        "o": pad_rows(dup_out(dl["o"]["w"]), q_out),
        "gate": pad_cols(dup_in(dl["gate"]["w"]), int_t),
        "up": pad_cols(dup_in(dl["up"]["w"]), int_t),
        "down": pad_rows(dup_out(dl["down"]["w"]), int_t),
        "attn_norm": jnp.concatenate([dl["attn_norm"]] * 2, axis=1),
        "ffn_norm": jnp.concatenate([dl["ffn_norm"]] * 2, axis=1),
    }
    e = jnp.asarray(eps, jnp.bfloat16)
    upper = {
        "q": hbf16((L, hid_t, q_out), salt0 * 100 + 31),
        "k": hbf16((L, hid_t, kv_out), salt0 * 100 + 32),
        "v": hbf16((L, hid_t, kv_out), salt0 * 100 + 33),
        "o": hbf16((L, q_out, hid_t), salt0 * 100 + 34) * e,
        "gate": hbf16((L, hid_t, int_t), salt0 * 100 + 35),
        "up": hbf16((L, hid_t, int_t), salt0 * 100 + 36),
        "down": hbf16((L, int_t, hid_t), salt0 * 100 + 37) * e,
        "attn_norm": jnp.ones((L, hid_t), jnp.bfloat16),
        "ffn_norm": jnp.ones((L, hid_t), jnp.bfloat16),
    }
    layers = {}
    for name in lower:
        lo, up_ = lower[name], upper[name]
        if name in ("q", "k", "v", "o", "gate", "up", "down"):
            layers[name] = {"w": jnp.concatenate([lo, up_], axis=0)}
        else:
            layers[name] = jnp.concatenate([lo, up_], axis=0)
    cos, sin = kllama.rope_cache(t_cfg, t_cfg.max_seq_len)
    half = jnp.asarray(0.5, jnp.bfloat16)
    t_params = {
        "embed": jnp.concatenate([d_params["embed"]] * 2, axis=1),
        "layers": layers,
        "final_norm": jnp.concatenate([d_params["final_norm"]] * 2, axis=0),
        "lm_head": jnp.concatenate([d_params["lm_head"]] * 2, axis=0) * half,
        "rope_cos": jnp.asarray(cos, jnp.float32),
        "rope_sin": jnp.asarray(sin, jnp.float32),
    }
    return t_cfg, t_params


class LMShell:
    """The DecoderLM surface SpeculativeGenerator drives, over synthesized
    params (no model dir / tokenizer files at 1B scale)."""

    def __init__(self, cfg, params, max_context=2048):
        import jax
        import jax.numpy as jnp

        from kjarni_tpu.models import llama as kllama

        self.config = cfg
        self.family = kllama
        self.params = params
        self.stop_token_ids: set = set()
        self.max_context = max_context
        # caches follow the weights' dtype (--f32 mode casts the params)
        self._cache_dtype = params["embed"].dtype
        self._cache = None
        self._session_ids: list = []
        self._kv_bucket_step = 512

        @partial(jax.jit, donate_argnums=(1, 2))
        def _prefill(params, ck, cv, ids, last_idx):
            logits, ck, cv = kllama.forward(params, cfg, ids, ck, cv, 0,
                                            last_idx)
            return logits[0], ck, cv

        self._prefill = _prefill

        class _Tok:
            @staticmethod
            def decode(toks, skip_special_tokens=True):
                return " ".join(str(int(t)) for t in toks)

        self.tokenizer = _Tok()

    def _ensure_cache(self):
        if self._cache is None:
            self._cache = self.family.init_cache(
                self.config, 1, self.max_context, self._cache_dtype)
        return self._cache

    def reset(self):
        self._cache = None
        self._session_ids = []


def plain_greedy(shell, ids, max_new):
    """Target-only fused greedy decode, same protocol as the product fused
    loop (kb=512 working slice; fill stays under one bucket here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kjarni_tpu.core.bucketing import seq_bucket
    from kjarni_tpu.core.kvcache import slice_working, write_back
    from kjarni_tpu.generate.sampling import fast_argmax

    cfg, fam = shell.config, shell.family
    kb = shell._kv_bucket_step
    while kb < len(ids) + max_new + 1:
        kb += shell._kv_bucket_step
    kb = min(kb, shell.max_context)

    if not hasattr(shell, "_plain_loop"):
        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("n", "kv_bucket"))
        def loop(params, ck, cv, tok0, pos0, *, n, kv_bucket):
            full_ck, full_cv = ck, cv
            if kv_bucket < (ck.shape[3] if not isinstance(ck, dict)
                            else ck["q"].shape[3]):
                ck = slice_working(ck, kv_bucket, axis=3)
                cv = slice_working(cv, kv_bucket, axis=3)

            def body(carry, i):
                tok, ck, cv = carry
                logits, ck, cv = fam.forward(params, cfg, tok[None, None],
                                             ck, cv, pos0 + i)
                return (fast_argmax(logits[0]), ck, cv), tok
            (tok, ck, cv), toks = jax.lax.scan(body, (tok0, ck, cv),
                                               jnp.arange(n))
            ck = write_back(full_ck, ck)
            cv = write_back(full_cv, cv)
            return toks, tok, ck, cv
        shell._plain_loop = loop

    ck, cv = shell._ensure_cache()
    bucket = seq_bucket(len(ids), shell.max_context)
    padded = np.zeros((1, bucket), dtype=np.int32)
    padded[0, :len(ids)] = ids
    logits, ck, cv = shell._prefill(shell.params, ck, cv,
                                    jnp.asarray(padded), len(ids) - 1)
    cur = fast_argmax(logits)
    toks, cur, ck, cv = shell._plain_loop(shell.params, ck, cv, cur,
                                          jnp.int32(len(ids)),
                                          n=max_new - 1, kv_bucket=kb)
    shell._cache = (ck, cv)
    out = [int(t) for t in np.asarray(toks)] + [int(cur)]
    # scan emits the carry BEFORE each step: out[0] is the prefill argmax
    return out


TIE_MARGIN = 0.05  # f32 logit gap below which an argmax flip is a numeric tie


def logits_at(shell, ids):
    """Target's full f32 logit row after `ids`, via a fresh prefill."""
    import jax.numpy as jnp
    import numpy as np

    from kjarni_tpu.core.bucketing import seq_bucket

    shell.reset()
    ck, cv = shell._ensure_cache()
    bucket = seq_bucket(len(ids), shell.max_context)
    padded = np.zeros((1, bucket), dtype=np.int32)
    padded[0, :len(ids)] = ids
    logits, ck, cv = shell._prefill(shell.params, ck, cv,
                                    jnp.asarray(padded), len(ids) - 1)
    shell._cache = (ck, cv)
    return np.asarray(logits, np.float32)


def check_greedy_parity(target, prompt, ref, spec_toks):
    """Spec greedy == target greedy, up to ONE near-tie argmax flip.

    The speculative invariant is exact only under deterministic logits; on
    TPU the k-token verify matmul accumulates in a different order than the
    one-token decode matmul, so bf16 near-ties can argmax-flip. With random
    hash weights the logit landscape near the max is nearly FLAT (measured:
    dozens of tokens within 1e-4 of the max at 1B geometry, and a third
    recomputation under the prefill shape argmaxes a different near-tied
    token than either stream) — so at the first divergence we recompute the
    target's logits at that prefix and demand BOTH streams' tokens sit
    inside the near-tie band of the recomputed max (gap < TIE_MARGIN). A
    real divergence (wrong verify math, e.g. a token the target never
    ranked) shows a large gap and still fails loudly. After a tie flip the
    histories differ, so comparison stops there.
    """
    import numpy as np

    div = next((i for i, (a, b) in enumerate(zip(spec_toks, ref))
                if a != b), None)
    assert len(spec_toks) >= 1
    if div is None:
        return {"parity": "exact"}
    lg = logits_at(target, list(prompt) + ref[:div])
    mx = float(lg.max())
    gap_spec = mx - float(lg[spec_toks[div]])
    gap_ref = mx - float(lg[ref[div]])
    n_band = int(np.sum(lg >= mx - TIE_MARGIN))
    assert gap_spec < TIE_MARGIN and gap_ref < TIE_MARGIN, (
        f"greedy parity broken at token {div}: spec={spec_toks[div]} "
        f"(gap {gap_spec:.4f}) ref={ref[div]} (gap {gap_ref:.4f}) vs "
        f"recomputed max {mx:.4f} ({n_band} tokens in the tie band)")
    return {"parity": f"tie@{div}",
            "tie_gaps": [round(gap_spec, 4), round(gap_ref, 4)],
            "tie_band_size": n_band}


def main():
    tiny = "--tiny" in sys.argv
    f32 = "--f32" in sys.argv
    if tiny:
        # the image's sitecustomize pins the axon TPU platform; the smoke
        # test must not queue behind whatever holds the single real chip
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bench import build_llama_bf16_device
    from kjarni_tpu.generate.sampling import GenerationConfig
    from kjarni_tpu.generate.speculative import SpeculativeGenerator

    if tiny:
        d_kwargs = {"vocab_size": 512, "hidden_size": 64, "num_layers": 2,
                    "num_heads": 4, "num_kv_heads": 2, "head_dim": 16,
                    "intermediate_size": 128, "max_seq_len": 512}
        ctx, p_len, max_new = 512, 8, 48
    else:
        d_kwargs = {"vocab_size": 128256, "hidden_size": 1024,
                    "num_layers": 8, "num_heads": 16, "num_kv_heads": 4,
                    "head_dim": 64, "intermediate_size": 4096,
                    "max_seq_len": 4096}
        ctx, p_len, max_new = 2048, PROMPT_LEN, MAX_NEW

    if f32:
        # TPU f32 dots default to bf16-input passes (DEFAULT precision);
        # the input rounding alone injects ~one-bf16-ulp logit noise
        # (measured: tie gaps 0.0028-0.0045 at eps=0, acceptance 0.84).
        # The f32 mode exists to put numeric noise far below the top-2
        # gaps, so force true f32 MXU passes.
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")

    d_cfg, d_params = build_llama_bf16_device(d_kwargs, salt0=1)
    # the throughput builders' single-multiply iota hash emits NEAR-DUPLICATE
    # lm_head columns at llama vocab scale (measured: 1249 logits tied within
    # 0.05 of the max, top gap exactly 0.0) — greedy acceptance over tied
    # logits is a coin flip, which is what the first TPU run of this bench
    # measured (acceptance 0.248 at eps=0). Rebuild the lm_head with the
    # fully-avalanched fmix32 builder: top-2 gap ~0.012, 2 tokens in the
    # band — far above bf16 accumulation noise, so argmax is meaningful.
    from bench import _device_fmix_bf16
    d_params["lm_head"] = _device_fmix_bf16()(
        tuple(d_params["lm_head"].shape), 118)
    if f32:
        import jax
        import jax.numpy as jnp
        d_params = jax.tree.map(lambda x: x.astype(jnp.float32), d_params)
    rng = np.random.default_rng(11)
    prompt = [int(t) for t in rng.integers(1, d_cfg.vocab_size, p_len)]
    gen_cfg = GenerationConfig.greedy(max_new_tokens=max_new,
                                      max_length=ctx)

    rows = []
    for eps in EPS_SWEEP:
        t_cfg, t_params = build_embedded_target(d_cfg, d_params, eps)
        if f32:
            t_params = jax.tree.map(lambda x: x.astype(jnp.float32),
                                    t_params)
        target = LMShell(t_cfg, t_params, max_context=ctx)
        draft = LMShell(d_cfg, d_params, max_context=ctx)

        # greedy-parity gate: spec output must equal target-only greedy
        ref = plain_greedy(target, prompt, max_new)
        target.reset()
        gen = SpeculativeGenerator(target, draft, num_tokens=K)
        out = gen.generate(token_ids=prompt, config=gen_cfg)
        spec_toks = [int(t) for t in out.split()]
        acc = gen.last_acceptance_rate
        parity = check_greedy_parity(target, prompt, ref, spec_toks)
        target.reset()

        # timing: warm pass above compiled everything; min of 3 cold-cache runs
        def timed(fn, reset_all):
            best = float("inf")
            for _ in range(3):
                reset_all()
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        t_spec = timed(lambda: gen.generate(token_ids=prompt, config=gen_cfg),
                       lambda: (target.reset(), draft.reset()))
        t_plain = timed(lambda: plain_greedy(target, prompt, max_new),
                        target.reset)
        row = {"eps": eps, "dtype": "f32" if f32 else "bf16",
               "acceptance": round(acc, 4),
               "spec_tok_s": round(len(spec_toks) / t_spec, 1),
               "plain_tok_s": round(max_new / t_plain, 1),
               "speedup": round((len(spec_toks) / t_spec) /
                                (max_new / t_plain), 3),
               "tokens": len(spec_toks), "rounds": gen.last_rounds,
               **parity}
        rows.append(row)
        print(json.dumps(row), flush=True)
        # drop EVERYTHING that pins this iteration's ~2-4 GB target before
        # the next eps builds its own (gen holds target+draft; leaving it
        # bound across the build OOMed the f32 run on a 16 GB v5e)
        del t_params, target, draft, gen, ref, spec_toks
    # E(a) sanity: acceptance must decrease along the sweep
    accs = [r["acceptance"] for r in rows]
    print(json.dumps({"sweep_monotone_nonincreasing":
                      all(a >= b - 0.02 for a, b in zip(accs, accs[1:])),
                      "k": K, "max_new": max_new}))


if __name__ == "__main__":
    main()
