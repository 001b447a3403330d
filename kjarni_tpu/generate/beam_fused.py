"""Fully on-device beam search: the whole loop in one jitted while_loop.

The host implementation (generate/beam.py, cf. beams.rs:362 run_beam_search)
does top-2k bookkeeping in numpy with one device dispatch per step. This
variant fuses everything — decode, log-softmax, constraint masking, top-2k,
finished-hypothesis tracking, beam reorder — into a single XLA program: one
dispatch + one readback per generation. Semantics match the host version
exactly (same candidate processing order, length-penalty normalization,
forced BOS/EOS, early stopping), verified token-for-token in tests.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .beam import BeamSearchConfig
from .sampling import apply_no_repeat_ngram

NEG = -1e9


def build_fused_beam(decode_fn: Callable, cfg: BeamSearchConfig,
                     vocab_size: int, max_len_cap: int):
    """Build a jittable beam loop.

    decode_fn(tokens [k, 1], sk, sv, pos, parents) -> (logits [k, V], sk, sv)
    must reorder its self-cache by `parents` before decoding (identity at
    step 0). Returns run(sk, sv) -> (best_tokens [max_len], best_len).
    """
    k = cfg.num_beams
    V = vocab_size
    L = min(cfg.max_length, max_len_cap)
    lp_pow = cfg.length_penalty

    def norm_score(raw, length):
        Lf = jnp.maximum(length, 1).astype(jnp.float32)
        return raw / jnp.power(Lf, lp_pow)

    def run(sk, sv):
        beam_toks = jnp.full((k, L + 1), cfg.decoder_start_token_id, jnp.int32)
        scores = jnp.concatenate([jnp.zeros(1), jnp.full(k - 1, NEG)]
                                 ).astype(jnp.float32)
        parents = jnp.arange(k, dtype=jnp.int32)
        fin_toks = jnp.zeros((k, L + 1), jnp.int32)
        fin_lens = jnp.zeros(k, jnp.int32)
        fin_norm = jnp.full(k, -jnp.inf, jnp.float32)
        fin_count = jnp.int32(0)

        def cond(state):
            step, done, *_ = state
            return (step < L) & jnp.logical_not(done)

        def body(state):
            (step, done, beam_toks, scores, parents, sk, sv,
             fin_toks, fin_lens, fin_norm, fin_count) = state

            cur = jnp.take_along_axis(beam_toks, step[None].repeat(k)[:, None],
                                      axis=1)  # [k, 1]
            logits, sk, sv = decode_fn(cur, sk, sv, step, parents)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

            gen_len = step + 1
            # min-length: suppress EOS until allowed (host: gen_len < min+1)
            lp = jnp.where(
                (gen_len < cfg.min_length + 1)
                & (jnp.arange(V)[None, :] == cfg.eos_token_id), NEG, lp)
            if cfg.forced_bos_token_id is not None:
                forced = jnp.where(jnp.arange(V) == cfg.forced_bos_token_id,
                                   lp, NEG)
                lp = jnp.where(step == 0, forced, lp)
            if cfg.forced_eos_token_id is not None:
                forced = jnp.where(jnp.arange(V) == cfg.forced_eos_token_id,
                                   lp, NEG)
                lp = jnp.where(step == L - 1, forced, lp)
            if cfg.no_repeat_ngram_size > 0:
                def ban(row_lp, toks):
                    # history excludes the start token (host: tokens[1:])
                    return apply_no_repeat_ngram(row_lp, toks[1:], step,
                                                 cfg.no_repeat_ngram_size)
                lp = jax.vmap(ban)(lp, beam_toks)

            cand = scores[:, None] + lp
            vals, idx = jax.lax.top_k(cand.reshape(-1), 2 * k)
            cand_b = (idx // V).astype(jnp.int32)
            cand_t = (idx % V).astype(jnp.int32)
            is_eos = cand_t == cfg.eos_token_id
            # host ordering: candidate j is processed while fewer than k
            # non-eos have been taken so far
            non_eos_before = jnp.cumsum((~is_eos).astype(jnp.int32)) \
                - (~is_eos).astype(jnp.int32)
            processed = non_eos_before < k

            # --- finished pool update (insert eos candidates, keep k best) ---
            def insert(carry, j):
                fin_toks, fin_lens, fin_norm, fin_count = carry
                take = processed[j] & is_eos[j]
                ns = norm_score(vals[j], step)
                worst = jnp.argmin(fin_norm)
                better = ns > fin_norm[worst]
                do = take & better
                new_row = beam_toks[cand_b[j]]
                fin_toks = jnp.where(do, fin_toks.at[worst].set(new_row),
                                     fin_toks)
                fin_lens = jnp.where(do, fin_lens.at[worst].set(step), fin_lens)
                fin_norm = jnp.where(do, fin_norm.at[worst].set(ns), fin_norm)
                fin_count = fin_count + take.astype(jnp.int32)
                return (fin_toks, fin_lens, fin_norm, fin_count), ()

            (fin_toks, fin_lens, fin_norm, fin_count), _ = jax.lax.scan(
                insert, (fin_toks, fin_lens, fin_norm, fin_count),
                jnp.arange(2 * k))

            # --- pick the first k non-eos candidates as the new beams ---
            alive_rank = jnp.where(~is_eos & processed, non_eos_before, 2 * k)
            order = jnp.argsort(alive_rank)[:k]  # indices of first k non-eos
            ok = alive_rank[order] < 2 * k
            new_parents = jnp.where(ok, cand_b[order], 0).astype(jnp.int32)
            new_tokens = jnp.where(ok, cand_t[order], cfg.eos_token_id)
            new_scores = jnp.where(ok, vals[order], NEG)

            beam_toks = beam_toks[new_parents]
            beam_toks = beam_toks.at[:, step + 1].set(new_tokens)

            all_dead = jnp.logical_not(jnp.any(ok))
            stop = all_dead
            if cfg.early_stopping:
                stop = stop | (fin_count >= k)
            else:
                kth_best = jnp.sort(fin_norm)[0]  # worst of the kept k
                best_alive = jnp.max(new_scores) / jnp.power(
                    jnp.float32(step + 2), lp_pow) if lp_pow else \
                    jnp.max(new_scores)
                stop = stop | ((fin_count >= k) & (best_alive < kth_best))

            return (step + 1, stop, beam_toks, new_scores, new_parents, sk, sv,
                    fin_toks, fin_lens, fin_norm, fin_count)

        state = (jnp.int32(0), jnp.bool_(False), beam_toks, scores, parents,
                 sk, sv, fin_toks, fin_lens, fin_norm, fin_count)
        (step, done, beam_toks, scores, parents, sk, sv,
         fin_toks, fin_lens, fin_norm, fin_count) = jax.lax.while_loop(
            cond, body, state)

        # fallback: no finished hypothesis -> best alive beam (host behavior)
        none_finished = fin_count == 0
        best_alive = jnp.argmax(scores)
        best_fin = jnp.argmax(fin_norm)
        best_row = jnp.where(none_finished, beam_toks[best_alive],
                             fin_toks[best_fin])
        best_len = jnp.where(none_finished, step, fin_lens[best_fin])
        # strip the start token: emitted tokens live at positions 1..best_len
        out = jnp.roll(best_row, -1)[:L]
        return out, best_len

    return run
