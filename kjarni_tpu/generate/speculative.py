"""Speculative decoding: draft model proposes, target verifies in one forward.

Rebuild of kjarni-transformers/src/cpu/decoder/speculation.rs:42
(DraftModelContext :20, greedy + probabilistic acceptance). The reference runs
draft/target prefill concurrently with tokio; here the whole hot loop is three
device dispatches per speculation round:

  1. draft scan  — k+1 greedy draft steps fused in one `lax.scan` program
  2. target pass — ONE batched forward over [cur, d1..dk]
  3. verify      — acceptance + bonus-token pick, on device

Cache rollback (speculation.rs accept/rollback) costs nothing: rejected
positions are simply overwritten by the next round's writes before any query
can attend to them.
"""

from __future__ import annotations

import random as _random
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bucketing import seq_bucket
from ..core.cancellation import CancellationToken
from ..core.kvcache import slice_working, write_back
from ..core.errors import GenerationError
from ..core.stats import GenerationStats
from .sampling import GenerationConfig, fast_argmax
from .stream import StreamDecoder, StreamedToken, TokenType


class SpeculativeGenerator:
    """Cf. run_speculative_generation_loop (speculation.rs:42)."""

    def __init__(self, target, draft, num_tokens: int = 4,
                 probabilistic: bool = False):
        if target.config.vocab_size != draft.config.vocab_size:
            raise GenerationError(
                "draft and target models must share a vocabulary")
        self.target = target
        self.draft = draft
        self.k = num_tokens
        self.probabilistic = probabilistic
        # acceptance telemetry (the reference logs draft acceptance,
        # speculation.rs accept bookkeeping): updated per generation
        self.last_rounds = 0
        self.last_drafted = 0
        self.last_accepted = 0
        self._build()

    @property
    def last_acceptance_rate(self) -> float:
        """Fraction of drafted tokens the target accepted, last generation."""
        return (self.last_accepted / self.last_drafted
                if self.last_drafted else 0.0)

    def _build(self):
        k = self.k
        t_cfg, d_cfg = self.target.config, self.draft.config
        t_fwd = self.target.family.forward_all_logits
        d_fwd = self.draft.family.forward_all_logits

        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("kv_bucket",))
        def draft_scan(params, ck, cv, cur, pos, *, kv_bucket=None):
            """k+1 greedy draft steps; returns d1..dk and their logits.

            fill-proportional: the k+1-step scan restacks the carried cache
            every step, so carry a kv_bucket working slice and write it back
            once per round (core/kvcache.py mechanism)."""
            full_ck, full_cv = ck, cv
            if kv_bucket is not None:
                ck = slice_working(ck, kv_bucket, axis=3)
                cv = slice_working(cv, kv_bucket, axis=3)

            def body(carry, i):
                tok, ck, cv = carry
                logits, ck, cv = d_fwd(params, d_cfg, tok[None, None], ck, cv,
                                       pos + i)
                nxt = fast_argmax(logits[0, 0])
                return (nxt, ck, cv), (nxt, logits[0, 0])
            (last, ck, cv), (toks, logits) = jax.lax.scan(
                body, (cur, ck, cv), jnp.arange(k + 1))
            if kv_bucket is not None:
                ck = write_back(full_ck, ck)
                cv = write_back(full_cv, cv)
            return toks[:k], logits[:k], ck, cv

        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("kv_bucket",))
        def target_pass(params, ck, cv, tokens, pos, *, kv_bucket=None):
            """tokens [k+1] = [cur, d1..dk]; logits at every position."""
            full_ck, full_cv = ck, cv
            if kv_bucket is not None:
                ck = slice_working(ck, kv_bucket, axis=3)
                cv = slice_working(cv, kv_bucket, axis=3)
            logits, ck, cv = t_fwd(params, t_cfg, tokens[None, :], ck, cv, pos)
            if kv_bucket is not None:
                ck = write_back(full_ck, ck)
                cv = write_back(full_cv, cv)
            return logits[0], ck, cv  # [k+1, V]

        @jax.jit
        def verify_greedy(target_logits, draft_tokens):
            preds = fast_argmax(target_logits)  # [k+1]
            matches = preds[:k] == draft_tokens
            n_acc = jnp.argmin(jnp.concatenate(
                [matches, jnp.array([False])]).astype(jnp.int32))
            return n_acc.astype(jnp.int32), preds[n_acc]

        @jax.jit
        def verify_prob(target_logits, draft_logits, draft_tokens, rng):
            p = jax.nn.softmax(target_logits, axis=-1)  # [k+1, V]
            q = jax.nn.softmax(draft_logits, axis=-1)   # [k, V]
            idx = draft_tokens
            p_tok = jnp.take_along_axis(p[:k], idx[:, None], axis=-1)[:, 0]
            q_tok = jnp.take_along_axis(q, idx[:, None], axis=-1)[:, 0]
            rng, u_key, s_key = jax.random.split(rng, 3)
            u = jax.random.uniform(u_key, (k,))
            accept = u < p_tok / jnp.maximum(q_tok, 1e-20)
            n_acc = jnp.argmin(jnp.concatenate(
                [accept, jnp.array([False])]).astype(jnp.int32))
            # resample distribution at the first rejection; p[k] if all accepted
            residual = jnp.maximum(p[jnp.minimum(n_acc, k - 1)] -
                                   q[jnp.minimum(n_acc, k - 1)], 0.0)
            residual = residual / jnp.maximum(residual.sum(), 1e-20)
            resampled = jax.random.categorical(s_key, jnp.log(residual + 1e-20))
            bonus = jax.random.categorical(s_key, jnp.log(p[k] + 1e-20))
            nxt = jnp.where(n_acc == k, bonus, resampled).astype(jnp.int32)
            return n_acc.astype(jnp.int32), nxt, rng

        self._draft_scan = draft_scan
        self._target_pass = target_pass
        self._verify_greedy = verify_greedy
        self._verify_prob = verify_prob

        stop_ids = jnp.asarray(sorted(self.target.stop_token_ids) or [-1],
                               dtype=jnp.int32)

        @partial(jax.jit, donate_argnums=(2, 3, 4, 5),
                 static_argnames=("width", "kv_bucket"))
        def fused_loop(t_params, d_params, tck, tcv, dck, dcv, cur0, pos0,
                       rng, n_bound, max_pos, *, width, kv_bucket=None):
            """The speculative loop on device: draft-scan -> target verify ->
            accept, iterated in a while_loop with on-device EOS exit.

            Resumable segment form: n_bound/max_pos are dynamic so the caller
            can decode in kv-bucketed segments (generate() below) on a
            kv_bucket working slice of both caches — the per-round scans
            restack whatever cache they carry, so at long contexts carrying
            the full allocation costs capacity-proportional HBM traffic
            (core/kvcache.py; BASELINE.md round-3 memo). `width` is the
            static out-buffer size; the emit cutoff uses dynamic n_bound."""
            full_tck, full_tcv, full_dck, full_dcv = tck, tcv, dck, dcv
            if kv_bucket is not None:
                tck = slice_working(tck, kv_bucket, axis=3)
                tcv = slice_working(tcv, kv_bucket, axis=3)
                dck = slice_working(dck, kv_bucket, axis=3)
                dcv = slice_working(dcv, kv_bucket, axis=3)
            out = jnp.full((width,), -1, jnp.int32)

            def cond(state):
                done, cur, pos, tck, tcv, dck, dcv, out, n_out, rounds, rng = state
                return jnp.logical_not(done) & (n_out < n_bound) &                     (pos + k + 2 < max_pos)

            def body(state):
                done, cur, pos, tck, tcv, dck, dcv, out, n_out, rounds, rng = state

                def d_body(carry, i):
                    tok, dck, dcv = carry
                    lg, dck, dcv = d_fwd(d_params, d_cfg, tok[None, None],
                                         dck, dcv, pos + i)
                    nxt = fast_argmax(lg[0, 0])
                    return (nxt, dck, dcv), nxt
                (_, dck, dcv), d_toks_all = jax.lax.scan(
                    d_body, (cur, dck, dcv), jnp.arange(k + 1))
                d_toks = d_toks_all[:k]

                tokens_in = jnp.concatenate([cur[None], d_toks])
                t_logits, tck, tcv = t_fwd(t_params, t_cfg, tokens_in[None, :],
                                           tck, tcv, pos)
                preds = fast_argmax(t_logits[0])
                matches = preds[:k] == d_toks
                n_acc = jnp.argmin(jnp.concatenate(
                    [matches, jnp.array([False])]).astype(jnp.int32))
                nxt = preds[n_acc]

                # emit accepted drafts then the bonus token, honoring stops
                emit = jnp.concatenate([d_toks, nxt[None]])      # [k+1]
                emit_valid = jnp.concatenate(
                    [jnp.arange(k) < n_acc, jnp.array([True])])
                is_stop = jnp.any(emit[:, None] == stop_ids[None, :], axis=1)
                stop_seen = jnp.cumsum((is_stop & emit_valid)
                                       .astype(jnp.int32)) > 0
                # no budget cutoff here: a round always records ALL its kept
                # tokens (cache/pos advance past them regardless), and the
                # CALLER truncates at the global budget — cutting mid-round
                # would silently drop accepted tokens across segment resumes.
                # cond guarantees n_out < n_bound <= width - k - 1 on entry,
                # so the buffer always fits the round's k+1 tokens.
                keep = emit_valid & jnp.logical_not(stop_seen)
                # scatter kept tokens into out at running positions
                slot = n_out + jnp.cumsum(keep.astype(jnp.int32)) - 1
                out = out.at[jnp.where(keep, slot, width)].set(
                    jnp.where(keep, emit, -1), mode="drop")
                n_kept = jnp.sum(keep.astype(jnp.int32))
                done = jnp.any(is_stop & emit_valid)
                return (done, nxt, pos + n_acc + 1, tck, tcv, dck, dcv, out,
                        n_out + n_kept, rounds + 1, rng)

            state = (jnp.bool_(False), cur0, pos0, tck, tcv, dck, dcv, out,
                     jnp.int32(0), jnp.int32(0), rng)
            state = jax.lax.while_loop(cond, body, state)
            done, cur, pos, tck, tcv, dck, dcv, out, n_out, rounds, rng = state
            if kv_bucket is not None:
                tck = write_back(full_tck, tck)
                tcv = write_back(full_tcv, tcv)
                dck = write_back(full_dck, dck)
                dcv = write_back(full_dcv, dcv)
            return (out, n_out, rounds, pos - pos0, done, cur,
                    tck, tcv, dck, dcv)

        self._fused_loop = fused_loop

    def generate_stream(self, prompt: Optional[str] = None, *,
                        token_ids=None,
                        config: Optional[GenerationConfig] = None,
                        cancellation: Optional[CancellationToken] = None,
                        ) -> Iterator[StreamedToken]:
        gen = config or GenerationConfig.greedy()
        target, draft = self.target, self.draft
        if token_ids is None:
            if prompt is None:
                raise GenerationError("either prompt or token_ids is required")
            token_ids = target.encode_prompt(prompt, gen.add_bos_token)
        ids = list(token_ids)[: target.max_context - self.k - 2]
        prompt_len = len(ids)
        self.last_rounds = self.last_drafted = self.last_accepted = 0
        stats = GenerationStats()
        stats.start()

        # prefill both models (speculation.rs: joint prefill)
        tck, tcv = target._ensure_cache()
        if draft is target:
            # self-drafting: the roles need distinct cache buffers
            dck, dcv = draft.family.init_cache(draft.config, 1,
                                               draft.max_context,
                                               draft._cache_dtype)
        else:
            dck, dcv = draft._ensure_cache()
        bucket = seq_bucket(prompt_len, target.max_context)
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :prompt_len] = ids
        t_logits, tck, tcv = target._prefill(target.params, tck, tcv,
                                             jnp.asarray(padded), prompt_len - 1)
        _, dck, dcv = draft._prefill(draft.params, dck, dcv,
                                     jnp.asarray(padded), prompt_len - 1)
        stats.mark_prefill(prompt_len)

        cur = fast_argmax(t_logits)
        pos = prompt_len
        rng = jax.random.PRNGKey(gen.seed if gen.seed is not None
                                 else _random.getrandbits(31))
        sdec = StreamDecoder(target.tokenizer)
        max_new = gen.max_new_tokens if gen.max_new_tokens is not None else \
            max(gen.max_length - prompt_len, 0)
        n_generated = 0
        stop = target.stop_token_ids

        def emit(t: int):
            nonlocal n_generated
            n_generated += 1
            return StreamedToken(sdec.push(t), t, TokenType.GENERATED)

        try:
            c = int(cur)
            if c in stop:
                return
            yield emit(c)
            while n_generated < max_new:
                if cancellation is not None and cancellation.is_cancelled:
                    break
                if pos + self.k + 2 >= min(target.max_context,
                                           draft.max_context, gen.max_length):
                    break
                # fill-proportional round: both per-round dispatches carry a
                # bucket-sized working slice of their cache (the static
                # bucket changes every _kv_bucket_step tokens, so the jit
                # cache holds one variant per crossed bucket)
                kbs = getattr(target, "_kv_bucket_step", 512)
                kb = -(-(pos + self.k + 2) // kbs) * kbs  # covers pos..pos+k
                kb_d = None if kb >= draft.max_context else kb
                kb_t = None if kb >= target.max_context else kb
                d_toks, d_logits, dck, dcv = self._draft_scan(
                    draft.params, dck, dcv, cur, jnp.int32(pos),
                    kv_bucket=kb_d)
                tokens_in = jnp.concatenate([cur[None], d_toks])
                t_logits, tck, tcv = self._target_pass(
                    target.params, tck, tcv, tokens_in, jnp.int32(pos),
                    kv_bucket=kb_t)
                if self.probabilistic:
                    n_acc, nxt, rng = self._verify_prob(t_logits, d_logits,
                                                        d_toks, rng)
                else:
                    n_acc, nxt = self._verify_greedy(t_logits, d_toks)
                n_acc = int(n_acc)
                self.last_rounds += 1
                self.last_drafted += self.k
                self.last_accepted += n_acc
                accepted = [int(t) for t in np.asarray(d_toks[:n_acc])]
                stopped = False
                for t in accepted:
                    if t in stop or n_generated >= max_new:
                        stopped = True
                        break
                    yield emit(t)
                if stopped:
                    break
                nxt_i = int(nxt)
                if nxt_i in stop or n_generated >= max_new:
                    break
                yield emit(nxt_i)
                cur = jnp.int32(nxt_i)
                pos += n_acc + 1
        finally:
            target._cache = (tck, tcv)
            draft._cache = (dck, dcv)
            target._session_ids = []
            draft._session_ids = []
            stats.mark_decode_done(n_generated)
            stats.print_summary()

    def generate(self, prompt: Optional[str] = None, *,
                 token_ids=None,
                 config: Optional[GenerationConfig] = None,
                 cancellation: Optional[CancellationToken] = None,
                 fused: bool = True) -> str:
        """Blocking speculative generation; fused=True runs the entire loop
        as one device dispatch (greedy strategy only)."""
        gen = config or GenerationConfig.greedy()
        # cancellation needs the per-token host loop (the fused on-device
        # while_loop cannot be interrupted) — same policy as DecoderLM.generate
        if (not fused or self.probabilistic or gen.strategy != "greedy"
                or cancellation is not None):
            return "".join(st.text for st in
                           self.generate_stream(prompt, token_ids=token_ids,
                                                config=gen,
                                                cancellation=cancellation))
        target, draft = self.target, self.draft
        if token_ids is None:
            if prompt is None:
                raise GenerationError("either prompt or token_ids is required")
            token_ids = target.encode_prompt(prompt, gen.add_bos_token)
        ids = list(token_ids)[: target.max_context - self.k - 2]
        prompt_len = len(ids)

        tck, tcv = target._ensure_cache()
        if draft is target:
            dck, dcv = draft.family.init_cache(draft.config, 1,
                                               draft.max_context,
                                               draft._cache_dtype)
        else:
            dck, dcv = draft._ensure_cache()
        bucket = seq_bucket(prompt_len, target.max_context)
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :prompt_len] = ids
        t_logits, tck, tcv = target._prefill(target.params, tck, tcv,
                                             jnp.asarray(padded),
                                             prompt_len - 1)
        _, dck, dcv = draft._prefill(draft.params, dck, dcv,
                                     jnp.asarray(padded), prompt_len - 1)
        cur = fast_argmax(t_logits)
        c = int(cur)
        if c in target.stop_token_ids:
            return ""
        max_new = gen.max_new_tokens if gen.max_new_tokens is not None else             max(gen.max_length - prompt_len, 0)
        max_pos = min(target.max_context, gen.max_length, draft.max_context)
        toks = [c]
        self.last_rounds = self.last_drafted = self.last_accepted = 0
        if max_new > 1:
            # kv-bucketed segments (same fill-proportional design as
            # DecoderLM.generate): each fused dispatch decodes on a working
            # slice of BOTH caches sized to the current bucket, so step cost
            # tracks fill, not the max_context allocation
            KB_STEP = getattr(target, "_kv_bucket_step", 512)
            width = int(KB_STEP)
            alloc = min(target.max_context, draft.max_context)
            rng = jax.random.PRNGKey(gen.seed or 0)
            pos = prompt_len
            remaining = int(max_new - 1)
            while remaining > 0 and pos + self.k + 2 < max_pos:
                # bucket must leave headroom for at least one k+1-token round
                kb = -(-(pos + self.k + 3) // KB_STEP) * KB_STEP
                if kb >= alloc:
                    kb = None        # bucket would cover the whole cache
                mp = min(kb, max_pos) if kb is not None else max_pos
                n_bound = min(remaining, width - self.k - 1)
                (out, n, rounds, advanced, stopped, cur, tck, tcv, dck,
                 dcv) = self._fused_loop(
                    target.params, draft.params, tck, tcv, dck, dcv, cur,
                    jnp.int32(pos), rng, jnp.int32(n_bound), jnp.int32(mp),
                    width=width, kv_bucket=kb)
                seg_toks = [int(t) for t in np.asarray(out[:int(n)])
                            if t >= 0]
                r = int(rounds)
                adv = int(advanced)
                # pos advances n_acc+1 per round: accepted = advanced - rounds
                self.last_rounds += r
                self.last_drafted += r * self.k
                self.last_accepted += max(adv - r, 0)
                take = min(len(seg_toks), remaining)
                toks += seg_toks[:take]
                remaining -= take
                pos += adv
                if bool(stopped) or take < len(seg_toks) or r == 0:
                    break
        target._cache = (tck, tcv)
        draft._cache = (dck, dcv)
        target._session_ids = []
        draft._session_ids = []
        return target.tokenizer.decode(toks, skip_special_tokens=True)
