"""Token-level continuous batching: a slot-based decode engine.

Goes beyond the reference (which is per-request; kjarni/src/generation drives
one sequence at a time) and works for both decoder families (llama/qwen2/
mistral/phi3 and gpt2): requests join and leave a running decode mid-flight,
vLLM-style. TPU-native design constraints shape the layout:

  * static shapes — a fixed number of slots S, each with a fixed-length cache;
  * per-slot caches stacked on a leading slot axis [S, L, 1, Hkv, T, D], so
    one `jax.vmap` of the B=1 forward decodes ALL active slots in a single
    XLA dispatch even though every slot sits at a different position;
  * prefill writes into a dynamic slot index (dynamic_update_index_in_dim),
    jitted once per prompt-length bucket;
  * inactive slots still compute (masked on the host) — lockstep SPMD is
    cheaper than ragged dispatch because decode is weight-bandwidth-bound.

Each slot carries its own sampling parameters (temperature / top-k / top-p /
min-p / seed) and its own PRNG key, applied inside the vmap'd step — greedy
and sampled requests share one dispatch. Top-k uses a dynamic-k mask (rank
cutoff) because slots differ in k; top-p/min-p thresholds are traced scalars.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bucketing import seq_bucket
from ..core.errors import GenerationError
from .sampling import (NEG_INF, SamplingParams, apply_no_repeat_ngram,
                       apply_repetition_penalty, min_p_filter, top_p_filter)

_HIST_BUF = 128   # per-slot generated-token history window for penalties


def _sample_slot(logits, key, temp, top_k, top_p, min_p):
    """Per-slot sampling with traced parameters (cf. sampling.py sample_token,
    but every knob is a runtime scalar so slots can differ inside one vmap).
    temp <= 0 means greedy."""
    vocab = logits.shape[-1]

    def greedy(_):
        return jnp.argmax(logits).astype(jnp.int32)

    def sampled(_):
        l = logits
        # dynamic top-k: mask everything below the k-th largest (k<=0 = off)
        sorted_desc = jnp.sort(l)[::-1]
        kth = sorted_desc[jnp.clip(top_k - 1, 0, vocab - 1)]
        l = jnp.where((top_k > 0) & (l < kth), NEG_INF, l)
        l = top_p_filter(l, top_p)      # top_p=1.0 keeps everything
        l = min_p_filter(l, min_p)      # min_p=0.0 keeps everything
        l = l / jnp.maximum(temp, 1e-5)
        return jax.random.categorical(key, l).astype(jnp.int32)

    return jax.lax.cond(temp <= 0.0, greedy, sampled, None)


@dataclasses.dataclass
class _Slot:
    request_id: int = -1
    active: bool = False
    pos: int = 0                 # cache write frontier (== tokens in cache)
    remaining: int = 0           # max_new_tokens budget left
    generated: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class FinishedRequest:
    request_id: int
    token_ids: list
    text: str
    finish_reason: str           # "eos" | "length"


class ContinuousEngine:
    """Slot-based continuous-batching engine over a DecoderLM (any family).

    Usage:
        eng = ContinuousEngine(lm, slots=8)
        rid = eng.submit("prompt", max_new_tokens=64)   # joins mid-decode
        eng.step()                   # one fused window (k tokens), all slots
        done = eng.drain()                              # finished requests
    """

    def __init__(self, lm, slots: int = 8, max_context: Optional[int] = None,
                 no_repeat_ngram_size: int = 0, steps_per_sync: int = 8):
        self.lm = lm
        self.family = lm.family   # llama family or gpt2: same forward shape
        self.cfg = lm.config
        self.S = slots
        self.T = max_context or lm.max_context
        dt = lm.params["embed"].dtype
        if dt == jnp.int8:
            dt = jnp.bfloat16
        # one B=1 cache per slot, stacked on a leading slot axis
        ck1, cv1 = lm.family.init_cache(self.cfg, 1, self.T, dt)
        self.cache_k = jnp.zeros((slots,) + ck1.shape, ck1.dtype)
        self.cache_v = jnp.zeros((slots,) + cv1.shape, cv1.dtype)
        if getattr(lm, "_mesh", None) is not None:
            # tensor-parallel lm: shard the stacked caches' kv-head axis
            # ([S, L, 1, Hkv, T, D] -> axis 3) to match the sharded weights
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = lm._mesh
            spec = [None] * self.cache_k.ndim
            if self.cache_k.shape[3] % mesh.shape.get("tp", 1) == 0:
                spec[3] = "tp"
            sh = NamedSharding(mesh, P(*spec))
            self.cache_k = jax.device_put(self.cache_k, sh)
            self.cache_v = jax.device_put(self.cache_v, sh)
        self._slots = [_Slot() for _ in range(slots)]
        self._last_tok = np.zeros(slots, np.int32)
        # per-slot sampling state (temp<=0 = greedy); keys advance per step
        self._temp = np.zeros(slots, np.float32)
        self._top_k = np.zeros(slots, np.int32)
        self._top_p = np.ones(slots, np.float32)
        self._min_p = np.zeros(slots, np.float32)
        self._keys = jnp.stack([jax.random.PRNGKey(i) for i in range(slots)])
        # per-slot penalties over a rolling generated-token history window;
        # ngram size is static per engine (shape-dependent), gated per slot
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self._penalty = np.ones(slots, np.float32)
        self._ngram_on = np.zeros(slots, bool)
        self._hist = np.zeros((slots, _HIST_BUF), np.int32)
        self._hist_len = np.zeros(slots, np.int32)
        self._next_id = 0
        self._queue: list[tuple] = []                   # waiting requests
        self._finished: list[FinishedRequest] = []
        self._prefill_cache: dict[int, any] = {}
        # k decode iterations fused per host dispatch (lax.fori_loop inside
        # the jitted step): slots join/leave at k-token granularity, and the
        # per-token host roundtrip (≈30 ms over a remote-device tunnel) is
        # amortized k×. k=1 reproduces per-token stepping exactly.
        self.steps_per_sync = max(int(steps_per_sync), 1)
        self._step_fn = self._build_step()
        self._first_fn = self._build_first()

    # ------------------------------------------------------------------

    def _build_step(self):
        cfg = self.cfg
        fwd = self.family.forward
        ngram = self.no_repeat_ngram_size
        k_steps = self.steps_per_sync

        @partial(jax.jit, donate_argnums=(2, 3))
        def step(params, toks, ck, cv, pos, keys, temp, top_k, top_p, min_p,
                 pen, ngram_on, hist, hist_len):
            # vmap the B=1 forward over the slot axis: each slot attends its
            # own cache at its own frontier and samples with its own params
            # and PRNG key — then fuse k such iterations in one dispatch
            # (lax.fori_loop), advancing tokens, caches, PRNG streams, and
            # the penalty-history ring entirely on device. The host only
            # sees the [S, k] token block.
            def one(i, tok, ck1, cv1, p, key, t, tk, tp, mp, pe, ng, h, hl):
                logits, ck1, cv1 = fwd(params, cfg, tok[None, None], ck1, cv1,
                                       p + i)
                l = logits[0]
                valid = jnp.arange(_HIST_BUF) < hl
                l = apply_repetition_penalty(l, h, valid, pe)  # pe=1 → no-op
                if ngram > 1:
                    l = jnp.where(ng, apply_no_repeat_ngram(l, h, hl, ngram), l)
                key, sub = jax.random.split(key)
                nxt = _sample_slot(l, sub, t, tk, tp, mp)
                # rolling history append (device twin of _note_token's
                # host-side window update)
                h_app = h.at[jnp.clip(hl, 0, _HIST_BUF - 1)].set(nxt)
                h_roll = jnp.roll(h, -1).at[_HIST_BUF - 1].set(nxt)
                h = jnp.where(hl >= _HIST_BUF, h_roll, h_app)
                hl = jnp.minimum(hl + 1, _HIST_BUF)
                return nxt, ck1, cv1, key, h, hl

            def body(i, state):
                toks, ck, cv, keys, hist, hist_len, out = state
                toks, ck, cv, keys, hist, hist_len = jax.vmap(
                    one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
                )(i, toks, ck, cv, pos, keys, temp, top_k, top_p, min_p,
                  pen, ngram_on, hist, hist_len)
                out = out.at[:, i].set(toks)
                return toks, ck, cv, keys, hist, hist_len, out

            out = jnp.full((toks.shape[0], k_steps), -1, jnp.int32)
            toks, ck, cv, keys, hist, hist_len, out = jax.lax.fori_loop(
                0, k_steps, body,
                (toks, ck, cv, keys, hist, hist_len, out))
            return out, toks, ck, cv, keys, hist, hist_len

        return step

    def _build_first(self):
        """Sampler for the token right after prefill: same penalty chain as
        the step (history = prompt tail at that point, cf. decoder_lm.py:359
        which seeds the buffer with the prompt)."""
        ngram = self.no_repeat_ngram_size

        @jax.jit
        def first(logits, key, t, tk, tp, mp, pe, ng, h, hl):
            valid = jnp.arange(_HIST_BUF) < hl
            l = apply_repetition_penalty(logits, h, valid, pe)
            if ngram > 1:
                l = jnp.where(ng, apply_no_repeat_ngram(l, h, hl, ngram), l)
            return _sample_slot(l, key, t, tk, tp, mp)

        return first

    def _prefill_fn(self, bucket: int):
        fn = self._prefill_cache.get(bucket)
        if fn is not None:
            return fn
        cfg = self.cfg
        fwd = self.family.forward

        @partial(jax.jit, donate_argnums=(2, 3))
        def prefill(params, ids, ck, cv, slot, last_idx):
            ck1 = jax.lax.dynamic_index_in_dim(ck, slot, 0, keepdims=False)
            cv1 = jax.lax.dynamic_index_in_dim(cv, slot, 0, keepdims=False)
            logits, ck1, cv1 = fwd(params, cfg, ids[None, :], ck1, cv1,
                                   jnp.int32(0), last_idx=last_idx)
            ck = jax.lax.dynamic_update_index_in_dim(ck, ck1, slot, 0)
            cv = jax.lax.dynamic_update_index_in_dim(cv, cv1, slot, 0)
            return logits[0], ck, cv

        self._prefill_cache[bucket] = prefill
        return prefill

    # ------------------------------------------------------------------

    def submit(self, prompt: str, max_new_tokens: int = 128,
               sampling: Optional[SamplingParams] = None,
               seed: Optional[int] = None,
               repetition_penalty: float = 1.0,
               no_repeat_ngram: bool = False) -> int:
        """Queue a request; it joins the running batch at the next step.

        sampling=None (or temperature<=0) decodes greedily; otherwise the
        slot samples with its own temperature/top_k/top_p/min_p and a PRNG
        stream derived from `seed` (default: the request id).
        repetition_penalty compounds per occurrence over the slot's last
        _HIST_BUF generated tokens; no_repeat_ngram uses the engine's static
        `no_repeat_ngram_size` (a jit shape), toggled per request.
        """
        if no_repeat_ngram and self.no_repeat_ngram_size <= 1:
            raise GenerationError(
                "engine was built with no_repeat_ngram_size<=1; pass it to "
                "ContinuousEngine(...) to enable per-request ngram blocking")
        ids = self.lm.encode_prompt(prompt, add_bos=True)
        # worst-case cache frontier: prefill + full decode windows (a slot
        # finishing mid-window still writes the whole k-token window)
        k = self.steps_per_sync
        windows = -(-(max_new_tokens - 1) // k) if max_new_tokens > 1 else 0
        need = len(ids) + windows * k
        if need > self.T:
            raise GenerationError(
                f"prompt ({len(ids)} tokens) + max_new_tokens "
                f"({max_new_tokens}, rounded up to the {k}-token decode "
                f"window: {need} total) exceeds slot capacity {self.T}")
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, ids, max_new_tokens, sampling, seed,
                            repetition_penalty, no_repeat_ngram))
        self._admit()
        return rid

    def _admit(self) -> None:
        """Prefill queued requests into free slots."""
        for slot_idx, slot in enumerate(self._slots):
            if not self._queue:
                return
            if slot.active:
                continue
            rid, ids, max_new, sampling, seed, rep_pen, ngram_on = \
                self._queue.pop(0)
            bucket = seq_bucket(len(ids))
            arr = np.zeros(bucket, np.int32)
            arr[:len(ids)] = ids               # right-pad; garbage slots are
            # never attended: queries stop at last_idx, later writes overwrite
            logits, self.cache_k, self.cache_v = self._prefill_fn(bucket)(
                self.lm.params, jnp.asarray(arr), self.cache_k, self.cache_v,
                jnp.int32(slot_idx), jnp.int32(len(ids) - 1))
            sp = sampling or SamplingParams(temperature=0.0)
            self._temp[slot_idx] = sp.temperature
            self._top_k[slot_idx] = sp.top_k or 0
            self._top_p[slot_idx] = 1.0 if sp.top_p is None else sp.top_p
            self._min_p[slot_idx] = sp.min_p or 0.0
            self._penalty[slot_idx] = rep_pen
            self._ngram_on[slot_idx] = ngram_on
            # penalties run over prompt + generated (decoder_lm.py:359); seed
            # the rolling window with the prompt tail
            tail = ids[-_HIST_BUF:]
            self._hist[slot_idx, :len(tail)] = tail
            self._hist_len[slot_idx] = len(tail)
            key = jax.random.PRNGKey(rid if seed is None else seed)
            key, sub = jax.random.split(key)
            self._keys = self._keys.at[slot_idx].set(key)
            tok = self._first_fn(logits, sub,
                                 jnp.float32(self._temp[slot_idx]),
                                 jnp.int32(self._top_k[slot_idx]),
                                 jnp.float32(self._top_p[slot_idx]),
                                 jnp.float32(self._min_p[slot_idx]),
                                 jnp.float32(self._penalty[slot_idx]),
                                 jnp.bool_(ngram_on),
                                 jnp.asarray(self._hist[slot_idx]),
                                 jnp.int32(self._hist_len[slot_idx]))
            slot.request_id = rid
            slot.active = True
            slot.pos = len(ids)
            slot.remaining = max_new
            slot.generated = []
            self._last_tok[slot_idx] = int(tok)
            self._note_token(slot_idx, int(tok))

    def _note_token(self, slot_idx: int, tok: int,
                    update_hist: bool = True) -> None:
        """Bookkeep one accepted token. update_hist=False when the device
        already appended it to the history ring inside the fused step (the
        host mirror was refreshed from the device output)."""
        slot = self._slots[slot_idx]
        if tok in self.lm.stop_token_ids:
            self._finish(slot_idx, "eos")
            return
        slot.generated.append(tok)
        if update_hist:
            hl = int(self._hist_len[slot_idx])
            if hl < _HIST_BUF:
                self._hist[slot_idx, hl] = tok
                self._hist_len[slot_idx] = hl + 1
            else:   # rolling window: penalties see the last _HIST_BUF tokens
                self._hist[slot_idx, :-1] = self._hist[slot_idx, 1:]
                self._hist[slot_idx, -1] = tok
        slot.remaining -= 1
        if slot.remaining <= 0:
            self._finish(slot_idx, "length")

    def _finish(self, slot_idx: int, reason: str) -> None:
        slot = self._slots[slot_idx]
        self._finished.append(FinishedRequest(
            request_id=slot.request_id,
            token_ids=list(slot.generated),
            text=self.lm.tokenizer.decode(slot.generated),
            finish_reason=reason))
        slot.active = False

    # ------------------------------------------------------------------

    @property
    def num_active(self) -> int:
        return sum(s.active for s in self._slots)

    @property
    def num_waiting(self) -> int:
        return len(self._queue)

    def step(self) -> None:
        """Decode one fused window (steps_per_sync tokens) for every active
        slot — a single XLA dispatch and a single host sync.

        A slot that finishes mid-window (EOS or budget) has its trailing
        window tokens discarded; the capacity check in submit() reserves the
        overshoot so the extra cache writes never clobber live positions.
        """
        self._admit()   # freed slots pick up waiting requests first
        if self.num_active == 0:
            return
        was_active = [s.active for s in self._slots]
        pos = np.array([s.pos for s in self._slots], np.int32)
        out, last, self.cache_k, self.cache_v, self._keys, hist_d, hl_d = \
            self._step_fn(
                self.lm.params, jnp.asarray(self._last_tok), self.cache_k,
                self.cache_v, jnp.asarray(pos), self._keys,
                jnp.asarray(self._temp), jnp.asarray(self._top_k),
                jnp.asarray(self._top_p), jnp.asarray(self._min_p),
                jnp.asarray(self._penalty), jnp.asarray(self._ngram_on),
                jnp.asarray(self._hist), jnp.asarray(self._hist_len))
        out = np.asarray(out)                  # [S, k] token block
        self._last_tok = np.asarray(last).copy()
        self._hist = np.asarray(hist_d).copy()
        self._hist_len = np.asarray(hl_d).copy()
        for i, slot in enumerate(self._slots):
            if not was_active[i]:
                continue
            for j in range(out.shape[1]):
                slot.pos += 1
                self._note_token(i, int(out[i, j]), update_hist=False)
                if not slot.active:
                    break   # discard the rest of the window

    def drain(self) -> list[FinishedRequest]:
        out, self._finished = self._finished, []
        return out

    def run(self) -> list[FinishedRequest]:
        """Step until every submitted request has finished."""
        while self.num_active or self.num_waiting:
            self.step()
        return self.drain()
