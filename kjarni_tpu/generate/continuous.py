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

Host-synchronization budget (the round-3 redesign): ALL mutable slot state —
last sampled token, PRNG keys, penalty-history ring, per-slot sampling
parameters — is device-resident. Admission is one fused dispatch PER WAVE
(all joining requests' prefills vmapped together + first-token sampling +
state scatter at the slot indices) with NO device→host readback; each
decode window is one fused dispatch whose ONLY readback is a
packed [S, k+1] int32 token block (column 0 = the window's entry token, so
the token sampled at admission is reported on the next window without its
own sync). Over a remote-device tunnel with ~30 ms roundtrips this is the
difference between ~2 syncs per burst and ~20.

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
from ..core.kvcache import slice_working, write_back
from ..core.errors import GenerationError
from .sampling import (NEG_INF, SamplingParams, apply_no_repeat_ngram,
                       apply_repetition_penalty, fast_argmax, min_p_filter,
                       top_p_filter)

_HIST_BUF = 128   # per-slot generated-token history window for penalties


def _sample_slot(logits, key, temp, top_k, top_p, min_p):
    """Per-slot sampling with traced parameters (cf. sampling.py sample_token,
    but every knob is a runtime scalar so slots can differ inside one vmap).
    temp <= 0 means greedy."""
    vocab = logits.shape[-1]

    def greedy(_):
        return fast_argmax(logits)

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


def _hist_append(h, hl, tok):
    """Append one token to a rolling [_HIST_BUF] history ring (device)."""
    h_app = h.at[jnp.clip(hl, 0, _HIST_BUF - 1)].set(tok)
    h_roll = jnp.roll(h, -1).at[_HIST_BUF - 1].set(tok)
    h = jnp.where(hl >= _HIST_BUF, h_roll, h_app)
    return h, jnp.minimum(hl + 1, _HIST_BUF)


@dataclasses.dataclass
class _Slot:
    request_id: int = -1
    active: bool = False
    pos: int = 0                 # cache write frontier (== tokens in cache)
    remaining: int = 0           # max_new_tokens budget left
    pending_first: bool = False  # admission token not yet reported to host
    plain: bool = True           # greedy, no penalties: fast-path eligible
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
                 no_repeat_ngram_size: int = 0, steps_per_sync: int = 8,
                 auto_prefix_min: int = 32, max_prefixes: int = 8):
        self.lm = lm
        self.family = lm.family   # llama family or gpt2: same forward shape
        self.cfg = lm.config
        self.S = slots
        self.T = max_context or lm.max_context
        dt = lm.params["embed"].dtype
        if dt == jnp.int8:
            dt = jnp.bfloat16
        self._dtype = dt
        # int8 KV (lm kv_cache="int8"): the engine honors the LM's decision —
        # batched long-context decode is exactly the B×fill KV-bound shape
        # where int8 wins (BASELINE.md round-4 rule: 1.44x at B=8/high fill).
        # The quantized cache is a dict {"q": int8 [..., T, D], "s": f32
        # [..., T]}; every transform below is tree-mapped and the position
        # axis sits at the same index in both leaves.
        self._kv_quantized = bool(getattr(lm, "_kv_quantized", False))
        # one B=1 cache per slot, stacked on a leading slot axis
        ck1, cv1 = self._init_cache1(self.T)
        stack = lambda a: jnp.zeros((slots,) + a.shape, a.dtype)
        self.cache_k = jax.tree.map(stack, ck1)
        self.cache_v = jax.tree.map(stack, cv1)
        if getattr(lm, "_mesh", None) is not None:
            # tensor-parallel lm: shard the stacked caches' kv-head axis
            # ([S, L, 1, Hkv, T, D] -> axis 3; same index in the int8 "s"
            # leaf [S, L, 1, Hkv, T]) to match the sharded weights
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = lm._mesh

            def shard(a):
                spec = [None] * a.ndim
                if a.shape[3] % mesh.shape.get("tp", 1) == 0:
                    spec[3] = "tp"
                return jax.device_put(a, NamedSharding(mesh, P(*spec)))

            self.cache_k = jax.tree.map(shard, self.cache_k)
            self.cache_v = jax.tree.map(shard, self.cache_v)
        self._slots = [_Slot() for _ in range(slots)]
        # ALL per-slot decode state is device-resident and never read back:
        # the host only ever sees the packed [S, k+1] window token block.
        self._last_tok = jnp.zeros(slots, jnp.int32)
        self._temp = jnp.zeros(slots, jnp.float32)      # temp<=0 = greedy
        self._top_k = jnp.zeros(slots, jnp.int32)
        self._top_p = jnp.ones(slots, jnp.float32)
        self._min_p = jnp.zeros(slots, jnp.float32)
        self._keys = jnp.stack([jax.random.PRNGKey(i) for i in range(slots)])
        # per-slot penalties over a rolling generated-token history window;
        # ngram size is static per engine (shape-dependent), gated per slot
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self._penalty = jnp.ones(slots, jnp.float32)
        self._ngram_on = jnp.zeros(slots, jnp.bool_)
        self._hist = jnp.zeros((slots, _HIST_BUF), jnp.int32)
        self._hist_len = jnp.zeros(slots, jnp.int32)
        self._next_id = 0
        self._queue: list[tuple] = []                   # waiting requests
        self._finished: list[FinishedRequest] = []
        # serving telemetry (surfaced at /v1/batch_stats)
        self.stats = {"submitted": 0, "finished": 0, "windows": 0,
                      "admission_waves": 0, "prefix_hits": 0, "tokens": 0}
        self._prefill_cache: dict = {}
        # shared-prefix prompt cache (register_prefix): prefilled KV copied
        # into joining slots so admissions only compute their suffix. A
        # TABLE of up to `max_prefixes` prefixes (multi-tenant serving: one
        # per distinct system prompt); admission matches each prompt against
        # the longest registered prefix. The jit-variant space stays bounded:
        # one admission variant per (suffix bucket, prefix LENGTH) — two
        # prefixes of equal length share a compiled variant because the
        # prefix KV is a traced argument, and the table is capped.
        # auto_prefix_min > 0 also LEARNS prefixes from traffic (two prompts
        # sharing that many leading tokens trigger registration, repeatedly
        # until the table is full); 0 disables auto-detection.
        self._prefixes: list[tuple[list, tuple]] = []   # (ids, (k, v))
        self.max_prefixes = max_prefixes
        self.auto_prefix_min = auto_prefix_min
        self._auto_candidate: Optional[list] = None
        # Up to `steps_per_sync` decode iterations fuse per host dispatch
        # (lax.fori_loop inside the jitted step): slots join/leave at window
        # granularity, and the per-token host roundtrip (≈30 ms over a
        # remote-device tunnel) is amortized k×. The actual window size k is
        # chosen ADAPTIVELY per step — the round-up-power-of-two of the
        # minimum tokens still needed across active slots, capped at
        # steps_per_sync — so a uniform burst finishes in exactly one window
        # with no wasted slot-steps; one step fn lazily compiles per k.
        # steps_per_sync=1 reproduces per-token stepping exactly.
        self.steps_per_sync = max(int(steps_per_sync), 1)
        self._step_fns: dict[int, any] = {}
        # working-cache bucket granularity (see _build_step); tests shrink it
        # to cross buckets cheaply on tiny models
        self._kv_bucket_step = 512
        # admission prefill memory gate (see _admit_fn): above this f32-score
        # byte bound a wave routes through flash (TPU, llama family) or
        # chunked prefill instead of materializing one [n, H, S, T] score
        # block — same 2 GB gate as the single-stream path
        # (decoder_lm._prefill_with_reuse); tests shrink it to force the
        # chunked path on tiny models
        self._admit_score_limit = 2_000_000_000
        self._flash_ok = bool(getattr(lm, "_flash_ok", False))
        self._admit_plans: dict = {}   # (bucket, m) -> chosen memory plan

    # ------------------------------------------------------------------

    def _init_cache1(self, length: int):
        """One B=1 cache of the engine's dtype/quantization discipline."""
        if self._kv_quantized:
            return self.lm.family.init_cache(self.cfg, 1, length,
                                             self._dtype, quantized=True)
        return self.lm.family.init_cache(self.cfg, 1, length, self._dtype)

    def _step_fn(self, k_steps: int, plain: bool, kv_bucket):
        key = (k_steps, plain, kv_bucket)
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        fn = self._build_step(k_steps, plain, kv_bucket)
        self._step_fns[key] = fn
        return fn

    def _build_step(self, k_steps: int, plain: bool, kv_bucket):
        """plain=True compiles the all-greedy/no-penalty fast path: pure
        argmax, no per-slot top-k sort (a vmapped lax.cond executes BOTH
        branches, so on a real 100k+ vocab every greedy window would
        otherwise pay the sampling sort per slot per token), no key splits,
        no history-ring maintenance. Stale hist/keys for plain slots are
        harmless in later mixed windows: penalty 1.0 is a no-op over any
        history and greedy sampling never reads the key.

        kv_bucket (static) slices every slot's WORKING cache to the current
        ceil-to-512 frontier for the whole window and writes it back once:
        the layer scan restacks whatever cache it carries every iteration,
        so carrying the full allocated context costs capacity-proportional
        HBM traffic per token (cf. decoder_lm._fused_loop_fn and the
        BASELINE.md round-3 long-context memo). Inactive lanes may clamp
        their writes at the slice edge — confined to their own lane's
        garbage cache, which admission re-prefills from position 0."""
        cfg = self.cfg
        fwd = self.family.forward
        ngram = self.no_repeat_ngram_size

        @partial(jax.jit, donate_argnums=(1, 2, 3, 5, 12, 13))
        def step(params, toks, ck, cv, pos, keys, temp, top_k, top_p, min_p,
                 pen, ngram_on, hist, hist_len):
            full_ck, full_cv = ck, cv
            if kv_bucket is not None:
                # [S, L, 1, Hkv, T, D]: T is axis 4
                ck = slice_working(ck, kv_bucket, axis=4)
                cv = slice_working(cv, kv_bucket, axis=4)
            # vmap the B=1 forward over the slot axis: each slot attends its
            # own cache at its own frontier and samples with its own params
            # and PRNG key — then fuse k such iterations in one dispatch
            # (lax.fori_loop), advancing tokens, caches, PRNG streams, and
            # the penalty-history ring entirely on device. The host sees ONE
            # packed [S, k+1] block: column 0 is the entry token (reports the
            # admission-sampled token of freshly joined slots), columns 1..k
            # are this window's samples.
            def one(i, tok, ck1, cv1, p, key, t, tk, tp, mp, pe, ng, h, hl):
                logits, ck1, cv1 = fwd(params, cfg, tok[None, None], ck1, cv1,
                                       p + i)
                l = logits[0]
                if plain:
                    return (fast_argmax(l), ck1, cv1, key, h, hl)
                valid = jnp.arange(_HIST_BUF) < hl
                l = apply_repetition_penalty(l, h, valid, pe)  # pe=1 → no-op
                if ngram > 1:
                    l = jnp.where(ng, apply_no_repeat_ngram(l, h, hl, ngram), l)
                key, sub = jax.random.split(key)
                nxt = _sample_slot(l, sub, t, tk, tp, mp)
                h, hl = _hist_append(h, hl, nxt)
                return nxt, ck1, cv1, key, h, hl

            def body(i, state):
                toks, ck, cv, keys, hist, hist_len, out = state
                toks, ck, cv, keys, hist, hist_len = jax.vmap(
                    one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
                )(i, toks, ck, cv, pos, keys, temp, top_k, top_p, min_p,
                  pen, ngram_on, hist, hist_len)
                out = out.at[:, i + 1].set(toks)
                return toks, ck, cv, keys, hist, hist_len, out

            out = jnp.full((toks.shape[0], k_steps + 1), -1, jnp.int32)
            out = out.at[:, 0].set(toks)        # entry tokens (column 0)
            toks, ck, cv, keys, hist, hist_len, out = jax.lax.fori_loop(
                0, k_steps, body,
                (toks, ck, cv, keys, hist, hist_len, out))
            if kv_bucket is not None:
                ck = write_back(full_ck, ck)
                cv = write_back(full_cv, cv)
            return out, toks, ck, cv, keys, hist, hist_len

        return step

    @property
    def _prefix_ids(self) -> list:
        """First registered prefix's token ids (legacy single-prefix view;
        [] when the table is empty)."""
        return self._prefixes[0][0] if self._prefixes else []

    def register_prefix(self, prompt: str) -> int:
        """Prompt caching across slots: prefill `prompt` ONCE, and every
        subsequent submit whose token ids start with it gets the cached KV
        copied into its slot — admission then computes only the suffix.
        The single-stream analogue is DecoderLM._prefill_with_reuse; this
        is the serving-side version (e.g. a shared system prompt). Up to
        `max_prefixes` distinct prefixes can be registered (multi-tenant:
        one per system prompt); each prompt admits against its LONGEST
        matching prefix. Returns the cached token count. Beyond-reference
        feature."""
        return self._register_prefix_ids(
            self.lm.encode_prompt(prompt, add_bos=True))

    def _match_prefix(self, ids: list) -> tuple[int, int]:
        """(table index, prefix length) of the longest registered prefix
        `ids` extends by at least one token; (-1, 0) on a miss."""
        best, m = -1, 0
        for pi, (pids, _) in enumerate(self._prefixes):
            P = len(pids)
            if P > m and len(ids) > P and ids[:P] == pids:
                best, m = pi, P
        return best, m

    def _register_prefix_ids(self, ids: list) -> int:
        if len(ids) + 1 + self.steps_per_sync >= self.T:
            raise GenerationError(
                f"prefix ({len(ids)} tokens) leaves no room in slot "
                f"capacity {self.T}")
        ids = list(ids)
        for pids, _ in self._prefixes:
            if pids == ids:
                return len(ids)            # already cached
        if len(self._prefixes) >= self.max_prefixes:
            raise GenerationError(
                f"prefix table is full ({self.max_prefixes}); raise "
                f"max_prefixes or drop one workload's prefix")
        ck1, cv1 = self._init_cache1(len(ids))
        _, ck1, cv1 = self.family.forward(
            self.lm.params, self.cfg,
            jnp.asarray([ids], jnp.int32), ck1, cv1, jnp.int32(0))
        self._prefixes.append((ids, (ck1, cv1)))   # kv: [L, 1, Hkv, P, D]
        return len(ids)

    def _maybe_auto_prefix(self, ids: list) -> None:
        """Automatic prompt-caching: learn shared prefixes from traffic.
        A prompt not covered by any registered prefix becomes the candidate;
        when a later uncovered prompt shares >= auto_prefix_min leading
        tokens with it, that common prefix is materialized once and every
        subsequent matching request admits suffix-only. Learning continues
        (multi-tenant workloads converge on one prefix per system prompt)
        until the table holds max_prefixes entries, which bounds the
        admission jit-variant space."""
        if not self.auto_prefix_min \
                or len(self._prefixes) >= self.max_prefixes:
            return
        if self._match_prefix(ids)[0] >= 0:
            return                          # already covered by the table
        if self._auto_candidate is None:
            self._auto_candidate = list(ids)
            return
        cand = self._auto_candidate
        limit = min(len(cand), len(ids) - 1)
        m = 0
        while m < limit and cand[m] == ids[m]:
            m += 1
        if m >= self.auto_prefix_min \
                and m + 1 + self.steps_per_sync < self.T:
            self._register_prefix_ids(ids[:m])
            self._auto_candidate = None
        else:
            # keep the newer prompt as candidate so a drifting workload can
            # still converge on its current common prefix
            self._auto_candidate = list(ids)

    def _admit_fn(self, bucket: int, m: int = 0):
        """Fused BATCHED admission: prefill n requests into n free slots,
        sample each one's first token (same penalty chain as the step;
        history = prompt tail, cf. decoder_lm.py:359 which seeds the buffer
        with the prompt), and scatter ALL per-slot state at the slot
        indices — ONE dispatch, zero readbacks, regardless of how many
        requests joined. The per-slot B=1 prefill is vmapped over the lanes
        so XLA batches the matmuls (n B=1 prefills cost ~one batch-n
        prefill, not n sequential ones). The lane count is ALWAYS the
        engine's slot count — partial waves pad by duplicating a real lane
        (identical duplicate scatters are consistent), so exactly ONE
        variant compiles per prompt bucket instead of one per
        (bucket, wave-size): a fresh wave size in production would
        otherwise stall a live burst behind a multi-second compile.
        Sampled tokens land in last_tok[slots] and are reported as column 0
        of the next window's packed block.

        m > 0 compiles the shared-prefix variant (register_prefix): the
        cached prefix KV is broadcast-copied into every joining slot's
        cache at [0:m] and ids_n holds only the SUFFIX, prefilled at
        pos_start=m — admission compute is suffix-proportional."""
        fn = self._prefill_cache.get((bucket, m))
        if fn is not None:
            return fn
        cfg = self.cfg
        fwd_hidden = self.family.forward_hidden
        head_fn = self.family.head_logits
        ngram = self.no_repeat_ngram_size

        # --- admission memory plan (static per (bucket, m) variant) -------
        # The wave attends the slot caches over the working range [0, kb);
        # a materialized score block costs 4*H*S*kb bytes per lane in f32.
        # Under the limit the single fused pass wins; above it, flash (no
        # score materialization) where available, else the suffix prefills
        # in chunks whose score blocks stay bounded — either way a
        # multi-thousand-token prompt joining an 8-slot long-context engine
        # cannot OOM the device (VERDICT r3 item 4).
        n_lanes = self.S
        kb = min(-(-(m + bucket) // 256) * 256, self.T)
        if kb >= self.T:
            kb = None                    # working range covers the cache
        eff_kb = kb if kb is not None else self.T
        limit = self._admit_score_limit
        score_bytes = 4 * cfg.num_heads * bucket * eff_kb * n_lanes
        chunk = None
        if score_bytes <= limit:
            mode = "plain"
        elif self._flash_ok:
            mode = "flash"
        else:
            mode = "plain"               # bucket < 128: block is tiny anyway
            for c in (2048, 1024, 512, 256, 128):
                if bucket % c == 0 and c < bucket:
                    mode, chunk = "chunked", c
                    if 4 * cfg.num_heads * c * eff_kb * n_lanes <= limit:
                        break            # largest dividing chunk under limit
        emb = self.lm.params["embed"]
        h_dim = int(emb.shape[-1])
        act_dtype = self._dtype
        self._admit_plans[(bucket, m)] = {
            "mode": mode, "chunk": chunk, "kb": eff_kb,
            "score_bytes": score_bytes}

        @partial(jax.jit,
                 donate_argnums=(2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
        def admit(params, ids_n, ck, cv, slots_n,
                  last_tok, keys, hist, hist_len,
                  temp, top_k, top_p, min_p, pen, ngram_on,
                  last_idx_n, keys0_n, tails_n, tail_len_n, fp_n, tk_n, ng_n,
                  prefix_kv=None):
            # gather the joining slots' caches [n, L, 1, Hkv, T, D] and fold
            # them into ONE plain batched prefill [L, n, Hkv, T, D] — the
            # same fast path generate_batch uses — instead of vmapping n
            # B=1 forwards (measured ~3.5x slower for a full 8-slot wave).
            # All transforms are tree-mapped: the int8 cache is a dict whose
            # "s" leaf drops the trailing D axis but keeps every other axis
            # at the same index, so the same lambdas apply.
            fold = lambda a: jnp.moveaxis(a[slots_n][:, :, 0], 0, 1)
            ckb = jax.tree.map(fold, ck)
            cvb = jax.tree.map(fold, cv)
            if m:
                pk, pv = prefix_kv         # [L, 1, Hkv, m, D] -> all lanes

                def bcast(dst, src):
                    bshape = (src.shape[0], dst.shape[1]) + src.shape[2:]
                    return jax.lax.dynamic_update_slice(
                        dst, jnp.broadcast_to(src, bshape).astype(dst.dtype),
                        (0,) * dst.ndim)

                ckb = jax.tree.map(bcast, ckb, pk)
                cvb = jax.tree.map(bcast, cvb, pv)
            # decode on the [0, kb) working slice (write back after): the
            # admission pass and its scores see only the working range
            full_ckb = full_cvb = None
            if kb is not None:
                full_ckb, full_cvb = ckb, cvb
                ckb = slice_working(ckb, kb, axis=3)
                cvb = slice_working(cvb, kb, axis=3)
            # right-padded rows: row r's prompt ends at last_idx_n[r]; its
            # causal query there attends only its own real tokens, and the
            # garbage K/V beyond it sit past the decode frontier until
            # overwritten (same discipline as llama.py forward's docstring)
            if mode == "chunked":
                def chunk_body(carry, i):
                    ckb, cvb, last_h = carry
                    blk = jax.lax.dynamic_slice_in_dim(ids_n, i * chunk,
                                                       chunk, axis=1)
                    x, ckb, cvb = fwd_hidden(params, cfg, blk, ckb, cvb,
                                             m + i * chunk)
                    idx = jnp.clip(last_idx_n - i * chunk, 0, chunk - 1)
                    cand = jnp.take_along_axis(
                        x, idx[:, None, None], axis=1)[:, 0]
                    sel = ((last_idx_n >= i * chunk) &
                           (last_idx_n < (i + 1) * chunk))
                    last_h = jnp.where(sel[:, None],
                                       cand.astype(last_h.dtype), last_h)
                    return (ckb, cvb, last_h), None

                last_h0 = jnp.zeros((ids_n.shape[0], h_dim), act_dtype)
                (ckb, cvb, last_h), _ = jax.lax.scan(
                    chunk_body, (ckb, cvb, last_h0),
                    jnp.arange(bucket // chunk))
            else:
                x, ckb, cvb = fwd_hidden(
                    params, cfg, ids_n, ckb, cvb, jnp.int32(m),
                    use_flash=(mode == "flash"),
                    kv_bucket=(eff_kb if mode == "flash" else None))
                last_h = jnp.take_along_axis(
                    x, last_idx_n[:, None, None], axis=1)[:, 0]
            if full_ckb is not None:
                ckb = write_back(full_ckb, ckb)
                cvb = write_back(full_cvb, cvb)
            logits_n = head_fn(params, cfg, last_h)

            def lane(l, key0, tail, tl, fp, tk, ng):
                valid = jnp.arange(_HIST_BUF) < tl
                l = apply_repetition_penalty(l, tail, valid, fp[3])
                if ngram > 1:
                    l = jnp.where(ng,
                                  apply_no_repeat_ngram(l, tail, tl, ngram),
                                  l)
                key, sub = jax.random.split(key0)
                tok = _sample_slot(l, sub, fp[0], tk, fp[1], fp[2])
                h, hl = _hist_append(tail, tl, tok)
                return tok, key, h, hl

            toks, keys_n, h_n, hl_n = jax.vmap(lane)(
                logits_n, keys0_n, tails_n, tail_len_n, fp_n, tk_n, ng_n)
            # scatter the new slots' state at their indices (duplicates from
            # lane padding write identical values)
            unfold = lambda full, w: full.at[slots_n].set(
                jnp.moveaxis(w, 1, 0)[:, :, None])
            ck = jax.tree.map(unfold, ck, ckb)
            cv = jax.tree.map(unfold, cv, cvb)
            last_tok = last_tok.at[slots_n].set(toks)
            keys = keys.at[slots_n].set(keys_n)
            hist = hist.at[slots_n].set(h_n)
            hist_len = hist_len.at[slots_n].set(hl_n)
            temp = temp.at[slots_n].set(fp_n[:, 0])
            top_p = top_p.at[slots_n].set(fp_n[:, 1])
            min_p = min_p.at[slots_n].set(fp_n[:, 2])
            pen = pen.at[slots_n].set(fp_n[:, 3])
            top_k = top_k.at[slots_n].set(tk_n)
            ngram_on = ngram_on.at[slots_n].set(ng_n)
            return (ck, cv, last_tok, keys, hist, hist_len,
                    temp, top_k, top_p, min_p, pen, ngram_on)

        self._prefill_cache[(bucket, m)] = admit
        return admit

    # ------------------------------------------------------------------

    def submit(self, prompt: Optional[str] = None, max_new_tokens: int = 128,
               sampling: Optional[SamplingParams] = None,
               seed: Optional[int] = None,
               repetition_penalty: float = 1.0,
               no_repeat_ngram: bool = False,
               defer_admit: bool = False,
               token_ids: Optional[list] = None) -> int:
        """Queue a request; it joins the running batch at the next step.

        sampling=None (or temperature<=0) decodes greedily; otherwise the
        slot samples with its own temperature/top_k/top_p/min_p and a PRNG
        stream derived from `seed` (default: the request id).
        repetition_penalty compounds per occurrence over the slot's last
        _HIST_BUF generated tokens; no_repeat_ngram uses the engine's static
        `no_repeat_ngram_size` (a jit shape), toggled per request.

        defer_admit=True only queues: a caller submitting a burst defers so
        that the next step()/admit() prefills the whole wave in ONE batched
        dispatch instead of one per request (serve_batching.ContinuousRunner
        does this).
        """
        if no_repeat_ngram and self.no_repeat_ngram_size <= 1:
            raise GenerationError(
                "engine was built with no_repeat_ngram_size<=1; pass it to "
                "ContinuousEngine(...) to enable per-request ngram blocking")
        if token_ids is not None:
            ids = list(token_ids)        # pre-encoded (e.g. serve_openai)
        elif prompt is not None:
            ids = self.lm.encode_prompt(prompt, add_bos=True)
        else:
            raise GenerationError("either prompt or token_ids is required")
        self._maybe_auto_prefix(ids)
        # worst-case cache frontier: prefill + decode writes. A slot
        # finishing mid-window (EOS, or another slot pinning a larger
        # adaptive k) still writes its whole window, so reserve one maximal
        # window of overshoot beyond the max_new-1 decode writes.
        k = self.steps_per_sync
        need = len(ids) + (max_new_tokens - 1) + k
        if need > self.T:
            raise GenerationError(
                f"prompt ({len(ids)} tokens) + max_new_tokens "
                f"({max_new_tokens}) + worst-case {k}-token decode-window "
                f"overshoot ({need} total) exceeds slot capacity {self.T}")
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, ids, max_new_tokens, sampling, seed,
                            repetition_penalty, no_repeat_ngram))
        self.stats["submitted"] += 1
        if not defer_admit:
            self._admit()
        return rid

    def _admit(self) -> None:
        """Prefill queued requests into free slots — one fused BATCHED
        dispatch per prompt-length bucket, no device→host sync (each first
        token is reported by the next window's packed readback)."""
        pairs = []
        for slot_idx, slot in enumerate(self._slots):
            if not self._queue:
                break
            if slot.active:
                continue
            pairs.append((slot_idx, self._queue.pop(0)))
        if not pairs:
            return
        groups: dict[tuple, list] = {}
        for slot_idx, req in pairs:
            ids = req[1]
            # shared-prefix hit: token ids start with a registered prefix
            # and at least one suffix token remains to produce logits.
            # Waves group by (prefix INDEX, bucket) — two different prefixes
            # in one wave dispatch separately — while the jitted admission
            # variant is keyed by (bucket, prefix LENGTH) only, because the
            # prefix KV is a traced argument.
            pi, m = self._match_prefix(ids)
            # cap the prefill block at the remaining capacity: an uncapped
            # bucket at pos_start=m would make _cache_write's
            # dynamic_update_slice CLAMP the start index and land the
            # suffix K/V at shifted positions — silent corruption
            groups.setdefault(
                (pi, m, seq_bucket(len(ids) - m, self.T - m)), []).append(
                (slot_idx, req))
        for (pi, m, bucket), grp in groups.items():
            n = len(grp)
            self.stats["admission_waves"] += 1
            if m:
                self.stats["prefix_hits"] += n
            npad = self.S            # fixed lane count: one jit per bucket
            ids_n = np.zeros((npad, bucket), np.int32)
            slots_n = np.zeros(npad, np.int32)
            last_idx_n = np.zeros(npad, np.int32)
            tails_n = np.zeros((npad, _HIST_BUF), np.int32)
            tail_len_n = np.zeros(npad, np.int32)
            fp_n = np.zeros((npad, 4), np.float32)
            tk_n = np.zeros(npad, np.int32)
            ng_n = np.zeros(npad, bool)
            keys0 = []
            for j, (slot_idx, req) in enumerate(grp):
                rid, ids, max_new, sampling, seed, rep_pen, ngram_on = req
                sfx = ids[m:]                  # whole prompt when m == 0
                ids_n[j, :len(sfx)] = sfx      # right-pad; garbage slots are
                # never attended: queries stop at last_idx, later writes
                # overwrite
                slots_n[j] = slot_idx
                last_idx_n[j] = len(sfx) - 1
                sp = sampling or SamplingParams(temperature=0.0)
                # penalties run over prompt + generated (decoder_lm.py:359);
                # seed the rolling window with the prompt tail
                tail = ids[-_HIST_BUF:]
                tails_n[j, :len(tail)] = tail
                tail_len_n[j] = len(tail)
                fp_n[j] = (sp.temperature,
                           1.0 if sp.top_p is None else sp.top_p,
                           sp.min_p or 0.0, rep_pen)
                tk_n[j] = sp.top_k or 0
                ng_n[j] = ngram_on
                keys0.append(jax.random.PRNGKey(
                    rid if seed is None else seed))
            for j in range(n, npad):   # pad: duplicate lane 0 (identical
                # duplicate scatters write identical values — consistent)
                ids_n[j] = ids_n[0]
                slots_n[j] = slots_n[0]
                last_idx_n[j] = last_idx_n[0]
                tails_n[j] = tails_n[0]
                tail_len_n[j] = tail_len_n[0]
                fp_n[j] = fp_n[0]
                tk_n[j] = tk_n[0]
                ng_n[j] = ng_n[0]
                keys0.append(keys0[0])
            extra = {"prefix_kv": self._prefixes[pi][1]} if m else {}
            (self.cache_k, self.cache_v, self._last_tok, self._keys,
             self._hist, self._hist_len, self._temp, self._top_k,
             self._top_p, self._min_p, self._penalty, self._ngram_on) = \
                self._admit_fn(bucket, m)(
                    self.lm.params, jnp.asarray(ids_n), self.cache_k,
                    self.cache_v, jnp.asarray(slots_n),
                    self._last_tok, self._keys, self._hist, self._hist_len,
                    self._temp, self._top_k, self._top_p, self._min_p,
                    self._penalty, self._ngram_on,
                    jnp.asarray(last_idx_n), jnp.stack(keys0),
                    jnp.asarray(tails_n), jnp.asarray(tail_len_n),
                    jnp.asarray(fp_n), jnp.asarray(tk_n),
                    jnp.asarray(ng_n), **extra)
            for slot_idx, req in grp:
                rid, ids, max_new, sampling = req[0], req[1], req[2], req[3]
                sp = sampling or SamplingParams(temperature=0.0)
                slot = self._slots[slot_idx]
                slot.request_id = rid
                slot.active = True
                slot.pos = len(ids)
                slot.remaining = max_new
                slot.pending_first = True
                slot.plain = (sp.temperature <= 0.0 and req[5] == 1.0
                              and not req[6])
                slot.generated = []

    def _note_token(self, slot_idx: int, tok: int) -> None:
        """Bookkeep one accepted token (the device already appended it to
        the penalty-history ring inside the fused dispatch)."""
        slot = self._slots[slot_idx]
        if tok in self.lm.stop_token_ids:
            self._finish(slot_idx, "eos")
            return
        slot.generated.append(tok)
        self.stats["tokens"] += 1
        slot.remaining -= 1
        if slot.remaining <= 0:
            self._finish(slot_idx, "length")

    def _finish(self, slot_idx: int, reason: str) -> None:
        self.stats["finished"] += 1
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
        slot — a single XLA dispatch whose ONLY host sync is the packed
        [S, k+1] token block.

        A slot that finishes mid-window (EOS or budget) has its trailing
        window tokens discarded; the capacity check in submit() reserves the
        overshoot so the extra cache writes never clobber live positions.
        """
        self._admit()   # freed slots pick up waiting requests first
        if self.num_active == 0:
            return
        was_active = [s.active for s in self._slots]
        pending = [s.pending_first for s in self._slots]
        pos = np.array([s.pos for s in self._slots], np.int32)
        # adaptive window: smallest power of two covering the least-loaded
        # active slot's outstanding tokens (so nobody decodes far past its
        # budget), capped at steps_per_sync
        needed = min(
            (s.remaining - (1 if s.pending_first else 0)
             for s in self._slots if s.active))
        k = 1
        while k < needed and k * 2 <= self.steps_per_sync:
            k *= 2
        self.stats["windows"] += 1
        plain = all(s.plain for s in self._slots if s.active)
        # working-cache bucket: highest active frontier + this window,
        # rounded up to the bucket step (one compiled variant per bucket)
        kbs = self._kv_bucket_step
        top = max(s.pos for s in self._slots if s.active)
        kb = -(-(top + k + 1) // kbs) * kbs
        if kb >= self.T:
            kb = None
        (packed, self._last_tok, self.cache_k, self.cache_v, self._keys,
         self._hist, self._hist_len) = self._step_fn(k, plain, kb)(
            self.lm.params, self._last_tok, self.cache_k,
            self.cache_v, jnp.asarray(pos), self._keys,
            self._temp, self._top_k, self._top_p, self._min_p,
            self._penalty, self._ngram_on, self._hist, self._hist_len)
        out = np.asarray(packed)       # [S, k+1] — the window's one sync
        for i, slot in enumerate(self._slots):
            if not was_active[i]:
                continue
            if pending[i]:
                # column 0 = the token sampled at admission; its cache write
                # happened as iteration 0 of THIS window, so pos does not
                # advance for it here
                slot.pending_first = False
                self._note_token(i, int(out[i, 0]))
                if not slot.active:
                    continue
            for j in range(1, out.shape[1]):
                slot.pos += 1
                self._note_token(i, int(out[i, j]))
                if not slot.active:
                    break   # discard the rest of the window
        # slots freed this window admit waiting work immediately so the next
        # step() decodes them — keeps the batch full without an extra sync
        if self._queue:
            self._admit()

    def drain(self) -> list[FinishedRequest]:
        out, self._finished = self._finished, []
        return out

    def run(self) -> list[FinishedRequest]:
        """Step until every submitted request has finished."""
        while self.num_active or self.num_waiting:
            self.step()
        return self.drain()
