"""DecoderLM: a loaded autoregressive language model with a streaming generator.

Rebuild of the reference decoder generation stack: DecoderGenerator
(kjarni-transformers/src/decoder/generator.rs:20), the backend dispatch
(decoder/backend.rs:15), and run_generation_loop (generator.rs:228).

TPU design: two jitted programs per model —
  * prefill: [1, S_bucket] prompt forward writing the KV cache, logits at the
    last real token;
  * decode step: penalties + sampling + single-token forward FUSED into one
    device dispatch, with the KV cache and history buffer donated so XLA
    updates them in place.
The host loop only does: one int sync per token (the sampled id), stop checks,
and incremental detokenization — the reference's mpsc-channel machinery
(generator.rs:193-225) reduces to a Python generator.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import random as _random
from functools import partial
from pathlib import Path
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bucketing import seq_bucket
from ..core.cancellation import CancellationToken
from ..core.kvcache import slice_working, write_back
from ..core.errors import GenerationError, InvalidConfigError
from ..core.stats import GenerationStats
from ..chat_templates import ChatTemplate, Conversation, template_for_arch
from ..generate.sampling import (GenerationConfig, process_logits, sample_token)
from ..generate.stream import StreamDecoder, StreamedToken, TokenType
from ..tokenizer import KjarniTokenizer
from ..weights.safetensors_loader import ModelWeights
from . import gpt2 as kgpt2
from . import llama as kllama

DEFAULT_MAX_CONTEXT = 4096

logger = logging.getLogger(__name__)


def resolve_dtype(dtype):
    """"auto" -> bf16 on accelerators, f32 on CPU (ModelLoadConfig
    target_dtype analogue, models/base.rs:118)."""
    if dtype in ("auto", None):
        import ml_dtypes
        return (ml_dtypes.bfloat16
                if jax.devices()[0].platform != "cpu" else np.float32)
    if isinstance(dtype, str):
        import ml_dtypes
        return {"f32": np.float32, "float32": np.float32,
                "bf16": ml_dtypes.bfloat16,
                "bfloat16": ml_dtypes.bfloat16}[dtype]
    return dtype


class DecoderLM:
    """A causal LM ready for generation (cf. DecoderLanguageModel traits.rs:272)."""

    def __init__(self, model_dir: Path, dtype="auto",
                 max_context: Optional[int] = None,
                 quantize: Optional[str] = None,
                 kv_cache: Optional[str] = None,
                 execution_plan=None,
                 tp: Optional[int] = None):
        dtype = resolve_dtype(dtype)
        model_dir = Path(model_dir)
        self.model_dir = model_dir
        # weights source priority: native checkpoint > safetensors > GGUF
        # (gguf_loader.rs fallback order, plus the Orbax fast path)
        from ..weights.checkpoint import has_checkpoint
        gguf_path = model_dir / "model.gguf"
        has_safetensors = (model_dir / "model.safetensors").exists() or \
            (model_dir / "model.safetensors.index.json").exists()
        ws = None
        if has_safetensors:
            ws = ModelWeights(model_dir)
        elif gguf_path.exists():
            from ..weights.gguf import GgufWeights
            ws = GgufWeights(gguf_path)
        elif not has_checkpoint(model_dir):
            ws = ModelWeights(model_dir)  # raises with a clear error
        cfg_path = model_dir / "config.json"
        if cfg_path.exists():
            hf_cfg = json.loads(cfg_path.read_text())
        else:
            hf_cfg = ws.hf_config()  # GGUF metadata -> HF-style config
        self.hf_config = hf_cfg
        mt = hf_cfg.get("model_type", "llama")

        if mt in ("gpt2",):
            self.family = kgpt2
            self.config = kgpt2.Gpt2Config.from_hf(hf_cfg)
        else:
            self.family = kllama
            self.config = kllama.DecoderConfig.from_hf(hf_cfg)
        cfg = self.config

        self.max_context = min(cfg.max_seq_len, max_context or DEFAULT_MAX_CONTEXT)
        from ..weights.checkpoint import load_checkpoint
        if has_checkpoint(model_dir):
            params = load_checkpoint(model_dir)
        elif self.family is kllama:
            params = kllama.load_params(ws, cfg, dtype, rope_cache_len=self.max_context)
        else:
            params = kgpt2.load_params(ws, cfg, dtype)
        if quantize == "int8" and self.family is kllama:
            # skip if the checkpoint is already quantized
            if not isinstance(params.get("lm_head"), dict):
                params = kllama.quantize_params_int8(params)
        elif quantize == "int4" and self.family is kllama:
            # packed two-per-byte int4 ("w4"): works on every backend,
            # including tunnels without native int4 device_put
            if not isinstance(params.get("lm_head"), dict):
                params = kllama.quantize_params_int4(params)
        elif quantize not in (None, "int8", "int4"):
            raise InvalidConfigError(f"unknown quantize mode '{quantize}'")
        self.params = jax.tree.map(jnp.asarray, params)

        # tensor parallelism over a ("dp","tp") mesh (parallel/mesh.py):
        # Megatron column/row-sharded params, kv-head-sharded cache, same
        # jitted programs — GSPMD inserts the ICI collectives. This is the
        # product path for the scale-out axis the reference never had
        # (SURVEY §2.5, §7 step 8).
        self._mesh = None
        if tp is not None and tp > 1:
            if self.family is not kllama:
                raise InvalidConfigError(
                    "tensor parallelism (tp>1) supports llama-family models "
                    "only (llama/qwen2/mistral/phi3)")
            if execution_plan is not None:
                raise InvalidConfigError(
                    "tp>1 and execution_plan host-offload are mutually "
                    "exclusive (host pinning is a single-chip optimization)")
            n_dev = len(jax.devices())
            if n_dev < tp:
                raise InvalidConfigError(
                    f"tp={tp} requested but only {n_dev} device(s) visible")
            from ..parallel.mesh import make_mesh, shard_llama_params
            self._mesh = make_mesh(tp, dp=1, tp=tp)
            self.params = shard_llama_params(self.params, self._mesh)

        # per-stage host offload (ExecutionPlan, execution/plan.rs:4): pin the
        # embedding table and/or lm head in host memory; the matching compute
        # runs host-side inside jit (core/placement.py). Llama family only —
        # gpt2 ties everything through wte. A quantized (dict) head stays on
        # device: it is already 4x smaller and _head_mm has no host int8 path.
        from ..core.placement import ExecutionPlan, to_host_memory
        plan = ExecutionPlan.resolve(execution_plan)
        self.execution_plan = plan
        if self.family is kllama and plan != ExecutionPlan():
            embed_host = plan.embeddings == "host"
            head_host = (plan.lm_head == "host"
                         and not isinstance(self.params.get("lm_head"), dict))
            if embed_host:
                self.params["embed"] = to_host_memory(self.params["embed"])
            if head_host:
                self.params["lm_head"] = to_host_memory(self.params["lm_head"])
            self.config = dataclasses.replace(
                cfg, embed_on_host=embed_host, lm_head_on_host=head_host)
            cfg = self.config
        self._cache_dtype = dtype
        if kv_cache not in (None, "int8"):
            raise InvalidConfigError(f"unknown kv_cache mode '{kv_cache}'")
        if kv_cache == "int8" and self.family is not kllama:
            # fail loudly (cf. the tp>1 gate above): the CLI/serve --kv-cache
            # flag is user-reachable and a silently-bf16 cache would lie
            raise InvalidConfigError(
                "kv_cache='int8' supports llama-family models only "
                "(llama/qwen2/mistral/phi3)")
        self._kv_quantized = (kv_cache == "int8")
        self._cache = None  # allocated lazily, reused across generations

        tok_path = model_dir / "tokenizer.json"
        if tok_path.exists():
            self.tokenizer = KjarniTokenizer.from_file(tok_path)
        else:
            # GGUF files embed vocab+merges; build the in-tree BPE from them
            from ..tokenizer_native import bpe_from_gguf_metadata
            bpe = None
            if ws is not None and hasattr(ws, "metadata"):
                bpe = bpe_from_gguf_metadata(ws.metadata)
            if bpe is None:
                raise InvalidConfigError(
                    f"no tokenizer.json in {model_dir} and no GGUF-embedded "
                    f"tokenizer available")
            self.tokenizer = bpe
        self.chat_template: ChatTemplate = template_for_arch(cfg.arch)

        # stop tokens: generation_config.json eos wins over config.json
        eos: tuple[int, ...] = tuple(cfg.eos_token_ids)
        gen_cfg_path = model_dir / "generation_config.json"
        self.hf_generation_config: dict = {}
        if gen_cfg_path.exists():
            self.hf_generation_config = json.loads(gen_cfg_path.read_text())
            g_eos = self.hf_generation_config.get("eos_token_id")
            if g_eos is not None:
                eos = tuple(g_eos) if isinstance(g_eos, list) else (int(g_eos),)
        self.stop_token_ids = set(eos)
        self.bos_token_id = cfg.bos_token_id

        fwd = self.family.forward
        # flash prefill: TPU-only, llama-family, no sliding window, long prompts
        self._flash_min_seq = 512
        self._flash_ok = (
            self.family is kllama
            and jax.devices()[0].platform != "cpu"
            # Pallas custom-calls don't partition under GSPMD; the XLA
            # attention path shards fine, so tp runs without flash
            and self._mesh is None)

        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("use_flash", "kv_bucket"))
        def _prefill(params, ck, cv, ids, last_idx, pos_start=0,
                     use_flash=False, kv_bucket=None):
            if use_flash:
                # kv_bucket <= S: from-zero prefill over the fresh block;
                # kv_bucket > S: cache-reuse prefill — flash attends the
                # bucket-sliced cache at dynamic q_offset (prompt caching)
                logits, ck, cv = fwd(params, cfg, ids, ck, cv, pos_start,
                                     last_idx, use_flash=True,
                                     kv_bucket=kv_bucket)
            else:
                logits, ck, cv = fwd(params, cfg, ids, ck, cv, pos_start,
                                     last_idx)
            return logits[0], ck, cv

        self._prefill = _prefill
        self._steps: dict = {}
        # decode attention reads only the current ceil-to-bucket slice of the
        # cache (fill-proportional, not capacity-proportional); contexts at
        # or below one bucket keep the single full-cache variant
        self._kv_bucket_step = 512
        # conversation prefix reuse (cf. Cache::clone_box, cache/mod.rs:20):
        # token ids currently materialized in the single-stream cache
        self._session_ids: list[int] = []
        self._min_reuse_prefix = 16

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _ensure_cache(self):
        if self._cache is None:
            if self._kv_quantized:
                cache = kllama.init_cache(
                    self.config, 1, self.max_context, self._cache_dtype,
                    quantized=True)
            else:
                cache = self.family.init_cache(
                    self.config, 1, self.max_context, self._cache_dtype)
            if self._mesh is not None:
                from ..parallel.mesh import shard_cache
                cache = shard_cache(cache, self._mesh)
            self._cache = cache
        return self._cache

    def _step_fn(self, gen: GenerationConfig):
        key = (gen.strategy, gen.sampling, gen.repetition_penalty,
               gen.no_repeat_ngram_size)
        fn = self._steps.get(key)
        if fn is not None:
            return fn
        cfg = self.config
        fwd = self.family.forward
        greedy = gen.strategy == "greedy"
        sp = gen.sampling
        pen, ngram = gen.repetition_penalty, gen.no_repeat_ngram_size

        @partial(jax.jit, donate_argnums=(1, 2, 4),
                 static_argnames=("kv_bucket",))
        def step(params, ck, cv, logits, history, hist_len, rng,
                 kv_bucket=None):
            # per-token working-cache slice (see _fused_loop_fn): the layer
            # scan restacks whatever cache it carries, so decode on the
            # bucket slice and write it back — two bucket-sized copies
            # instead of a capacity-sized restack
            full_ck, full_cv = ck, cv
            if kv_bucket is not None:
                ck = slice_working(ck, kv_bucket, axis=3)
                cv = slice_working(cv, kv_bucket, axis=3)
            lg = process_logits(logits, history, hist_len, pen, ngram)
            rng, sub = jax.random.split(rng)
            tok = sample_token(lg, sub, sp, greedy)
            history = history.at[hist_len].set(tok, mode="drop")
            new_logits, ck, cv = fwd(params, cfg, tok[None, None], ck, cv,
                                     hist_len)
            if kv_bucket is not None:
                ck = write_back(full_ck, ck)
                cv = write_back(full_cv, cv)
            return tok, new_logits[0], ck, cv, history, rng

        self._steps[key] = step
        return step

    def _fused_loop_fn(self, gen: GenerationConfig):
        """Whole decode loop fused on device (lax.while_loop with on-device
        EOS exit) — one dispatch + one readback per generation. Used by the
        non-streaming generate(); the reference's per-token loop
        (generator.rs:314) survives as generate_stream for streaming."""
        key = ("fused", gen.strategy, gen.sampling, gen.repetition_penalty,
               gen.no_repeat_ngram_size)
        fn = self._steps.get(key)
        if fn is not None:
            return fn
        cfg = self.config
        fwd = self.family.forward
        greedy = gen.strategy == "greedy"
        sp = gen.sampling
        pen, ngram = gen.repetition_penalty, gen.no_repeat_ngram_size
        stop_ids = jnp.asarray(sorted(self.stop_token_ids) or [-1],
                               dtype=jnp.int32)

        @partial(jax.jit, donate_argnums=(1, 2, 4),
                 static_argnames=("max_steps", "kv_bucket"))
        def fused(params, ck, cv, logits, history, hist_len0, rng,
                  n_steps=None, *, max_steps, kv_bucket=None):
            # fill-proportional decode: slice the WORKING cache to the
            # current bucket ONCE per segment and decode entirely on the
            # small slice. Slicing only the attention read does not help —
            # XLA fuses it with the layer scan's cache restacking, which
            # still moves the full capacity every step (measured 0.997x,
            # scripts/decode_bucketed_bench.py); shrinking the carried
            # arrays themselves is what cuts the traffic. The two
            # capacity-sized copies here amortize over the whole segment.
            full_ck, full_cv = ck, cv
            if kv_bucket is not None:
                ck = slice_working(ck, kv_bucket, axis=3)
                cv = slice_working(cv, kv_bucket, axis=3)
            out = jnp.full((max_steps,), -1, jnp.int32)
            bound = (jnp.int32(max_steps) if n_steps is None
                     else jnp.minimum(n_steps, max_steps))

            def cond(state):
                i, done, *_ = state
                return (i < bound) & jnp.logical_not(done)

            def body(state):
                i, done, logits, ck, cv, history, rng, out = state
                lg = process_logits(logits, history, hist_len0 + i, pen, ngram)
                rng, sub = jax.random.split(rng)
                tok = sample_token(lg, sub, sp, greedy)
                is_stop = jnp.any(tok == stop_ids)
                out = out.at[i].set(jnp.where(is_stop, -1, tok))
                history = history.at[hist_len0 + i].set(tok, mode="drop")
                new_logits, ck, cv = fwd(params, cfg, tok[None, None], ck, cv,
                                         hist_len0 + i)
                return (i + 1, is_stop, new_logits[0], ck, cv, history, rng,
                        out)

            i, done, logits, ck, cv, history, rng, out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.bool_(False), logits, ck, cv, history, rng,
                 out))
            if kv_bucket is not None:
                ck = write_back(full_ck, ck)
                cv = write_back(full_cv, cv)
            n = i - done.astype(jnp.int32)  # drop the stop token if emitted
            return out, n, done, logits, ck, cv, history, rng

        self._steps[key] = fused
        return fused

    def _prefill_with_reuse(self, ids: list[int], ck, cv):
        """Prefill `ids`, skipping the longest cache-resident common prefix.

        Multi-turn chat re-sends the whole templated conversation; the K/V for
        the shared prefix is already in the cache from the previous turn, so
        only the suffix is computed (incremental prefill / prompt caching).
        """
        prompt_len = len(ids)
        common = 0
        limit = min(len(self._session_ids), prompt_len - 1)
        while common < limit and self._session_ids[common] == ids[common]:
            common += 1
        if common < self._min_reuse_prefix:
            common = 0

        suffix = ids[common:]
        bucket = seq_bucket(len(suffix), self.max_context - common)
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :len(suffix)] = suffix
        use_flash = self._flash_ok and bucket >= self._flash_min_seq
        kv_bucket = None
        if use_flash and common > 0:
            # cache-reuse prefill: the XLA materialized path WINS at moderate
            # shapes (flash = 0.90x at best, chunked_prefill_bench.py on
            # v5e); flash becomes mandatory only when the f32 score matrix
            # itself would blow HBM. Gate on score bytes > 2 GB.
            score_bytes = 4 * self.config.num_heads * bucket * (common + bucket)
            use_flash = score_bytes > 2_000_000_000
        if use_flash:
            # static cache-slice bound covering prefix + fresh block,
            # rounded to the flash block size (one compile per bucket pair)
            kv_bucket = min(-(-(common + bucket) // 128) * 128,
                            self.max_context)
        logits, ck, cv = self._prefill(
            self.params, ck, cv, jnp.asarray(padded), len(suffix) - 1,
            jnp.int32(common), use_flash=use_flash, kv_bucket=kv_bucket)
        self.last_prefill_tokens = len(suffix)  # observability for tests/stats
        return logits, ck, cv, common

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _bound_prompt(self, ids: list[int]) -> list[int]:
        """Bound a prompt to the context window, keeping the NEWEST tokens.

        The reference hard-stops at the limit
        (decoder/generator.rs:322); silently keeping the head would generate
        from stale context in a long chat — the newest user message is the
        part that must survive, so the head is dropped and the tail kept.
        tasks/chat.py trims whole conversation turns before it ever gets
        here; this is the raw-generate backstop.
        """
        limit = self.max_context - 1
        if len(ids) <= limit:
            return ids
        logger.warning(
            "prompt (%d tokens) exceeds max_context %d; dropping the oldest "
            "%d tokens and keeping the newest %d",
            len(ids), self.max_context, len(ids) - limit, limit)
        return ids[-limit:]

    def encode_prompt(self, prompt: str, add_bos: bool = True) -> list[int]:
        ids = self.tokenizer.encode(prompt, add_special_tokens=False)
        if add_bos and self.bos_token_id is not None and \
                (not ids or ids[0] != self.bos_token_id) and \
                self.config.arch in ("llama", "mistral"):
            ids = [self.bos_token_id] + ids
        return ids

    def apply_chat_template(self, conversation: Conversation) -> str:
        return self.chat_template.apply(conversation)

    def generate_stream(self, prompt: Optional[str] = None, *,
                        token_ids: Optional[Sequence[int]] = None,
                        config: Optional[GenerationConfig] = None,
                        cancellation: Optional[CancellationToken] = None,
                        emit_prompt: bool = False,
                        stats: Optional[GenerationStats] = None,
                        ) -> Iterator[StreamedToken]:
        """Token-streaming generation (cf. generator.rs:183,228)."""
        gen = config or GenerationConfig()
        if token_ids is None:
            if prompt is None:
                raise GenerationError("either prompt or token_ids is required")
            token_ids = self.encode_prompt(prompt, gen.add_bos_token)
        ids = self._bound_prompt(list(token_ids))
        if not ids:
            raise GenerationError("empty prompt")
        prompt_len = len(ids)

        stats = stats or GenerationStats()
        stats.start()

        ck, cv = self._ensure_cache()
        logits, ck, cv, _ = self._prefill_with_reuse(ids, ck, cv)
        stats.mark_prefill(prompt_len)
        emitted: list[int] = []

        if emit_prompt:
            for t in ids:
                yield StreamedToken(self.tokenizer.decode([t], False), t,
                                    TokenType.PROMPT)

        history = np.zeros(self.max_context, dtype=np.int32)
        history[:prompt_len] = ids
        history = jnp.asarray(history)
        hist_len = prompt_len

        seed = gen.seed if gen.seed is not None else _random.getrandbits(31)
        rng = jax.random.PRNGKey(seed)
        step = self._step_fn(gen)

        max_new = gen.max_new_tokens if gen.max_new_tokens is not None else \
            max(gen.max_length - prompt_len, 0)
        sdec = StreamDecoder(self.tokenizer)
        n_generated = 0
        try:
            for _ in range(max_new):
                if cancellation is not None and cancellation.is_cancelled:
                    break
                if hist_len >= self.max_context or hist_len >= gen.max_length:
                    break
                # fill-proportional decode attention (see generate()): the
                # static bucket only changes every _kv_bucket_step tokens, so
                # the jit cache holds one step variant per crossed bucket
                kbs = self._kv_bucket_step
                kb = -(-(hist_len + 1) // kbs) * kbs
                if kb >= self.max_context:
                    kb = None    # bucket would cover the whole cache
                tok, logits, ck, cv, history, rng = step(
                    self.params, ck, cv, logits, history,
                    jnp.int32(hist_len), rng, kv_bucket=kb)
                t = int(tok)
                if t in self.stop_token_ids:
                    break
                hist_len += 1
                n_generated += 1
                emitted.append(t)
                text = sdec.push(t)
                yield StreamedToken(text, t, TokenType.GENERATED)
        finally:
            self._cache = (ck, cv)
            self._session_ids = ids + emitted
            stats.mark_decode_done(n_generated)
            stats.print_summary()

    def _batch_fns(self, gen: GenerationConfig, batch: int):
        """Jitted batched prefill + fused batched decode loop (left padding)."""
        key = ("batch", batch, gen.strategy, gen.sampling,
               gen.repetition_penalty, gen.no_repeat_ngram_size)
        fns = self._steps.get(key)
        if fns is not None:
            return fns
        cfg = self.config
        fwd = self.family.forward
        greedy = gen.strategy == "greedy"
        sp = gen.sampling
        pen, ngram = gen.repetition_penalty, gen.no_repeat_ngram_size
        stop_ids = jnp.asarray(sorted(self.stop_token_ids) or [-1],
                               dtype=jnp.int32)

        def sample_row(logits, history, hist_len, rng):
            lg = process_logits(logits, history, hist_len, pen, ngram)
            return sample_token(lg, rng, sp, greedy)

        v_sample = jax.vmap(sample_row)

        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("pos_start",))
        def prefill_b(params, ck, cv, ids, positions, pad_mask,
                      prefix_kv=None, pos_start=0):
            # pos_start > 0 = shared-prefix reuse: the batch's common prompt
            # prefix was prefilled ONCE at B=1 (prefix_kv, possibly padded
            # past the true length); broadcast its first pos_start positions
            # into every row's cache, then prefill only the suffix block.
            # Tree-mapped: the int8 dict cache's "s" leaf drops the trailing
            # D axis but keeps the position axis at index 3.
            if pos_start:
                pk, pv = prefix_kv

                def bcast(dst, src):
                    src = jax.lax.slice_in_dim(src, 0, pos_start, axis=3)
                    bshape = (src.shape[0], dst.shape[1]) + src.shape[2:]
                    return jax.lax.dynamic_update_slice(
                        dst, jnp.broadcast_to(src, bshape).astype(dst.dtype),
                        (0,) * dst.ndim)

                ck = jax.tree.map(bcast, ck, pk)
                cv = jax.tree.map(bcast, cv, pv)
            logits, ck, cv = fwd(params, cfg, ids, ck, cv, pos_start,
                                 ids.shape[1] - 1, positions=positions,
                                 pad_mask=pad_mask)
            return logits, ck, cv  # [B, V]

        @partial(jax.jit, donate_argnums=(1, 2, 4),
                 static_argnames=("max_steps", "kv_bucket"))
        def decode_b(params, ck, cv, logits, history, slot0, lens0,
                     pad_mask, rng, done0, i0, n_steps=None, *, max_steps,
                     kv_bucket=None):
            # slot0: shared cache slot of the first generated token;
            # lens0 [B]: per-row true history length (ragged prompts);
            # i0: global step offset of this segment (resumable state so
            # generate_batch can decode in kv-bucketed segments).
            # fill-proportional decode (same mechanism as the single-stream
            # fused loop above): the layer scan restacks the carried cache
            # every step, so carry a kv_bucket-wide working slice and write
            # it back once per segment.
            B = logits.shape[0]
            full_ck, full_cv = ck, cv
            if kv_bucket is not None:
                ck = slice_working(ck, kv_bucket, axis=3)
                cv = slice_working(cv, kv_bucket, axis=3)
                pad_mask = pad_mask[:, :kv_bucket]
            out = jnp.full((B, max_steps), -1, jnp.int32)
            bound = (jnp.int32(max_steps) if n_steps is None
                     else jnp.minimum(n_steps, max_steps))

            def cond(state):
                i, done, *_ = state
                return (i < bound) & jnp.logical_not(jnp.all(done))

            def body(state):
                i, done, logits, ck, cv, history, rng, out = state
                rng, sub = jax.random.split(rng)
                toks = v_sample(logits, history, lens0 + i0 + i,
                                jax.random.split(sub, B))
                is_stop = jnp.any(toks[:, None] == stop_ids[None, :], axis=1)
                done_new = done | is_stop
                out = out.at[:, i].set(jnp.where(done_new, -1, toks))
                history = jax.vmap(
                    lambda h, t, l: h.at[l + i0 + i].set(t, mode="drop")
                )(history, toks, lens0)
                new_logits, ck, cv = fwd(
                    params, cfg, toks[:, None], ck, cv, slot0 + i0 + i,
                    positions=(lens0 + i0 + i)[:, None], pad_mask=pad_mask)
                return i + 1, done_new, new_logits, ck, cv, history, rng, out

            i, done, logits, ck, cv, history, rng, out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), done0, logits, ck, cv, history, rng, out))
            if kv_bucket is not None:
                ck = write_back(full_ck, ck)
                cv = write_back(full_cv, cv)
            return out, done, logits, ck, cv, history, rng

        fns = (prefill_b, decode_b)
        self._steps[key] = fns
        return fns

    def _shared_batch_prefix(self, ids_list: list) -> int:
        """Longest token prefix COMMON to every row (each row must keep at
        least one suffix token); 0 when too short to pay for the extra
        broadcast + compile variant."""
        if len(ids_list) < 2:
            return 0
        first = ids_list[0]
        limit = min(len(r) for r in ids_list) - 1
        p = 0
        while p < limit and all(r[p] == first[p] for r in ids_list):
            p += 1
        return p if p >= self._min_reuse_prefix else 0

    def _prefix_fill(self, ids_p: list):
        """Prefill a shared prompt prefix ONCE at B=1 (padded to its seq
        bucket; end-padding garbage cannot affect earlier positions' K/V
        under causal attention) and return the KV for broadcast into a
        batch cache (generate_batch shared-prefix reuse)."""
        pb = seq_bucket(len(ids_p), self.max_context)
        fn = self._steps.get(("prefix_fill", pb))
        if fn is None:
            cfg = self.config
            fwd = self.family.forward
            quant = self._kv_quantized
            cdt = self._cache_dtype
            fam = self.family

            @jax.jit
            def fill(params, ids1):
                if quant:
                    ck1, cv1 = kllama.init_cache(cfg, 1, pb, cdt,
                                                 quantized=True)
                else:
                    ck1, cv1 = fam.init_cache(cfg, 1, pb, cdt)
                _, ck1, cv1 = fwd(params, cfg, ids1, ck1, cv1, 0,
                                  ids1.shape[1] - 1)
                return ck1, cv1

            fn = self._steps[("prefix_fill", pb)] = fill
        arr = np.zeros((1, pb), np.int32)
        arr[0, :len(ids_p)] = ids_p
        return fn(self.params, jnp.asarray(arr))

    def generate_batch(self, prompts: Sequence[str], *,
                       config: Optional[GenerationConfig] = None) -> list[str]:
        """Batched generation over ragged prompts (left-padded).

        Decode is weight-bandwidth-bound, so B sequences decode at nearly the
        cost of one — the aggregate-throughput path for serving. Greedy output
        per row equals the unbatched generate() for the same prompt.

        Rows sharing a leading token prefix (>= _min_reuse_prefix tokens,
        e.g. a system prompt under serve_batching) prefill it ONCE at B=1
        and broadcast the KV into every row — batch prefill then computes
        only the per-row suffixes (the batched analogue of the continuous
        engine's register_prefix and the single-stream _prefill_with_reuse).
        """
        gen = config or GenerationConfig()
        if not prompts:
            return []
        ids_list = [self._bound_prompt(self.encode_prompt(p, gen.add_bos_token))
                    for p in prompts]
        B = len(ids_list)
        max_len = max(len(i) for i in ids_list)
        # shared-prefix reuse: suffix geometry shifts right by P cache slots
        P = self._shared_batch_prefix(ids_list)
        self._batch_prefix_len = P    # diagnostic (tests/bench introspection)
        sfx_list = [row[P:] for row in ids_list]
        bucket = seq_bucket(max(len(s) for s in sfx_list),
                            self.max_context - P)
        max_new = gen.max_new_tokens if gen.max_new_tokens is not None else \
            max(gen.max_length - max_len, 0)
        max_steps = int(max(min(max_new, self.max_context - P - bucket - 1),
                            0))
        if max_steps == 0:
            return ["" for _ in prompts]
        # right-size the per-call cache: the layer scan restacks the whole
        # carried cache every decode step (BASELINE.md round-3 long-context
        # memo), so allocating max_context would cost capacity-proportional
        # HBM traffic; this cache never outlives the call, so it only needs
        # prompt + generation, rounded to 256 for compile-key stability
        T_b = min(self.max_context,
                  -(-(P + bucket + max_steps + 1) // 256) * 256)
        ids = np.zeros((B, bucket), dtype=np.int32)
        positions = np.zeros((B, bucket), dtype=np.int32)
        pad_mask = np.zeros((B, T_b), dtype=np.int32)
        pad_mask[:, :P] = 1       # shared-prefix slots are real for all rows
        for r, row in enumerate(sfx_list):
            pad = bucket - len(row)
            ids[r, pad:] = row
            positions[r, pad:] = P + np.arange(len(row))
            pad_mask[r, P + pad:P + bucket] = 1
        pad_mask[:, P + bucket:] = 1  # decode slots are always real

        prefill_b, decode_b = self._batch_fns(gen, B)
        # kv_cache="int8" pays exactly here: at B=1 the stream is weight-
        # bound and int8 KV measures 0.93x, but batched long-context decode
        # is KV-bound — 1.44x at B=8 / fill 3456 on v5e
        # (scripts/kv_int8_batch_bench.py; BASELINE.md round-4 decision rule)
        if self._kv_quantized:
            ck, cv = kllama.init_cache(self.config, B, T_b,
                                       self._cache_dtype, quantized=True)
        else:
            ck, cv = self.family.init_cache(self.config, B, T_b,
                                            self._cache_dtype)
        if self._mesh is not None:
            from ..parallel.mesh import shard_cache
            ck, cv = shard_cache((ck, cv), self._mesh)
        prefix_kv = self._prefix_fill(ids_list[0][:P]) if P else None
        logits, ck, cv = prefill_b(self.params, ck, cv, jnp.asarray(ids),
                                   jnp.asarray(positions),
                                   jnp.asarray(pad_mask),
                                   prefix_kv, pos_start=P)
        history = np.zeros((B, self.max_context), dtype=np.int32)
        for r, row in enumerate(ids_list):
            history[r, :len(row)] = row
        lens0 = jnp.asarray([len(r) for r in ids_list], dtype=jnp.int32)
        seed = gen.seed if gen.seed is not None else _random.getrandbits(31)
        # kv-bucketed segments, like generate(): decode on a working slice of
        # the cache sized to the current 512-multiple bucket so early steps
        # move fill-proportional (not T_b-proportional) HBM traffic; the out
        # buffer is always KB_STEP wide with a dynamic n_steps bound, so the
        # jit cache holds one variant per (config, B, bucket) independent of
        # max_new_tokens
        KB_STEP = self._kv_bucket_step
        rng = jax.random.PRNGKey(seed)
        history_d = jnp.asarray(history)
        pad_mask_d = jnp.asarray(pad_mask)
        done = jnp.zeros((B,), jnp.bool_)
        chunks = []
        i0 = 0
        slot0 = P + bucket       # first decode write slot (after prefix+sfx)
        while i0 < max_steps:
            kb = -(-(slot0 + i0 + 1) // KB_STEP) * KB_STEP
            if kb >= T_b:
                kb = None        # bucket would cover the whole cache
            seg = min(max_steps - i0,
                      (kb - (slot0 + i0)) if kb is not None else KB_STEP)
            seg_out, done, logits, ck, cv, history_d, rng = decode_b(
                self.params, ck, cv, logits, history_d, jnp.int32(slot0),
                lens0, pad_mask_d, rng, done, jnp.int32(i0), jnp.int32(seg),
                max_steps=int(KB_STEP), kv_bucket=kb)
            chunks.append(np.asarray(seg_out[:, :seg]))
            i0 += seg
            if bool(jnp.all(done)):
                break
        out = np.concatenate(chunks, axis=1)
        texts = []
        for r in range(B):
            toks = [int(t) for t in out[r] if t >= 0]
            texts.append(self.tokenizer.decode(toks, skip_special_tokens=True))
        return texts

    def generate(self, prompt: Optional[str] = None, *,
                 token_ids: Optional[Sequence[int]] = None,
                 config: Optional[GenerationConfig] = None,
                 cancellation: Optional[CancellationToken] = None,
                 fused: bool = True) -> str:
        """Blocking generation returning the full completion.

        With fused=True (default) the whole decode loop runs on device; with
        fused=False it reuses the streaming per-token loop.
        """
        if not fused or cancellation is not None:
            parts = [st.text for st in self.generate_stream(
                prompt, token_ids=token_ids, config=config,
                cancellation=cancellation)]
            return "".join(parts)

        gen = config or GenerationConfig()
        if token_ids is None:
            if prompt is None:
                raise GenerationError("either prompt or token_ids is required")
            token_ids = self.encode_prompt(prompt, gen.add_bos_token)
        ids = self._bound_prompt(list(token_ids))
        if not ids:
            raise GenerationError("empty prompt")
        prompt_len = len(ids)

        ck, cv = self._ensure_cache()
        logits, ck, cv, _ = self._prefill_with_reuse(ids, ck, cv)

        history = np.zeros(self.max_context, dtype=np.int32)
        history[:prompt_len] = ids
        max_new = gen.max_new_tokens if gen.max_new_tokens is not None else \
            max(gen.max_length - prompt_len, 0)
        max_steps = max(min(max_new, self.max_context - prompt_len - 1,
                            gen.max_length - prompt_len), 0)
        if max_steps == 0:
            self._cache = (ck, cv)
            return ""
        seed = gen.seed if gen.seed is not None else _random.getrandbits(31)
        fused_fn = self._fused_loop_fn(gen)
        # kv-bucketed decode: XLA reads the whole FIXED-shape cache every
        # step, so at a 16k allocated context a 1B model moves ~537 MB/step
        # of cache it never attends. Decode in segments whose attention is
        # statically sliced to the current 512-multiple bucket — step cost
        # becomes fill-proportional instead of capacity-proportional
        # (measured table in BASELINE.md round 3). Small contexts keep the
        # old single-segment full-cache path (identical compile count).
        KB_STEP = self._kv_bucket_step
        rng = jax.random.PRNGKey(seed)
        history_d = jnp.asarray(history)
        pos = prompt_len
        remaining = int(max_steps)
        toks: list[int] = []
        while remaining > 0:
            kb = -(-(pos + 1) // KB_STEP) * KB_STEP
            if kb >= self.max_context:
                kb = None            # bucket would cover the whole cache
            seg = min(remaining,
                      (kb - pos) if kb is not None else KB_STEP)
            # out buffer is always KB_STEP wide with a dynamic n_steps
            # bound: ONE fused variant per (sampling config, bucket) in the
            # jit cache, independent of max_new_tokens
            out, n, done, logits, ck, cv, history_d, rng = fused_fn(
                self.params, ck, cv, logits, history_d, jnp.int32(pos), rng,
                jnp.int32(seg), max_steps=int(KB_STEP), kv_bucket=kb)
            n = int(n)
            toks += [int(t) for t in np.asarray(out[:n]) if t >= 0]
            if bool(done) or n == 0:
                break
            pos += n
            remaining -= n
        self._cache = (ck, cv)
        self._session_ids = ids + toks
        return self.tokenizer.decode(toks, skip_special_tokens=True)

    def default_generation_config(self) -> GenerationConfig:
        """Defaults from the model's generation_config.json (HFGenerationConfig
        parse, common/mod.rs:118): temperature/top_p/top_k/repetition_penalty
        seed the sampling params; library defaults fill the rest."""
        import dataclasses
        from ..generate.sampling import SamplingParams
        g = self.hf_generation_config
        base = GenerationConfig()
        if not g:
            return base
        sp = SamplingParams(
            temperature=g.get("temperature", base.sampling.temperature),
            top_k=g.get("top_k", base.sampling.top_k),
            top_p=g.get("top_p", base.sampling.top_p),
            min_p=g.get("min_p", base.sampling.min_p),
        )
        return dataclasses.replace(
            base,
            sampling=sp,
            repetition_penalty=g.get("repetition_penalty",
                                     base.repetition_penalty),
            strategy="sample" if g.get("do_sample", True) else "greedy",
        )
