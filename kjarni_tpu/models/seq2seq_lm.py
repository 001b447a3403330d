"""Seq2SeqLM: loaded encoder-decoder model with greedy + beam generation.

Rebuild of the reference seq2seq generation layer: EncoderDecoderGenerator
(kjarni-transformers/src/encoder_decoder/generator.rs:118), the Cpu/Gpu backend
dispatch (cpu_backend.rs:24, traits.rs:227), and the task-params parsing
(encoder_decoder/config.rs:5-32 — HF config task_specific_params).

All beams decode in one jitted step; cache reorder (reorder_cache
traits.rs:246) is a jnp.take fused into the step.
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bucketing import seq_bucket
from ..core.errors import InvalidConfigError
from ..generate.beam import BeamSearchConfig, beam_search
from ..tokenizer import KjarniTokenizer
from ..weights.safetensors_loader import ModelWeights
from . import bart as kbart
from . import t5 as kt5

DEFAULT_MAX_DECODE = 512


@dataclasses.dataclass
class Seq2SeqTaskParams:
    """Parsed task_specific_params (cf. config.rs:5 SummarizationParams)."""

    early_stopping: bool = True
    length_penalty: float = 2.0
    max_length: int = 142
    min_length: int = 0
    no_repeat_ngram_size: int = 3
    num_beams: int = 4
    prefix: Optional[str] = None


class Seq2SeqLM:
    """An encoder-decoder LM ready for generation."""

    def __init__(self, model_dir: Path, dtype="auto",
                 max_decode_len: int = DEFAULT_MAX_DECODE):
        from .decoder_lm import resolve_dtype
        dtype = resolve_dtype(dtype)
        model_dir = Path(model_dir)
        self.model_dir = model_dir
        hf_cfg = json.loads((model_dir / "config.json").read_text())
        self.hf_config = hf_cfg
        mt = hf_cfg.get("model_type")
        if mt == "t5":
            self.family = kt5
            self.config = kt5.T5Config.from_hf(hf_cfg)
        elif mt == "bart":
            self.family = kbart
            self.config = kbart.BartConfig.from_hf(hf_cfg)
        else:
            raise InvalidConfigError(f"unsupported seq2seq model_type '{mt}'")
        cfg = self.config
        self.max_decode_len = max_decode_len
        if mt == "bart":
            self.max_decode_len = min(max_decode_len,
                                      cfg.max_position_embeddings - kbart.POSITION_OFFSET)

        ws = ModelWeights(model_dir)
        self.params = jax.tree.map(jnp.asarray, self.family.load_params(ws, cfg, dtype))
        self.tokenizer = KjarniTokenizer.from_file(model_dir / "tokenizer.json",
                                                   pad_token_id=cfg.pad_token_id)
        self.task_params = self._parse_task_params(hf_cfg)

        fam = self.family

        @jax.jit
        def _encode_and_cross(params, ids, mask):
            enc = fam.encode(params, cfg, ids, mask)
            ck, cv = fam.precompute_cross_kv(params, cfg, enc)
            return enc, ck, cv

        @partial(jax.jit, donate_argnums=(2, 3))
        def _step(params, ids, sk, sv, ck, cv, enc_mask, pos, parents):
            # reorder self-cache by beam parent (identity when parents==arange)
            sk = jnp.take(sk, parents, axis=1)
            sv = jnp.take(sv, parents, axis=1)
            logits, sk, sv = fam.decode_step(params, cfg, ids, sk, sv, ck, cv,
                                             enc_mask, pos)
            return logits[:, -1, :], sk, sv

        self._encode_and_cross = _encode_and_cross
        self._step = _step
        self._fused_runners: dict = {}

    @staticmethod
    def _parse_task_params(hf_cfg: dict) -> dict[str, Seq2SeqTaskParams]:
        out: dict[str, Seq2SeqTaskParams] = {}
        for name, raw in (hf_cfg.get("task_specific_params") or {}).items():
            if not isinstance(raw, dict):
                continue
            out[name] = Seq2SeqTaskParams(
                early_stopping=raw.get("early_stopping", True),
                length_penalty=raw.get("length_penalty", 2.0),
                max_length=raw.get("max_length", 142),
                min_length=raw.get("min_length", 0),
                no_repeat_ngram_size=raw.get("no_repeat_ngram_size", 3),
                num_beams=raw.get("num_beams", 4),
                prefix=raw.get("prefix"),
            )
        return out

    # ------------------------------------------------------------------

    def _encode_input(self, text: str, max_input_len: Optional[int] = None):
        limit = max_input_len
        if self.family is kbart:
            hard = self.config.max_position_embeddings - kbart.POSITION_OFFSET
            limit = min(limit or hard, hard)
        ids, mask = self.tokenizer.encode_batch([text], max_len=limit)
        return jnp.asarray(ids), jnp.asarray(mask)

    def generate(self, text: str, *,
                 num_beams: Optional[int] = None,
                 max_length: Optional[int] = None,
                 min_length: Optional[int] = None,
                 length_penalty: Optional[float] = None,
                 no_repeat_ngram_size: Optional[int] = None,
                 early_stopping: Optional[bool] = None,
                 task: Optional[str] = None,
                 max_input_len: Optional[int] = None,
                 stream_callback: Optional[Callable[[int], None]] = None) -> str:
        """Beam-search generation (cf. generator.rs:143 generate->run_beam_search).

        Defaults resolve from the model's task_specific_params when `task`
        matches (e.g. "summarization"), else library defaults.
        """
        tp = self.task_params.get(task) if task else None
        tp = tp or Seq2SeqTaskParams()
        cfg = self.config
        beams = num_beams if num_beams is not None else tp.num_beams
        bs_cfg = BeamSearchConfig(
            num_beams=beams,
            max_length=min(max_length if max_length is not None else tp.max_length,
                           self.max_decode_len - 1),
            min_length=min_length if min_length is not None else tp.min_length,
            length_penalty=length_penalty if length_penalty is not None
            else tp.length_penalty,
            early_stopping=early_stopping if early_stopping is not None
            else tp.early_stopping,
            no_repeat_ngram_size=no_repeat_ngram_size if no_repeat_ngram_size
            is not None else tp.no_repeat_ngram_size,
            eos_token_id=cfg.eos_token_id,
            decoder_start_token_id=cfg.decoder_start_token_id,
            forced_bos_token_id=getattr(cfg, "forced_bos_token_id", None),
            forced_eos_token_id=getattr(cfg, "forced_eos_token_id", None),
        )
        if tp.prefix:
            text = tp.prefix + text

        enc_ids, enc_mask = self._encode_input(text, max_input_len)
        if stream_callback is None:
            toks = self._generate_fused(bs_cfg, enc_ids, enc_mask)
            return self.tokenizer.decode(toks, skip_special_tokens=True).strip()

        _, ck, cv = self._encode_and_cross(self.params, enc_ids, enc_mask)
        k = bs_cfg.num_beams
        # tile encoder state across beams
        ck = jnp.repeat(ck, k, axis=1)
        cv = jnp.repeat(cv, k, axis=1)
        beam_enc_mask = jnp.repeat(enc_mask, k, axis=0)
        cache_len = seq_bucket(bs_cfg.max_length + 1, self.max_decode_len)
        sk, sv = self.family.init_self_cache(self.config, k, cache_len)

        state = {"sk": sk, "sv": sv}

        def step_fn(tokens: np.ndarray, pos: int, parents: np.ndarray):
            logits, state["sk"], state["sv"] = self._step(
                self.params, jnp.asarray(tokens[:, None]), state["sk"], state["sv"],
                ck, cv, beam_enc_mask, jnp.int32(pos), jnp.asarray(parents))
            return logits

        hyp = beam_search(step_fn, bs_cfg, stream_callback)
        return self.tokenizer.decode(hyp.tokens, skip_special_tokens=True).strip()

    def _generate_fused(self, bs_cfg: BeamSearchConfig, enc_ids, enc_mask
                        ) -> list[int]:
        """Whole beam generation (encode + cross-KV + beam while_loop) as ONE
        device dispatch (generate/beam_fused.py)."""
        from ..generate.beam_fused import build_fused_beam

        cfg = self.config
        fam = self.family
        k = bs_cfg.num_beams
        cache_len = seq_bucket(bs_cfg.max_length + 1, self.max_decode_len)
        key = (bs_cfg.num_beams, bs_cfg.max_length, bs_cfg.min_length,
               bs_cfg.length_penalty, bs_cfg.early_stopping,
               bs_cfg.no_repeat_ngram_size, bs_cfg.eos_token_id,
               bs_cfg.decoder_start_token_id, bs_cfg.forced_bos_token_id,
               bs_cfg.forced_eos_token_id, int(enc_ids.shape[1]), cache_len)
        run = self._fused_runners.get(key)
        if run is None:
            @jax.jit
            def run(params, enc_ids, enc_mask):
                enc = fam.encode(params, cfg, enc_ids, enc_mask)
                ck, cv = fam.precompute_cross_kv(params, cfg, enc)
                ck = jnp.repeat(ck, k, axis=1)
                cv = jnp.repeat(cv, k, axis=1)
                mask_t = jnp.repeat(enc_mask, k, axis=0)
                sk, sv = fam.init_self_cache(cfg, k, cache_len,
                                             params["shared"].dtype
                                             if "shared" in params
                                             else enc.dtype)

                def decode_fn(cur, sk, sv, pos, parents):
                    sk = jnp.take(sk, parents, axis=1)
                    sv = jnp.take(sv, parents, axis=1)
                    logits, sk, sv = fam.decode_step(params, cfg, cur, sk, sv,
                                                     ck, cv, mask_t, pos)
                    return logits[:, -1, :], sk, sv

                runner = build_fused_beam(decode_fn, bs_cfg, cfg.vocab_size,
                                          cache_len - 1)
                return runner(sk, sv)

            self._fused_runners[key] = run
        out, n = run(self.params, enc_ids, enc_mask)
        return [int(t) for t in np.asarray(out[:int(n)])]
