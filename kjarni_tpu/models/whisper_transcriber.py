"""Whisper transcription pipeline: chunking, prompt, greedy decode, stitching.

Rebuild of kjarni-models/src/models/whisper/transcriber.rs:85 (chunk_audio :87,
encode_mel :121, decode_chunk :143 with cross-KV precompute :166, pick_token
:248, build_prompt_tokens :279, stitch_segments :420). Same token-id constants
and suppression policy.

TPU shape: mel + encode are one jitted program per chunk; the greedy step
(forward + suppressed argmax) is another, with the self-KV cache donated across
steps — one int sync per token, like the decoder LM path.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..generate.sampling import fast_argmax

from ..audio.mel import MelConfig, log_mel_spectrogram
from ..core.bucketing import seq_bucket
from ..tokenizer import KjarniTokenizer
from ..weights.safetensors_loader import ModelWeights
from . import whisper as kwhisper

# Token constants (transcriber.rs:20-24)
SOT_TOKEN = 50258
EOT_TOKEN = 50257
TRANSCRIBE_TOKEN = 50359
TRANSLATE_TOKEN = 50358
NO_TIMESTAMPS_TOKEN = 50363
FIRST_SPECIAL_TOKEN = 50257
TIMESTAMP_BEGIN = 50364
CHUNK_LENGTH_SECS = 30.0


def audio_pcm16(audio: np.ndarray) -> np.ndarray:
    """Quantize f32 audio to int16 PCM for the host->device transfer.

    Halves the upload bytes; the link (tunnel/PCIe), not the encoder, bounds
    long-audio throughput. Quantization error <=3.1e-5 — below the log-mel
    floor and most sources are 16-bit PCM to begin with. Both the serial and
    batched paths share this encoding, so their per-lane equality is exact.
    """
    if audio.dtype == np.int16:
        return audio
    return np.clip(np.round(audio * 32768.0), -32768.0, 32767.0) \
        .astype(np.int16)


def _dequant_pcm(audio: jnp.ndarray) -> jnp.ndarray:
    """In-jit inverse of audio_pcm16 (trace-time no-op for f32 input)."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    return audio


class WhisperTask(str, enum.Enum):
    TRANSCRIBE = "transcribe"
    TRANSLATE = "translate"


@dataclasses.dataclass
class WhisperTranscriberConfig:
    """Cf. transcriber.rs:33 WhisperTranscriberConfig.

    temperature_fallback enables the OpenAI-Whisper quality loop the
    reference does NOT implement (greedy-only, transcriber.rs:143): when a
    chunk's transcript is degenerate (gzip compression ratio above
    compression_ratio_threshold — repetition loops — or mean token logprob
    below logprob_threshold), the chunk is re-decoded at increasing sampling
    temperatures until a candidate passes. Off by default for reference
    parity.
    """

    language: Optional[str] = None
    task: WhisperTask = WhisperTask.TRANSCRIBE
    timestamps: bool = False
    max_tokens_per_chunk: int = 224
    temperature_fallback: bool = False
    temperatures: tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    compression_ratio_threshold: float = 2.4
    logprob_threshold: float = -1.0
    seed: int = 0
    # long-audio throughput: chunks are independent after stitching, so
    # mel+encode and the greedy decode run at B=min(n_chunks, chunk_batch)
    # with per-chunk EOT (the reference decodes chunks serially,
    # transcriber.rs:87). <=1 forces the serial path; streaming (on_token)
    # always decodes serially for callback ordering.
    chunk_batch: int = 16


def compression_ratio(text: str) -> float:
    """gzip-style compressibility of the transcript: repetition loops
    compress extremely well (ratio > threshold flags a degenerate decode)."""
    import zlib
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


@dataclasses.dataclass
class WhisperSegment:
    start: float
    end: float
    text: str


@dataclasses.dataclass
class WhisperChunkResult:
    segments: list[WhisperSegment]
    text: str


class WhisperModel:
    """Loaded Whisper checkpoint with jitted encode + greedy-decode programs."""

    def __init__(self, model_dir: Path, dtype="auto"):
        from .decoder_lm import resolve_dtype
        dtype = resolve_dtype(dtype)
        model_dir = Path(model_dir)
        self.model_dir = model_dir
        hf_cfg = json.loads((model_dir / "config.json").read_text())
        self.config = kwhisper.WhisperConfig.from_hf(hf_cfg)
        cfg = self.config
        ws = ModelWeights(model_dir)
        self.params = jax.tree.map(jnp.asarray,
                                   kwhisper.load_params(ws, cfg, dtype))
        self.tokenizer = KjarniTokenizer.from_file(model_dir / "tokenizer.json")
        self._init_runtime()

    @classmethod
    def from_params(cls, cfg, params, tokenizer) -> "WhisperModel":
        """Build from in-memory params (bench/synthetic use — same jitted
        runtime as the disk path, no checkpoint required)."""
        self = cls.__new__(cls)
        self.model_dir = None
        self.config = cfg
        self.params = jax.tree.map(jnp.asarray, params)
        self.tokenizer = tokenizer
        self._init_runtime()
        return self

    def _init_runtime(self):
        cfg = self.config
        self.mel_config = MelConfig.whisper(n_mels=cfg.num_mel_bins)
        # suppression: allow text tokens, EOS, and (optionally) timestamps
        ids = np.arange(cfg.vocab_size)
        allow_base = (ids < FIRST_SPECIAL_TOKEN) | (ids == EOT_TOKEN)
        self._allow_no_ts = jnp.asarray(allow_base)
        self._allow_ts = jnp.asarray(allow_base | (ids >= TIMESTAMP_BEGIN))

        @jax.jit
        def _encode_chunk(params, audio):
            # mel stays f32 for numerics, then enters the encoder in the
            # param dtype (bf16 on TPU)
            audio = _dequant_pcm(audio)
            mel = log_mel_spectrogram(audio, self.mel_config)
            mel = mel.astype(params["conv1_w"].dtype)
            enc = kwhisper.encode(params, cfg, mel[None])
            ck, cv = kwhisper.precompute_cross_kv(params, cfg, enc)
            return ck, cv

        @partial(jax.jit, donate_argnums=(2, 3))
        def _prefill(params, ids, sk, sv, ck, cv, allow):
            enc_mask = jnp.ones((1, cfg.max_source_positions), jnp.int32)
            logits, sk, sv = kwhisper.decode_step(params, cfg, ids, sk, sv,
                                                  ck, cv, enc_mask, 0)
            last = logits[0, -1]
            tok = fast_argmax(jnp.where(allow, last, -jnp.inf))
            return tok, sk, sv

        @partial(jax.jit, donate_argnums=(2, 3))
        def _step(params, tok, sk, sv, ck, cv, pos, allow):
            enc_mask = jnp.ones((1, cfg.max_source_positions), jnp.int32)
            logits, sk, sv = kwhisper.decode_step(params, cfg, tok[None, None],
                                                  sk, sv, ck, cv, enc_mask, pos)
            nxt = fast_argmax(jnp.where(allow, logits[0, -1], -jnp.inf))
            return nxt, sk, sv

        self._encode_chunk = _encode_chunk
        self._prefill = _prefill
        self._step = _step

        @partial(jax.jit, donate_argnums=(2, 3),
                 static_argnames=("max_steps", "prompt_len"))
        def _decode_loop(params, prompt_ids, sk, sv, ck, cv, allow,
                         temperature, rng, *, max_steps, prompt_len):
            """Whole decode fused on device: prefill + while_loop until EOT.
            One dispatch + one small readback per chunk — the per-token host
            sync (and its latency) disappears. temperature==0 is greedy;
            temperature>0 samples (the quality-fallback retry path). Also
            accumulates the sum of selected-token logprobs for the
            logprob_threshold check."""
            enc_mask = jnp.ones((1, cfg.max_source_positions), jnp.int32)

            def pick(logits, rng):
                masked = jnp.where(allow, logits.astype(jnp.float32), -jnp.inf)
                lse = jax.nn.logsumexp(masked)
                rng, sub = jax.random.split(rng)
                sampled = jax.random.categorical(
                    sub, masked / jnp.maximum(temperature, 1e-6))
                greedy = fast_argmax(masked)
                tok = jnp.where(temperature > 0, sampled, greedy
                                ).astype(jnp.int32)
                return tok, masked[tok] - lse, rng

            logits, sk, sv = kwhisper.decode_step(params, cfg, prompt_ids,
                                                  sk, sv, ck, cv, enc_mask, 0)
            tok, lp, rng = pick(logits[0, -1], rng)
            out = jnp.full((max_steps + 1,), EOT_TOKEN, jnp.int32)
            out = out.at[0].set(tok)

            def cond(state):
                i, tok, *_ = state
                return (i < max_steps) & (tok != EOT_TOKEN)

            def body(state):
                i, tok, out, sum_lp, sk, sv, rng = state
                logits, sk, sv = kwhisper.decode_step(
                    params, cfg, tok[None, None], sk, sv, ck, cv, enc_mask,
                    prompt_len + i)
                nxt, lp, rng = pick(logits[0, -1], rng)
                out = out.at[i + 1].set(nxt)
                return i + 1, nxt, out, sum_lp + lp, sk, sv, rng

            n, tok, out, sum_lp, sk, sv, rng = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tok, out, lp, sk, sv, rng))
            return out, n + 1, sum_lp, sk, sv

        self._decode_loop = _decode_loop

        @partial(jax.jit, static_argnames=("n_pad",))
        def _encode_chunks(params, audios, n_pad=0):
            """Batched mel + encode + cross-KV over [n, chunk_samples].

            `n_pad` bucket-pads the wave ON DEVICE (repeating lane 0) so the
            host->device link only carries real lanes: the link, not the
            encoder, bounds long-audio throughput on tunnel/PCIe-attached
            chips (measured 0.78 s of a 1.4 s 11-chunk transcribe was the
            f32 upload of 16 padded lanes)."""
            audios = _dequant_pcm(audios)
            if n_pad:
                audios = jnp.concatenate(
                    [audios, jnp.broadcast_to(audios[:1],
                                              (n_pad,) + audios.shape[1:])])
            mel = jax.vmap(
                lambda a: log_mel_spectrogram(a, self.mel_config))(audios)
            mel = mel.astype(params["conv1_w"].dtype)
            enc = kwhisper.encode(params, cfg, mel)
            return kwhisper.precompute_cross_kv(params, cfg, enc)

        self._encode_chunks = _encode_chunks

        @partial(jax.jit, donate_argnums=(2, 3),
                 static_argnames=("max_steps", "prompt_len"))
        def _decode_loop_b(params, prompt_ids, sk, sv, ck, cv, allow, *,
                           max_steps, prompt_len):
            """Batched greedy decode over n independent chunks with per-row
            EOT: finished rows keep stepping on fixed shapes but are pinned
            to EOT, so each row's prefix equals its own B=1 greedy decode.
            Returns per-row token buffers and logprob sums (the temperature
            fallback re-checks rows host-side and retries stragglers through
            the serial loop)."""
            n = prompt_ids.shape[0]
            enc_mask = jnp.ones((n, cfg.max_source_positions), jnp.int32)

            def pick(logits):                       # [n, V] -> ([n], [n])
                masked = jnp.where(allow[None, :],
                                   logits.astype(jnp.float32), -jnp.inf)
                tok = fast_argmax(masked)
                lse = jax.nn.logsumexp(masked, axis=-1)
                lp = jnp.take_along_axis(masked, tok[:, None],
                                         axis=-1)[:, 0] - lse
                return tok, lp

            logits, sk, sv = kwhisper.decode_step(params, cfg, prompt_ids,
                                                  sk, sv, ck, cv, enc_mask, 0)
            tok, lp = pick(logits[:, -1])
            out = jnp.full((n, max_steps + 1), EOT_TOKEN, jnp.int32)
            out = out.at[:, 0].set(tok)
            done0 = tok == EOT_TOKEN

            def cond(state):
                i, done, *_ = state
                return (i < max_steps) & jnp.logical_not(jnp.all(done))

            def body(state):
                i, done, tok, out, sum_lp, sk, sv = state
                logits, sk, sv = kwhisper.decode_step(
                    params, cfg, tok[:, None], sk, sv, ck, cv, enc_mask,
                    prompt_len + i)
                nxt, lp = pick(logits[:, -1])
                nxt = jnp.where(done, EOT_TOKEN, nxt)
                out = out.at[:, i + 1].set(nxt)
                sum_lp = sum_lp + jnp.where(done, 0.0, lp)
                return (i + 1, done | (nxt == EOT_TOKEN), nxt, out,
                        sum_lp, sk, sv)

            i, done, tok, out, sum_lp, sk, sv = jax.lax.while_loop(
                cond, body, (jnp.int32(0), done0, tok, out, lp, sk, sv))
            return out, sum_lp

        self._decode_loop_b = _decode_loop_b

    # ------------------------------------------------------------------

    def chunk_audio(self, audio: np.ndarray) -> list[np.ndarray]:
        """Zero-padded 30s chunks (transcriber.rs:87)."""
        n = self.mel_config.chunk_samples
        chunks = []
        for start in range(0, max(len(audio), 1), n):
            chunk = audio[start:start + n]
            if len(chunk) < n:
                chunk = np.pad(chunk, (0, n - len(chunk)))
            chunks.append(chunk.astype(np.float32))
        return chunks

    def detect_language(self, cross_kv) -> str:
        """Detect the spoken language: feed [SOT], argmax over language tokens
        (the whisper-native method; the reference defaults to 'en')."""
        cfg = self.config
        ck, cv = cross_kv
        sk, sv = kwhisper.init_self_cache(cfg, 1, 8, self.params["embed"].dtype)
        enc_mask = jnp.ones((1, cfg.max_source_positions), jnp.int32)
        logits, _, _ = kwhisper.decode_step(
            self.params, cfg, jnp.asarray([[SOT_TOKEN]], jnp.int32), sk, sv,
            ck, cv, enc_mask, 0)
        lang_lo, lang_hi = SOT_TOKEN + 1, SOT_TOKEN + 100  # <|en|>..<|su|>
        window = np.asarray(logits[0, -1, lang_lo:lang_hi])
        tok = int(lang_lo + window.argmax())
        text = self.tokenizer.decode([tok], skip_special_tokens=False)
        return text.strip("<|>") if text else "en"

    def resolve_language_token(self, language: str) -> Optional[int]:
        return self.tokenizer.token_to_id(f"<|{language.lower()}|>")

    def build_prompt_tokens(self, config: WhisperTranscriberConfig) -> list[int]:
        tokens = [SOT_TOKEN]
        lang = config.language or "en"
        tokens.append(self.resolve_language_token(lang) or 50259)
        tokens.append(TRANSCRIBE_TOKEN if config.task == WhisperTask.TRANSCRIBE
                      else TRANSLATE_TOKEN)
        if not config.timestamps:
            tokens.append(NO_TIMESTAMPS_TOKEN)
        return tokens

    def decode_chunk(self, cross_kv, config: WhisperTranscriberConfig,
                     chunk_time_offset: float,
                     on_token: Optional[Callable[[int, str], bool]] = None
                     ) -> WhisperChunkResult:
        """Greedy decode one chunk over precomputed cross-KV (transcriber.rs:143)."""
        cfg = self.config
        ck, cv = cross_kv
        prompt = self.build_prompt_tokens(config)
        max_len = min(len(prompt) + config.max_tokens_per_chunk + 1,
                      cfg.max_target_positions)
        cache_len = seq_bucket(max_len, cfg.max_target_positions)
        allow = self._allow_ts if config.timestamps else self._allow_no_ts

        if on_token is None:
            # fused path: entire decode loop on device, one readback per chunk
            max_steps = min(config.max_tokens_per_chunk,
                            cache_len - len(prompt) - 1)
            temps = (config.temperatures if config.temperature_fallback
                     else (0.0,))
            generated: list[int] = []
            for attempt, temp in enumerate(temps):
                sk, sv = kwhisper.init_self_cache(cfg, 1, cache_len,
                                                  self.params["embed"].dtype)
                rng = jax.random.PRNGKey(config.seed + attempt)
                out, n, sum_lp, sk, sv = self._decode_loop(
                    self.params, jnp.asarray([prompt], jnp.int32), sk, sv,
                    ck, cv, allow, jnp.float32(temp), rng,
                    max_steps=max_steps, prompt_len=len(prompt))
                generated = [int(t) for t in np.asarray(out[:int(n)])]
                if not config.temperature_fallback:
                    break
                text_ids = [i for i in generated if i < FIRST_SPECIAL_TOKEN]
                text = self.tokenizer.decode(text_ids, skip_special_tokens=True)
                avg_lp = float(sum_lp) / max(len(generated), 1)
                if (compression_ratio(text) <= config.compression_ratio_threshold
                        and avg_lp >= config.logprob_threshold):
                    break  # decode accepted; else retry hotter
            return self._finalize_chunk(generated, config, chunk_time_offset)

        sk, sv = kwhisper.init_self_cache(cfg, 1, cache_len,
                                          self.params["embed"].dtype)

        # streaming path: per-token host sync for the callback
        tok, sk, sv = self._prefill(self.params, jnp.asarray([prompt], jnp.int32),
                                    sk, sv, ck, cv, allow)

        generated: list[int] = []
        pos = len(prompt)
        t = int(tok)
        generated.append(t)
        if on_token is not None and t != EOT_TOKEN:
            if not on_token(t, self.tokenizer.decode([t], False)):
                return self._finalize_chunk(generated, config, chunk_time_offset)
        for _ in range(config.max_tokens_per_chunk):
            if t == EOT_TOKEN or pos + 1 >= cache_len:
                break
            tok, sk, sv = self._step(self.params, jnp.int32(t), sk, sv, ck, cv,
                                     jnp.int32(pos), allow)
            t = int(tok)
            pos += 1
            generated.append(t)
            if on_token is not None and t != EOT_TOKEN:
                if not on_token(t, self.tokenizer.decode([t], False)):
                    break
        return self._finalize_chunk(generated, config, chunk_time_offset)

    def _finalize_chunk(self, ids: list[int], config: WhisperTranscriberConfig,
                        offset: float) -> WhisperChunkResult:
        if config.timestamps:
            segments = self._parse_timestamp_segments(ids, offset)
            return WhisperChunkResult(segments=segments,
                                      text="".join(s.text for s in segments))
        text_ids = [i for i in ids if i < FIRST_SPECIAL_TOKEN]
        text = self.tokenizer.decode(text_ids, skip_special_tokens=True)
        segments = []
        if text.strip():
            segments = [WhisperSegment(offset, offset + CHUNK_LENGTH_SECS, text)]
        return WhisperChunkResult(segments=segments, text=text)

    def _parse_timestamp_segments(self, ids: list[int],
                                  offset: float) -> list[WhisperSegment]:
        """<|t1|> text <|t2|> pairs -> segments; timestamps step 0.02s."""
        segments: list[WhisperSegment] = []
        start: Optional[float] = None
        buf: list[int] = []
        for i in ids:
            if i >= TIMESTAMP_BEGIN:
                ts = (i - TIMESTAMP_BEGIN) * 0.02 + offset
                if start is None:
                    start = ts
                else:
                    text = self.tokenizer.decode(
                        [t for t in buf if t < FIRST_SPECIAL_TOKEN], True)
                    if text.strip():
                        segments.append(WhisperSegment(start, ts, text))
                    start, buf = ts, []
            elif i < FIRST_SPECIAL_TOKEN:
                buf.append(i)
        if buf:
            text = self.tokenizer.decode(buf, True)
            if text.strip():
                segments.append(WhisperSegment(
                    start if start is not None else offset,
                    offset + CHUNK_LENGTH_SECS, text))
        return segments

    # ------------------------------------------------------------------

    def transcribe(self, audio: np.ndarray,
                   config: Optional[WhisperTranscriberConfig] = None,
                   on_token: Optional[Callable[[int, str], bool]] = None
                   ) -> tuple[str, list[WhisperSegment]]:
        """Full pipeline: chunk -> mel+encode -> decode -> stitch.

        language="auto" runs whisper-native detection on the first chunk.
        Multi-chunk audio without a streaming callback runs the batched
        pipeline (config.chunk_batch lanes per wave); streaming keeps the
        serial order so on_token sees tokens in time order.
        """
        import dataclasses
        config = config or WhisperTranscriberConfig()
        chunks = self.chunk_audio(audio)
        if on_token is None and len(chunks) > 1 and config.chunk_batch > 1:
            return self._transcribe_batched(chunks, config)
        results = []
        for i, chunk in enumerate(chunks):
            cross_kv = self._encode_chunk(self.params,
                                          jnp.asarray(audio_pcm16(chunk)))
            if config.language == "auto":
                config = dataclasses.replace(
                    config, language=self.detect_language(cross_kv))
            results.append(self.decode_chunk(cross_kv, config,
                                             i * CHUNK_LENGTH_SECS, on_token))
        return stitch_segments(results)

    def _transcribe_batched(self, chunks: list[np.ndarray],
                            config: WhisperTranscriberConfig
                            ) -> tuple[str, list[WhisperSegment]]:
        """Independent chunks decode together: waves of up to chunk_batch
        lanes (bucketed so each lane count compiles once; partial waves pad
        by repeating lane 0). Per-lane greedy output equals the serial
        decode_chunk; temperature_fallback re-checks lanes host-side and
        retries only degenerate chunks through the serial path. ~n_chunks x
        aggregate throughput over the reference's serial loop
        (transcriber.rs:87) at long audio."""
        import dataclasses
        from ..core.bucketing import batch_bucket
        cfg = self.config
        results: list[Optional[WhisperChunkResult]] = [None] * len(chunks)
        prompt: Optional[list[int]] = None
        wave_size = max(int(config.chunk_batch), 1)
        for ws in range(0, len(chunks), wave_size):
            wave = chunks[ws:ws + wave_size]
            nb = min(batch_bucket(len(wave)), wave_size)
            # upload only real lanes as int16 PCM; bucket-pad on device
            audios = audio_pcm16(np.stack(wave))
            ck, cv = self._encode_chunks(self.params, jnp.asarray(audios),
                                         n_pad=nb - len(wave))
            if config.language == "auto" and prompt is None:
                lane0 = (jax.lax.slice_in_dim(ck, 0, 1, axis=1),
                         jax.lax.slice_in_dim(cv, 0, 1, axis=1))
                config = dataclasses.replace(
                    config, language=self.detect_language(lane0))
            if prompt is None:
                prompt = self.build_prompt_tokens(config)
            max_len = min(len(prompt) + config.max_tokens_per_chunk + 1,
                          cfg.max_target_positions)
            cache_len = seq_bucket(max_len, cfg.max_target_positions)
            max_steps = min(config.max_tokens_per_chunk,
                            cache_len - len(prompt) - 1)
            allow = (self._allow_ts if config.timestamps
                     else self._allow_no_ts)
            sk, sv = kwhisper.init_self_cache(cfg, nb, cache_len,
                                              self.params["embed"].dtype)
            prompt_b = jnp.asarray([prompt] * nb, jnp.int32)
            out, sum_lp = self._decode_loop_b(
                self.params, prompt_b, sk, sv, ck, cv, allow,
                max_steps=max_steps, prompt_len=len(prompt))
            out = np.asarray(out)
            sum_lp = np.asarray(sum_lp)
            for j in range(len(wave)):
                row = [int(t) for t in out[j]]
                if EOT_TOKEN in row:
                    row = row[:row.index(EOT_TOKEN) + 1]
                offset = (ws + j) * CHUNK_LENGTH_SECS
                if config.temperature_fallback:
                    text_ids = [i for i in row if i < FIRST_SPECIAL_TOKEN]
                    text = self.tokenizer.decode(text_ids,
                                                 skip_special_tokens=True)
                    avg_lp = float(sum_lp[j]) / max(len(row), 1)
                    if (compression_ratio(text) >
                            config.compression_ratio_threshold
                            or avg_lp < config.logprob_threshold):
                        # degenerate greedy decode: retry this chunk alone
                        # through the serial fallback ladder
                        lane = (jax.lax.slice_in_dim(ck, j, j + 1, axis=1),
                                jax.lax.slice_in_dim(cv, j, j + 1, axis=1))
                        results[ws + j] = self.decode_chunk(lane, config,
                                                            offset)
                        continue
                results[ws + j] = self._finalize_chunk(row, config, offset)
        return stitch_segments(results)


def stitch_segments(chunk_results: list[WhisperChunkResult]
                    ) -> tuple[str, list[WhisperSegment]]:
    """Cf. transcriber.rs:420 stitch_segments + merge_boundary_segments."""
    if not chunk_results:
        return "", []
    full_text = "".join(r.text for r in chunk_results)
    all_segments = [s for r in chunk_results for s in r.segments]
    if len(all_segments) < 2:
        return full_text, all_segments

    def is_boundary(t: float) -> bool:
        rem = t % CHUNK_LENGTH_SECS
        return rem < 0.02 or (CHUNK_LENGTH_SECS - rem) < 0.02

    merged: list[WhisperSegment] = []
    for seg in all_segments:
        if merged and abs(merged[-1].end - seg.start) < 0.02 and \
                is_boundary(merged[-1].end):
            merged[-1] = WhisperSegment(merged[-1].start, seg.end,
                                        merged[-1].text + seg.text)
        else:
            merged.append(seg)
    return full_text, merged
