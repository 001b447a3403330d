"""Transcriber task API (cf. kjarni/src/transcriber/model.rs:22 —
transcribe_file :76, stream_file :182)."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from ..audio.loader import (AudioLoaderConfig, load_audio, load_audio_bytes,
                            load_audio_for_whisper)
from ..models.whisper_transcriber import (WhisperModel, WhisperSegment,
                                          WhisperTask, WhisperTranscriberConfig)
from ..registry import ModelTask
from .common import Device, DownloadPolicy, resolve_model_dir

_TRANSCRIBER_TASKS = (ModelTask.SPEECH_TO_TEXT,)


@dataclasses.dataclass
class TranscriptionResult:
    text: str
    segments: list[WhisperSegment]
    duration: float


class Transcriber:
    def __init__(self, model: str = "whisper-small", *,
                 language: Optional[str] = None,
                 task: WhisperTask | str = WhisperTask.TRANSCRIBE,
                 timestamps: bool = False,
                 device: Device | str | None = None,
                 cache_dir: Optional[Path] = None,
                 offline: bool = False,
                 quiet: bool = False):
        self.device = Device.resolve(device)
        policy = DownloadPolicy.OFFLINE if offline else DownloadPolicy.ALLOW
        model_dir, info = resolve_model_dir(
            model, cache_dir, policy, quiet, _TRANSCRIBER_TASKS, "transcription")
        self.model_info = info
        self.model_id = info.cli_name if info else str(model)
        self._model = WhisperModel(model_dir)
        self.config = WhisperTranscriberConfig(
            language=language,
            task=WhisperTask(task) if isinstance(task, str) else task,
            timestamps=timestamps)

    def transcribe_file(self, path: str | Path) -> TranscriptionResult:
        audio = load_audio_for_whisper(Path(path))
        return self.transcribe_samples(audio)

    def transcribe_bytes(self, data: bytes, fmt: str = "wav") -> TranscriptionResult:
        audio = load_audio_bytes(data, fmt, AudioLoaderConfig.for_whisper())
        return self.transcribe_samples(audio.samples)

    def transcribe_samples(self, samples: np.ndarray) -> TranscriptionResult:
        text, segments = self._model.transcribe(samples, self.config)
        return TranscriptionResult(
            text=text, segments=segments,
            duration=len(samples) / 16000.0)

    def stream_file(self, path: str | Path) -> Iterator[str]:
        """Yield token text pieces as they decode (model.rs:182 stream_file)."""
        audio = load_audio_for_whisper(Path(path))
        pieces: list[str] = []

        # collect via callback per chunk; yield between chunks
        for i, chunk in enumerate(self._model.chunk_audio(audio)):
            import jax.numpy as jnp
            chunk_pieces: list[str] = []

            def cb(tok: int, text: str) -> bool:
                chunk_pieces.append(text)
                return True

            from ..models.whisper_transcriber import audio_pcm16
            cross_kv = self._model._encode_chunk(
                self._model.params, jnp.asarray(audio_pcm16(chunk)))
            self._model.decode_chunk(cross_kv, self.config, i * 30.0, cb)
            yield from chunk_pieces
