"""Audio loading: WAV decode, mono mixdown, resampling.

Rebuild of kjarni-transformers/src/audio/loader.rs (load_audio :72,
load_audio_bytes :101, load_audio_for_whisper :302, create_sine_wave :308).
The reference uses hound+rubato; here stdlib `wave` + numpy polyphase-free
linear resampling (adequate for 16kHz speech frontends).
"""

from __future__ import annotations

import dataclasses
import io
import wave
from pathlib import Path

import numpy as np

from ..core.errors import AudioError

WHISPER_SAMPLE_RATE = 16000


@dataclasses.dataclass
class AudioData:
    samples: np.ndarray  # float32 mono [-1, 1]
    sample_rate: int

    @property
    def duration(self) -> float:
        return len(self.samples) / self.sample_rate

    @property
    def num_samples(self) -> int:
        return len(self.samples)


@dataclasses.dataclass
class AudioLoaderConfig:
    target_sample_rate: int | None = None
    mono: bool = True

    @staticmethod
    def for_whisper() -> "AudioLoaderConfig":
        return AudioLoaderConfig(target_sample_rate=WHISPER_SAMPLE_RATE, mono=True)


def _decode_wav(fileobj) -> AudioData:
    try:
        with wave.open(fileobj, "rb") as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except wave.Error as e:
        raise AudioError(f"failed to decode WAV: {e}")
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise AudioError(f"unsupported WAV sample width {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return AudioData(samples=data, sample_rate=rate)


def resample(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample (replaces the reference's rubato path)."""
    if src_rate == dst_rate:
        return samples
    n_out = int(round(len(samples) * dst_rate / src_rate))
    if n_out <= 1 or len(samples) <= 1:
        return np.zeros(max(n_out, 0), dtype=np.float32)
    x_old = np.arange(len(samples), dtype=np.float64)
    x_new = np.linspace(0, len(samples) - 1, n_out)
    return np.interp(x_new, x_old, samples).astype(np.float32)


def load_audio(path: Path, config: AudioLoaderConfig | None = None) -> AudioData:
    path = Path(path)
    if not path.exists():
        raise AudioError(f"audio file not found: {path}")
    if path.suffix.lower() != ".wav":
        raise AudioError(
            f"unsupported audio format '{path.suffix}' (WAV only in this build)")
    with open(path, "rb") as f:
        return _finish(_decode_wav(f), config)


def load_audio_bytes(data: bytes, fmt: str = "wav",
                     config: AudioLoaderConfig | None = None) -> AudioData:
    if fmt.lower() != "wav":
        raise AudioError(f"unsupported audio format '{fmt}' (WAV only)")
    return _finish(_decode_wav(io.BytesIO(data)), config)


def _finish(audio: AudioData, config: AudioLoaderConfig | None) -> AudioData:
    config = config or AudioLoaderConfig()
    if config.target_sample_rate and audio.sample_rate != config.target_sample_rate:
        audio = AudioData(
            samples=resample(audio.samples, audio.sample_rate,
                             config.target_sample_rate),
            sample_rate=config.target_sample_rate)
    return audio


def load_audio_for_whisper(path: Path) -> np.ndarray:
    """WAV -> mono float32 @16kHz (loader.rs:302)."""
    return load_audio(path, AudioLoaderConfig.for_whisper()).samples


def create_sine_wave(frequency: float, duration_secs: float,
                     sample_rate: int = 16000) -> np.ndarray:
    t = np.arange(int(duration_secs * sample_rate)) / sample_rate
    return np.sin(2 * np.pi * frequency * t).astype(np.float32)


def write_wav(path: Path, samples: np.ndarray, sample_rate: int) -> None:
    """Helper for tests: float32 mono -> 16-bit WAV."""
    data = np.clip(samples, -1.0, 1.0)
    pcm = (data * 32767.0).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
