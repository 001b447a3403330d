"""Log-mel spectrogram frontend, on-device.

Rebuild of kjarni-transformers/src/audio/mel.rs (MelConfig::whisper :44,
compute_mel_spectrogram :60, whisper_log_mel :124, librosa Slaney filterbank
:163). The reference runs a scalar DFT per frame on the CPU ("hot (CPU FFT)" in
SURVEY §3.3); here the whole pipeline — reflect pad → frame → Hann window →
rfft → mel matmul → log10 → whisper normalize — is one jitted XLA program, so
the frontend fuses straight into the Whisper encoder (BASELINE.json: "audio
frontend fuses into on-device XLA ops feeding the encoder").
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 80
    chunk_length_secs: int = 30
    whisper_normalize: bool = False
    center: bool = False
    power: bool = False
    fmax: float | None = None
    fmin: float = 0.0

    @staticmethod
    def whisper(n_mels: int = 80) -> "MelConfig":
        return MelConfig(sample_rate=16000, n_fft=400, hop_length=160,
                         n_mels=n_mels, chunk_length_secs=30,
                         whisper_normalize=True, center=True, power=True,
                         fmax=8000.0, fmin=0.0)

    @property
    def chunk_samples(self) -> int:
        return self.sample_rate * self.chunk_length_secs

    @property
    def n_frames(self) -> int:
        # whisper fixes 3000 frames per 30s chunk
        return self.chunk_samples // self.hop_length


def hz_to_mel_slaney(hz: np.ndarray) -> np.ndarray:
    """Slaney mel scale (mel.rs:163 create_mel_filterbank_librosa)."""
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    hz = np.asarray(hz, dtype=np.float64)
    return np.where(hz < min_log_hz, hz / f_sp,
                    min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep)


def mel_to_hz_slaney(mel: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = np.asarray(mel, dtype=np.float64)
    return np.where(mel < min_log_mel, mel * f_sp,
                    min_log_hz * np.exp(logstep * (mel - min_log_mel)))


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float) -> np.ndarray:
    """librosa-compatible Slaney filterbank [n_mels, n_fft//2+1]."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel_slaney(np.array(fmin)),
                          hz_to_mel_slaney(np.array(fmax)), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    fb = fb * enorm[:, None]
    return fb.astype(np.float32)


@partial(jax.jit, static_argnames=("cfg",))
def log_mel_spectrogram(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """audio [n_samples] (pre-padded to chunk_samples for whisper) -> [n_mels, T].

    Matches mel.rs:60 compute_mel_spectrogram with whisper settings: the last
    frame whose window would overrun the padded signal is left at zero (the
    reference `break`s there), then whisper log-normalization applies.
    """
    fmax = cfg.fmax if cfg.fmax is not None else cfg.sample_rate / 2.0
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                    cfg.fmin, fmax))
    if cfg.center:
        pad = cfg.n_fft // 2
        audio = jnp.pad(audio, pad, mode="reflect")
    n_samples = audio.shape[0]
    if cfg.whisper_normalize:
        n_frames = cfg.n_frames
    else:
        n_frames = 1 + (n_samples - cfg.n_fft) // cfg.hop_length

    # frame: [n_frames, n_fft] via gather of strided windows
    starts = jnp.arange(n_frames) * cfg.hop_length
    idx = starts[:, None] + jnp.arange(cfg.n_fft)[None, :]
    valid = (starts + cfg.n_fft) <= n_samples  # reference breaks past the end
    frames = jnp.take(audio, jnp.clip(idx, 0, n_samples - 1), axis=0)
    window = jnp.asarray(np.hanning(cfg.n_fft + 1)[:-1].astype(np.float32))
    frames = frames * window[None, :] * valid[:, None]

    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))  # [n_frames, n_bins]
    if cfg.power:
        spec = spec * spec
    mel = spec @ fb.T  # [n_frames, n_mels]
    mel = mel.T  # [n_mels, n_frames]

    if cfg.whisper_normalize:
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
        return (log_spec + 4.0) / 4.0
    return jnp.log(jnp.maximum(mel, 1e-10))
