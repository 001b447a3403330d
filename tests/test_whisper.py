"""Whisper tests: mel-frontend parity vs HF feature extractor, encoder/decoder
parity vs HF torch, chunking/stitching, transcribe pipeline smoke."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import save_torch_model

from kjarni_tpu.audio.loader import create_sine_wave, resample, write_wav
from kjarni_tpu.audio.mel import MelConfig, log_mel_spectrogram, mel_filterbank
from kjarni_tpu.models import whisper as kwhisper
from kjarni_tpu.models.whisper_transcriber import (WhisperChunkResult,
                                                   WhisperModel,
                                                   WhisperSegment,
                                                   WhisperTranscriberConfig,
                                                   stitch_segments)
from kjarni_tpu.weights.safetensors_loader import ModelWeights


class TestMelFrontend:
    def test_filterbank_matches_transformers(self):
        from transformers.audio_utils import mel_filter_bank
        expected = mel_filter_bank(
            num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=16000, norm="slaney",
            mel_scale="slaney").T  # [80, 201]
        got = mel_filterbank(16000, 400, 80, 0.0, 8000.0)
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_log_mel_matches_whisper_feature_extractor(self):
        from transformers import WhisperFeatureExtractor
        fe = WhisperFeatureExtractor()  # default whisper config, no download
        audio = create_sine_wave(440.0, 2.0, 16000)
        expected = fe(audio, sampling_rate=16000,
                      return_tensors="np").input_features[0]  # [80, 3000]
        padded = np.pad(audio, (0, 16000 * 30 - len(audio)))
        got = np.asarray(log_mel_spectrogram(jnp.asarray(padded),
                                             MelConfig.whisper()))
        assert got.shape == expected.shape == (80, 3000)
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_resample_halves_length(self):
        x = create_sine_wave(100.0, 1.0, 32000)
        y = resample(x, 32000, 16000)
        assert abs(len(y) - 16000) <= 1


class TestPolyphaseResample:
    """Windowed-sinc polyphase resampler vs scipy.signal.resample_poly
    (VERDICT item 6: the round-1 linear interpolator aliased on 44.1k->16k;
    reference uses rubato's polyphase, audio/loader.rs:72)."""

    @pytest.mark.parametrize("src", [44100, 48000, 8000, 22050, 32000])
    def test_matches_scipy_golden(self, src):
        scipy_signal = pytest.importorskip("scipy.signal")
        import math
        rng = np.random.default_rng(7)
        x = (rng.standard_normal(src) * 0.3).astype(np.float32)  # 1s of noise
        got = resample(x, src, 16000)
        g = math.gcd(src, 16000)
        want = scipy_signal.resample_poly(x.astype(np.float64),
                                          16000 // g, src // g)
        assert len(got) == len(want)
        assert float(np.abs(got - want).max()) < 1e-3

    def test_antialiasing_kills_above_nyquist_tone(self):
        # 10 kHz tone sampled at 44.1k is above the 8 kHz target Nyquist:
        # a correct resampler suppresses it; linear interpolation aliased it
        # to ~5.9 kHz at full amplitude (the round-1 bug).
        x = create_sine_wave(10000.0, 1.0, 44100)
        y = resample(x, 44100, 16000)
        rms = float(np.sqrt(np.mean(y[800:-800] ** 2)))
        assert rms < 0.01, f"aliased energy leaked through: rms={rms}"

    def test_passband_tone_preserved(self):
        x = create_sine_wave(1000.0, 1.0, 44100)
        y = resample(x, 44100, 16000)
        rms = float(np.sqrt(np.mean(y[800:-800] ** 2)))
        assert abs(rms - 1 / np.sqrt(2)) < 0.01

    def test_identity_when_rates_equal(self):
        x = create_sine_wave(100.0, 0.5, 16000)
        np.testing.assert_array_equal(resample(x, 16000, 16000), x)

    def test_short_input(self):
        assert len(resample(np.zeros(1, np.float32), 44100, 16000)) >= 0

    def test_upsample_exact_ratio(self):
        scipy_signal = pytest.importorskip("scipy.signal")
        x = (np.random.default_rng(3).standard_normal(8000) * 0.2
             ).astype(np.float32)
        got = resample(x, 8000, 16000)
        want = scipy_signal.resample_poly(x.astype(np.float64), 2, 1)
        assert float(np.abs(got - want).max()) < 1e-3


def whisper_checkpoint(tmp_path, seed=0):
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    config = WhisperConfig(
        vocab_size=51865, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=448)
    torch.manual_seed(seed)
    model = WhisperForConditionalGeneration(config).eval()
    save_torch_model(tmp_path, model, config)
    hf = json.loads((tmp_path / "config.json").read_text())
    cfg = kwhisper.WhisperConfig.from_hf(hf)
    params = kwhisper.load_params(ModelWeights(tmp_path), cfg)
    return model, cfg, params


class TestWhisperParity:
    def test_encoder_parity(self, tmp_path):
        model, cfg, params = whisper_checkpoint(tmp_path)
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.1
        with torch.no_grad():
            expected = model.model.encoder(
                torch.from_numpy(mel)).last_hidden_state.numpy()
        got = np.asarray(kwhisper.encode(params, cfg, jnp.asarray(mel)))
        np.testing.assert_allclose(got, expected, atol=3e-3, rtol=1e-3)

    def test_decoder_parity(self, tmp_path):
        model, cfg, params = whisper_checkpoint(tmp_path, seed=1)
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.1
        dec_ids = np.array([[50258, 50259, 50359, 50363, 100]], dtype=np.int32)
        with torch.no_grad():
            expected = model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(dec_ids.astype(np.int64)),
            ).logits.numpy()
        enc = kwhisper.encode(params, cfg, jnp.asarray(mel))
        ck, cv = kwhisper.precompute_cross_kv(params, cfg, enc)
        sk, sv = kwhisper.init_self_cache(cfg, 1, 8)
        enc_mask = jnp.ones((1, cfg.max_source_positions), jnp.int32)
        logits, _, _ = kwhisper.decode_step(params, cfg, jnp.asarray(dec_ids),
                                            sk, sv, ck, cv, enc_mask, 0)
        got = np.asarray(logits)
        np.testing.assert_allclose(got, expected, atol=8e-3, rtol=1e-2)
        g, e = got.ravel(), expected.ravel()
        cos = g @ e / (np.linalg.norm(g) * np.linalg.norm(e))
        assert cos >= 0.9999

    def test_incremental_decode_matches_full(self, tmp_path):
        model, cfg, params = whisper_checkpoint(tmp_path, seed=2)
        rng = np.random.default_rng(2)
        mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.1
        dec_ids = np.array([[50258, 50259, 50359, 100]], dtype=np.int32)
        enc = kwhisper.encode(params, cfg, jnp.asarray(mel))
        ck, cv = kwhisper.precompute_cross_kv(params, cfg, enc)
        enc_mask = jnp.ones((1, cfg.max_source_positions), jnp.int32)
        sk, sv = kwhisper.init_self_cache(cfg, 1, 8)
        full, _, _ = kwhisper.decode_step(params, cfg, jnp.asarray(dec_ids),
                                          sk, sv, ck, cv, enc_mask, 0)
        sk, sv = kwhisper.init_self_cache(cfg, 1, 8)
        last = None
        for i in range(dec_ids.shape[1]):
            last, sk, sv = kwhisper.decode_step(
                params, cfg, jnp.asarray(dec_ids[:, i:i + 1]), sk, sv, ck, cv,
                enc_mask, jnp.int32(i))
        np.testing.assert_allclose(np.asarray(last)[0, 0],
                                   np.asarray(full)[0, -1], atol=1e-3, rtol=1e-3)


class TestChunkingStitching:
    def test_chunk_audio_pads(self, tmp_path):
        _, cfg, params = whisper_checkpoint(tmp_path, seed=3)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        wm = WhisperModel(tmp_path)
        audio = np.zeros(16000 * 45, dtype=np.float32)  # 45s -> 2 chunks
        chunks = wm.chunk_audio(audio)
        assert len(chunks) == 2
        assert all(len(c) == 16000 * 30 for c in chunks)

    def test_build_prompt_tokens(self, tmp_path):
        whisper_checkpoint(tmp_path, seed=3)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        wm = WhisperModel(tmp_path)
        toks = wm.build_prompt_tokens(WhisperTranscriberConfig())
        assert toks == [50258, 50259, 50359, 50363]
        toks_ts = wm.build_prompt_tokens(WhisperTranscriberConfig(timestamps=True))
        assert toks_ts == [50258, 50259, 50359]

    def test_stitch_merges_boundary(self):
        r1 = WhisperChunkResult(
            segments=[WhisperSegment(0.0, 30.0, "hello ")], text="hello ")
        r2 = WhisperChunkResult(
            segments=[WhisperSegment(30.0, 60.0, "world")], text="world")
        text, segments = stitch_segments([r1, r2])
        assert text == "hello world"
        assert len(segments) == 1
        assert segments[0].start == 0.0 and segments[0].end == 60.0

    def test_stitch_keeps_separate_segments(self):
        r1 = WhisperChunkResult(
            segments=[WhisperSegment(0.0, 12.0, "a")], text="a")
        r2 = WhisperChunkResult(
            segments=[WhisperSegment(30.0, 40.0, "b")], text="b")
        _, segments = stitch_segments([r1, r2])
        assert len(segments) == 2


class TestTranscribePipeline:
    def test_end_to_end_smoke(self, tmp_path):
        whisper_checkpoint(tmp_path, seed=4)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        wm = WhisperModel(tmp_path)
        audio = create_sine_wave(440.0, 1.0, 16000)
        cfg = WhisperTranscriberConfig(max_tokens_per_chunk=4)
        text, segments = wm.transcribe(audio, cfg)
        assert isinstance(text, str)

    def test_transcriber_task_from_file(self, tmp_path):
        model_dir = tmp_path / "model"
        model_dir.mkdir()
        whisper_checkpoint(model_dir, seed=5)
        from helpers import build_word_tokenizer
        build_word_tokenizer(model_dir / "tokenizer.json", bert_style=False)
        wav = tmp_path / "test.wav"
        write_wav(wav, create_sine_wave(220.0, 0.5, 16000), 16000)

        from kjarni_tpu.tasks.transcriber import Transcriber
        t = Transcriber(str(model_dir), quiet=True)
        t.config.max_tokens_per_chunk = 3
        result = t.transcribe_file(wav)
        assert isinstance(result.text, str)
        assert result.duration == pytest.approx(0.5, abs=0.01)


class TestTemperatureFallback:
    """OpenAI-style quality loop (VERDICT item 8): degenerate chunks retry at
    increasing temperature; off by default for reference parity."""

    def test_compression_ratio_flags_repetition(self):
        from kjarni_tpu.models.whisper_transcriber import compression_ratio
        degenerate = "the cat " * 60
        normal = ("the quick brown fox jumps over the lazy dog while the "
                  "violinist tuned a reluctant cello in the damp courtyard")
        assert compression_ratio(degenerate) > 2.4
        assert compression_ratio(normal) <= 2.4
        assert compression_ratio("") == 0.0

    def test_fallback_disabled_matches_greedy(self, tmp_path):
        whisper_checkpoint(tmp_path, seed=6)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        wm = WhisperModel(tmp_path)
        audio = create_sine_wave(330.0, 1.0, 16000)
        base = WhisperTranscriberConfig(max_tokens_per_chunk=4)
        off = WhisperTranscriberConfig(max_tokens_per_chunk=4,
                                       temperature_fallback=False)
        assert wm.transcribe(audio, base)[0] == wm.transcribe(audio, off)[0]

    def test_fallback_retries_until_accept_or_exhausted(self, tmp_path):
        whisper_checkpoint(tmp_path, seed=7)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        wm = WhisperModel(tmp_path)
        audio = create_sine_wave(330.0, 1.0, 16000)
        # impossible acceptance bar -> walks the whole temperature ladder
        # (synthetic stand-in for a repetition loop) and still returns
        cfg = WhisperTranscriberConfig(
            max_tokens_per_chunk=4, temperature_fallback=True,
            temperatures=(0.0, 0.5, 1.0),
            compression_ratio_threshold=-1.0, logprob_threshold=1e9)
        text, segs = wm.transcribe(audio, cfg)
        assert isinstance(text, str)

    def test_fallback_accepts_greedy_when_healthy(self, tmp_path):
        whisper_checkpoint(tmp_path, seed=8)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        wm = WhisperModel(tmp_path)
        audio = create_sine_wave(330.0, 1.0, 16000)
        # permissive thresholds: temperature 0 accepted -> identical to greedy
        on = WhisperTranscriberConfig(
            max_tokens_per_chunk=4, temperature_fallback=True,
            compression_ratio_threshold=1e9, logprob_threshold=-1e9)
        base = WhisperTranscriberConfig(max_tokens_per_chunk=4)
        assert wm.transcribe(audio, on)[0] == wm.transcribe(audio, base)[0]


class TestBatchedChunks:
    """Long-audio chunks decode batched (whisper_transcriber.py
    _transcribe_batched): waves of chunk_batch lanes with per-row EOT must
    reproduce the serial pipeline exactly (the reference decodes chunks one
    by one, transcriber.rs:87)."""

    def _model(self, tmp_path, seed=6):
        whisper_checkpoint(tmp_path, seed=seed)
        from helpers import build_word_tokenizer
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)
        return WhisperModel(tmp_path)

    def test_batched_matches_serial(self, tmp_path):
        wm = self._model(tmp_path)
        rng = np.random.default_rng(7)
        audio = (0.1 * np.sin(2 * np.pi * 220.0 *
                              np.arange(16000 * 75) / 16000.0)
                 + 0.02 * rng.standard_normal(16000 * 75)).astype(np.float32)
        assert len(wm.chunk_audio(audio)) == 3     # partial wave: pads to 4
        serial = WhisperTranscriberConfig(max_tokens_per_chunk=4,
                                          chunk_batch=1)
        batched = WhisperTranscriberConfig(max_tokens_per_chunk=4,
                                           chunk_batch=16)
        t_s, seg_s = wm.transcribe(audio, serial)
        t_b, seg_b = wm.transcribe(audio, batched)
        assert t_b == t_s
        assert [(s.start, s.end, s.text) for s in seg_b] == \
            [(s.start, s.end, s.text) for s in seg_s]

    def test_multiple_waves(self, tmp_path):
        """chunk_batch smaller than n_chunks: several waves, offsets intact."""
        wm = self._model(tmp_path, seed=7)
        audio = np.zeros(16000 * 90, dtype=np.float32)   # 3 chunks
        audio[::161] = 0.3
        serial = WhisperTranscriberConfig(max_tokens_per_chunk=3,
                                          chunk_batch=1)
        waves = WhisperTranscriberConfig(max_tokens_per_chunk=3,
                                         chunk_batch=2)  # 2 waves: 2+1
        assert wm.transcribe(audio, waves) == wm.transcribe(audio, serial)

    def test_batched_timestamps(self, tmp_path):
        wm = self._model(tmp_path, seed=8)
        rng = np.random.default_rng(8)
        audio = (0.05 * rng.standard_normal(16000 * 61)).astype(np.float32)
        serial = WhisperTranscriberConfig(max_tokens_per_chunk=4,
                                          timestamps=True, chunk_batch=1)
        batched = WhisperTranscriberConfig(max_tokens_per_chunk=4,
                                           timestamps=True, chunk_batch=16)
        t_s, seg_s = wm.transcribe(audio, serial)
        t_b, seg_b = wm.transcribe(audio, batched)
        assert t_b == t_s
        assert [(s.start, s.end) for s in seg_b] == \
            [(s.start, s.end) for s in seg_s]

    def test_batched_with_fallback(self, tmp_path):
        """temperature_fallback on the batched path: accepted rows come from
        the batch; the host-side degenerate check matches the serial one."""
        wm = self._model(tmp_path, seed=9)
        rng = np.random.default_rng(9)
        audio = (0.05 * rng.standard_normal(16000 * 61)).astype(np.float32)
        serial = WhisperTranscriberConfig(
            max_tokens_per_chunk=4, temperature_fallback=True,
            logprob_threshold=-1e9, chunk_batch=1)
        batched = WhisperTranscriberConfig(
            max_tokens_per_chunk=4, temperature_fallback=True,
            logprob_threshold=-1e9, chunk_batch=16)
        assert wm.transcribe(audio, batched)[0] == \
            wm.transcribe(audio, serial)[0]
