"""Headline benchmark: MiniLM-L6-v2-class embedding throughput (sentences/sec/chip).

Driver contract: print ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 10_000 — the BASELINE.json north-star target
(">=10k MiniLM sentences/sec/chip on v5e-1").

Methodology: the TPU here sits behind a tunnel with ~30ms synchronous
round-trip latency, so per-call host timing measures the tunnel, not the chip.
We run ITERS encoder forwards inside ONE jitted `lax.scan` with a data
dependency between iterations (so nothing can be elided or deduped), read back
a single scalar, and subtract the measured empty-roundtrip latency.

Model: randomly-initialized with the exact all-MiniLM-L6-v2 geometry (6 layers,
hidden 384, 12 heads, ffn 1536, vocab 30522) — throughput does not depend on
weight values. bf16 weights/activations (MXU-native), batch 256, seq bucket 64.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_minilm(dtype):
    from kjarni_tpu.models.bert import BertConfig

    cfg = BertConfig(
        flavor="bert", vocab_size=30522, hidden_size=384, num_layers=6,
        num_heads=12, intermediate_size=1536, max_position_embeddings=512,
        type_vocab_size=2, pad_token_id=0, layer_norm_eps=1e-12,
        activation="gelu")
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(dtype)

    L, H, I, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    lin = lambda i, o: {"w": w(L, i, o), "b": w(L, o)}
    norm = lambda: {"weight": np.ones((L, H), dtype), "bias": np.zeros((L, H), dtype)}
    params = {
        "embeddings": {
            "word": w(V, H),
            "position": w(cfg.max_position_embeddings, H),
            "token_type": w(2, H),
            "norm": {"weight": np.ones(H, dtype), "bias": np.zeros(H, dtype)},
        },
        "layers": {
            "q": lin(H, H), "k": lin(H, H), "v": lin(H, H), "o": lin(H, H),
            "attn_norm": norm(),
            "fc1": lin(H, I), "fc2": lin(I, H),
            "ffn_norm": norm(),
        },
        "pooler": None,
        "rel_bias": None,
    }
    return cfg, params


def build_llama_1b(dtype, quantize=False):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from __graft_entry__ import _random_llama
    from kjarni_tpu.models import llama as kllama
    import jax
    import jax.numpy as jnp

    cfg, params = _random_llama({
        "vocab_size": 128256, "hidden_size": 2048, "num_layers": 16,
        "num_heads": 32, "num_kv_heads": 8, "head_dim": 64,
        "intermediate_size": 8192, "max_seq_len": 4096})
    if quantize == "int4":
        params = kllama.quantize_params_int4(params)
    elif quantize:
        params = kllama.quantize_params_int8(params)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if x.dtype == np.float32 and x.ndim > 1 else jnp.asarray(x), params)
    params["rope_cos"] = jnp.asarray(params["rope_cos"], jnp.float32)
    params["rope_sin"] = jnp.asarray(params["rope_sin"], jnp.float32)
    return cfg, params


def _device_hash_builders():
    """(h8, hbf16): fused iota-hash random tensors built ON the device —
    XLA writes only the final int8/bf16 bytes, no host gen, no transfer."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    def h8(shape, salt):
        @partial(jax.jit, static_argnums=0)
        def f(shape, salt):
            n = 1
            for s in shape:
                n *= s
            i = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435761) + salt
            b = ((i >> 13) & jnp.uint32(0xFF)).astype(jnp.int32) - 128
            return jnp.clip(b, -127, 127).astype(jnp.int8).reshape(shape)
        return f(tuple(shape), jnp.uint32(salt))

    def hbf16(shape, salt, scale=0.02):
        @partial(jax.jit, static_argnums=0)
        def f(shape, salt, scale):
            n = 1
            for s in shape:
                n *= s
            i = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2246822519) + salt
            u = ((i >> 9) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
            return ((u - 0.5) * (2 * scale)).astype(jnp.bfloat16).reshape(shape)
        return f(tuple(shape), jnp.uint32(salt), scale)

    return h8, hbf16


def _device_fmix_bf16():
    """A bf16 builder with full avalanche (murmur3 fmix32 finalizer).

    The cheap single-multiply iota hash above is fine for THROUGHPUT
    benches (bytes are bytes), but its extracted bit-window is strongly
    correlated across strides: at llama vocab scale the lm_head columns
    come out near-duplicated (measured on CPU: random column pairs with
    |cos| up to 0.99999; thousands of logits tied within 0.05 of the max,
    top-8 exactly equal) — which silently breaks any bench where ARGMAX
    must be meaningful (greedy parity, speculative acceptance). Use this
    builder wherever weight VALUES matter, not just bytes."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    def fmix_bf16(shape, salt, scale=0.02):
        @partial(jax.jit, static_argnums=0)
        def f(shape, salt, scale):
            n = 1
            for s in shape:
                n *= s
            i = jax.lax.iota(jnp.uint32, n) + salt * jnp.uint32(0x9E3779B9)
            i = (i ^ (i >> 16)) * jnp.uint32(0x85EBCA6B)
            i = (i ^ (i >> 13)) * jnp.uint32(0xC2B2AE35)
            i = i ^ (i >> 16)
            u = (i & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
            return ((u - 0.5) * (2 * scale)).astype(jnp.bfloat16).reshape(
                shape)
        return f(tuple(shape), jnp.uint32(salt), scale)

    return fmix_bf16


def build_llama_bf16_device(geom_kwargs, rope_theta=500000.0, salt0=0):
    """Random bf16 llama params synthesized ON DEVICE (plain, unquantized
    layout: {"w": bf16 [L,K,N]} per projection). See
    build_llama_int8_device for why device synthesis (host gen + tunnel
    device_put dominates bench wall time at 1B+)."""
    import jax.numpy as jnp
    from kjarni_tpu.models import llama as kllama

    _, hbf16 = _device_hash_builders()
    cfg = kllama.DecoderConfig(arch="llama", rope_theta=rope_theta,
                               **geom_kwargs)
    L, H, Hkv, D = (cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                    cfg.head_dim)
    hid, inter, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    cos, sin = kllama.rope_cache(cfg, cfg.max_seq_len)

    def proj(k_dim, n_dim, salt):
        return {"w": hbf16((L, k_dim, n_dim), salt0 * 100 + salt)}

    params = {
        "embed": hbf16((V, hid), salt0 * 100 + 1),
        "layers": {
            "q": proj(hid, H * D, 11),
            "k": proj(hid, Hkv * D, 12),
            "v": proj(hid, Hkv * D, 13),
            "o": proj(H * D, hid, 14),
            "gate": proj(hid, inter, 15),
            "up": proj(hid, inter, 16),
            "down": proj(inter, hid, 17),
            "attn_norm": jnp.ones((L, hid), jnp.bfloat16),
            "ffn_norm": jnp.ones((L, hid), jnp.bfloat16),
        },
        "final_norm": jnp.ones(hid, jnp.bfloat16),
        "lm_head": hbf16((hid, V), salt0 * 100 + 18),
        "rope_cos": jnp.asarray(cos, jnp.float32),
        "rope_sin": jnp.asarray(sin, jnp.float32),
    }
    return cfg, params


def build_llama_int8_device(geom_kwargs, rope_theta=500000.0):
    """Random int8-quantized llama params synthesized ON DEVICE.

    Host-side standard_normal at 8B scale is ~32 GB of f64 temporaries and
    the quantized result is an 8 GB device_put through the ~30 MB/s dev
    tunnel; a fused iota-hash lowers straight to int8 writes on the chip
    (8B params in ~16 s). Decode throughput is weight-VALUE-independent
    (no data-dependent control flow in the step), so hash-random weights
    measure exactly what real ones would. Layout matches
    models/llama.py quantize_params_int8 ({"w": int8 [L,K,N],
    "scale": f32 [L,N]} per projection).
    """
    import jax.numpy as jnp
    from kjarni_tpu.models import llama as kllama

    h8, hbf16 = _device_hash_builders()
    cfg = kllama.DecoderConfig(arch="llama", rope_theta=rope_theta,
                               **geom_kwargs)
    L, H, Hkv, D = (cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                    cfg.head_dim)
    hid, inter, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    cos, sin = kllama.rope_cache(cfg, cfg.max_seq_len)
    sc = 0.02 / 127.0

    def proj(k_dim, n_dim, salt):
        return {"w": h8((L, k_dim, n_dim), salt),
                "scale": jnp.full((L, n_dim), sc, jnp.float32)}

    params = {
        "embed": hbf16((V, hid), 1),
        "layers": {
            "q": proj(hid, H * D, 11),
            "k": proj(hid, Hkv * D, 12),
            "v": proj(hid, Hkv * D, 13),
            "o": proj(H * D, hid, 14),
            "gate": proj(hid, inter, 15),
            "up": proj(hid, inter, 16),
            "down": proj(inter, hid, 17),
            "attn_norm": jnp.ones((L, hid), jnp.bfloat16),
            "ffn_norm": jnp.ones((L, hid), jnp.bfloat16),
        },
        "final_norm": jnp.ones(hid, jnp.bfloat16),
        "lm_head": {"w": h8((hid, V), 18),
                    "scale": jnp.full((V,), sc, jnp.float32)},
        "rope_cos": jnp.asarray(cos, jnp.float32),
        "rope_sin": jnp.asarray(sin, jnp.float32),
    }
    return cfg, params


def _roundtrip_latency():
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones(8)
    float(probe(x))
    t0 = time.perf_counter()
    for _ in range(3):
        float(probe(x))
    return (time.perf_counter() - t0) / 3


def bench_decode(quantize=False):
    """Llama-3.2-1B-geometry decode tok/s (fused scan, ctx 2048)."""
    import jax
    import jax.numpy as jnp
    from kjarni_tpu.generate.sampling import fast_argmax
    from kjarni_tpu.models import llama as kllama

    # int4 stores packed two-per-int8-byte ("w4"), so it runs on every
    # backend — including the axon tunnel that cannot device_put int4
    cfg, params = build_llama_1b(None, quantize)
    N = 64
    ck, cv = kllama.init_cache(cfg, 1, 2048, jnp.bfloat16)

    @jax.jit
    def decode_n(params, ck, cv, tok0, pos0):
        # fill-proportional decode, as DecoderLM.generate does: the layer
        # scan restacks whatever cache it carries every step, so carry the
        # 512-slot working slice (fill stays <512 here) and write it back
        # once (BASELINE.md round-3 long-context memo)
        full_ck, full_cv = ck, cv
        ck = jax.lax.slice_in_dim(ck, 0, 512, axis=3)
        cv = jax.lax.slice_in_dim(cv, 0, 512, axis=3)

        def body(carry, i):
            tok, ck, cv = carry
            logits, ck, cv = kllama.forward(params, cfg, tok[None, None],
                                            ck, cv, pos0 + i)
            return (fast_argmax(logits[0]), ck, cv), ()
        (tok, ck, cv), _ = jax.lax.scan(body, (tok0, ck, cv), jnp.arange(N))
        ck = jax.lax.dynamic_update_slice(full_ck, ck, (0, 0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(full_cv, cv, (0, 0, 0, 0, 0))
        return tok, ck, cv

    tok, ck, cv = decode_n(params, ck, cv, jnp.int32(1), jnp.int32(128))
    int(tok)
    lat = _roundtrip_latency()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tok, ck, cv = decode_n(params, ck, cv, jnp.int32(1), jnp.int32(256))
        int(tok)
        times.append(time.perf_counter() - t0)
    tps = N / (min(times) - lat)
    name = (f"llama_1b_decode_{quantize}_tok_per_sec" if quantize
            else "llama_1b_decode_bf16_tok_per_sec")
    print(json.dumps({"metric": name, "value": round(tps, 1),
                      "unit": "tok/s", "vs_baseline": round(tps / 100.0, 3)}))


def _whisper_small_params():
    """Random-init whisper-small geometry (768/12/12, vocab 51865)."""
    import jax.numpy as jnp
    from kjarni_tpu.models import whisper as kwhisper

    cfg = kwhisper.WhisperConfig(
        vocab_size=51865, d_model=768, encoder_layers=12, decoder_layers=12,
        encoder_heads=12, decoder_heads=12, encoder_ffn_dim=3072,
        decoder_ffn_dim=3072, num_mel_bins=80, max_source_positions=1500,
        max_target_positions=448)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def w(*s, scale=0.02):
        return jnp.asarray(rng.standard_normal(s) * scale, dt)

    H = 768

    def lin(L, i, o, bias=True):
        p = {"w": w(L, i, o)}
        if bias:
            p["b"] = w(L, o)
        return p

    def norm(L):
        return {"weight": jnp.ones((L, H), dt), "bias": jnp.zeros((L, H), dt)}

    enc = {"q": lin(12, H, H), "k": {"w": w(12, H, H)}, "v": lin(12, H, H),
           "o": lin(12, H, H), "attn_norm": norm(12), "fc1": lin(12, H, 3072),
           "fc2": lin(12, 3072, H), "ffn_norm": norm(12)}
    dec = {"q": lin(12, H, H), "k": {"w": w(12, H, H)}, "v": lin(12, H, H),
           "o": lin(12, H, H), "self_norm": norm(12),
           "cross_q": lin(12, H, H), "cross_k": {"w": w(12, H, H)},
           "cross_v": lin(12, H, H), "cross_o": lin(12, H, H),
           "cross_norm": norm(12), "fc1": lin(12, H, 3072),
           "fc2": lin(12, 3072, H), "ffn_norm": norm(12)}
    embed = w(51865, H)
    params = {"conv1_w": w(H, 80, 3), "conv1_b": w(H), "conv2_w": w(H, H, 3),
              "conv2_b": w(H), "enc_pos": w(1500, H), "enc": enc,
              "enc_final_norm": {"weight": jnp.ones(H, dt),
                                 "bias": jnp.zeros(H, dt)},
              "embed": embed, "dec_pos": w(448, H), "dec": dec,
              "dec_final_norm": {"weight": jnp.ones(H, dt),
                                 "bias": jnp.zeros(H, dt)},
              "lm_head": embed.T}
    return cfg, params


def bench_whisper():
    """Whisper-small 30s-chunk transcription speed (xRT)."""
    import jax
    import jax.numpy as jnp
    from kjarni_tpu.audio.mel import MelConfig, log_mel_spectrogram
    from kjarni_tpu.models import whisper as kwhisper

    cfg, params = _whisper_small_params()
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    mel_cfg = MelConfig.whisper()
    audio = jnp.asarray(rng.standard_normal(16000 * 30) * 0.1, jnp.float32)
    MAX_STEPS = 100

    @jax.jit
    def full_chunk(params, audio):
        mel = log_mel_spectrogram(audio, mel_cfg).astype(dt)
        enc_out = kwhisper.encode(params, cfg, mel[None])
        ck, cv = kwhisper.precompute_cross_kv(params, cfg, enc_out)
        sk = jnp.zeros((12, 1, 12, 128, 64), dt)
        sv = jnp.zeros((12, 1, 12, 128, 64), dt)
        enc_mask = jnp.ones((1, 1500), jnp.int32)
        prompt = jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32)
        logits, sk, sv = kwhisper.decode_step(params, cfg, prompt, sk, sv,
                                              ck, cv, enc_mask, 0)
        tok = jnp.argmax(logits[0, -1]).astype(jnp.int32)

        def body(carry, i):
            tok, sk, sv = carry
            lg, sk, sv = kwhisper.decode_step(params, cfg, tok[None, None],
                                              sk, sv, ck, cv, enc_mask, 4 + i)
            return (jnp.argmax(lg[0, -1]).astype(jnp.int32), sk, sv), tok
        (tok, sk, sv), toks = jax.lax.scan(body, (tok, sk, sv),
                                           jnp.arange(MAX_STEPS))
        return jnp.sum(toks)

    float(full_chunk(params, audio))
    lat = _roundtrip_latency()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(full_chunk(params, audio))
        times.append(time.perf_counter() - t0)
    xrt = 30.0 / (min(times) - lat)
    print(json.dumps({"metric": "whisper_small_x_realtime",
                      "value": round(xrt, 1), "unit": "x_realtime",
                      "vs_baseline": round(xrt / 30.0, 3)}))


def bench_whisper_long():
    """Long-audio transcription through the REAL multi-chunk product path
    (WhisperModel.transcribe: chunk -> mel+encode -> fused decode -> stitch),
    5.5 minutes of synthetic audio (VERDICT r2 item 8 — guards the
    single-chunk xRT number against regression in the chunk/stitch loop)."""
    import io
    import time as _time

    from kjarni_tpu.models.whisper_transcriber import (WhisperModel,
                                                       WhisperTranscriberConfig)
    from kjarni_tpu.tokenizer import KjarniTokenizer

    cfg, params = _whisper_small_params()
    # tiny word tokenizer: random-weight argmax ids outside its vocab decode
    # to nothing, which is fine — the bench measures the pipeline, not ASR
    import tempfile
    from pathlib import Path
    from tokenizers import Tokenizer, models, pre_tokenizers
    vocab = {w: i for i, w in enumerate(
        ["[UNK]"] + [f"w{i}" for i in range(64)])}
    tk = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "tokenizer.json"
        tk.save(str(p))
        tokenizer = KjarniTokenizer.from_file(p)
    wm = WhisperModel.from_params(cfg, params, tokenizer)
    # random weights tend to argmax EOT immediately (identical near-silent
    # chunks), which would skip the decode loop entirely; suppress EOT so
    # every chunk decodes the full token budget — worst-case speech density
    from kjarni_tpu.models.whisper_transcriber import EOT_TOKEN
    wm._allow_no_ts = wm._allow_no_ts.at[EOT_TOKEN].set(False)

    secs = 330.0                                     # 5.5 min -> 11 chunks
    rng = np.random.default_rng(1)
    t = np.arange(int(16000 * secs)) / 16000.0
    audio = (0.1 * np.sin(2 * np.pi * 220.0 * t)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    n_chunks = len(wm.chunk_audio(audio))
    assert n_chunks == 11, n_chunks
    # ~64 tokens per 30s chunk models real speech density; random weights
    # rarely emit EOT, so this also bounds the run
    tcfg = WhisperTranscriberConfig(max_tokens_per_chunk=64)

    # warm the BATCHED wave variants (8-lane full wave + padded tail wave):
    # chunks now decode batched (whisper_transcriber._transcribe_batched;
    # per-lane equality vs serial pinned by test_whisper TestBatchedChunks),
    # so the warmup must run the same full multi-chunk pipeline
    wm.transcribe(audio, tcfg)
    t0 = _time.perf_counter()
    text, segments = wm.transcribe(audio, tcfg)
    elapsed = _time.perf_counter() - t0
    # random weights may emit only special tokens (empty text/segments) —
    # the bench times the real chunk/stitch pipeline, not ASR quality
    assert isinstance(text, str)
    xrt = secs / elapsed
    print(json.dumps({"metric": "whisper_small_long_audio_x_realtime",
                      "value": round(xrt, 1), "unit": "x_realtime",
                      "vs_baseline": round(xrt / 30.0, 3),
                      "note": f"{n_chunks} chunks, {len(segments)} segments, "
                              f"{elapsed:.1f}s wall"}))


def bench_summarize():
    """DistilBART-CNN-12-6 geometry: 512-token article -> beam-4 summary,
    fused on-device beam loop (models/seq2seq_lm.py + generate/beam_fused.py)."""
    import jax
    import jax.numpy as jnp
    from kjarni_tpu.models import bart as kbart
    from kjarni_tpu.generate.beam import BeamSearchConfig
    from kjarni_tpu.generate.beam_fused import build_fused_beam

    cfg = kbart.BartConfig(
        vocab_size=50264, d_model=1024, encoder_layers=12, decoder_layers=6,
        encoder_heads=16, decoder_heads=16, encoder_ffn_dim=4096,
        decoder_ffn_dim=4096, max_position_embeddings=1024)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    H = 1024

    def w(*s, scale=0.02):
        return jnp.asarray(rng.standard_normal(s) * scale, dt)

    def lin(L, i, o):
        return {"w": w(L, i, o), "b": w(L, o)}

    def norm(L):
        return {"weight": jnp.ones((L, H), dt), "bias": jnp.zeros((L, H), dt)}

    enc = {"q": lin(12, H, H), "k": lin(12, H, H), "v": lin(12, H, H),
           "o": lin(12, H, H), "attn_norm": norm(12), "fc1": lin(12, H, 4096),
           "fc2": lin(12, 4096, H), "ffn_norm": norm(12)}
    dec = {"q": lin(6, H, H), "k": lin(6, H, H), "v": lin(6, H, H),
           "o": lin(6, H, H), "self_norm": norm(6), "cross_q": lin(6, H, H),
           "cross_k": lin(6, H, H), "cross_v": lin(6, H, H),
           "cross_o": lin(6, H, H), "cross_norm": norm(6),
           "fc1": lin(6, H, 4096), "fc2": lin(6, 4096, H), "ffn_norm": norm(6)}
    shared = w(50264, H)
    params = {"shared": shared, "enc_pos": w(1026, H), "dec_pos": w(1026, H),
              "enc_emb_norm": {"weight": jnp.ones(H, dt),
                               "bias": jnp.zeros(H, dt)},
              "dec_emb_norm": {"weight": jnp.ones(H, dt),
                               "bias": jnp.zeros(H, dt)},
              "enc": enc, "dec": dec, "lm_head": shared.T,
              "final_logits_bias": jnp.zeros(50264, dt)}
    bs = BeamSearchConfig(num_beams=4, max_length=142, min_length=56,
                          length_penalty=2.0, early_stopping=True,
                          no_repeat_ngram_size=3, eos_token_id=2,
                          decoder_start_token_id=2, forced_bos_token_id=0,
                          forced_eos_token_id=2)
    enc_ids = jnp.asarray(rng.integers(10, 50000, (1, 512)), jnp.int32)
    enc_mask = jnp.ones((1, 512), jnp.int32)
    k, cache_len = 4, 256

    @jax.jit
    def run(params, enc_ids, enc_mask):
        enc_out = kbart.encode(params, cfg, enc_ids, enc_mask)
        ck, cv = kbart.precompute_cross_kv(params, cfg, enc_out)
        ck = jnp.repeat(ck, k, axis=1)
        cv = jnp.repeat(cv, k, axis=1)
        mask_t = jnp.repeat(enc_mask, k, axis=0)
        sk, sv = kbart.init_self_cache(cfg, k, cache_len, dt)

        def decode_fn(cur, sk, sv, pos, parents):
            sk = jnp.take(sk, parents, axis=1)
            sv = jnp.take(sv, parents, axis=1)
            logits, sk, sv = kbart.decode_step(params, cfg, cur, sk, sv, ck,
                                               cv, mask_t, pos)
            return logits[:, -1, :], sk, sv

        runner = build_fused_beam(decode_fn, bs, cfg.vocab_size, cache_len - 1)
        return runner(sk, sv)

    out, n = run(params, enc_ids, enc_mask)
    int(n)
    lat = _roundtrip_latency()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, n = run(params, enc_ids, enc_mask)
        int(n)
        times.append(time.perf_counter() - t0)
    per_sec = 1.0 / (min(times) - lat)
    print(json.dumps({"metric": "distilbart_cnn_summaries_per_sec",
                      "value": round(per_sec, 2), "unit": "summaries/s/chip",
                      "vs_baseline": round(per_sec, 3)}))


_METRIC_NAMES = {
    "embed": "minilm_l6_v2_embed_sentences_per_sec",
    "decode": "llama_1b_decode_bf16_tok_per_sec",
    "decode-int8": "llama_1b_decode_int8_tok_per_sec",
    "decode-int4": "llama_1b_decode_int4_tok_per_sec",
    "whisper": "whisper_small_x_realtime",
    "whisper-long": "whisper_small_long_audio_x_realtime",
    "summarize": "distilbart_cnn_summaries_per_sec",
}


def _emit_skip(metric, reason):
    """One parseable line, exit 0 — the driver records a structured skip
    instead of an unparseable traceback (VERDICT r3 item 2)."""
    print(json.dumps({"metric": _METRIC_NAMES.get(metric, metric), "value": 0,
                      "unit": "skipped", "vs_baseline": 0.0,
                      "skipped": True, "reason": reason}))


def _backend_ready(timeout=None):
    """Probe jax backend init in a SUBPROCESS with a bounded timeout.

    On this image a dead axon tunnel makes the first in-process backend init
    (any jax.devices()) hang ~25 minutes before raising (measured, round 3) —
    a try/except in this process cannot bound that. The child inherits the
    env untouched (no PYTHONPATH: it breaks axon plugin registration)."""
    import os
    import subprocess
    import sys

    if timeout is None:
        timeout = int(os.environ.get("KJARNI_BENCH_PROBE_TIMEOUT", "180"))
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True, ""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True, ""
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        p = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, f"axon tunnel down: backend init hung >{timeout}s"
    if p.returncode != 0:
        lines = (p.stderr or "").strip().splitlines()
        tail = lines[-1][:200] if lines else f"rc={p.returncode}"
        return False, f"axon tunnel down: backend init failed: {tail}"
    return True, ""


def _is_backend_error(e):
    name = type(e).__name__
    if name in ("JaxRuntimeError", "XlaRuntimeError"):
        return True
    if isinstance(e, (OSError, ConnectionError, TimeoutError)):
        return True
    s = str(e)
    return any(sig in s for sig in ("axon", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                                    "tunnel", "backend setup"))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="embed",
                    choices=["embed", "decode", "decode-int8", "decode-int4",
                             "whisper", "whisper-long", "summarize"])
    args = ap.parse_args()

    ok, reason = _backend_ready()
    if not ok:
        time.sleep(60)                       # one delayed retry
        ok, reason = _backend_ready()
    if not ok:
        return _emit_skip(args.metric, reason)

    try:
        if args.metric == "decode":
            return bench_decode(False)
        if args.metric == "decode-int8":
            return bench_decode("int8")
        if args.metric == "decode-int4":
            return bench_decode("int4")
        if args.metric == "whisper":
            return bench_whisper()
        if args.metric == "whisper-long":
            return bench_whisper_long()
        if args.metric == "summarize":
            return bench_summarize()
        return bench_embed()
    except Exception as e:  # tunnel died mid-run: structured skip, not rc=1
        if _is_backend_error(e):
            return _emit_skip(args.metric,
                              f"backend error mid-run: {type(e).__name__}: "
                              f"{str(e)[:200]}")
        raise


def bench_embed():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from kjarni_tpu.models import bert as kbert
    from kjarni_tpu.ops.pooling import mean_pool

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = ml_dtypes.bfloat16 if on_tpu else np.float32

    cfg, params = build_minilm(dtype)
    params = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None,
        params, is_leaf=lambda x: x is None or isinstance(x, np.ndarray))

    BATCH, SEQ = 256, 64
    ITERS = 50 if on_tpu else 3
    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(1000, 20000, (BATCH, SEQ)), dtype=jnp.int32)
    mask = jnp.ones((BATCH, SEQ), dtype=jnp.int32)
    tt = jnp.zeros((BATCH, SEQ), dtype=jnp.int32)

    @jax.jit
    def bench_loop(params, ids0):
        def body(ids, _):
            hidden = kbert.encode_auto(params, cfg, ids, mask, tt)
            pooled = mean_pool(hidden, mask)
            # zero-valued but data-dependent perturbation chains the iterations
            delta = (jnp.abs(pooled[:, :1]) * 0).astype(jnp.int32)
            return ids + delta, jnp.sum(pooled.astype(jnp.float32))
        ids, sums = jax.lax.scan(body, ids0, None, length=ITERS)
        return jnp.sum(sums)

    float(bench_loop(params, ids0))  # warmup/compile

    # empty-roundtrip latency to subtract
    f0 = jax.jit(lambda x: jnp.sum(x))
    float(f0(ids0))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f0(ids0))
    latency = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_loop(params, ids0))
        times.append(time.perf_counter() - t0)
    net = max(min(times) - latency, 1e-9)

    sentences_per_sec = BATCH * ITERS / net
    print(json.dumps({
        "metric": "minilm_l6_v2_embed_sentences_per_sec",
        "value": round(sentences_per_sec, 1),
        "unit": "sentences/s/chip",
        "vs_baseline": round(sentences_per_sec / 10_000.0, 3),
    }))


if __name__ == "__main__":
    main()
