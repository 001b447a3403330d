"""Whisper encoder-decoder for speech-to-text, TPU-native.

Rebuild of kjarni-models/src/models/whisper/model.rs:36 (CpuEncoderOps :250,
CpuEncoderDecoderOps :338, EncoderDecoderLanguageModel :480) and the conv
frontend (kjarni-transformers/src/audio/mel.rs:265 AudioConvFrontend).

Pre-norm transformer on both sides; the conv frontend (conv1 s=1 + conv2 s=2,
both GELU) runs as lax.conv_general_dilated so mel->hidden stays on-device.
Whisper attention quirk honored for parity: k_proj has NO bias.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import gelu
from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF
from ..ops.norms import layer_norm
from ..weights.safetensors_loader import ModelWeights


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    encoder_heads: int
    decoder_heads: int
    encoder_ffn_dim: int
    decoder_ffn_dim: int
    num_mel_bins: int
    max_source_positions: int   # 1500
    max_target_positions: int   # 448
    eos_token_id: int = 50257
    decoder_start_token_id: int = 50258
    pad_token_id: int = 50257
    arch: str = "whisper"

    @staticmethod
    def from_hf(cfg: dict) -> "WhisperConfig":
        return WhisperConfig(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            encoder_layers=cfg["encoder_layers"],
            decoder_layers=cfg["decoder_layers"],
            encoder_heads=cfg["encoder_attention_heads"],
            decoder_heads=cfg["decoder_attention_heads"],
            encoder_ffn_dim=cfg["encoder_ffn_dim"],
            decoder_ffn_dim=cfg["decoder_ffn_dim"],
            num_mel_bins=cfg["num_mel_bins"],
            max_source_positions=cfg["max_source_positions"],
            max_target_positions=cfg["max_target_positions"],
            eos_token_id=cfg.get("eos_token_id", 50257),
            decoder_start_token_id=cfg.get("decoder_start_token_id", 50258),
            pad_token_id=cfg.get("pad_token_id", 50257),
        )

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_heads


def _lin(ws, name, dtype):
    p = {"w": np.asarray(ws.get(f"{name}.weight"), dtype=np.float32).T.astype(dtype)}
    if f"{name}.bias" in ws:
        p["b"] = np.asarray(ws.get(f"{name}.bias"), dtype=np.float32).astype(dtype)
    return p


def _stack_lin(ws, fmt, L, dtype):
    ps = [_lin(ws, fmt.format(i), dtype) for i in range(L)]
    out = {"w": np.stack([p["w"] for p in ps])}
    if "b" in ps[0]:
        out["b"] = np.stack([p["b"] for p in ps])
    return out


def _stack_norm(ws, fmt, L, dtype):
    return {
        "weight": np.stack([np.asarray(ws.get(fmt.format(i) + ".weight"),
                                       dtype=np.float32) for i in range(L)]).astype(dtype),
        "bias": np.stack([np.asarray(ws.get(fmt.format(i) + ".bias"),
                                     dtype=np.float32) for i in range(L)]).astype(dtype),
    }


def load_params(ws: ModelWeights, cfg: WhisperConfig, dtype=np.float32) -> dict:
    pre = "model." if "model.encoder.conv1.weight" in ws else ""
    e = pre + "encoder.layers.{}."
    d = pre + "decoder.layers.{}."
    Le, Ld = cfg.encoder_layers, cfg.decoder_layers

    def g(name):
        return np.asarray(ws.get(pre + name), dtype=np.float32).astype(dtype)

    enc = {
        "q": _stack_lin(ws, e + "self_attn.q_proj", Le, dtype),
        "k": _stack_lin(ws, e + "self_attn.k_proj", Le, dtype),  # no bias
        "v": _stack_lin(ws, e + "self_attn.v_proj", Le, dtype),
        "o": _stack_lin(ws, e + "self_attn.out_proj", Le, dtype),
        "attn_norm": _stack_norm(ws, e + "self_attn_layer_norm", Le, dtype),
        "fc1": _stack_lin(ws, e + "fc1", Le, dtype),
        "fc2": _stack_lin(ws, e + "fc2", Le, dtype),
        "ffn_norm": _stack_norm(ws, e + "final_layer_norm", Le, dtype),
    }
    dec = {
        "q": _stack_lin(ws, d + "self_attn.q_proj", Ld, dtype),
        "k": _stack_lin(ws, d + "self_attn.k_proj", Ld, dtype),
        "v": _stack_lin(ws, d + "self_attn.v_proj", Ld, dtype),
        "o": _stack_lin(ws, d + "self_attn.out_proj", Ld, dtype),
        "self_norm": _stack_norm(ws, d + "self_attn_layer_norm", Ld, dtype),
        "cross_q": _stack_lin(ws, d + "encoder_attn.q_proj", Ld, dtype),
        "cross_k": _stack_lin(ws, d + "encoder_attn.k_proj", Ld, dtype),
        "cross_v": _stack_lin(ws, d + "encoder_attn.v_proj", Ld, dtype),
        "cross_o": _stack_lin(ws, d + "encoder_attn.out_proj", Ld, dtype),
        "cross_norm": _stack_norm(ws, d + "encoder_attn_layer_norm", Ld, dtype),
        "fc1": _stack_lin(ws, d + "fc1", Ld, dtype),
        "fc2": _stack_lin(ws, d + "fc2", Ld, dtype),
        "ffn_norm": _stack_norm(ws, d + "final_layer_norm", Ld, dtype),
    }
    embed = g("decoder.embed_tokens.weight")
    return {
        "conv1_w": g("encoder.conv1.weight"),  # [out, in, k]
        "conv1_b": g("encoder.conv1.bias"),
        "conv2_w": g("encoder.conv2.weight"),
        "conv2_b": g("encoder.conv2.bias"),
        "enc_pos": g("encoder.embed_positions.weight"),  # sinusoidal, stored
        "enc": enc,
        "enc_final_norm": {"weight": g("encoder.layer_norm.weight"),
                           "bias": g("encoder.layer_norm.bias")},
        "embed": embed,
        "dec_pos": g("decoder.embed_positions.weight"),
        "dec": dec,
        "dec_final_norm": {"weight": g("decoder.layer_norm.weight"),
                           "bias": g("decoder.layer_norm.bias")},
        "lm_head": embed.T,
    }


def _heads(x, B, S, H, D):
    return x.reshape(B, S, H, D).transpose(0, 2, 1, 3)


def _apply(x, p):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            stride: int) -> jnp.ndarray:
    """[B, C_in, T] conv with kernel [C_out, C_in, K], padding=1 (mel.rs:333)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out + b[None, :, None]


def encode(params: dict, cfg: WhisperConfig, mel: jnp.ndarray,
           use_flash: bool = False) -> jnp.ndarray:
    """mel [B, n_mels, 3000] -> hidden [B, 1500, d_model].

    Conv frontend (conv1 s=1 + GELU, conv2 s=2 + GELU, + positions) then the
    pre-norm encoder stack (cf. AudioConvFrontend::forward mel.rs:303 and
    whisper/model.rs:250). `use_flash` (static) routes through the Pallas flash
    kernel — measured SLOWER here (13.8ms vs 4.1ms on v5e: at B=1, 12 heads,
    non-causal 1500, XLA's batched GEMMs beat the kernel's sequential grid), so
    it stays off by default; the flag exists for larger-batch serving shapes.
    """
    B = mel.shape[0]
    H, D = cfg.encoder_heads, cfg.head_dim
    x = gelu(_conv1d(mel, params["conv1_w"], params["conv1_b"], 1))
    x = gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2))
    x = x.transpose(0, 2, 1)  # [B, T, d_model]
    S = x.shape[1]
    x = x + params["enc_pos"][:S][None]

    def layer_fn(h, lp):
        hn = layer_norm(h, lp["attn_norm"]["weight"], lp["attn_norm"]["bias"])
        q = _heads(_apply(hn, lp["q"]), B, S, H, D)
        k = _heads(_apply(hn, lp["k"]), B, S, H, D)
        v = _heads(_apply(hn, lp["v"]), B, S, H, D)
        if use_flash:
            from ..ops.pallas.flash_attention import flash_attention
            ctx = merge_heads(flash_attention(q, k, v))
        else:
            ctx = merge_heads(attention(q, k, v))
        h = h + _apply(ctx, lp["o"])
        hn = layer_norm(h, lp["ffn_norm"]["weight"], lp["ffn_norm"]["bias"])
        ffn = _apply(gelu(_apply(hn, lp["fc1"])), lp["fc2"])
        return h + ffn, None

    x, _ = jax.lax.scan(layer_fn, x, params["enc"])
    return layer_norm(x, params["enc_final_norm"]["weight"],
                      params["enc_final_norm"]["bias"])


def precompute_cross_kv(params: dict, cfg: WhisperConfig, enc_hidden: jnp.ndarray):
    """Cross-attention K/V once per chunk (cf. transcriber.rs:166)."""
    B, S, _ = enc_hidden.shape
    H, D = cfg.decoder_heads, cfg.head_dim

    def one(lp_k, lp_v):
        k = _heads(_apply(enc_hidden, lp_k), B, S, H, D)
        v = _heads(_apply(enc_hidden, lp_v), B, S, H, D)
        return k, v

    return jax.vmap(one)(params["dec"]["cross_k"], params["dec"]["cross_v"])


def init_self_cache(cfg: WhisperConfig, batch: int, max_len: int,
                    dtype=jnp.float32):
    shape = (cfg.decoder_layers, batch, cfg.decoder_heads, max_len, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step(params: dict, cfg: WhisperConfig, ids: jnp.ndarray,
                self_k: jnp.ndarray, self_v: jnp.ndarray,
                cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                enc_mask: jnp.ndarray, pos_start):
    """Pre-norm decoder for S tokens at pos_start+arange(S) -> [B, S, V]."""
    B, S = ids.shape
    T = self_k.shape[3]
    H, D = cfg.decoder_heads, cfg.head_dim
    positions = pos_start + jnp.arange(S)
    x = jnp.take(params["embed"], ids, axis=0) + \
        jnp.take(params["dec_pos"], positions, axis=0)[None]

    qi = positions[:, None]
    kj = jnp.arange(T)[None, :]
    self_bias = jnp.where(kj <= qi, 0.0, NEG_INF)[None, None]

    def layer_fn(h, xs):
        lp, kc, vc, ck, cv = xs
        hn = layer_norm(h, lp["self_norm"]["weight"], lp["self_norm"]["bias"])
        q = _heads(_apply(hn, lp["q"]), B, S, H, D)
        k = _heads(_apply(hn, lp["k"]), B, S, H, D)
        v = _heads(_apply(hn, lp["v"]), B, S, H, D)
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, pos_start, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, pos_start, 0))
        ctx = merge_heads(attention(q, kc, vc, self_bias))
        h = h + _apply(ctx, lp["o"])
        hn = layer_norm(h, lp["cross_norm"]["weight"], lp["cross_norm"]["bias"])
        cq = _heads(_apply(hn, lp["cross_q"]), B, S, H, D)
        cctx = merge_heads(attention(cq, ck, cv))
        h = h + _apply(cctx, lp["cross_o"])
        hn = layer_norm(h, lp["ffn_norm"]["weight"], lp["ffn_norm"]["bias"])
        ffn = _apply(gelu(_apply(hn, lp["fc1"])), lp["fc2"])
        return h + ffn, (kc, vc)

    x, (self_k, self_v) = jax.lax.scan(
        layer_fn, x, (params["dec"], self_k, self_v, cross_k, cross_v))
    x = layer_norm(x, params["dec_final_norm"]["weight"],
                   params["dec_final_norm"]["bias"])
    return x @ params["lm_head"], self_k, self_v
