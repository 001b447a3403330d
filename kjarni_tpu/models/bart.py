"""BART / DistilBART encoder-decoder, TPU-native.

Rebuild of kjarni-models/src/models/bart (config.rs, model.rs:361,499 — learned
positions with the +2 offset, post-norm blocks) and the CPU encoder-decoder
stack (kjarni-transformers/src/cpu/encoder_decoder/cpu_{encoder,decoder}.rs).

Same decode discipline as t5.py: fixed self-KV cache + cross-KV precomputed
once from the encoder output.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import get_activation
from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF, padding_bias
from ..ops.norms import layer_norm
from ..weights.safetensors_loader import ModelWeights

POSITION_OFFSET = 2  # BartLearnedPositionalEmbedding offset (model.rs:361 extra_pos)


@dataclasses.dataclass(frozen=True)
class BartConfig:
    vocab_size: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    encoder_heads: int
    decoder_heads: int
    encoder_ffn_dim: int
    decoder_ffn_dim: int
    max_position_embeddings: int
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5
    scale_embedding: bool = False
    decoder_start_token_id: int = 2
    forced_bos_token_id: int | None = 0
    forced_eos_token_id: int | None = 2
    eos_token_id: int = 2
    bos_token_id: int = 0
    pad_token_id: int = 1
    arch: str = "bart"

    @staticmethod
    def from_hf(cfg: dict) -> "BartConfig":
        return BartConfig(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            encoder_layers=cfg["encoder_layers"],
            decoder_layers=cfg["decoder_layers"],
            encoder_heads=cfg["encoder_attention_heads"],
            decoder_heads=cfg["decoder_attention_heads"],
            encoder_ffn_dim=cfg["encoder_ffn_dim"],
            decoder_ffn_dim=cfg["decoder_ffn_dim"],
            max_position_embeddings=cfg["max_position_embeddings"],
            activation=cfg.get("activation_function", "gelu"),
            scale_embedding=cfg.get("scale_embedding", False),
            decoder_start_token_id=cfg.get("decoder_start_token_id", 2),
            forced_bos_token_id=cfg.get("forced_bos_token_id"),
            forced_eos_token_id=cfg.get("forced_eos_token_id"),
            eos_token_id=cfg.get("eos_token_id", 2),
            bos_token_id=cfg.get("bos_token_id", 0),
            pad_token_id=cfg.get("pad_token_id", 1),
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


def load_params(ws: ModelWeights, cfg: BartConfig, dtype=np.float32) -> dict:
    pre = "model." if "model.shared.weight" in ws else ""
    e = pre + "encoder.layers.{}."
    d = pre + "decoder.layers.{}."
    Le, Ld = cfg.encoder_layers, cfg.decoder_layers
    shared = np.asarray(ws.get(pre + "shared.weight"), dtype=np.float32).astype(dtype)

    enc = {
        "q": _stack_lin(ws, e + "self_attn.q_proj", Le, dtype),
        "k": _stack_lin(ws, e + "self_attn.k_proj", Le, dtype),
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

    final_bias = (np.asarray(ws.get("final_logits_bias"), dtype=np.float32)
                  .reshape(-1).astype(dtype)
                  if "final_logits_bias" in ws else np.zeros(cfg.vocab_size, dtype))
    return {
        "shared": shared,
        "enc_pos": np.asarray(ws.get(pre + "encoder.embed_positions.weight"),
                              dtype=np.float32).astype(dtype),
        "dec_pos": np.asarray(ws.get(pre + "decoder.embed_positions.weight"),
                              dtype=np.float32).astype(dtype),
        "enc_emb_norm": {
            "weight": np.asarray(ws.get(pre + "encoder.layernorm_embedding.weight"),
                                 dtype=np.float32).astype(dtype),
            "bias": np.asarray(ws.get(pre + "encoder.layernorm_embedding.bias"),
                               dtype=np.float32).astype(dtype)},
        "dec_emb_norm": {
            "weight": np.asarray(ws.get(pre + "decoder.layernorm_embedding.weight"),
                                 dtype=np.float32).astype(dtype),
            "bias": np.asarray(ws.get(pre + "decoder.layernorm_embedding.bias"),
                               dtype=np.float32).astype(dtype)},
        "enc": enc,
        "dec": dec,
        "lm_head": shared.T,
        "final_logits_bias": final_bias,
    }


def _heads(x, B, S, H, D):
    return x.reshape(B, S, H, D).transpose(0, 2, 1, 3)


def _apply(x, p):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def encode(params: dict, cfg: BartConfig, ids: jnp.ndarray,
           mask: jnp.ndarray) -> jnp.ndarray:
    B, S = ids.shape
    H, D = cfg.encoder_heads, cfg.head_dim
    scale = (cfg.d_model ** 0.5) if cfg.scale_embedding else 1.0
    x = jnp.take(params["shared"], ids, axis=0) * scale
    x = x + params["enc_pos"][POSITION_OFFSET:POSITION_OFFSET + S][None]
    x = layer_norm(x, params["enc_emb_norm"]["weight"],
                   params["enc_emb_norm"]["bias"], cfg.layer_norm_eps)
    bias = padding_bias(mask)
    act = get_activation(cfg.activation)

    def layer_fn(h, lp):
        q = _heads(_apply(h, lp["q"]), B, S, H, D)
        k = _heads(_apply(h, lp["k"]), B, S, H, D)
        v = _heads(_apply(h, lp["v"]), B, S, H, D)
        ctx = merge_heads(attention(q, k, v, bias))
        h = layer_norm(h + _apply(ctx, lp["o"]), lp["attn_norm"]["weight"],
                       lp["attn_norm"]["bias"], cfg.layer_norm_eps)
        ffn = _apply(act(_apply(h, lp["fc1"])), lp["fc2"])
        return layer_norm(h + ffn, lp["ffn_norm"]["weight"], lp["ffn_norm"]["bias"],
                          cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(layer_fn, x, params["enc"])
    return x


def precompute_cross_kv(params: dict, cfg: BartConfig, enc_hidden: jnp.ndarray):
    B, S, _ = enc_hidden.shape
    H, D = cfg.decoder_heads, cfg.head_dim

    def one(lp_k, lp_v):
        k = _heads(_apply(enc_hidden, lp_k), B, S, H, D)
        v = _heads(_apply(enc_hidden, lp_v), B, S, H, D)
        return k, v

    ks, vs = jax.vmap(one)(params["dec"]["cross_k"], params["dec"]["cross_v"])
    return ks, vs


def init_self_cache(cfg: BartConfig, batch: int, max_len: int, dtype=jnp.float32):
    shape = (cfg.decoder_layers, batch, cfg.decoder_heads, max_len, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step(params: dict, cfg: BartConfig, ids: jnp.ndarray,
                self_k: jnp.ndarray, self_v: jnp.ndarray,
                cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                enc_mask: jnp.ndarray, pos_start):
    """Decoder forward for S tokens at pos_start+arange(S) -> [B, S, V]."""
    B, S = ids.shape
    T = self_k.shape[3]
    H, D = cfg.decoder_heads, cfg.head_dim
    scale = (cfg.d_model ** 0.5) if cfg.scale_embedding else 1.0
    positions = pos_start + jnp.arange(S)
    x = jnp.take(params["shared"], ids, axis=0) * scale
    x = x + jnp.take(params["dec_pos"], positions + POSITION_OFFSET, axis=0)[None]
    x = layer_norm(x, params["dec_emb_norm"]["weight"],
                   params["dec_emb_norm"]["bias"], cfg.layer_norm_eps)

    qi = positions[:, None]
    kj = jnp.arange(T)[None, :]
    self_bias = jnp.where(kj <= qi, 0.0, NEG_INF)[None, None]
    cross_bias = padding_bias(enc_mask)
    act = get_activation(cfg.activation)

    def layer_fn(h, xs):
        lp, kc, vc, ck, cv = xs
        q = _heads(_apply(h, lp["q"]), B, S, H, D)
        k = _heads(_apply(h, lp["k"]), B, S, H, D)
        v = _heads(_apply(h, lp["v"]), B, S, H, D)
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, pos_start, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, pos_start, 0))
        ctx = merge_heads(attention(q, kc, vc, self_bias))
        h = layer_norm(h + _apply(ctx, lp["o"]), lp["self_norm"]["weight"],
                       lp["self_norm"]["bias"], cfg.layer_norm_eps)
        cq = _heads(_apply(h, lp["cross_q"]), B, S, H, D)
        cctx = merge_heads(attention(cq, ck, cv, cross_bias))
        h = layer_norm(h + _apply(cctx, lp["cross_o"]), lp["cross_norm"]["weight"],
                       lp["cross_norm"]["bias"], cfg.layer_norm_eps)
        ffn = _apply(act(_apply(h, lp["fc1"])), lp["fc2"])
        h = layer_norm(h + ffn, lp["ffn_norm"]["weight"], lp["ffn_norm"]["bias"],
                       cfg.layer_norm_eps)
        return h, (kc, vc)

    x, (self_k, self_v) = jax.lax.scan(
        layer_fn, x, (params["dec"], self_k, self_v, cross_k, cross_v))
    logits = x @ params["lm_head"] + params["final_logits_bias"]
    return logits, self_k, self_v
