"""T5 / FLAN-T5 encoder-decoder, TPU-native.

Rebuild of kjarni-models/src/models/t5 (config.rs, model.rs) and the CPU
encoder-decoder blocks (kjarni-transformers/src/cpu/encoder_decoder/*,
relative_position_bias.rs:5 T5RelativePositionBias).

T5 specifics honored for parity: RMS norms without bias, NO attention scaling
(scale=1), relative-position bucket bias shared from layer 0 of each stack,
gated-gelu FFN for FLAN, tied-head rescale by d_model^-0.5 when tied.

Decode design matches the llama path: fixed-shape self-KV cache written with
dynamic_update_slice + per-layer cross-KV precomputed ONCE from the encoder
output (cf. whisper/transcriber.rs:166 precompute_cross_attention_kv — the same
trick, applied to every seq2seq model here).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF, padding_bias
from ..ops.norms import rms_norm
from ..weights.safetensors_loader import ModelWeights


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_layers: int
    num_decoder_layers: int
    num_heads: int
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_act: bool = False
    activation: str = "relu"
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 0
    arch: str = "t5"

    @staticmethod
    def from_hf(cfg: dict) -> "T5Config":
        ff_proj = cfg.get("feed_forward_proj", "relu")
        gated = ff_proj.startswith("gated-")
        act = ff_proj.replace("gated-", "")
        if act == "gelu":
            act = "gelu_new"  # HF T5 "gelu" means gelu_new in the FF block
        return T5Config(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            d_kv=cfg["d_kv"],
            d_ff=cfg["d_ff"],
            num_layers=cfg["num_layers"],
            num_decoder_layers=cfg.get("num_decoder_layers", cfg["num_layers"]),
            num_heads=cfg["num_heads"],
            relative_attention_num_buckets=cfg.get("relative_attention_num_buckets", 32),
            relative_attention_max_distance=cfg.get("relative_attention_max_distance", 128),
            layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
            gated_act=gated,
            activation=act,
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            decoder_start_token_id=cfg.get("decoder_start_token_id", 0),
            eos_token_id=cfg.get("eos_token_id", 1),
            pad_token_id=cfg.get("pad_token_id", 0),
        )


def _t(ws, name, dtype):
    return np.asarray(ws.get(name), dtype=np.float32).T.astype(dtype)


def _g(ws, name, dtype):
    return np.asarray(ws.get(name), dtype=np.float32).astype(dtype)


def load_params(ws: ModelWeights, cfg: T5Config, dtype=np.float32) -> dict:
    """Map HF T5 checkpoint names into stacked pytrees (encoder + decoder)."""
    def stack_enc(fmt):
        return np.stack([_t(ws, fmt.format(i), dtype) for i in range(cfg.num_layers)])

    def stack_dec(fmt):
        return np.stack(
            [_t(ws, fmt.format(i), dtype) for i in range(cfg.num_decoder_layers)])

    def stack_enc_g(fmt):
        return np.stack([_g(ws, fmt.format(i), dtype) for i in range(cfg.num_layers)])

    def stack_dec_g(fmt):
        return np.stack(
            [_g(ws, fmt.format(i), dtype) for i in range(cfg.num_decoder_layers)])

    e = "encoder.block.{}.layer."
    d = "decoder.block.{}.layer."
    enc = {
        "q": stack_enc(e + "0.SelfAttention.q.weight"),
        "k": stack_enc(e + "0.SelfAttention.k.weight"),
        "v": stack_enc(e + "0.SelfAttention.v.weight"),
        "o": stack_enc(e + "0.SelfAttention.o.weight"),
        "attn_norm": stack_enc_g(e + "0.layer_norm.weight"),
        "ffn_norm": stack_enc_g(e + "1.layer_norm.weight"),
        "wo": stack_enc(e + "1.DenseReluDense.wo.weight"),
    }
    if cfg.gated_act:
        enc["wi0"] = stack_enc(e + "1.DenseReluDense.wi_0.weight")
        enc["wi1"] = stack_enc(e + "1.DenseReluDense.wi_1.weight")
    else:
        enc["wi"] = stack_enc(e + "1.DenseReluDense.wi.weight")

    dec = {
        "q": stack_dec(d + "0.SelfAttention.q.weight"),
        "k": stack_dec(d + "0.SelfAttention.k.weight"),
        "v": stack_dec(d + "0.SelfAttention.v.weight"),
        "o": stack_dec(d + "0.SelfAttention.o.weight"),
        "self_norm": stack_dec_g(d + "0.layer_norm.weight"),
        "cross_q": stack_dec(d + "1.EncDecAttention.q.weight"),
        "cross_k": stack_dec(d + "1.EncDecAttention.k.weight"),
        "cross_v": stack_dec(d + "1.EncDecAttention.v.weight"),
        "cross_o": stack_dec(d + "1.EncDecAttention.o.weight"),
        "cross_norm": stack_dec_g(d + "1.layer_norm.weight"),
        "ffn_norm": stack_dec_g(d + "2.layer_norm.weight"),
        "wo": stack_dec(d + "2.DenseReluDense.wo.weight"),
    }
    if cfg.gated_act:
        dec["wi0"] = stack_dec(d + "2.DenseReluDense.wi_0.weight")
        dec["wi1"] = stack_dec(d + "2.DenseReluDense.wi_1.weight")
    else:
        dec["wi"] = stack_dec(d + "2.DenseReluDense.wi.weight")

    shared = _g(ws, "shared.weight", dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in ws:
        lm_head = shared.T
    else:
        lm_head = _t(ws, "lm_head.weight", dtype)
    return {
        "shared": shared,
        "enc": enc,
        "dec": dec,
        "enc_rel_bias": _g(
            ws, "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            dtype),
        "dec_rel_bias": _g(
            ws, "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            dtype),
        "enc_final_norm": _g(ws, "encoder.final_layer_norm.weight", dtype),
        "dec_final_norm": _g(ws, "decoder.final_layer_norm.weight", dtype),
        "lm_head": lm_head,
    }


# ---------------------------------------------------------------------------
# Relative position bias (cf. relative_position_bias.rs:5,71)
# ---------------------------------------------------------------------------

def _bucket(relative_position: jnp.ndarray, bidirectional: bool,
            num_buckets: int, max_distance: int) -> jnp.ndarray:
    ret = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (relative_position > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(relative_position)
    else:
        n = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def position_bias(table: jnp.ndarray, q_positions: jnp.ndarray,
                  k_positions: jnp.ndarray, bidirectional: bool,
                  num_buckets: int, max_distance: int) -> jnp.ndarray:
    """[1, H, Sq, Sk] additive bias from the [num_buckets, H] embedding."""
    rel = k_positions[None, :] - q_positions[:, None]  # memory - query
    buckets = _bucket(rel, bidirectional, num_buckets, max_distance)
    bias = jnp.take(table, buckets, axis=0)  # [Sq, Sk, H]
    return bias.transpose(2, 0, 1)[None]


def _ffn(h, lp, cfg: T5Config):
    from ..ops.activations import get_activation
    act = get_activation(cfg.activation)
    if cfg.gated_act:
        return (act(h @ lp["wi0"]) * (h @ lp["wi1"])) @ lp["wo"]
    return act(h @ lp["wi"]) @ lp["wo"]


def _heads(x, B, S, H, D):
    return x.reshape(B, S, H, D).transpose(0, 2, 1, 3)


def encode(params: dict, cfg: T5Config, ids: jnp.ndarray,
           mask: jnp.ndarray) -> jnp.ndarray:
    """Encoder forward: [B, S] -> [B, S, d_model]."""
    B, S = ids.shape
    H, D = cfg.num_heads, cfg.d_kv
    x = jnp.take(params["shared"], ids, axis=0)
    pos = jnp.arange(S)
    bias = position_bias(params["enc_rel_bias"], pos, pos, True,
                         cfg.relative_attention_num_buckets,
                         cfg.relative_attention_max_distance)
    bias = bias + padding_bias(mask)

    def layer_fn(h, lp):
        hn = rms_norm(h, lp["attn_norm"], cfg.layer_norm_eps)
        q = _heads(hn @ lp["q"], B, S, H, D)
        k = _heads(hn @ lp["k"], B, S, H, D)
        v = _heads(hn @ lp["v"], B, S, H, D)
        ctx = merge_heads(attention(q, k, v, bias, scale=1.0))
        h = h + ctx @ lp["o"]
        hn = rms_norm(h, lp["ffn_norm"], cfg.layer_norm_eps)
        return h + _ffn(hn, lp, cfg), None

    x, _ = jax.lax.scan(layer_fn, x, params["enc"])
    return rms_norm(x, params["enc_final_norm"], cfg.layer_norm_eps)


def precompute_cross_kv(params: dict, cfg: T5Config,
                        enc_hidden: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer cross-attention K/V from encoder output: [L, B, H, S_enc, D]."""
    B, S, _ = enc_hidden.shape
    H, D = cfg.num_heads, cfg.d_kv

    def one(lp):
        k = _heads(enc_hidden @ lp["cross_k"], B, S, H, D)
        v = _heads(enc_hidden @ lp["cross_v"], B, S, H, D)
        return k, v

    ks, vs = jax.vmap(one)(params["dec"])  # maps over layer axis of the pytree
    return ks, vs


def init_self_cache(cfg: T5Config, batch: int, max_len: int, dtype=jnp.float32):
    shape = (cfg.num_decoder_layers, batch, cfg.num_heads, max_len, cfg.d_kv)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step(params: dict, cfg: T5Config, ids: jnp.ndarray,
                self_k: jnp.ndarray, self_v: jnp.ndarray,
                cross_k: jnp.ndarray, cross_v: jnp.ndarray,
                enc_mask: jnp.ndarray, pos_start) -> tuple:
    """Decoder forward for S new tokens at positions pos_start+arange(S).

    Returns (logits [B, S, V], self_k, self_v).
    """
    B, S = ids.shape
    T = self_k.shape[3]
    H, D = cfg.num_heads, cfg.d_kv
    x = jnp.take(params["shared"], ids, axis=0)

    q_pos = pos_start + jnp.arange(S)
    k_pos = jnp.arange(T)
    bias = position_bias(params["dec_rel_bias"], q_pos, k_pos, False,
                         cfg.relative_attention_num_buckets,
                         cfg.relative_attention_max_distance)
    causal = jnp.where(k_pos[None, :] <= q_pos[:, None], 0.0, NEG_INF)
    self_bias = bias + causal[None, None]
    cross_bias = padding_bias(enc_mask)

    def layer_fn(h, xs):
        lp, kc, vc, ck, cv = xs
        hn = rms_norm(h, lp["self_norm"], cfg.layer_norm_eps)
        q = _heads(hn @ lp["q"], B, S, H, D)
        k = _heads(hn @ lp["k"], B, S, H, D)
        v = _heads(hn @ lp["v"], B, S, H, D)
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, pos_start, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, pos_start, 0))
        ctx = merge_heads(attention(q, kc, vc, self_bias, scale=1.0))
        h = h + ctx @ lp["o"]
        # cross attention over the precomputed encoder K/V
        hn = rms_norm(h, lp["cross_norm"], cfg.layer_norm_eps)
        cq = _heads(hn @ lp["cross_q"], B, S, H, D)
        cctx = merge_heads(attention(cq, ck, cv, cross_bias, scale=1.0))
        h = h + cctx @ lp["cross_o"]
        hn = rms_norm(h, lp["ffn_norm"], cfg.layer_norm_eps)
        return h + _ffn(hn, lp, cfg), (kc, vc)

    x, (self_k, self_v) = jax.lax.scan(
        layer_fn, x, (params["dec"], self_k, self_v, cross_k, cross_v))
    x = rms_norm(x, params["dec_final_norm"], cfg.layer_norm_eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model ** -0.5)
    return x @ params["lm_head"], self_k, self_v
