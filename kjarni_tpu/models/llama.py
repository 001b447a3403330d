"""Unified GQA+RoPE+RMSNorm+SwiGLU decoder: Llama / Qwen2 / Mistral / Phi-3.

Rebuild of the reference decoder stack (kjarni-transformers/src/cpu/decoder/
rope_decoder_layer.rs:12, decoder_attention.rs:8, gqa_projection.rs:8) and the
per-arch model crates (kjarni-models/src/models/{llama,qwen,mistral}/*,
llama/cpu_decoder.rs:12). One frozen config + one pure forward covers all four
architectures; the differences are data (qkv bias for Qwen2, fused projections
for Phi-3 split at load, sliding-window mask for Mistral, rope scaling for
Llama-3/Phi-3).

TPU design: stacked layer params under `lax.scan`, a fixed-shape KV cache
updated with `dynamic_update_slice` (donated across decode steps), and a single
`forward` used for both prefill (S = prompt bucket) and decode (S = 1) so XLA
compiles exactly two programs per model.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import InvalidConfigError
from ..core.metadata import RopeScaling
from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, base_inv_freq, llama3_inv_freq
from ..weights.safetensors_loader import ModelWeights


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    arch: str  # "llama" | "qwen2" | "mistral" | "phi3"
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    max_seq_len: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    # phi3 longrope factors (tuples so the config stays hashable)
    longrope_short_factor: Optional[tuple[float, ...]] = None
    longrope_long_factor: Optional[tuple[float, ...]] = None
    original_max_seq_len: Optional[int] = None
    qkv_bias: bool = False
    sliding_window: Optional[int] = None
    tie_word_embeddings: bool = False
    bos_token_id: Optional[int] = None
    eos_token_ids: tuple[int, ...] = ()
    # per-stage host offload (ExecutionPlan, execution/plan.rs:4): when set,
    # the corresponding table lives in pinned_host memory and its compute runs
    # host-side inside the compiled program (core/placement.py)
    embed_on_host: bool = False
    lm_head_on_host: bool = False

    @staticmethod
    def from_hf(cfg: dict) -> "DecoderConfig":
        mt = cfg.get("model_type", "llama")
        archs = {"llama": "llama", "qwen2": "qwen2", "mistral": "mistral",
                 "phi3": "phi3"}
        if mt not in archs:
            raise InvalidConfigError(f"unsupported decoder model_type '{mt}'")
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]
        rope_scaling = None
        short = long = None
        orig = None
        rs = cfg.get("rope_scaling")
        if rs:
            rtype = rs.get("rope_type", rs.get("type", ""))
            if rtype == "llama3":
                rope_scaling = RopeScaling(
                    rope_type="llama3",
                    factor=rs.get("factor", 32.0),
                    low_freq_factor=rs.get("low_freq_factor", 1.0),
                    high_freq_factor=rs.get("high_freq_factor", 4.0),
                    original_max_position_embeddings=rs.get(
                        "original_max_position_embeddings", 8192),
                )
            elif rtype in ("longrope", "su"):
                short = tuple(float(x) for x in rs["short_factor"])
                long = tuple(float(x) for x in rs["long_factor"])
                orig = cfg.get("original_max_position_embeddings",
                               cfg["max_position_embeddings"])
        eos = cfg.get("eos_token_id")
        if eos is None:
            eos_ids: tuple[int, ...] = ()
        elif isinstance(eos, list):
            eos_ids = tuple(int(e) for e in eos)
        else:
            eos_ids = (int(eos),)
        return DecoderConfig(
            arch=archs[mt],
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=head_dim,
            intermediate_size=cfg["intermediate_size"],
            max_seq_len=cfg["max_position_embeddings"],
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=rope_scaling,
            longrope_short_factor=short,
            longrope_long_factor=long,
            original_max_seq_len=orig,
            qkv_bias=mt == "qwen2",
            sliding_window=(cfg.get("sliding_window")
                            if cfg.get("use_sliding_window", mt == "mistral") else None),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_ids=eos_ids,
        )


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def _t(ws: ModelWeights, name: str, dtype) -> np.ndarray:
    return np.asarray(ws.get(name), dtype=np.float32).T.astype(dtype)


def _stack(ws: ModelWeights, fmt: str, L: int, dtype, transpose=True) -> np.ndarray:
    if transpose:
        return np.stack([_t(ws, fmt.format(i), dtype) for i in range(L)])
    return np.stack(
        [np.asarray(ws.get(fmt.format(i)), dtype=np.float32).astype(dtype)
         for i in range(L)])


def load_params(ws: ModelWeights, cfg: DecoderConfig, dtype=np.float32,
                rope_cache_len: Optional[int] = None) -> dict:
    """Map HF llama-layout checkpoints into the stacked pytree.

    Phi-3's fused qkv_proj / gate_up_proj (kjarni registry: Phi3 LongRoPE) are
    split here so one forward serves every arch.
    """
    L = cfg.num_layers
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    p = "model."

    def lin_stack(names_fmt, bias_fmt=None):
        out = {"w": _stack(ws, names_fmt, L, dtype)}
        if bias_fmt and f"{bias_fmt.format(0)}" in ws:
            out["b"] = _stack(ws, bias_fmt, L, dtype, transpose=False)
        return out

    if cfg.arch == "phi3":
        qkv = _stack(ws, p + "layers.{}.self_attn.qkv_proj.weight", L, dtype)
        q_dim = H * D
        kv_dim = Hkv * D
        q = {"w": qkv[:, :, :q_dim]}
        k = {"w": qkv[:, :, q_dim:q_dim + kv_dim]}
        v = {"w": qkv[:, :, q_dim + kv_dim:]}
        gate_up = _stack(ws, p + "layers.{}.mlp.gate_up_proj.weight", L, dtype)
        gate = {"w": gate_up[:, :, :cfg.intermediate_size]}
        up = {"w": gate_up[:, :, cfg.intermediate_size:]}
    else:
        q = lin_stack(p + "layers.{}.self_attn.q_proj.weight",
                      p + "layers.{}.self_attn.q_proj.bias")
        k = lin_stack(p + "layers.{}.self_attn.k_proj.weight",
                      p + "layers.{}.self_attn.k_proj.bias")
        v = lin_stack(p + "layers.{}.self_attn.v_proj.weight",
                      p + "layers.{}.self_attn.v_proj.bias")
        gate = lin_stack(p + "layers.{}.mlp.gate_proj.weight")
        up = lin_stack(p + "layers.{}.mlp.up_proj.weight")

    layers = {
        "q": q, "k": k, "v": v,
        "o": lin_stack(p + "layers.{}.self_attn.o_proj.weight"),
        "gate": gate, "up": up,
        "down": lin_stack(p + "layers.{}.mlp.down_proj.weight"),
        "attn_norm": _stack(ws, p + "layers.{}.input_layernorm.weight", L, dtype,
                            transpose=False),
        "ffn_norm": _stack(ws, p + "layers.{}.post_attention_layernorm.weight", L,
                           dtype, transpose=False),
    }
    embed = np.asarray(ws.get(p + "embed_tokens.weight"), dtype=np.float32).astype(dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in ws:
        lm_head = embed.T
    else:
        lm_head = _t(ws, "lm_head.weight", dtype)
    cos, sin = rope_cache(cfg, rope_cache_len, dtype=np.float32)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": np.asarray(ws.get(p + "norm.weight"), dtype=np.float32).astype(dtype),
        "lm_head": lm_head,
        "rope_cos": cos,
        "rope_sin": sin,
    }


def rope_cache(cfg: DecoderConfig, length: Optional[int] = None,
               dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Precompute cos/sin tables, honoring llama3 and phi3-longrope scaling."""
    length = length or cfg.max_seq_len
    D = cfg.head_dim
    attn_factor = 1.0
    if cfg.longrope_short_factor is not None:
        # Phi-3 LongRoPE: per-frequency factors; use short factors for contexts
        # within the original window (HF Phi3 chooses by seq length; decode
        # caches are sized by max_seq_len so we pick by cache length).
        orig = cfg.original_max_seq_len or cfg.max_seq_len
        factors = np.asarray(
            cfg.longrope_long_factor if length > orig else cfg.longrope_short_factor,
            dtype=np.float64)
        inv = base_inv_freq(D, cfg.rope_theta).astype(np.float64) / factors
        scale = length / orig if orig else 1.0
        if scale > 1.0:
            attn_factor = float(np.sqrt(1.0 + np.log(scale) / np.log(orig)))
    elif cfg.rope_scaling is not None:
        inv = llama3_inv_freq(D, cfg.rope_theta, cfg.rope_scaling).astype(np.float64)
    else:
        inv = base_inv_freq(D, cfg.rope_theta).astype(np.float64)
    pos = np.arange(length, dtype=np.float64)
    angles = np.outer(pos, inv)
    cos = np.concatenate([np.cos(angles), np.cos(angles)], axis=-1) * attn_factor
    sin = np.concatenate([np.sin(angles), np.sin(angles)], axis=-1) * attn_factor
    return cos.astype(dtype), sin.astype(dtype)


def _unpack_int4(w4: jnp.ndarray) -> jnp.ndarray:
    """[..., K/2, N] int8 (two nibbles per byte) -> [..., K, N] int8.

    HALF-SPLIT layout: the low nibble holds row k, the high nibble row
    k + K/2 — so unpack is two sign-extending shifts and a concat, with NO
    row interleave. This matters: an interleaving stack+reshape between the
    unpack and the consuming dot blocks XLA's operand fusion and forces the
    dequantized [K, N] matrix to materialize (measured 240 us vs 38 us per
    llama-1B gate matvec, scripts/int4_formulation_bench.py); the half-split
    chain fuses like the int8 convert does.
    """
    lo = jnp.left_shift(w4, 4) >> 4            # sign-extended low nibble
    hi = w4 >> 4                               # arithmetic: keeps sign
    return jnp.concatenate([lo, hi], axis=-2)


def _mm(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Linear apply over a param dict; int8/int4 weight-only quant goes
    through XLA convert-fused matmul paths (int8 measured at full HBM
    bandwidth — 2.0x over bf16 weights on v5e; see ops/pallas/quant_matmul.py
    for the story). int4 stores two nibbles per int8 byte ("w4") so every
    backend — including remote-device tunnels without native int4
    device_put — carries 4x less weight traffic; scales are GROUP-WISE
    (GGUF-Q4-style accuracy): scales [K/g, N], matmul per input-group with
    the unpack+convert fused, partials scale-weighted and summed."""
    if "w4" in p:
        # Half-split packed int4: y = x_lo @ deq(lo) + x_hi @ deq(hi).
        # Each half is a single dot whose operand chain (shift, convert,
        # group-scale multiply) XLA fuses into the read stream — no
        # materialized dequant matrix, 0.5 HBM bytes/weight
        # (scripts/int4_formulation_bench.py: 38.6 us vs 240 us for the
        # grouped-einsum form at llama-1B gate shape).
        w4 = p["w4"]                           # [K/2, N]
        scale = p["scale"]                     # [G, N]
        lo = (jnp.left_shift(w4, 4) >> 4).astype(x.dtype)
        hi = (w4 >> 4).astype(x.dtype)
        K2, N = w4.shape[-2], w4.shape[-1]
        G = scale.shape[-2]
        s = scale.astype(x.dtype)
        if G == 1:
            w_lo = lo * s[0]
            w_hi = hi * s[0]
        else:
            g = (2 * K2) // G
            G2 = G // 2
            w_lo = (lo.reshape(G2, g, N) * s[:G2, None, :]).reshape(K2, N)
            w_hi = (hi.reshape(G2, g, N) * s[G2:, None, :]).reshape(K2, N)
        y = x[..., :K2] @ w_lo + x[..., K2:] @ w_hi
        if "b" in p:
            y = y + p["b"]
        return y
    w = p["w"]
    if w.dtype == jnp.int8:
        y = (x @ w.astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ w
    if "b" in p:
        y = y + p["b"]
    return y


def int4_device_supported() -> bool:
    """Always true: int4 weights store packed two-per-int8-byte ("w4"), so
    device_put only ever moves int8 — no backend needs native int4 support
    (the axon dev tunnel's device_put recurses on real int4 arrays, which is
    why the packed representation exists). Kept for API compatibility with
    the round-2 gate."""
    return True


def pack_int4(q: np.ndarray) -> np.ndarray:
    """[..., K, N] int8 in [-8, 7] -> [..., K/2, N] int8, two nibbles/byte.

    HALF-SPLIT: row k in the low nibble, row k + K/2 in the high nibble
    (the inverse of _unpack_int4; see its docstring for why not
    interleaved). K must be even.
    """
    K2 = q.shape[-2] // 2
    lo = (q[..., :K2, :] & 0xF).astype(np.uint8)
    hi = (q[..., K2:, :] & 0xF).astype(np.uint8)
    return ((hi << 4) | lo).view(np.int8)


def quantize_params_int4(params: dict, group_size: int = 128) -> dict:
    """Group-wise int4 weight-only quantization (TPU analogue of the
    reference's Q4_K path, cpu/kernels/x86/q4_k.rs): each [group_size]-long
    slice of the input dim gets its own scale, recovering most of the
    accuracy per-channel int4 loses. Weights store PACKED two-per-int8-byte
    ({"w4": [.., K/2, N] int8, "scale": [.., K/g, N]}) — 4x less HBM weight
    traffic than bf16, and device_put never sees an int4 dtype."""
    import numpy as _np

    def quant(w):
        w32 = _np.asarray(w, dtype=_np.float32)
        K, N = w32.shape[-2], w32.shape[-1]
        # half-split packing needs an even group count (each half scales
        # with its own contiguous groups); otherwise collapse to per-matrix
        g = group_size if K % (2 * group_size) == 0 else K
        G = K // g
        wg = w32.reshape(*w32.shape[:-2], G, g, N)
        absmax = _np.maximum(_np.abs(wg).max(axis=-2), 1e-8)  # [..., G, N]
        scale = absmax / 7.0
        q = _np.clip(_np.round(wg / scale[..., None, :]), -8, 7)
        q = q.reshape(w32.shape).astype(_np.int8)
        return pack_int4(q), scale.astype(_np.float32)

    out = dict(params)
    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        entry = dict(layers[name])
        qw, sc = quant(entry.pop("w"))
        entry["w4"] = qw
        entry["scale"] = sc
        layers[name] = entry
    out["layers"] = layers
    qw, sc = quant(np.asarray(params["lm_head"]))
    out["lm_head"] = {"w4": qw, "scale": sc}
    return out


def quantize_params_int8(params: dict) -> dict:
    """Per-output-channel int8 weight-only quantization of the big projections
    (TPU analogue of the reference's Q8_0 GGUF path, weights/gguf_loader.rs).

    Embeddings and norms stay in the float dtype (gathers + tiny tensors);
    every matmul weight becomes int8 + scale, halving HBM traffic per token.
    """
    import numpy as _np

    def quant(w):
        w32 = _np.asarray(w, dtype=_np.float32)
        absmax = _np.maximum(_np.abs(w32).max(axis=-2, keepdims=True), 1e-8)
        scale = (absmax / 127.0)
        q = _np.clip(_np.round(w32 / scale), -127, 127).astype(_np.int8)
        return q, _np.squeeze(scale, axis=-2).astype(_np.float32)

    out = dict(params)
    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        entry = dict(layers[name])
        qw, sc = quant(entry["w"])
        entry["w"], entry["scale"] = qw, sc
        layers[name] = entry
    out["layers"] = layers
    qw, sc = quant(params["lm_head"])
    out["lm_head"] = {"w": qw, "scale": sc}
    return out


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_cache(cfg: DecoderConfig, batch: int, max_len: int,
               dtype=jnp.float32, quantized: bool = False):
    """Fixed-shape per-layer KV cache (cf. cache/cpu.rs:11 CpuKVCache).

    quantized=True stores K/V as int8 with per-(head, position) scales —
    half the HBM traffic per decode step at long context; dequantization is
    convert-fused into the attention matmuls by XLA.
    """
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if not quantized:
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
    sshape = shape[:-1]
    k = {"q": jnp.zeros(shape, jnp.int8), "s": jnp.zeros(sshape, jnp.float32)}
    v = {"q": jnp.zeros(shape, jnp.int8), "s": jnp.zeros(sshape, jnp.float32)}
    return k, v


def _cache_write(cache, new: jnp.ndarray, pos_start, act_dtype):
    """Write [B, H, S, D] into the cache at position pos_start; returns
    (updated_cache, dequantized_full_view [B, H, T, D])."""
    if isinstance(cache, dict):
        scale = jnp.maximum(jnp.max(jnp.abs(new), axis=-1), 1e-6) / 127.0
        q = jnp.clip(jnp.round(new / scale[..., None]), -127, 127
                     ).astype(jnp.int8)
        cq = jax.lax.dynamic_update_slice(cache["q"], q, (0, 0, pos_start, 0))
        cs = jax.lax.dynamic_update_slice(
            cache["s"], scale.astype(jnp.float32), (0, 0, pos_start))
        full = cq.astype(act_dtype) * cs[..., None].astype(act_dtype)
        return {"q": cq, "s": cs}, full
    c = jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype),
                                     (0, 0, pos_start, 0))
    return c, c


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _run_stack(params: dict, cfg: DecoderConfig, ids: jnp.ndarray,
               cache_k: jnp.ndarray, cache_v: jnp.ndarray, pos_start,
               use_flash: bool = False, positions: Optional[jnp.ndarray] = None,
               pad_mask: Optional[jnp.ndarray] = None,
               kv_bucket: Optional[int] = None):
    """Embed -> scanned layer stack -> final norm. Shared by prefill/decode.

    `use_flash` (static) routes attention through the Pallas flash kernel.
    From-zero prefills attend the fresh K/V block; cache-reuse prefills
    (pos_start > 0, multi-turn prompt caching) attend the cache sliced to
    the static `kv_bucket` with the kernel's dynamic q_offset/kv_len — no
    [S, T] score materialization either way.

    Batched generation with ragged prompts passes `positions` [B, S] (per-row
    absolute RoPE positions under LEFT padding; cache slots stay shared) and
    `pad_mask` [B, T] (1 = real kv slot) — cf. tokenize_batch left padding,
    models/base.rs:289.
    """
    B, S = ids.shape
    T = (cache_k["q"] if isinstance(cache_k, dict) else cache_k).shape[3]
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.embed_on_host:
        from ..core.placement import host_gather
        x = host_gather(params["embed"], ids)
    else:
        x = jnp.take(params["embed"], ids, axis=0)

    slot_q = pos_start + jnp.arange(S)
    if positions is None:
        positions = slot_q  # [S], shared across rows
    cos = jnp.take(params["rope_cos"], positions, axis=0)
    sin = jnp.take(params["rope_sin"], positions, axis=0)

    # causal bias over cache SLOTS: query slot i sees kv slots j <= i
    qi = slot_q[:, None]
    kj = jnp.arange(T)[None, :]
    bias = jnp.where(kj <= qi, 0.0, NEG_INF)
    if cfg.sliding_window:
        bias = jnp.where(kj > qi - cfg.sliding_window, bias, NEG_INF)
    bias = bias[None, None, :, :]  # [1, 1, S, T]
    if pad_mask is not None:
        bias = bias + jnp.where(pad_mask.astype(bool), 0.0,
                                NEG_INF)[:, None, None, :]

    def layer_fn(h, xs):
        lp, kc, vc = xs
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
        q = _mm(hn, lp["q"])
        k = _mm(hn, lp["k"])
        v = _mm(hn, lp["v"])
        q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        # tables were pre-gathered at `positions`: index 0..S (shared) or
        # per-row via broadcast (cos is [B, S, D] for batched generation)
        if cos.ndim == 3:
            c = cos[:, None].astype(q.dtype)
            si = sin[:, None].astype(q.dtype)
            from ..ops.rope import rotate_half
            q = q * c + rotate_half(q) * si
            k = k * c + rotate_half(k) * si
        else:
            q, k = apply_rope(q, k, cos, sin, jnp.arange(S))
        kc, k_full = _cache_write(kc, k, pos_start, h.dtype)
        vc, v_full = _cache_write(vc, v, pos_start, h.dtype)
        if use_flash:
            from ..ops.pallas.flash_attention import flash_attention
            kb = kv_bucket if kv_bucket is not None else S
            if kb <= S:
                # from-zero prefill: fresh block IS the whole valid cache
                ctx = merge_heads(flash_attention(
                    q, k, v, causal=True, window=cfg.sliding_window))
            else:
                # cache-reuse (chunked) prefill; block sizes come from the
                # measured table (flash_attention.pick_blocks: 256/512 = 1.6x
                # over 128/128 at llama-1B reuse shapes; 512/1024 forbidden —
                # compile-pathological on the remote compiler)
                ks = jax.lax.slice_in_dim(k_full, 0, kb, axis=2)
                vs = jax.lax.slice_in_dim(v_full, 0, kb, axis=2)
                ctx = merge_heads(flash_attention(
                    q, ks, vs, causal=True, window=cfg.sliding_window,
                    q_offset=pos_start, kv_len=pos_start + S))
        else:
            # NOTE: slicing the attention read to a kv bucket here does NOT
            # help — XLA fuses the cache-carry restacking of the layer scan
            # with the attention read, so the full-capacity pass happens
            # regardless (measured 0.997x, scripts/decode_bucketed_bench.py).
            # Fill-proportional decode instead slices the WORKING cache once
            # per segment in decoder_lm._fused_loop_fn.
            ctx = merge_heads(attention(q, k_full, v_full, bias))
        h = h + _mm(ctx, lp["o"])
        hn = rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
        ffn = _mm(jax.nn.silu(_mm(hn, lp["gate"])) * _mm(hn, lp["up"]),
                  lp["down"])
        return h + ffn, (kc, vc)

    x, (cache_k, cache_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache_k, cache_v))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, cache_k, cache_v


def forward(params: dict, cfg: DecoderConfig, ids: jnp.ndarray,
            cache_k: jnp.ndarray, cache_v: jnp.ndarray, pos_start: jnp.ndarray,
            last_idx: Optional[jnp.ndarray] = None, use_flash: bool = False,
            positions: Optional[jnp.ndarray] = None,
            pad_mask: Optional[jnp.ndarray] = None,
            kv_bucket: Optional[int] = None):
    """One decoder pass, shared by prefill and decode.

    ids: [B, S] tokens whose absolute positions are pos_start + arange(S).
    K/V for these tokens are written into the cache at those positions; queries
    attend causally over cache[0 .. pos_start+S). Returns (logits, cache_k,
    cache_v) where logits are taken at `last_idx` (default S-1).

    Padding discipline: garbage K/V beyond the true prompt length is never
    attended — decode steps overwrite slot p before any query reaches p.
    """
    x, cache_k, cache_v = _run_stack(params, cfg, ids, cache_k, cache_v,
                                     pos_start, use_flash, positions, pad_mask,
                                     kv_bucket)
    if last_idx is None:
        last_idx = ids.shape[1] - 1
    last = jax.lax.dynamic_index_in_dim(x, last_idx, axis=1, keepdims=False)
    logits = _head_mm(last, params["lm_head"], cfg)
    return logits, cache_k, cache_v


def _head_mm(x, head, cfg: DecoderConfig):
    """lm-head projection, routed host-side when the plan offloads it."""
    if cfg.lm_head_on_host and not isinstance(head, dict):
        from ..core.placement import host_matmul
        return host_matmul(x, head)
    return _mm(x, head) if isinstance(head, dict) else x @ head


def forward_all_logits(params: dict, cfg: DecoderConfig, ids: jnp.ndarray,
                       cache_k: jnp.ndarray, cache_v: jnp.ndarray, pos_start):
    """Like forward() but returns logits at every position (parity tests,
    speculative verification)."""
    x, cache_k, cache_v = _run_stack(params, cfg, ids, cache_k, cache_v, pos_start)
    logits = _head_mm(x, params["lm_head"], cfg)
    return logits, cache_k, cache_v


def forward_hidden(params: dict, cfg: DecoderConfig, ids: jnp.ndarray,
                   cache_k: jnp.ndarray, cache_v: jnp.ndarray, pos_start,
                   use_flash: bool = False, positions=None, pad_mask=None,
                   kv_bucket: Optional[int] = None):
    """Stack without the lm-head: final-norm hidden states at every position.

    Lets callers project only the rows they need (e.g. batched admission
    prefill gathers one hidden per lane before head_logits) instead of
    materializing [B, S, V] logits for a long block."""
    return _run_stack(params, cfg, ids, cache_k, cache_v, pos_start,
                      use_flash, positions, pad_mask, kv_bucket)


def head_logits(params: dict, cfg: DecoderConfig, x: jnp.ndarray):
    """lm-head projection over pre-gathered hidden rows."""
    return _head_mm(x, params["lm_head"], cfg)
