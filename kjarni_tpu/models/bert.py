"""BERT-family encoder (BERT / DistilBERT / RoBERTa / XLM-R / MPNet), TPU-native.

Rebuild of the reference CPU encoder stack (kjarni-transformers/src/cpu/encoder/
transformer_encoder.rs:22, encoder_layer.rs:12, encoder_self_attention.rs,
qkv_projection.rs) and the per-arch config dispatch in
kjarni-models/src/models/sentence_encoder/configs.rs.

Design: one frozen `BertConfig` (static under jit), a params pytree whose layer
weights are STACKED along a leading layer axis, and a pure `encode()` that runs
the layer stack with `lax.scan`. Scan keeps compile time O(1) in depth and gives
XLA one fused layer body to tile onto the MXU — the TPU-native replacement for
the reference's per-layer object graph and scratch-buffer forward
(`forward_noalloc`, transformer_encoder.rs:268); on TPU, buffer reuse is XLA's
job, not ours.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import InvalidConfigError
from ..ops.activations import get_activation
from ..ops.attention import attention, merge_heads, split_heads
from ..ops.masks import padding_bias
from ..ops.norms import layer_norm
from ..weights.safetensors_loader import ModelWeights


@dataclasses.dataclass(frozen=True)
class BertConfig:
    flavor: str  # "bert" | "distilbert" | "roberta" | "mpnet"
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    max_position_embeddings: int
    type_vocab_size: int = 0
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12
    activation: str = "gelu"
    # roberta/mpnet: positions start at pad_token_id + 1 and skip padding
    position_offset: int = 0
    # mpnet relative attention bias
    relative_attention_num_buckets: int = 0
    relative_attention_max_distance: int = 128
    # nomic-bert: rotary embeddings + swiglu ffn, fused Wqkv without bias
    rotary_emb_base: float = 0.0   # >0 enables rotary (no position embeddings)
    swiglu: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_hf(cfg: dict) -> "BertConfig":
        """Parse an HF config.json for any supported encoder flavor."""
        mt = cfg.get("model_type", "bert")
        if mt == "distilbert":
            return BertConfig(
                flavor="distilbert",
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["dim"],
                num_layers=cfg["n_layers"],
                num_heads=cfg["n_heads"],
                intermediate_size=cfg["hidden_dim"],
                max_position_embeddings=cfg["max_position_embeddings"],
                type_vocab_size=0,
                pad_token_id=cfg.get("pad_token_id", 0),
                layer_norm_eps=1e-12,
                activation=cfg.get("activation", "gelu"),
            )
        if mt in ("roberta", "xlm-roberta", "camembert"):
            pad = cfg.get("pad_token_id", 1)
            return BertConfig(
                flavor="roberta",
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                num_layers=cfg["num_hidden_layers"],
                num_heads=cfg["num_attention_heads"],
                intermediate_size=cfg["intermediate_size"],
                max_position_embeddings=cfg["max_position_embeddings"],
                type_vocab_size=cfg.get("type_vocab_size", 0),
                pad_token_id=pad,
                layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                activation=cfg.get("hidden_act", "gelu"),
                position_offset=pad + 1,
            )
        if mt == "mpnet":
            pad = cfg.get("pad_token_id", 1)
            return BertConfig(
                flavor="mpnet",
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                num_layers=cfg["num_hidden_layers"],
                num_heads=cfg["num_attention_heads"],
                intermediate_size=cfg["intermediate_size"],
                max_position_embeddings=cfg["max_position_embeddings"],
                type_vocab_size=0,
                pad_token_id=pad,
                layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
                activation=cfg.get("hidden_act", "gelu"),
                position_offset=pad + 1,
                relative_attention_num_buckets=cfg.get("relative_attention_num_buckets", 32),
            )
        if mt in ("nomic_bert", "nomic-bert"):
            return BertConfig(
                flavor="nomic",
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["n_embd"],
                num_layers=cfg["n_layer"],
                num_heads=cfg["n_head"],
                intermediate_size=cfg.get("n_inner") or 4 * cfg["n_embd"],
                max_position_embeddings=cfg.get("n_positions", 8192) or 8192,
                type_vocab_size=cfg.get("type_vocab_size", 2),
                pad_token_id=cfg.get("pad_token_id", 0),
                layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-12),
                activation="silu",
                rotary_emb_base=cfg.get("rotary_emb_base", 1000.0),
                swiglu=cfg.get("activation_function", "swiglu") == "swiglu",
            )
        if mt == "bert":
            return BertConfig(
                flavor="bert",
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                num_layers=cfg["num_hidden_layers"],
                num_heads=cfg["num_attention_heads"],
                intermediate_size=cfg["intermediate_size"],
                max_position_embeddings=cfg["max_position_embeddings"],
                type_vocab_size=cfg.get("type_vocab_size", 2),
                pad_token_id=cfg.get("pad_token_id", 0),
                layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
                activation=cfg.get("hidden_act", "gelu"),
            )
        raise InvalidConfigError(f"unsupported encoder model_type '{mt}'")


# ---------------------------------------------------------------------------
# Weight loading: HF safetensors names -> stacked params pytree
# ---------------------------------------------------------------------------

def _stack_linear(ws: ModelWeights, names: list[str], dtype) -> dict:
    """Stack per-layer torch [out,in] weights into {"w": [L,in,out], "b": [L,out]}."""
    w = np.stack([np.asarray(ws.get(f"{n}.weight"), dtype=np.float32).T for n in names])
    p = {"w": w.astype(dtype)}
    if f"{names[0]}.bias" in ws:
        p["b"] = np.stack(
            [np.asarray(ws.get(f"{n}.bias"), dtype=np.float32) for n in names]).astype(dtype)
    return p


def _stack_norm(ws: ModelWeights, names: list[str], dtype) -> dict:
    return {
        "weight": np.stack(
            [np.asarray(ws.get(f"{n}.weight"), dtype=np.float32) for n in names]).astype(dtype),
        "bias": np.stack(
            [np.asarray(ws.get(f"{n}.bias"), dtype=np.float32) for n in names]).astype(dtype),
    }


def _detect_prefix(ws: ModelWeights, candidates: list[str], probe: str) -> str:
    for p in candidates:
        if f"{p}{probe}" in ws:
            return p
    raise InvalidConfigError(
        f"could not find '{probe}' under any of prefixes {candidates}")


def load_params(ws: ModelWeights, cfg: BertConfig, dtype=np.float32) -> dict:
    """Map HF checkpoint tensor names into the stacked pytree.

    Name layouts follow the reference's AttentionLayout/FeedForwardLayout
    conventions (traits.rs:84,99) per flavor.
    """
    L = cfg.num_layers
    if cfg.flavor == "distilbert":
        pre = _detect_prefix(ws, ["distilbert.", ""], "embeddings.word_embeddings.weight")
        layer = [f"{pre}transformer.layer.{i}" for i in range(L)]
        emb = {
            "word": ws.get_f32(f"{pre}embeddings.word_embeddings.weight").astype(dtype),
            "position": ws.get_f32(f"{pre}embeddings.position_embeddings.weight").astype(dtype),
            "token_type": None,
            "norm": {
                "weight": ws.get_f32(f"{pre}embeddings.LayerNorm.weight").astype(dtype),
                "bias": ws.get_f32(f"{pre}embeddings.LayerNorm.bias").astype(dtype),
            },
        }
        layers = {
            "q": _stack_linear(ws, [f"{n}.attention.q_lin" for n in layer], dtype),
            "k": _stack_linear(ws, [f"{n}.attention.k_lin" for n in layer], dtype),
            "v": _stack_linear(ws, [f"{n}.attention.v_lin" for n in layer], dtype),
            "o": _stack_linear(ws, [f"{n}.attention.out_lin" for n in layer], dtype),
            "attn_norm": _stack_norm(ws, [f"{n}.sa_layer_norm" for n in layer], dtype),
            "fc1": _stack_linear(ws, [f"{n}.ffn.lin1" for n in layer], dtype),
            "fc2": _stack_linear(ws, [f"{n}.ffn.lin2" for n in layer], dtype),
            "ffn_norm": _stack_norm(ws, [f"{n}.output_layer_norm" for n in layer], dtype),
        }
        return {"embeddings": emb, "layers": layers, "pooler": None, "rel_bias": None}

    if cfg.flavor == "mpnet":
        pre = _detect_prefix(ws, ["mpnet.", ""], "embeddings.word_embeddings.weight")
        layer = [f"{pre}encoder.layer.{i}" for i in range(L)]
        emb = {
            "word": ws.get_f32(f"{pre}embeddings.word_embeddings.weight").astype(dtype),
            "position": ws.get_f32(f"{pre}embeddings.position_embeddings.weight").astype(dtype),
            "token_type": None,
            "norm": {
                "weight": ws.get_f32(f"{pre}embeddings.LayerNorm.weight").astype(dtype),
                "bias": ws.get_f32(f"{pre}embeddings.LayerNorm.bias").astype(dtype),
            },
        }
        layers = {
            "q": _stack_linear(ws, [f"{n}.attention.attn.q" for n in layer], dtype),
            "k": _stack_linear(ws, [f"{n}.attention.attn.k" for n in layer], dtype),
            "v": _stack_linear(ws, [f"{n}.attention.attn.v" for n in layer], dtype),
            "o": _stack_linear(ws, [f"{n}.attention.attn.o" for n in layer], dtype),
            "attn_norm": _stack_norm(ws, [f"{n}.attention.LayerNorm" for n in layer], dtype),
            "fc1": _stack_linear(ws, [f"{n}.intermediate.dense" for n in layer], dtype),
            "fc2": _stack_linear(ws, [f"{n}.output.dense" for n in layer], dtype),
            "ffn_norm": _stack_norm(ws, [f"{n}.output.LayerNorm" for n in layer], dtype),
        }
        rel = ws.get_f32(f"{pre}encoder.relative_attention_bias.weight").astype(dtype)
        return {"embeddings": emb, "layers": layers, "pooler": None, "rel_bias": rel}

    if cfg.flavor == "nomic":
        # NomicBERT layout (sentence_encoder/configs.rs:221 is_nomic branch):
        # fused Wqkv without bias, out_proj, norm1/norm2, mlp fc11(gate)/fc12(up)/fc2
        layer = [f"encoder.layers.{i}" for i in range(L)]
        H = cfg.hidden_size
        wqkv = np.stack([
            np.asarray(ws.get(f"{n}.attn.Wqkv.weight"), dtype=np.float32).T
            for n in layer])  # [L, H, 3H]
        emb = {
            "word": ws.get_f32("embeddings.word_embeddings.weight").astype(dtype),
            "position": None,
            "token_type": (
                ws.get_f32("embeddings.token_type_embeddings.weight").astype(dtype)
                if "embeddings.token_type_embeddings.weight" in ws else None),
            "norm": {
                "weight": ws.get_f32("emb_ln.weight").astype(dtype),
                "bias": ws.get_f32("emb_ln.bias").astype(dtype),
            },
        }
        layers = {
            "q": {"w": wqkv[:, :, :H].astype(dtype)},
            "k": {"w": wqkv[:, :, H:2 * H].astype(dtype)},
            "v": {"w": wqkv[:, :, 2 * H:].astype(dtype)},
            "o": {"w": np.stack([
                np.asarray(ws.get(f"{n}.attn.out_proj.weight"),
                           dtype=np.float32).T for n in layer]).astype(dtype)},
            "attn_norm": _stack_norm(ws, [f"{n}.norm1" for n in layer], dtype),
            "gate": {"w": np.stack([
                np.asarray(ws.get(f"{n}.mlp.fc11.weight"),
                           dtype=np.float32).T for n in layer]).astype(dtype)},
            "up": {"w": np.stack([
                np.asarray(ws.get(f"{n}.mlp.fc12.weight"),
                           dtype=np.float32).T for n in layer]).astype(dtype)},
            "fc2": {"w": np.stack([
                np.asarray(ws.get(f"{n}.mlp.fc2.weight"),
                           dtype=np.float32).T for n in layer]).astype(dtype)},
            "ffn_norm": _stack_norm(ws, [f"{n}.norm2" for n in layer], dtype),
        }
        from ..ops.rope import rope_tables
        cos, sin = rope_tables(cfg.head_dim, cfg.max_position_embeddings,
                               theta=cfg.rotary_emb_base)
        return {"embeddings": emb, "layers": layers, "pooler": None,
                "rel_bias": None, "rope_cos": np.asarray(cos, dtype=np.float32),
                "rope_sin": np.asarray(sin, dtype=np.float32)}

    # bert / roberta / xlm-roberta share the HF "encoder.layer" layout
    pre = _detect_prefix(
        ws, ["", "bert.", "roberta.", "xlm-roberta.", "model."],
        "embeddings.word_embeddings.weight")
    layer = [f"{pre}encoder.layer.{i}" for i in range(L)]
    emb = {
        "word": ws.get_f32(f"{pre}embeddings.word_embeddings.weight").astype(dtype),
        "position": ws.get_f32(f"{pre}embeddings.position_embeddings.weight").astype(dtype),
        "token_type": (
            ws.get_f32(f"{pre}embeddings.token_type_embeddings.weight").astype(dtype)
            if f"{pre}embeddings.token_type_embeddings.weight" in ws else None),
        "norm": {
            "weight": ws.get_f32(f"{pre}embeddings.LayerNorm.weight").astype(dtype),
            "bias": ws.get_f32(f"{pre}embeddings.LayerNorm.bias").astype(dtype),
        },
    }
    layers = {
        "q": _stack_linear(ws, [f"{n}.attention.self.query" for n in layer], dtype),
        "k": _stack_linear(ws, [f"{n}.attention.self.key" for n in layer], dtype),
        "v": _stack_linear(ws, [f"{n}.attention.self.value" for n in layer], dtype),
        "o": _stack_linear(ws, [f"{n}.attention.output.dense" for n in layer], dtype),
        "attn_norm": _stack_norm(ws, [f"{n}.attention.output.LayerNorm" for n in layer], dtype),
        "fc1": _stack_linear(ws, [f"{n}.intermediate.dense" for n in layer], dtype),
        "fc2": _stack_linear(ws, [f"{n}.output.dense" for n in layer], dtype),
        "ffn_norm": _stack_norm(ws, [f"{n}.output.LayerNorm" for n in layer], dtype),
    }
    pooler = None
    if f"{pre}pooler.dense.weight" in ws:
        pooler = {
            "w": ws.get_f32(f"{pre}pooler.dense.weight").T.astype(dtype),
            "b": ws.get_f32(f"{pre}pooler.dense.bias").astype(dtype),
        }
    return {"embeddings": emb, "layers": layers, "pooler": pooler, "rel_bias": None}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _mpnet_relative_position_bucket(relative_position: jnp.ndarray,
                                    num_buckets: int = 32,
                                    max_distance: int = 128) -> jnp.ndarray:
    """HF MPNet bucket scheme (bidirectional T5-style)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def _mpnet_position_bias(rel_bias: jnp.ndarray, seq_len: int, cfg: BertConfig) -> jnp.ndarray:
    pos = jnp.arange(seq_len)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = _mpnet_relative_position_bucket(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    bias = jnp.take(rel_bias, buckets, axis=0)  # [S, S, H]
    return bias.transpose(2, 0, 1)[None]  # [1, H, S, S]


def _abs_positions(cfg: BertConfig, input_ids: jnp.ndarray,
                   attention_mask: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Per-row absolute position ids (None for rotary models)."""
    if cfg.rotary_emb_base > 0:
        return None  # rotary models have no absolute position embeddings
    if cfg.position_offset > 0:
        # roberta/mpnet position ids: cumsum over the mask, pads pinned to pad idx
        mask_i = attention_mask.astype(jnp.int32)
        return jnp.cumsum(mask_i, axis=1) * mask_i + cfg.pad_token_id
    positions = jnp.arange(input_ids.shape[1])[None, :]
    return jnp.broadcast_to(positions, input_ids.shape)


def encode(params: dict, cfg: BertConfig, input_ids: jnp.ndarray,
           attention_mask: jnp.ndarray,
           token_type_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full encoder forward: [B, S] ids -> [B, S, H] hidden states."""
    bias = padding_bias(attention_mask)
    if params.get("rel_bias") is not None:
        bias = bias + _mpnet_position_bias(params["rel_bias"],
                                           input_ids.shape[1], cfg)
    return _encode_core(params, cfg, input_ids,
                        _abs_positions(cfg, input_ids, attention_mask),
                        token_type_ids, bias,
                        jnp.arange(input_ids.shape[1]))


def encode_packed_n(params: dict, cfg: BertConfig, input_ids: jnp.ndarray,
                    attention_mask: jnp.ndarray,
                    token_type_ids: Optional[jnp.ndarray] = None,
                    n: int = 2) -> jnp.ndarray:
    """encode() with n sequences packed per kernel row.

    [B, S] rows (B divisible by n) run as [B/n, nS] with BLOCK-DIAGONAL
    attention, per-lane positions, and per-lane relative/rotary patterns —
    numerically the same hidden states (exact in f32), returned at
    [B, S, H]. Fewer, fuller attention/softmax programs amortize the
    f32-score VPU work that dominates short rows; the tax is the (nS)^2
    score matrix vs n * S^2. Measured on v5e (scripts/encoder_pack{2,n}.py):
    n=2 is 1.31x plain at S=64; n=4 is 2.32x plain (1.24x pack-2) at S=32
    but 0.97x plain at S=64 — the crossover sits between.
    """
    B, S = input_ids.shape
    positions = _abs_positions(cfg, input_ids, attention_mask)
    idsn = input_ids.reshape(B // n, n * S)
    maskn = attention_mask.reshape(B // n, n * S)
    posn = None if positions is None else positions.reshape(B // n, n * S)
    ttn = None if token_type_ids is None else \
        token_type_ids.reshape(B // n, n * S)

    bias = padding_bias(maskn)
    # mask cross-lane attention
    lane = jnp.arange(n * S) // S
    block = jnp.where(lane[:, None] == lane[None, :], 0.0, -1e30)
    bias = bias + block[None, None]
    if params.get("rel_bias") is not None:
        rb = _mpnet_position_bias(params["rel_bias"], S, cfg)  # [1, H, S, S]
        rbn = jnp.zeros(rb.shape[:2] + (n * S, n * S), rb.dtype)
        for i in range(n):
            rbn = rbn.at[:, :, i * S:(i + 1) * S, i * S:(i + 1) * S].set(rb)
        bias = bias + rbn
    rope_pos = jnp.tile(jnp.arange(S), n)
    hidden = _encode_core(params, cfg, idsn, posn, ttn, bias, rope_pos)
    return hidden.reshape(B, S, cfg.hidden_size)


def encode_packed_pairs(params: dict, cfg: BertConfig, input_ids: jnp.ndarray,
                        attention_mask: jnp.ndarray,
                        token_type_ids: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """Two sequences per kernel row (the round-3 form of encode_packed_n)."""
    return encode_packed_n(params, cfg, input_ids, attention_mask,
                           token_type_ids, n=2)


def _pack_plan(B: int, S: int) -> tuple[int, int]:
    """Trace-time packing choice for encode_auto: (n, pad_rows).

    Measured v5e gains vs the plain path (scripts/encoder_pack{2,n}.py):
    at S<=32 pack-4 is 2.32x and pack-2 1.87x; at 32<S<=64 pack-2 is 1.31x
    (pack-4 measured 0.97x there — excluded). Ragged batches pad up to a
    full group with inert rows when the gain still covers the dummy
    compute: effective speedup = gain * B / (B + pad); the plan with the
    best effective speedup wins (plain = 1.0).
    """
    cands = [(1, 0, 1.0)]
    if S <= 64 and B >= 2:
        cands.append((2, (-B) % 2, 1.87 if S <= 32 else 1.31))
        if S <= 32:
            cands.append((4, (-B) % 4, 2.32))
    n, pad, _ = max(cands, key=lambda c: c[2] * B / (B + c[1]))
    return n, pad


def encode_auto(params: dict, cfg: BertConfig, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray,
                token_type_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """encode() with automatic packing for short rows.

    Shapes are static under jit, so this is a trace-time branch on the
    measured _pack_plan crossovers. Batches that don't divide the pack
    width are padded with inert rows (pad ids, zero mask — their uniform
    self-attention stays inside their own lane) and sliced back, so ragged
    library-path batches pack too, not only the pow2-bucketed product path.
    """
    B, S = input_ids.shape
    n, pad = _pack_plan(B, S)
    if n == 1:
        return encode(params, cfg, input_ids, attention_mask, token_type_ids)
    if pad:
        input_ids = jnp.concatenate(
            [input_ids, jnp.full((pad, S), cfg.pad_token_id, input_ids.dtype)])
        attention_mask = jnp.concatenate(
            [attention_mask, jnp.zeros((pad, S), attention_mask.dtype)])
        if token_type_ids is not None:
            token_type_ids = jnp.concatenate(
                [token_type_ids, jnp.zeros((pad, S), token_type_ids.dtype)])
    out = encode_packed_n(params, cfg, input_ids, attention_mask,
                          token_type_ids, n=n)
    return out[:B] if pad else out


def _encode_core(params: dict, cfg: BertConfig, input_ids: jnp.ndarray,
                 positions: Optional[jnp.ndarray],
                 token_type_ids: Optional[jnp.ndarray],
                 bias: jnp.ndarray, rope_positions: jnp.ndarray) -> jnp.ndarray:
    emb = params["embeddings"]
    x = jnp.take(emb["word"], input_ids, axis=0)
    if positions is not None:
        x = x + jnp.take(emb["position"], positions, axis=0)

    if emb.get("token_type") is not None:
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + jnp.take(emb["token_type"], token_type_ids, axis=0)

    x = layer_norm(x, emb["norm"]["weight"], emb["norm"]["bias"], cfg.layer_norm_eps)

    act = get_activation(cfg.activation)
    H = cfg.num_heads
    rotary = cfg.rotary_emb_base > 0
    if rotary:
        from ..ops.rope import apply_rope
        rope_cos = params["rope_cos"]
        rope_sin = params["rope_sin"]

    # NOTE on fused QKV: the reference fuses q/k/v into one GEMM on CPU
    # (cpu/encoder/qkv_projection.rs:12). Measured on TPU (v5e, MiniLM
    # geometry, scripts/encoder_ablation3.py) the fused [H,3H] GEMM is ~5%
    # SLOWER than three separate GEMMs — XLA already schedules the three
    # N=H matmuls back-to-back, and the post-GEMM slicing costs layout
    # copies. Separate projections are the TPU-native choice.
    def layer_fn(h, lp):
        q = h @ lp["q"]["w"]
        k = h @ lp["k"]["w"]
        v = h @ lp["v"]["w"]
        if "b" in lp["q"]:
            q = q + lp["q"]["b"]
            k = k + lp["k"]["b"]
            v = v + lp["v"]["b"]
        q, k, v = split_heads(q, H), split_heads(k, H), split_heads(v, H)
        if rotary:
            q, k = apply_rope(q, k, rope_cos, rope_sin, rope_positions)
        ctx = merge_heads(attention(q, k, v, bias))
        attn_out = ctx @ lp["o"]["w"]
        if "b" in lp["o"]:
            attn_out = attn_out + lp["o"]["b"]
        h = layer_norm(h + attn_out, lp["attn_norm"]["weight"], lp["attn_norm"]["bias"],
                       cfg.layer_norm_eps)
        if cfg.swiglu:
            ffn = (act(h @ lp["gate"]["w"]) * (h @ lp["up"]["w"])) @ lp["fc2"]["w"]
        else:
            ffn = act(h @ lp["fc1"]["w"] + lp["fc1"]["b"]) @ lp["fc2"]["w"] + lp["fc2"]["b"]
        h = layer_norm(h + ffn, lp["ffn_norm"]["weight"], lp["ffn_norm"]["bias"],
                       cfg.layer_norm_eps)
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x


def pooler_forward(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """BERT pooler: tanh(dense(CLS)) (cf. cpu/encoder/pooler.rs:9)."""
    cls = hidden[:, 0, :]
    return jnp.tanh(cls @ params["w"] + params["b"])
