"""GPT-2 / DistilGPT-2 decoder, TPU-native.

Rebuild of kjarni-models/src/models/gpt2 (config.rs, model.rs, cpu_decoder.rs —
the reference's `AutoregressiveLoop::Legacy` path, model.rs:360). Pre-norm
blocks with learned positions and fused c_attn; HF stores Conv1D weights as
[in, out], which matches our linear convention directly (no transpose).

Shares the prefill/decode cache discipline of models/llama.py so one generator
drives both families.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import gelu_new
from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF
from ..ops.norms import layer_norm
from ..weights.safetensors_loader import ModelWeights


@dataclasses.dataclass(frozen=True)
class Gpt2Config:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    max_seq_len: int
    layer_norm_eps: float = 1e-5
    bos_token_id: Optional[int] = 50256
    eos_token_ids: tuple[int, ...] = (50256,)

    # protocol compatibility with DecoderConfig
    arch: str = "gpt2"

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_hf(cfg: dict) -> "Gpt2Config":
        eos = cfg.get("eos_token_id", 50256)
        return Gpt2Config(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["n_embd"],
            num_layers=cfg["n_layer"],
            num_heads=cfg["n_head"],
            max_seq_len=cfg.get("n_positions", 1024),
            layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            bos_token_id=cfg.get("bos_token_id", 50256),
            eos_token_ids=(int(eos),) if not isinstance(eos, list)
            else tuple(int(e) for e in eos),
        )


def load_params(ws: ModelWeights, cfg: Gpt2Config, dtype=np.float32) -> dict:
    L = cfg.num_layers
    pre = "transformer." if "transformer.wte.weight" in ws else ""

    def g(name):
        return np.asarray(ws.get(pre + name), dtype=np.float32).astype(dtype)

    def stack(fmt):
        return np.stack([g(fmt.format(i)) for i in range(L)])

    embed = g("wte.weight")
    layers = {
        "ln1_w": stack("h.{}.ln_1.weight"), "ln1_b": stack("h.{}.ln_1.bias"),
        "ln2_w": stack("h.{}.ln_2.weight"), "ln2_b": stack("h.{}.ln_2.bias"),
        # Conv1D weights are [in, out] already
        "c_attn_w": stack("h.{}.attn.c_attn.weight"),
        "c_attn_b": stack("h.{}.attn.c_attn.bias"),
        "c_proj_w": stack("h.{}.attn.c_proj.weight"),
        "c_proj_b": stack("h.{}.attn.c_proj.bias"),
        "fc_w": stack("h.{}.mlp.c_fc.weight"), "fc_b": stack("h.{}.mlp.c_fc.bias"),
        "mlp_proj_w": stack("h.{}.mlp.c_proj.weight"),
        "mlp_proj_b": stack("h.{}.mlp.c_proj.bias"),
    }
    return {
        "embed": embed,
        "wpe": g("wpe.weight"),
        "layers": layers,
        "lnf_w": g("ln_f.weight"), "lnf_b": g("ln_f.bias"),
        "lm_head": embed.T,  # GPT-2 ties lm_head to wte
    }


def init_cache(cfg: Gpt2Config, batch: int, max_len: int, dtype=jnp.float32):
    shape = (cfg.num_layers, batch, cfg.num_heads, max_len, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _run_stack(params, cfg: Gpt2Config, ids, cache_k, cache_v, pos_start,
               use_flash: bool = False, positions=None, pad_mask=None,
               kv_bucket=None):
    # kv_bucket is accepted for forward-signature parity with llama; the
    # fill-proportional decode mechanism slices the WORKING cache in
    # decoder_lm instead (see llama._run_stack note)
    """Embed -> scanned layer stack -> final norm.

    Mirrors llama._run_stack's batched-generation contract: `positions` [B, S]
    carries per-row absolute positions under LEFT padding (cache slots stay
    shared), `pad_mask` [B, T] marks real kv slots. `use_flash` is accepted
    for signature parity with DecoderLM._batch_fns but ignored — the flash
    prefill path is gated to the llama family (decoder_lm.py _flash_ok).
    """
    del use_flash
    B, S = ids.shape
    T = cache_k.shape[3]
    H, D = cfg.num_heads, cfg.head_dim
    slot_q = pos_start + jnp.arange(S)
    if positions is None:
        positions = slot_q  # [S], shared across rows
    pos_emb = jnp.take(params["wpe"], positions, axis=0)
    if pos_emb.ndim == 2:
        pos_emb = pos_emb[None]
    x = jnp.take(params["embed"], ids, axis=0) + pos_emb
    qi = slot_q[:, None]
    kj = jnp.arange(T)[None, :]
    bias = jnp.where(kj <= qi, 0.0, NEG_INF)[None, None, :, :]
    if pad_mask is not None:
        bias = bias + jnp.where(pad_mask.astype(bool), 0.0,
                                NEG_INF)[:, None, None, :]

    def layer_fn(h, xs):
        lp, kc, vc = xs
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        qkv = hn @ lp["c_attn_w"] + lp["c_attn_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, pos_start, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, pos_start, 0))
        ctx = merge_heads(attention(q, kc, vc, bias))
        h = h + ctx @ lp["c_proj_w"] + lp["c_proj_b"]
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        ffn = gelu_new(hn @ lp["fc_w"] + lp["fc_b"]) @ lp["mlp_proj_w"] + lp["mlp_proj_b"]
        return h + ffn, (kc, vc)

    x, (cache_k, cache_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache_k, cache_v))
    x = layer_norm(x, params["lnf_w"], params["lnf_b"], cfg.layer_norm_eps)
    return x, cache_k, cache_v


def forward(params, cfg: Gpt2Config, ids, cache_k, cache_v, pos_start,
            last_idx=None, use_flash: bool = False, positions=None,
            pad_mask=None, kv_bucket=None):
    x, cache_k, cache_v = _run_stack(params, cfg, ids, cache_k, cache_v,
                                     pos_start, use_flash, positions, pad_mask,
                                     kv_bucket)
    if last_idx is None:
        last_idx = ids.shape[1] - 1
    last = jax.lax.dynamic_index_in_dim(x, last_idx, axis=1, keepdims=False)
    return last @ params["lm_head"], cache_k, cache_v


def forward_all_logits(params, cfg: Gpt2Config, ids, cache_k, cache_v, pos_start):
    x, cache_k, cache_v = _run_stack(params, cfg, ids, cache_k, cache_v, pos_start)
    return x @ params["lm_head"], cache_k, cache_v


def forward_hidden(params, cfg: Gpt2Config, ids, cache_k, cache_v, pos_start,
                   use_flash: bool = False, positions=None, pad_mask=None,
                   kv_bucket=None):
    """Stack without the lm-head (cf. llama.forward_hidden)."""
    return _run_stack(params, cfg, ids, cache_k, cache_v, pos_start,
                      use_flash, positions, pad_mask, kv_bucket)


def head_logits(params, cfg: Gpt2Config, x):
    """lm-head projection over pre-gathered hidden rows."""
    return x @ params["lm_head"]
