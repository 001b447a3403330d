"""Sequence parallelism (sp): Ulysses-style long-context prefill.

The reference has no long-context scaling story beyond RoPE scaling (SURVEY
§5.7). On TPU, a prompt too long for one chip's activation memory shards the
SEQUENCE axis across the mesh: elementwise/MLP work runs S-sharded, and for
attention the layout switches to HEAD-sharded (each device holds full
sequences for a subset of heads) — the DeepSpeed-Ulysses pattern. With
`jax.lax.with_sharding_constraint` the layout switches are declared, and
GSPMD inserts the all-to-alls over ICI; no hand-written collectives.

Cache-free full-sequence forward (scoring / prefill). Validated for
equivalence against the single-device forward in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import DecoderConfig
from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope


def make_sp_mesh(n_devices: int) -> Mesh:
    devices = jax.devices()[:n_devices]
    return Mesh(np.asarray(devices), ("sp",))


def sequence_parallel_forward(params: dict, cfg: DecoderConfig,
                              ids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """[B, S] ids -> [B, S, V] logits with activations sharded along S.

    S must divide the sp size; heads must divide it too (the attention
    interchange shards heads instead of sequence).
    """
    sp = mesh.shape["sp"]
    B, S = ids.shape
    if S % sp or cfg.num_heads % sp or cfg.num_kv_heads % sp:
        raise ValueError(
            f"S ({S}), heads ({cfg.num_heads}) and kv heads "
            f"({cfg.num_kv_heads}) must divide sp ({sp})")

    seq_sharded = NamedSharding(mesh, P(None, "sp", None))       # [B, S, H]
    head_sharded = NamedSharding(mesh, P(None, "sp", None, None))  # [B, H, S, D]
    csc = jax.lax.with_sharding_constraint

    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    bias = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, NEG_INF
    )[None, None]
    if cfg.sliding_window:
        i = jnp.arange(S)[:, None]
        j = jnp.arange(S)[None, :]
        bias = jnp.where(j > i - cfg.sliding_window, bias, NEG_INF)

    def fwd(params, ids):
        cos = params["rope_cos"][:S].astype(jnp.float32)
        sin = params["rope_sin"][:S].astype(jnp.float32)
        x = jnp.take(params["embed"], ids, axis=0)
        x = csc(x, seq_sharded)

        def layer_fn(h, lp):
            hn = rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
            q = hn @ lp["q"]["w"]
            k = hn @ lp["k"]["w"]
            v = hn @ lp["v"]["w"]
            if "b" in lp["q"]:
                q = q + lp["q"]["b"]
                k = k + lp["k"]["b"]
                v = v + lp["v"]["b"]
            q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
            k = k.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
            v = v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
            # Ulysses interchange: S-sharded -> head-sharded (all-to-all)
            q = csc(q, head_sharded)
            k = csc(k, head_sharded)
            v = csc(v, head_sharded)
            q, k = apply_rope(q, k, cos, sin, jnp.arange(S))
            ctx = attention(q, k, v, bias)
            # back to S-sharded for the row-parallel projection + MLP
            ctx = csc(ctx, head_sharded)
            h = h + csc(merge_heads(ctx) @ lp["o"]["w"], seq_sharded)
            hn = rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
            ffn = (jax.nn.silu(hn @ lp["gate"]["w"]) * (hn @ lp["up"]["w"])) \
                @ lp["down"]["w"]
            return csc(h + ffn, seq_sharded), None

        x, _ = jax.lax.scan(layer_fn, x, params["layers"])
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return csc(x @ params["lm_head"], seq_sharded)

    with mesh:
        return jax.jit(fwd)(params, ids)
