"""Device mesh + sharding rules for multi-chip execution.

The reference has NO distributed execution (SURVEY.md §2.5 — its parallelism is
rayon threads and WGSL workgroups). On TPU, scale-out is a first-class design
axis: a `jax.sharding.Mesh` with ("dp", "tp") axes, Megatron-style tensor
sharding over the decoder's stacked params, and XLA-inserted collectives over
ICI. jit + NamedSharding does the rest (GSPMD): column-parallel QKV/gate/up,
row-parallel o/down, data-parallel batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, *,
              dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Create a ("dp", "tp") mesh over the first n_devices.

    Defaults put every device on "tp" when undivided; pass dp/tp explicitly for
    mixed data/tensor parallelism.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp ({dp}*{tp}) != n_devices ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def llama_param_sharding(mesh: Mesh, params: Optional[dict] = None) -> dict:
    """NamedSharding pytree matching models/llama.py load_params() structure.

    Megatron layout: QKV/gate/up column-parallel (output dim on "tp"),
    o/down row-parallel (input dim on "tp"), lm_head column-parallel,
    embeddings and norms replicated. Layer axis (leading) is never sharded —
    it is scanned over. Works for the int8-quantized layout too ("scale"
    follows the output dim of column-parallel layers, stays replicated for
    row-parallel ones); pass `params` so a quantized {"w","scale"} lm_head
    gets its dict-form spec.
    """
    # int8 "scale" ([L, out]) follows the sharded output dim on
    # column-parallel layers; on row-parallel layers the output dim is
    # unsharded -> replicated. Packed int4 "w4" ([L, in/2, out]) shards like
    # "w"; its rank-3 group scale falls back to replication (tiny tensors).
    col = {"w": _ns(mesh, None, None, "tp"), "w4": _ns(mesh, None, None, "tp"),
           "scale": _ns(mesh, None, "tp")}
    col_b = {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp"),
             "w4": _ns(mesh, None, None, "tp"), "scale": _ns(mesh, None, "tp")}
    row = {"w": _ns(mesh, None, "tp", None), "w4": _ns(mesh, None, "tp", None),
           "scale": _ns(mesh, None, None)}
    rep1 = _ns(mesh, None)
    rep2 = _ns(mesh, None, None)

    lm_head = _ns(mesh, None, "tp")
    if params is not None and isinstance(params.get("lm_head"), dict):
        lm_head = {"w": _ns(mesh, None, "tp"), "w4": _ns(mesh, None, "tp"),
                   "scale": _ns(mesh, "tp")}

    return {
        "embed": rep2,
        "layers": {
            "q": col_b, "k": col_b, "v": col_b,  # harmless if bias absent
            "o": row,
            "gate": col, "up": col, "down": row,
            "attn_norm": rep2, "ffn_norm": rep2,
        },
        "final_norm": rep1,
        "lm_head": lm_head,
        "rope_cos": rep2,
        "rope_sin": rep2,
    }


def _match_structure(params: dict, shardings: dict, mesh: Mesh):
    """Align the sharding pytree with the actual params pytree.

    Handles optional biases, None leaves, and rank mismatches (a spec written
    for stacked [L, ...] weights falls back to replication for unstacked or
    lower-rank tensors). A dim that does not divide its mesh axis falls back
    to replication for that leaf — GSPMD keeps the math identical either way,
    sharding is purely a layout/performance hint (matters for e.g. tiny test
    vocabularies that don't divide tp).
    """
    rep = NamedSharding(mesh, P())

    def fit(leaf, s):
        if leaf is None or isinstance(s, dict):
            return rep
        ndim = getattr(leaf, "ndim", None)
        # exact rank match required: applying a lower-rank spec to a
        # higher-rank leaf would shard the wrong axes (e.g. the rank-2 int8
        # "scale" spec against a rank-3 int4 group scale)
        if ndim is None or (len(s.spec) != ndim and len(s.spec) > 0):
            return rep
        for dim, ax in zip(leaf.shape, s.spec):
            if ax is None:
                continue
            axes = (ax,) if isinstance(ax, str) else tuple(ax)
            size = int(np.prod([mesh.shape[a] for a in axes]))
            if dim % size:
                return rep
        return s

    def go(p, s):
        if isinstance(p, dict):
            return {k: go(v, s.get(k, rep) if isinstance(s, dict) else rep)
                    for k, v in p.items()}
        return fit(p, s)

    return go(params, shardings)


def shard_llama_params(params: dict, mesh: Mesh) -> dict:
    """Place a llama params pytree onto the mesh with tensor-parallel layout."""
    sh = _match_structure(params, llama_param_sharding(mesh, params), mesh)
    return jax.tree.map(jax.device_put, params, sh)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, S] token batches shard over "dp"."""
    return NamedSharding(mesh, P("dp", None))


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV caches [L, B, Hkv, T, D]: batch on "dp", kv heads on "tp"."""
    return NamedSharding(mesh, P(None, "dp", "tp", None, None))


def shard_cache(cache, mesh: Mesh):
    """Place a KV-cache pytree onto the mesh: batch axis on "dp", kv-head axis
    on "tp" — per leaf, with replication fallback for non-divisible dims.

    Works for plain [L, B, Hkv, T, D] arrays, int8 caches ({"q": [L,B,Hkv,T,D],
    "s": [L,B,Hkv,T]}), and any (k, v) tuple of those.
    """
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)

    def put(x):
        spec = [None] * x.ndim
        if x.ndim >= 4:
            if x.shape[1] % dp == 0:
                spec[1] = "dp"
            if x.shape[2] % tp == 0:
                spec[2] = "tp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, cache)


def encoder_param_sharding(mesh: Mesh) -> dict:
    """Sharding pytree for the BERT encoder (models/bert.py) — tp over heads/ffn."""
    col = {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp")}
    row = {"w": _ns(mesh, None, "tp", None), "b": _ns(mesh, None, None)}
    rep2 = _ns(mesh, None, None)
    norm = {"weight": rep2, "bias": rep2}
    return {
        "embeddings": {"word": rep2, "position": rep2, "token_type": rep2,
                       "norm": norm},
        "layers": {
            "q": col, "k": col, "v": col, "o": row,
            "attn_norm": norm,
            "fc1": col, "fc2": row,
            "ffn_norm": norm,
        },
        "pooler": {"w": rep2, "b": _ns(mesh, None)},
        "rel_bias": rep2,
    }


def t5_param_sharding(mesh: Mesh) -> dict:
    """Sharding pytree for models/t5.py load_params() — Megatron TP on both
    stacks; cross-attention shards like self-attention."""
    col = {"w": _ns(mesh, None, None, "tp")}
    row = {"w": _ns(mesh, None, "tp", None)}
    rep1 = _ns(mesh, None)
    rep2 = _ns(mesh, None, None)
    stack = {
        "q": _ns(mesh, None, None, "tp"), "k": _ns(mesh, None, None, "tp"),
        "v": _ns(mesh, None, None, "tp"), "o": _ns(mesh, None, "tp", None),
        "cross_q": _ns(mesh, None, None, "tp"),
        "cross_k": _ns(mesh, None, None, "tp"),
        "cross_v": _ns(mesh, None, None, "tp"),
        "cross_o": _ns(mesh, None, "tp", None),
        "wi": _ns(mesh, None, None, "tp"),
        "wi0": _ns(mesh, None, None, "tp"),
        "wi1": _ns(mesh, None, None, "tp"),
        "wo": _ns(mesh, None, "tp", None),
        "attn_norm": rep2, "ffn_norm": rep2, "self_norm": rep2,
        "cross_norm": rep2,
    }
    return {
        "shared": rep2, "enc": stack, "dec": stack,
        "enc_rel_bias": rep2, "dec_rel_bias": rep2,
        "enc_final_norm": rep1, "dec_final_norm": rep1,
        "lm_head": _ns(mesh, None, "tp"),
    }


def shard_params_with(params: dict, sharding_tree: dict, mesh: Mesh) -> dict:
    """Generic placement: align + device_put any model family's pytree."""
    sh = _match_structure(params, sharding_tree, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if x is not None else None,
        params, sh, is_leaf=lambda x: x is None or hasattr(x, "shape"))


def _encdec_stack_sharding(mesh: Mesh) -> dict:
    """Shared layout for BART/Whisper-style stacks ({"w","b"} linear dicts)."""
    col = {"w": _ns(mesh, None, None, "tp"), "b": _ns(mesh, None, "tp")}
    row = {"w": _ns(mesh, None, "tp", None), "b": _ns(mesh, None, None)}
    rep2 = _ns(mesh, None, None)
    norm = {"weight": rep2, "bias": rep2}
    return {
        "q": col, "k": col, "v": col, "o": row,
        "cross_q": col, "cross_k": col, "cross_v": col, "cross_o": row,
        "fc1": col, "fc2": row,
        "attn_norm": norm, "ffn_norm": norm, "self_norm": norm,
        "cross_norm": norm,
    }


def bart_param_sharding(mesh: Mesh) -> dict:
    """Sharding pytree for models/bart.py load_params()."""
    rep1 = _ns(mesh, None)
    rep2 = _ns(mesh, None, None)
    norm = {"weight": rep1, "bias": rep1}
    stack = _encdec_stack_sharding(mesh)
    return {
        "shared": rep2, "enc_pos": rep2, "dec_pos": rep2,
        "enc_emb_norm": norm, "dec_emb_norm": norm,
        "enc": stack, "dec": stack,
        "lm_head": _ns(mesh, None, "tp"),
        "final_logits_bias": _ns(mesh, "tp"),
    }


def whisper_param_sharding(mesh: Mesh) -> dict:
    """Sharding pytree for models/whisper.py load_params()."""
    rep1 = _ns(mesh, None)
    rep2 = _ns(mesh, None, None)
    norm = {"weight": rep1, "bias": rep1}
    stack = _encdec_stack_sharding(mesh)
    return {
        "conv1_w": _ns(mesh, None, None, None), "conv1_b": rep1,
        "conv2_w": _ns(mesh, None, None, None), "conv2_b": rep1,
        "enc_pos": rep2, "dec_pos": rep2, "embed": rep2,
        "enc": stack, "dec": stack,
        "enc_final_norm": norm, "dec_final_norm": norm,
        "lm_head": _ns(mesh, None, "tp"),
    }
