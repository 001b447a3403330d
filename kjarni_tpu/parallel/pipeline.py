"""Pipeline parallelism (pp): GPipe-style staged decoder forward.

The reference has no distributed execution at all (SURVEY §2.5); this is a
TPU-native scale-out axis. The decoder's stacked layer params [L, ...] are
sharded over a "pp" mesh axis on the layer dimension, the batch is split into
microbatches, and activations flow stage-to-stage over ICI with
`jax.lax.ppermute` inside a `shard_map` — the classic GPipe schedule with a
(pp-1)-step fill/drain bubble.

Scope: cache-free forward (scoring / training / prefill-style full-sequence
pass). Each microbatch is a full [b_micro, S] sequence, so attention is
self-contained per microbatch; KV-cache decode does not pipeline well at
B=1 and uses tensor parallelism instead (parallel/mesh.py).

Validated against the single-device forward (tests/test_parallel.py) on the
virtual CPU mesh and exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import DecoderConfig
from ..ops.attention import attention, merge_heads
from ..ops.masks import NEG_INF
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope


def make_pp_mesh(n_devices: int, pp: int, tp: int = 1) -> Mesh:
    """("pp", "tp") mesh: layers staged over pp, heads sharded over tp."""
    devices = jax.devices()[:n_devices]
    if pp * tp != len(devices):
        raise ValueError(f"pp*tp ({pp}*{tp}) != n_devices ({len(devices)})")
    return Mesh(np.asarray(devices).reshape(pp, tp), ("pp", "tp"))


def pp_param_sharding(mesh: Mesh) -> dict:
    """Layer-stacked params shard their leading [L] axis over "pp"; within a
    stage, Megatron tp applies as usual. Embed/head live replicated (they are
    needed by the first/last stage; GSPMD keeps the copy local in practice)."""
    col = {"w": NamedSharding(mesh, P("pp", None, "tp"))}
    col_b = {"w": NamedSharding(mesh, P("pp", None, "tp")),
             "b": NamedSharding(mesh, P("pp", "tp"))}
    row = {"w": NamedSharding(mesh, P("pp", "tp", None))}
    repl = lambda *s: NamedSharding(mesh, P(*s))
    return {
        "embed": repl(None, None),
        "layers": {
            "q": col_b, "k": col_b, "v": col_b, "o": row,
            "gate": col, "up": col, "down": row,
            "attn_norm": repl("pp", None), "ffn_norm": repl("pp", None),
        },
        "final_norm": repl(None),
        "lm_head": repl(None, "tp"),
        "rope_cos": repl(None, None),
        "rope_sin": repl(None, None),
    }


def _layer_stack_local(local_layers: dict, cfg: DecoderConfig, x: jnp.ndarray,
                      cos: jnp.ndarray, sin: jnp.ndarray,
                      bias: jnp.ndarray) -> jnp.ndarray:
    """Run this stage's local layers (cache-free, fresh S x S attention)."""
    B, S, _ = x.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def layer_fn(h, lp):
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_norm_eps)
        q = hn @ lp["q"]["w"]
        k = hn @ lp["k"]["w"]
        v = hn @ lp["v"]["w"]
        if "b" in lp["q"]:
            q = q + lp["q"]["b"]
            k = k + lp["k"]["b"]
            v = v + lp["v"]["b"]
        q = q.reshape(B, S, -1, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, -1, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, -1, D).transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin, jnp.arange(S))
        ctx = merge_heads(attention(q, k, v, bias))
        h = h + ctx @ lp["o"]["w"]
        hn = rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
        ffn = (jax.nn.silu(hn @ lp["gate"]["w"]) * (hn @ lp["up"]["w"])) \
            @ lp["down"]["w"]
        return h + ffn, None

    x, _ = jax.lax.scan(layer_fn, x, local_layers)
    return x


def pipeline_forward(params: dict, cfg: DecoderConfig, ids: jnp.ndarray,
                     mesh: Mesh, n_micro: int) -> jnp.ndarray:
    """GPipe forward: [B, S] ids -> [B, S, V] logits, layers staged over "pp".

    B must divide into n_micro microbatches; n_micro >= pp keeps the bubble
    fraction at (pp-1)/(n_micro+pp-1).
    """
    pp = mesh.shape["pp"]
    B, S = ids.shape
    assert B % n_micro == 0, (B, n_micro)
    b_micro = B // n_micro

    # [n_micro, b_micro, S]
    micro = ids.reshape(n_micro, b_micro, S)

    bias = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, NEG_INF
    )[None, None]
    if cfg.sliding_window:
        i = jnp.arange(S)[:, None]
        j = jnp.arange(S)[None, :]
        bias = jnp.where(j > i - cfg.sliding_window, bias, NEG_INF)

    def stage_fn(layers_local, embed, final_norm, lm_head, cos, sin, micro):
        """Runs on every device; layers_local is this stage's [L/pp] shard."""
        stage = jax.lax.axis_index("pp")
        n_steps = n_micro + pp - 1
        carry = jnp.zeros((b_micro, S, cfg.hidden_size), embed.dtype)
        out = jnp.zeros((n_micro, b_micro, S, embed.shape[0]), embed.dtype)

        def body(t, state):
            carry, out = state
            # stage 0 ingests microbatch t (when one remains); others use the
            # activation received from the previous stage
            mb_idx = jnp.clip(t, 0, n_micro - 1)
            fresh = jnp.take(embed, micro[mb_idx], axis=0)
            x = jnp.where(stage == 0, fresh, carry)
            x = _layer_stack_local(layers_local, cfg, x, cos, sin, bias)

            # last stage finalizes microbatch (t - (pp-1)) when in range
            xn = rms_norm(x, final_norm, cfg.rms_norm_eps)
            logits = xn @ lm_head
            out_idx = jnp.clip(t - (pp - 1), 0, n_micro - 1)
            write = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            out = jax.lax.cond(
                write,
                lambda o: o.at[out_idx].set(logits),
                lambda o: o,
                out)

            # send activations downstream (stage i -> i+1; wraparound output
            # from the last stage is ignored by stage 0, which embeds fresh)
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            carry = jax.lax.ppermute(x, "pp", perm)
            return carry, out

        carry, out = jax.lax.fori_loop(0, n_steps, body, (carry, out))
        # only the last stage holds real logits; broadcast over the pp axis
        out = jnp.where(stage == pp - 1, out, 0.0)
        out = jax.lax.psum(out, "pp")
        return out

    import inspect
    kw = ({"check_vma": False}
          if "check_vma" in inspect.signature(shard_map).parameters
          else {"check_rep": False})
    fn = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P("pp"), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        **kw,
    )
    cos = params["rope_cos"][:S].astype(jnp.float32)
    sin = params["rope_sin"][:S].astype(jnp.float32)
    out = fn(params["layers"], params["embed"], params["final_norm"],
             params["lm_head"], cos, sin, micro)
    return out.reshape(B, S, -1)
