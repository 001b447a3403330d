"""Pipeline parallelism (pp): GPipe-style staged decoder forward.

The reference has no distributed execution at all (SURVEY §2.5); this is a
TPU-native scale-out axis. The decoder's stacked layer params [L, ...] are
sharded over a "pp" mesh axis on the layer dimension, the batch is split into
microbatches, and activations flow stage-to-stage over ICI with
`jax.lax.ppermute` inside a `shard_map` — the classic GPipe schedule with a
(pp-1)-step fill/drain bubble.

Two entry points:

  * `pipeline_forward` — cache-free forward (scoring / training /
    prefill-style full-sequence pass). Each microbatch is a full
    [b_micro, S] sequence, so attention is self-contained per microbatch.
  * `pp_generate` — pipelined BATCHED greedy decode with per-stage KV
    caches: pp microbatches round-robin through the stages, each stage
    holding the cache shard for its own layers, and the sampled token's
    embedding wraps from the last stage back to stage 0 over the same
    `ppermute` ring. Steady state keeps every stage busy (one microbatch
    per stage per tick); only the (pp-1)-tick fill/drain is bubble.
    KV-cache decode at B=1 still does not pipeline (token t+1 depends on
    token t) and uses tensor parallelism instead (parallel/mesh.py).

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

from ..generate.sampling import fast_argmax
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


# ---------------------------------------------------------------------------
# Pipelined decode WITH KV caches (GPipe ring decode)
# ---------------------------------------------------------------------------

def _layer_stack_cached(local_layers: dict, cfg: DecoderConfig,
                        x: jnp.ndarray, ck, cv, mb, pos,
                        cos: jnp.ndarray, sin: jnp.ndarray):
    """Run this stage's local layers over x [b, s, hidden], reading/writing
    the microbatch `mb`'s slice of the stage-local caches
    [L_local, m, b, Hkv, T, D] at write frontier `pos` (scalar)."""
    B, S, _ = x.shape
    D = cfg.head_dim
    T = ck.shape[-2]
    positions = pos + jnp.arange(S)

    # causal-over-cache bias: query at absolute position pos+i attends
    # cache positions <= pos+i (prompt + already-written tokens)
    t_idx = jnp.arange(T)[None, :]
    q_idx = positions[:, None]
    bias = jnp.where(t_idx <= q_idx, 0.0, NEG_INF)
    if cfg.sliding_window:
        bias = jnp.where(t_idx > q_idx - cfg.sliding_window, bias, NEG_INF)
    bias = bias[None, None]

    def layer_fn(h, inp):
        lp, ck_l, cv_l = inp                 # ck_l: [m, b, Hkv, T, D]
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
        q, k = apply_rope(q, k, cos, sin, positions)
        ck_mb = jax.lax.dynamic_index_in_dim(ck_l, mb, 0, keepdims=False)
        cv_mb = jax.lax.dynamic_index_in_dim(cv_l, mb, 0, keepdims=False)
        ck_mb = jax.lax.dynamic_update_slice(
            ck_mb, k.astype(ck_mb.dtype), (0, 0, pos, 0))
        cv_mb = jax.lax.dynamic_update_slice(
            cv_mb, v.astype(cv_mb.dtype), (0, 0, pos, 0))
        ctx = merge_heads(attention(q, ck_mb.astype(q.dtype),
                                    cv_mb.astype(q.dtype), bias))
        h = h + ctx @ lp["o"]["w"]
        hn = rms_norm(h, lp["ffn_norm"], cfg.rms_norm_eps)
        ffn = (jax.nn.silu(hn @ lp["gate"]["w"]) * (hn @ lp["up"]["w"])) \
            @ lp["down"]["w"]
        ck_l = jax.lax.dynamic_update_index_in_dim(ck_l, ck_mb, mb, 0)
        cv_l = jax.lax.dynamic_update_index_in_dim(cv_l, cv_mb, mb, 0)
        return h + ffn, (ck_l, cv_l)

    x, (ck, cv) = jax.lax.scan(layer_fn, x, (local_layers, ck, cv))
    return x, ck, cv


def pp_generate(params: dict, cfg: DecoderConfig, ids: jnp.ndarray,
                mesh: Mesh, max_new: int) -> jnp.ndarray:
    """Pipelined batched greedy decode: [B, S] same-length prompts ->
    [B, max_new] generated tokens, layers staged over "pp".

    B splits into exactly pp microbatches (one in flight per stage — the
    zero-steady-state-bubble schedule): at tick d, stage s decodes
    microbatch (d - s) mod pp; the last stage samples, embeds the new token
    (the embedding table is replicated) and `ppermute`s that embedding back
    to stage 0, which feeds it in m ticks later — exactly when that
    microbatch's previous token has cleared the pipe. Stage-local caches
    [L/pp, m, b, Hkv, S+max_new, D] hold each stage's own layers only, so
    cache memory also scales 1/pp per chip.

    Prompts must share one length (pad upstream); greedy argmax sampling
    (cf. reference decoder/generator.rs greedy path); EOS truncation is the
    caller's concern — the full [B, max_new] block is returned.
    """
    pp = mesh.shape["pp"]
    B, S = ids.shape
    m = pp                       # one microbatch per stage
    if B % m:
        raise ValueError(f"batch {B} must divide into pp={pp} microbatches")
    b_micro = B // m
    T = S + max_new
    micro = ids.reshape(m, b_micro, S)
    cos = params["rope_cos"][:T].astype(jnp.float32)
    sin = params["rope_sin"][:T].astype(jnp.float32)
    hid = cfg.hidden_size

    def stage_fn(layers_local, embed, final_norm, lm_head, cos, sin, micro):
        stage = jax.lax.axis_index("pp")
        L_local = jax.tree.leaves(layers_local)[0].shape[0]
        dt = embed.dtype
        ck = jnp.zeros((L_local, m, b_micro, cfg.num_kv_heads, T,
                        cfg.head_dim), dt)
        cv = jnp.zeros_like(ck)
        first_emb = jnp.zeros((m, b_micro, hid), dt)   # token-0 embeddings
        out_toks = jnp.zeros((m, max_new, b_micro), jnp.int32)

        def sample_embed(x_last):
            xn = rms_norm(x_last, final_norm, cfg.rms_norm_eps)
            logits = xn @ lm_head
            tok = fast_argmax(logits)  # [b_micro]
            return tok, jnp.take(embed, tok, axis=0)             # [b, hid]

        # ---- phase A: GPipe prefill, writing prompt KV into the caches ----
        def pre_body(t, state):
            carry, ck, cv, first_emb, out_toks = state
            mb = jnp.clip(t - stage, 0, m - 1)
            valid = jnp.logical_and(t >= stage, t - stage <= m - 1)
            fresh = jnp.take(embed, micro[jnp.clip(t, 0, m - 1)], axis=0)
            x = jnp.where(stage == 0, fresh, carry)

            def proc(op):
                x, ck, cv = op
                return _layer_stack_cached(layers_local, cfg, x, ck, cv,
                                           mb, jnp.int32(0), cos, sin)

            x, ck, cv = jax.lax.cond(
                valid, proc, lambda op: op, (x, ck, cv))

            # last stage samples microbatch (t - (pp-1))'s first token
            tok, emb = sample_embed(x[:, S - 1, :])
            write = jnp.logical_and(stage == pp - 1, valid)
            out_toks = jax.lax.cond(
                write, lambda o: o.at[mb, 0].set(tok), lambda o: o, out_toks)
            first_emb = jax.lax.cond(
                write, lambda f: f.at[mb].set(emb), lambda f: f, first_emb)

            perm = [(i, (i + 1) % pp) for i in range(pp)]
            carry = jax.lax.ppermute(x, "pp", perm)
            return carry, ck, cv, first_emb, out_toks

        carry0 = jnp.zeros((b_micro, S, hid), dt)
        _, ck, cv, first_emb, out_toks = jax.lax.fori_loop(
            0, m + pp - 1, pre_body, (carry0, ck, cv, first_emb, out_toks))

        # hand the stashed first-token embeddings to stage 0
        first_emb = jax.lax.ppermute(first_emb, "pp", [(pp - 1, 0)])

        # ---- phase B: ring decode, one token per microbatch per m ticks ----
        def dec_body(d, state):
            carry, ck, cv, out_toks = state
            mb = jnp.mod(d - stage, m)
            g_in = (d - stage) // m          # generated token being fed
            valid = jnp.logical_and(d >= stage, g_in <= max_new - 2)
            x = carry
            x = jnp.where(jnp.logical_and(stage == 0, d < m),
                          jax.lax.dynamic_index_in_dim(
                              first_emb, mb, 0, keepdims=False), x)
            x = x[:, None, :]                # [b, 1, hid]

            def proc(op):
                x, ck, cv = op
                return _layer_stack_cached(layers_local, cfg, x, ck, cv,
                                           mb, S + g_in, cos, sin)

            x, ck, cv = jax.lax.cond(
                valid, proc, lambda op: op, (x, ck, cv))

            tok, emb = sample_embed(x[:, 0, :])
            write = jnp.logical_and(stage == pp - 1, valid)
            out_toks = jax.lax.cond(
                write,
                lambda o: o.at[mb, jnp.clip(g_in + 1, 0, max_new - 1)].set(tok),
                lambda o: o, out_toks)
            # last stage forwards the NEW token's embedding; inner stages
            # forward their activation
            payload = jnp.where(stage == pp - 1, emb, x[:, 0, :])
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            carry = jax.lax.ppermute(payload, "pp", perm)
            return carry, ck, cv, out_toks

        if max_new > 1:
            # stage pp-1 emits microbatch mb's token j at tick
            # (pp-1) + mb + j*m; the last is mb=m-1, j=max_new-2
            n_ticks = (max_new - 1) * m + pp - 1
            carry0 = jnp.zeros((b_micro, hid), dt)
            _, ck, cv, out_toks = jax.lax.fori_loop(
                0, n_ticks, dec_body, (carry0, ck, cv, out_toks))

        out_toks = jnp.where(stage == pp - 1, out_toks, 0)
        return jax.lax.psum(out_toks, "pp")

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
    out = fn(params["layers"], params["embed"], params["final_norm"],
             params["lm_head"], cos, sin, micro)
    # [m, max_new, b_micro] -> [B, max_new] in original batch order
    return out.transpose(0, 2, 1).reshape(B, max_new)
