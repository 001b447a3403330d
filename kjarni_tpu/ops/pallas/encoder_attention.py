"""Fused encoder self-attention for short sequences (Pallas TPU kernel).

The XLA path materializes f32 score matrices to HBM between the QK^T matmul,
softmax reductions, and the PV matmul — at MiniLM shapes (B=256, H=12, S=64)
that is ~50 MB of f32 per layer making several round trips, a measurable
slice of the encoder's remaining MFU gap. This kernel keeps one batch row's
ENTIRE attention (all heads) in VMEM: scores never touch HBM.

Grid: (B,) — one invocation per batch row; the kernel loops over heads with
scores [S, S] living in registers/VMEM. Only worthwhile for short S (<= ~256)
where H*S*D and S*S tiles fit VMEM; long sequences use flash_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int,
            scale: float):
    """q/k/v_ref: [1, H, S, D]; mask_ref: [1, S] (1 = real token);
    o_ref: [1, H, S, D]."""
    mask = mask_ref[0]  # [S]
    neg = (1.0 - mask.astype(jnp.float32)) * NEG_INF  # [S]

    for h in range(num_heads):  # static unroll: H is small (<= 16)
        q = q_ref[0, h].astype(jnp.float32)  # [S, D]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + neg[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = (ctx / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def encoder_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      mask: jnp.ndarray, *, scale: float | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Bidirectional masked attention: q/k/v [B, H, S, D], mask [B, S]
    (1 = attend, 0 = padding) -> [B, H, S, D]. Fused per batch row."""
    B, H, S, D = q.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(_kernel, num_heads=H, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, S), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)
