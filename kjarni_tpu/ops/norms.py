"""LayerNorm and RMSNorm.

Rebuild of kjarni-transformers/src/cpu/normalization/{layer_norm,rms_norm}.rs.
On TPU these are single fused VPU expressions; XLA folds them into surrounding
ops, so there is no hand-written kernel. Statistics are computed in float32
regardless of the activation dtype (matches the reference's f32 accumulators and
HF's mixed-precision convention), then cast back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float = 1e-12) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm (Llama-style): x / rms(x) * w, stats in f32 (cf. rms_norm.rs)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)
