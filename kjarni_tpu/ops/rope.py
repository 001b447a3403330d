"""Rotary position embeddings (RoPE) with llama3 frequency scaling.

Rebuild of kjarni-transformers/src/cpu/rope/mod.rs. The reference precomputes
[max_seq, head_dim] cos/sin tables and rotates in-place with AVX2; here the table
is a small device-resident array and the rotation is a fused VPU expression. The
rotate-half convention matches HF/Llama (and the reference's rotate_4d).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.metadata import RopeScaling


def base_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    exponents = np.arange(0, head_dim // 2, dtype=np.float64) * 2.0 / head_dim
    return (1.0 / np.power(theta, exponents)).astype(np.float32)


def llama3_inv_freq(head_dim: int, theta: float, scaling: RopeScaling) -> np.ndarray:
    """Llama-3 frequency scaling (cf. rope/mod.rs:31-64 calculate_inv_freq_llama3)."""
    inv_freq = base_inv_freq(head_dim, theta).astype(np.float64)
    orig = float(scaling.original_max_position_embeddings)
    low_wavelen = orig / scaling.low_freq_factor
    high_wavelen = orig / scaling.high_freq_factor
    wavelen = 2.0 * math.pi / inv_freq
    smooth = (orig / wavelen - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor)
    scaled = np.where(
        wavelen < high_wavelen,
        inv_freq,
        np.where(
            wavelen > low_wavelen,
            inv_freq / scaling.factor,
            inv_freq / ((1.0 - smooth) * scaling.factor + smooth),
        ),
    )
    return scaled.astype(np.float32)


def rope_tables(head_dim: int, max_seq_len: int, theta: float = 10000.0,
                scaling: Optional[RopeScaling] = None,
                dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) tables of shape [max_seq_len, head_dim].

    Layout matches the reference build_cache (rope/mod.rs:100): the half-dim
    frequencies are duplicated into both halves of the last axis, pairing with
    the rotate-half convention below.
    """
    if scaling is not None and scaling.rope_type == "llama3":
        inv = llama3_inv_freq(head_dim, theta, scaling)
    else:
        inv = base_inv_freq(head_dim, theta)
    pos = np.arange(max_seq_len, dtype=np.float32)
    angles = np.outer(pos, inv)  # [S, D/2]
    cos = np.concatenate([np.cos(angles), np.cos(angles)], axis=-1)
    sin = np.concatenate([np.sin(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               positions: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q/k of shape [B, H, S, D] at absolute `positions` [S] or [B, S]."""
    c = jnp.take(cos, positions, axis=0)  # [..., S, D]
    s = jnp.take(sin, positions, axis=0)
    if c.ndim == 2:  # positions shared across batch: [S, D] -> [1, 1, S, D]
        c = c[None, None, :, :]
        s = s[None, None, :, :]
    else:  # per-batch positions: [B, S, D] -> [B, 1, S, D]
        c = c[:, None, :, :]
        s = s[:, None, :, :]
    c = c.astype(q.dtype)
    s = s.astype(q.dtype)
    q_rot = q * c + rotate_half(q) * s
    k_rot = k * c + rotate_half(k) * s
    return q_rot, k_rot
