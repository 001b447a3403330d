"""Attention masks (causal / padding / additive bias).

Rebuild of kjarni-transformers/src/utils/masks.rs:7-163. Masks are additive float
biases (0 for keep, large-negative for drop) so they fuse into the attention
softmax. We use a finite large-negative instead of -inf so fully-masked padding
rows softmax to uniform instead of NaN (same trick as the reference / HF).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9  # finite "minus infinity" that survives bf16 softmax without NaNs


def causal_mask(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """[seq, seq] additive causal bias: 0 on/below diagonal, NEG_INF above."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)


def causal_mask_with_offset(q_len: int, kv_len: int, offset, dtype=jnp.float32) -> jnp.ndarray:
    """[q_len, kv_len] causal bias where query position i sits at offset + i.

    Used by the decode step: a query at absolute position p may attend to kv
    positions <= p. `offset` may be a traced scalar (decode position).
    """
    qi = jnp.arange(q_len)[:, None] + offset
    kj = jnp.arange(kv_len)[None, :]
    return jnp.where(kj <= qi, 0.0, NEG_INF).astype(dtype)


def padding_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[batch, kv] 0/1 mask → [batch, 1, 1, kv] additive bias."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
    return bias[:, None, None, :].astype(dtype)


def combine(*biases: jnp.ndarray | None) -> jnp.ndarray | None:
    """Sum additive biases, broadcasting; None entries are skipped."""
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out
