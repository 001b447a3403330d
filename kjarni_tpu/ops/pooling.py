"""Sentence pooling strategies (cf. kjarni-transformers/src/pooling/mod.rs:11-54)."""

from __future__ import annotations

import enum

import jax.numpy as jnp


class PoolingStrategy(str, enum.Enum):
    MEAN = "mean"
    CLS = "cls"
    MAX = "max"
    LAST = "last"


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the sequence axis. hidden: [B, S, H], mask: [B, S]."""
    m = attention_mask.astype(hidden.dtype)[..., None]
    summed = jnp.sum(hidden * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return summed / counts


def cls_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    return hidden[:, 0, :]


def max_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    m = attention_mask.astype(bool)[..., None]
    neg = jnp.full_like(hidden, -1e9)
    return jnp.max(jnp.where(m, hidden, neg), axis=1)


def last_token_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
    idx = jnp.maximum(lengths - 1, 0)
    return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]


def pool(strategy: PoolingStrategy, hidden: jnp.ndarray,
         attention_mask: jnp.ndarray) -> jnp.ndarray:
    if strategy == PoolingStrategy.MEAN:
        return mean_pool(hidden, attention_mask)
    if strategy == PoolingStrategy.CLS:
        return cls_pool(hidden, attention_mask)
    if strategy == PoolingStrategy.MAX:
        return max_pool(hidden, attention_mask)
    if strategy == PoolingStrategy.LAST:
        return last_token_pool(hidden, attention_mask)
    raise ValueError(f"Unknown pooling strategy {strategy}")
