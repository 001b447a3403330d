"""Functional NN building blocks over param dicts.

The reference builds stateful layer objects (LinearLayer linear_layer.rs:33,
Embeddings cpu/embeddings/mod.rs, FeedForward cpu/feedforward/mod.rs). The
TPU-native shape is a params pytree + pure functions: XLA sees one traced graph,
fuses bias adds/activations into the matmuls, and the MXU gets large fused GEMMs
instead of strategy-dispatched microkernels.

Convention: linear weights are stored [in, out] (transposed from torch's
[out, in]) so application is `x @ w + b`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """y = x @ w (+ b). p = {"w": [in, out], optional "b": [out]}."""
    y = x @ p["w"]
    b = p.get("b")
    if b is not None:
        y = y + b
    return y


def linear_params(w_torch: np.ndarray, b: Optional[np.ndarray] = None,
                  dtype=np.float32) -> dict:
    """Build linear params from a torch-layout [out, in] weight."""
    p = {"w": np.ascontiguousarray(np.asarray(w_torch, dtype=dtype).T)}
    if b is not None:
        p["b"] = np.asarray(b, dtype=dtype)
    return p


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)
