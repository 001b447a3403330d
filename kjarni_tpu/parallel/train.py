"""Sharded training step (causal-LM fine-tuning) over the mesh.

The reference is inference-only; this module exists so the TPU rebuild scales
past it: a jittable loss + SGD step over the same stacked llama params, ready
to pjit over a ("dp", "tp") mesh. Gradients of the tensor-parallel matmuls
produce the textbook Megatron collectives (psum over "tp"), inserted by GSPMD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import llama as kllama


def causal_lm_loss(params: dict, cfg: kllama.DecoderConfig, ids: jnp.ndarray,
                   labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Next-token cross-entropy. ids/labels/mask: [B, S]."""
    B, S = ids.shape
    ck, cv = kllama.init_cache(cfg, B, S, dtype=params["embed"].dtype)
    logits, _, _ = kllama.forward_all_logits(params, cfg, ids, ck, cv, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def sgd_train_step(params: dict, cfg: kllama.DecoderConfig, ids: jnp.ndarray,
                   labels: jnp.ndarray, mask: jnp.ndarray,
                   lr: float = 1e-3) -> tuple[dict, jnp.ndarray]:
    """One SGD step; jit this with sharded params/batch for dp+tp execution."""
    loss, grads = jax.value_and_grad(causal_lm_loss)(params, cfg, ids, labels, mask)
    new_params = jax.tree.map(
        lambda p, g: p - lr * g.astype(p.dtype) if jnp.issubdtype(
            p.dtype, jnp.floating) else p,
        params, grads)
    return new_params, loss
