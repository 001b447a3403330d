"""Multi-chip inference helpers: data-parallel encoder batches.

SURVEY §2.5/§7: the natural scale-out for embedding/classify/rerank throughput
is data parallelism over ICI — replicate the (small) encoder params, shard the
batch over the "dp" axis, and jit does the rest. One mesh-wide program, no
collectives on the forward path (only the host gather of pooled outputs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import bert as kbert
from ..ops.pooling import mean_pool


def replicate_params(params, mesh: Mesh):
    """Replicate a params pytree across every device of the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, rep) if x is not None else None, params,
        is_leaf=lambda x: x is None or hasattr(x, "shape"))


def dp_batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))


def encode_data_parallel(params, cfg: kbert.BertConfig, mesh: Mesh,
                         ids: np.ndarray, mask: np.ndarray,
                         token_type: Optional[np.ndarray] = None,
                         normalize: bool = True) -> np.ndarray:
    """Mean-pooled embeddings for a batch sharded over the mesh's "dp" axis.

    The batch is padded up to a multiple of the dp size; padding rows are
    dropped from the result.
    """
    dp = mesh.shape.get("dp", 1) * mesh.shape.get("tp", 1)
    n = ids.shape[0]
    pad = (-n) % dp
    if pad:
        ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
        mask_p = np.concatenate([mask,
                                 np.ones((pad, mask.shape[1]), mask.dtype)])
    else:
        mask_p = mask
    if token_type is None:
        token_type = np.zeros_like(ids)
    elif pad:
        token_type = np.concatenate(
            [token_type, np.zeros((pad, ids.shape[1]), token_type.dtype)])

    # flatten every mesh axis onto the batch dimension
    flat = NamedSharding(mesh, P(tuple(mesh.axis_names), None))
    ids_s = jax.device_put(jnp.asarray(ids), flat)
    mask_s = jax.device_put(jnp.asarray(mask_p), flat)
    tt_s = jax.device_put(jnp.asarray(token_type), flat)

    @jax.jit
    def fwd(params, ids, mask, tt):
        hidden = kbert.encode_auto(params, cfg, ids, mask, tt)
        pooled = mean_pool(hidden, mask)
        if normalize:
            norm = jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1,
                                   keepdims=True)
            pooled = pooled / jnp.maximum(norm, 1e-12).astype(pooled.dtype)
        return pooled

    with mesh:
        out = fwd(params, ids_s, mask_s, tt_s)
    return np.asarray(out, dtype=np.float32)[:n]
