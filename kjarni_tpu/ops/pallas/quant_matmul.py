"""Weight-only int8 matmul — the XLA convert-fused path.

TPU-native analogue of the reference's quantized matvec kernels
(cpu/kernels/x86/q8_0.rs:7 matmul_vec_q8_0_avx2 and friends): weights live in
HBM as int8 + per-output-channel scales (half the bytes of bf16). For
HBM-bandwidth-bound decode, halving weight bytes is a direct ~2x speedup.

DESIGN DECISION (round 2): the production path is `int8_matmul_xla` — XLA
fuses the int8->bf16 convert into the matmul operand load and reaches full
HBM bandwidth (measured 755 GB/s on v5e vs 742 GB/s for plain bf16 weights =
1.99x effective bytes). A hand-written Pallas kernel (round 1) reached only
~410 GB/s: its VMEM dequant-convert did not pipeline ahead of the MXU well
enough, and a bandwidth-bound op cannot beat a compiler path already at the
HBM roofline. Per the beat-or-delete rule it was deleted; models use the XLA
path via models/llama.py::_mm. (Pallas remains the right tool where XLA
CAN'T fuse — see ops/pallas/flash_attention.py.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quantize_weights_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """w [K, N] float -> (int8 [K, N], scales [N]) with per-channel absmax."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.maximum(np.abs(w).max(axis=0), 1e-8)
    scales = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scales[None, :]), -127, 127).astype(np.int8)
    return q, scales


def int8_matmul_reference(x: jnp.ndarray, w_q: jnp.ndarray,
                          scales: jnp.ndarray) -> jnp.ndarray:
    """Dequant-materialized reference (tests): exact same math, worst layout."""
    w = w_q.astype(x.dtype) * scales[None, :].astype(x.dtype)
    return x @ w


def int8_matmul_xla(x: jnp.ndarray, w_q: jnp.ndarray,
                    scales: jnp.ndarray) -> jnp.ndarray:
    """PRODUCTION int8 weight-only matmul: convert fused into the operand
    load, per-channel scale applied to the (small) output."""
    return (x @ w_q.astype(x.dtype)) * scales[None, :].astype(x.dtype)


# Back-compat alias: callers that asked for the "kernel" get the fastest path.
int8_matmul = int8_matmul_xla
