"""Pallas TPU kernel: decode-time matvec over packed int4 weights.

y = x @ dequant(w4), x [B, K] (B small — the decode step), w4 [K/2, N] int8
holding two nibbles per byte in the models/llama.py HALF-SPLIT layout (low
nibble = original row r, high nibble = row r + K/2), group-wise scales
[G, N] over g = K/G contiguous input rows.

Why a kernel (VERDICT r2 item 4): XLA fuses the int8 convert into a dot's
operand stream (int8 decode hits the HBM roofline) but will NOT fuse the
int4 shift+convert+group-scale chain — it materializes the dequantized
matrix (scripts/int4_formulation_bench.py: 240 us/matvec interleaved,
38.6 us half-split-XLA vs int8's 17.4 at llama-1B gate shape). Here the
dequant happens on VMEM-resident tiles: HBM traffic is the packed bytes
(0.5 B/weight) and nothing else.

Grid (N/bn, G/2): step (n, j) loads w4 rows [j*g, (j+1)*g) x columns
[n*bn, (n+1)*bn) — one tile carries (lo) group j and (hi) group G/2+j —
dequantizes both halves against their scales, and accumulates two
[B, g] @ [g, bn] dots into f32 scratch; the last j writes out.

Reference analogue: the Q4_K AVX2 matvec (cpu/kernels/x86/q4_k.rs:8),
which likewise fuses nibble-unpack + scale into the dot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 512
_MIN_ROWS = 8   # pad B up; Mosaic wants >=8 sublanes


def _kernel(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int32 shifts (Mosaic cannot legalize int8 shli on this toolchain —
    # "failed to legalize operation 'arith.shli'"); bf16 dot operands keep
    # the MXU at full rate (nibble values in [-8, 7] are bf16-exact). The
    # per-element shift/convert chain is the measured bottleneck: ~44 us per
    # 16.8M-weight matvec vs int8's 23.8 — on this VPU the int4 unpack costs
    # more than the HBM bytes it saves (see BASELINE.md int4 memo).
    t = w4_ref[:].astype(jnp.int32)              # [g, bn] packed bytes
    lo = ((t << 28) >> 28).astype(jnp.bfloat16)  # sign-extended low nibble
    hi = (t >> 4).astype(jnp.bfloat16)
    # one grid step = one group per nibble, so the group scale factors OUT
    # of the dot: scale the [B, bn] partial, not the [g, bn] tile — g x less
    # VPU multiply work
    p_lo = jax.lax.dot(x_lo_ref[0].astype(jnp.bfloat16), lo,
                       preferred_element_type=jnp.float32)
    p_hi = jax.lax.dot(x_hi_ref[0].astype(jnp.bfloat16), hi,
                       preferred_element_type=jnp.float32)
    acc_ref[:] += p_lo * s_lo_ref[0] + p_hi * s_hi_ref[0]

    @pl.when(j == nj - 1)
    def _done():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int4_matvec(x: jnp.ndarray, w4: jnp.ndarray, scale: jnp.ndarray, *,
                block_n: int = DEFAULT_BLOCK_N,
                interpret: bool = False) -> jnp.ndarray:
    """x [B, K] @ half-split-packed w4 [K/2, N] (scales [G, N]) -> [B, N].

    Requires an even group count (guaranteed by quantize_params_int4) and
    g % 8 == 0. B is padded to 8 rows internally.
    """
    B, K = x.shape
    K2, N = w4.shape
    G = scale.shape[0]
    assert 2 * K2 == K, (K, K2)
    assert G % 2 == 0, "half-split kernel needs an even group count"
    g = K // G
    G2 = G // 2

    Bp = max(B, _MIN_ROWS)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    bn = min(block_n, N)
    N_out = N
    Np = -(-N // bn) * bn
    if Np != N:
        w4 = jnp.pad(w4, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, ((0, 0), (0, Np - N)))
        N = Np

    # [Bp, G2, g] views of each half: BlockSpec picks group j's rows
    x_lo = x[:, :K2].reshape(Bp, G2, g).swapaxes(0, 1)   # [G2, Bp, g]
    x_hi = x[:, K2:].reshape(Bp, G2, g).swapaxes(0, 1)
    # [G2, 1, N]: 3-D so the block's trailing dims satisfy Mosaic's (8, 128)
    # tiling rule (middle dim 1 == the full array dim)
    s_lo = scale[:G2, None, :].astype(jnp.float32)
    s_hi = scale[G2:, None, :].astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(N // bn, G2),
        in_specs=[
            pl.BlockSpec((1, Bp, g), lambda n, j: (j, 0, 0)),
            pl.BlockSpec((1, Bp, g), lambda n, j: (j, 0, 0)),
            pl.BlockSpec((g, bn), lambda n, j: (j, n)),
            pl.BlockSpec((1, 1, bn), lambda n, j: (j, 0, n)),
            pl.BlockSpec((1, 1, bn), lambda n, j: (j, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, Bp, bn), lambda n, j: (0, 0, n)),
        out_shape=jax.ShapeDtypeStruct((1, Bp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((Bp, bn), jnp.float32)],
        interpret=interpret,
    )(x_lo, x_hi, w4, s_lo, s_hi)
    return out[0, :B, :N_out]
