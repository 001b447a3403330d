"""Fused flash attention (Pallas TPU kernel).

The reference's attention materializes full [S, T] score matrices
(cpu/encoder/encoder_self_attention.rs, gpu_ops/blocks/attention/*). On TPU,
long sequences make that HBM-bound; this kernel streams K/V blocks through
VMEM with an online softmax so scores never hit HBM (SURVEY §5.7: "blockwise/
flash attention in Pallas is needed for parity throughput").

Canonical TPU layout: sequential grid (batch*kv_heads, q_blocks, k_blocks)
with the running max/sum/accumulator living in VMEM scratch across the k
dimension; @pl.when(k==0) initializes, @pl.when(k==last) writes the
normalized tile out.

GQA is NATIVE: the G query heads sharing one KV head are folded into the
q-block row dimension ([B, Hkv, G*S_pad, D]), so K/V blocks stream once per
KV head — no repeat_kv materialization (the reference needed an explicit
repeat_kv kernel, gpu_ops/primitives/repeat_kv; round-1's jnp.repeat cost
~2x HBM traffic on 1B-class GQA models).

Cache-offset queries (chunked prefill / prompt caching): `q_offset` places
the query block at absolute positions q_offset..q_offset+S-1 over a K/V
buffer holding positions 0..kv_len — multi-turn prefix-reuse prefills attend
cache+fresh block without materializing [S, T] scores. Both scalars are
DYNAMIC (scalar-prefetch SMEM), so one compiled kernel serves every resume
position; blocks fully outside the causal band or beyond kv_len are skipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def pick_blocks(S: int, T: int, D: int) -> tuple[int, int]:
    """Measured block-size table (VERDICT r2 item 6).

    Seeded from v5e measurements at llama-1B reuse shapes
    (scripts/chunked_prefill_bench.py): 256/512 is 1.6x faster than 128/128
    (44.7 ms vs 71.6 ms at S=512 over T=4096, D=64); 512/1024 is
    COMPILE-PATHOLOGICAL on the remote compiler (>30 min, killed) and must
    never be emitted. Small shapes stay at 128/128 — larger tiles only pay
    when there are enough k-blocks to stream.
    """
    bq = 256 if S >= 256 else DEFAULT_BLOCK_Q
    if T >= 2048:
        bk = 512
    elif T >= 512:
        bk = 256
    else:
        bk = DEFAULT_BLOCK_K
    return bq, bk


def _flash_kernel(info_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, causal: bool, block_q: int, block_k: int,
                  seq_pad: int, window: int | None = None):
    """Rows of q are G groups of seq_pad query positions; block_q divides
    seq_pad, so each q block sits inside one group and its sequence position
    is (row index mod seq_pad)."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    q_offset = info_ref[0]  # absolute position of sequence row 0
    kv_len = info_ref[1]    # valid K/V prefix length

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    blocks_per_seq = seq_pad // block_q
    # absolute position of this q block's first row
    q_start = (qi % blocks_per_seq) * block_q + q_offset
    k_start = ki * block_k

    # skip k-blocks beyond the valid prefix; with causal also those strictly
    # above the diagonal band; with a sliding window (Mistral, cpu/decoder
    # SWA) also blocks entirely left of the window
    run = k_start < kv_len
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if window is not None:
        run = jnp.logical_and(run,
                              k_start + block_k - 1 >= q_start - window + 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [BQ, D]
        k = k_ref[0].astype(jnp.float32)  # [BK, D]
        v = v_ref[0].astype(jnp.float32)  # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = k_start + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_q, block_k), 1)
        if causal or window is not None:
            row = q_start + jax.lax.broadcasted_iota(jnp.int32,
                                                     (block_q, block_k), 0)
            if causal:
                s = jnp.where(col <= row, s, NEG_INF)
            if window is not None:
                s = jnp.where(col > row - window, s, NEG_INF)
        # mask padded kv tail
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_prev = m_ref[:, :1]                       # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                      # [BQ, BK]
        correction = jnp.exp(m_prev - m_new)        # [BQ, 1]
        l_new = correction * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "interpret", "window"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = False, scale: float | None = None,
                    window: int | None = None,
                    q_offset=None, kv_len=None,
                    block_q: int | None = None,
                    block_k: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """q [B, H, S, D], k/v [B, Hkv, T, D] -> [B, H, S, D].

    GQA folds query-head groups into the row dimension per KV head — K/V
    stream once per KV head with no materialized repeat. S and T are padded
    to block multiples internally.

    q_offset (dynamic int, default 0): absolute position of q[.., 0, .] over
    the K/V buffer — queries at rows q_offset..q_offset+S-1 attend causally
    over K/V positions 0..kv_len (dynamic int, default T). This is the
    chunked-prefill / cache-resume form: pass the full (or bucket-sliced) KV
    cache and the resume position.
    """
    B, H, S, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    G = H // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    auto_q, auto_k = pick_blocks(S, T, D)
    block_q = min(block_q or auto_q, max(8, S))
    block_k = min(block_k or auto_k, max(8, T))
    S_pad = -(-S // block_q) * block_q
    T_pad = -(-T // block_k) * block_k
    # [B, H, S, D] -> [B, Hkv, G, S_pad, D] -> [B*Hkv, G*S_pad, D]:
    # rows are G contiguous blocks of S_pad query positions per KV head
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))
    qf = qf.reshape(B, Hkv, G, S_pad, D).reshape(B * Hkv, G * S_pad, D)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, T_pad - T), (0, 0))).reshape(
        B * Hkv, T_pad, D)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, T_pad - T), (0, 0))).reshape(
        B * Hkv, T_pad, D)

    info = jnp.stack([
        jnp.asarray(0 if q_offset is None else q_offset, jnp.int32),
        jnp.asarray(T if kv_len is None else kv_len, jnp.int32)])

    grid = (B * Hkv, (G * S_pad) // block_q, T_pad // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale, causal=causal,
                               block_q=block_q, block_k=block_k,
                               seq_pad=S_pad, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j, info: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, info: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, info: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j, info: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, D), jnp.float32),    # output accumulator
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hkv, G * S_pad, D), q.dtype),
        interpret=interpret,
    )(info, qf, kf, vf)
    out = out.reshape(B, Hkv, G, S_pad, D).reshape(B, H, S_pad, D)
    return out[:, :, :S, :]
