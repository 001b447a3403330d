"""Pallas int4 matvec kernel vs reference dequant matmul (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kjarni_tpu.models.llama import _unpack_int4, pack_int4
from kjarni_tpu.ops.pallas.int4_matvec import int4_matvec


def _assert_cos(got, ref, thresh=0.9995):
    g = np.asarray(got, np.float32).ravel()
    r = np.asarray(ref, np.float32).ravel()
    cos = r @ g / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9)
    assert cos > thresh, cos


def make_case(B, K, N, g, seed=0):
    rng = np.random.default_rng(seed)
    w32 = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    G = K // g
    wg = w32.reshape(G, g, N)
    scale = np.abs(wg).max(axis=1) / 7.0
    q = np.clip(np.round(wg / scale[:, None, :]), -8, 7).reshape(K, N)
    w4 = pack_int4(q.astype(np.int8))
    x = rng.standard_normal((B, K)).astype(np.float32)
    # reference: dequant then dot
    deq = (np.asarray(_unpack_int4(jnp.asarray(w4)), np.float32)
           .reshape(G, g, N) * scale[:, None, :]).reshape(K, N)
    return x, w4, scale.astype(np.float32), x @ deq


class TestInt4Matvec:
    @pytest.mark.parametrize("B,K,N,g", [(1, 256, 512, 64), (4, 512, 512, 128),
                                         (8, 256, 1024, 64)])
    def test_matches_reference(self, B, K, N, g):
        x, w4, scale, ref = make_case(B, K, N, g)
        got = int4_matvec(jnp.asarray(x), jnp.asarray(w4), jnp.asarray(scale),
                          block_n=512, interpret=True)
        # the kernel dots in bf16 (MXU full rate; nibbles are bf16-exact but
        # the x operand rounds) — compare at bf16 precision
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)
        _assert_cos(got, ref)

    def test_unaligned_n_padded(self, ):
        x, w4, scale, ref = make_case(2, 256, 384, 64, seed=3)
        got = int4_matvec(jnp.asarray(x), jnp.asarray(w4), jnp.asarray(scale),
                          block_n=256, interpret=True)
        assert got.shape == (2, 384)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)
        _assert_cos(got, ref)

    def test_bf16_inputs(self):
        x, w4, scale, ref = make_case(1, 256, 512, 128, seed=5)
        got = int4_matvec(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w4),
                          jnp.asarray(scale), block_n=512, interpret=True)
        cos = (ref.ravel() @ np.asarray(got, np.float32).ravel()
               / (np.linalg.norm(ref) *
                  np.linalg.norm(np.asarray(got, np.float32)) + 1e-9))
        assert cos > 0.999
