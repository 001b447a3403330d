"""Flash-attention kernel vs XLA reference attention (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kjarni_tpu.ops.attention import attention
from kjarni_tpu.ops.masks import causal_mask
from kjarni_tpu.ops.pallas.flash_attention import flash_attention


def rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestFlashAttention:
    def test_full_attention_matches(self):
        q = jnp.asarray(rand(1, 2, 128, 64, seed=1))
        k = jnp.asarray(rand(1, 2, 128, 64, seed=2))
        v = jnp.asarray(rand(1, 2, 128, 64, seed=3))
        ref = attention(q, k, v)
        got = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_causal_matches(self):
        q = jnp.asarray(rand(1, 2, 128, 32, seed=4))
        k = jnp.asarray(rand(1, 2, 128, 32, seed=5))
        v = jnp.asarray(rand(1, 2, 128, 32, seed=6))
        ref = attention(q, k, v, causal_mask(128)[None, None])
        got = flash_attention(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_multi_block_kv(self):
        q = jnp.asarray(rand(1, 1, 128, 32, seed=7))
        k = jnp.asarray(rand(1, 1, 384, 32, seed=8))
        v = jnp.asarray(rand(1, 1, 384, 32, seed=9))
        ref = attention(q, k, v)
        got = flash_attention(q, k, v, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_unaligned_lengths_padded(self):
        q = jnp.asarray(rand(1, 1, 100, 32, seed=10))
        k = jnp.asarray(rand(1, 1, 200, 32, seed=11))
        v = jnp.asarray(rand(1, 1, 200, 32, seed=12))
        ref = attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_gqa(self):
        q = jnp.asarray(rand(1, 4, 64, 32, seed=13))
        k = jnp.asarray(rand(1, 2, 64, 32, seed=14))
        v = jnp.asarray(rand(1, 2, 64, 32, seed=15))
        ref = attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self):
        import ml_dtypes
        q = jnp.asarray(rand(1, 1, 64, 32, seed=16)).astype(jnp.bfloat16)
        k = jnp.asarray(rand(1, 1, 64, 32, seed=17)).astype(jnp.bfloat16)
        v = jnp.asarray(rand(1, 1, 64, 32, seed=18)).astype(jnp.bfloat16)
        ref = attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                                   np.asarray(ref, dtype=np.float32), atol=3e-2)


class TestSlidingWindow:
    def test_window_matches_masked_reference(self):
        import jax.numpy as jnp
        from kjarni_tpu.ops.masks import NEG_INF
        q = jnp.asarray(rand(1, 2, 256, 32, seed=20))
        k = jnp.asarray(rand(1, 2, 256, 32, seed=21))
        v = jnp.asarray(rand(1, 2, 256, 32, seed=22))
        window = 64
        i = np.arange(256)[:, None]
        j = np.arange(256)[None, :]
        bias = np.where((j <= i) & (j > i - window), 0.0, NEG_INF)
        ref = attention(q, k, v, jnp.asarray(bias)[None, None].astype(jnp.float32))
        got = flash_attention(q, k, v, causal=True, window=window,
                              block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
