"""Unit tests for core ops — kernel-vs-reference numerics (SURVEY §4 tier 1)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from kjarni_tpu.ops.activations import gelu, gelu_new, silu
from kjarni_tpu.ops.attention import attention, merge_heads, split_heads
from kjarni_tpu.ops.masks import causal_mask, causal_mask_with_offset, padding_bias
from kjarni_tpu.ops.norms import layer_norm, rms_norm
from kjarni_tpu.ops.pooling import PoolingStrategy, mean_pool, pool
from kjarni_tpu.ops.rope import apply_rope, rope_tables
from kjarni_tpu.core.bucketing import batch_bucket, seq_bucket


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestActivations:
    def test_gelu_matches_torch(self):
        x = rand(64)
        np.testing.assert_allclose(
            np.asarray(gelu(jnp.asarray(x))), F.gelu(torch.from_numpy(x)).numpy(),
            atol=1e-6)

    def test_gelu_new_matches_torch_tanh(self):
        x = rand(64, seed=1)
        np.testing.assert_allclose(
            np.asarray(gelu_new(jnp.asarray(x))),
            F.gelu(torch.from_numpy(x), approximate="tanh").numpy(), atol=1e-6)

    def test_silu_matches_torch(self):
        x = rand(64, seed=2)
        np.testing.assert_allclose(
            np.asarray(silu(jnp.asarray(x))), F.silu(torch.from_numpy(x)).numpy(),
            atol=1e-6)


class TestNorms:
    def test_layer_norm_matches_torch(self):
        x, w, b = rand(4, 32), rand(32, seed=3), rand(32, seed=4)
        expected = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w),
                                torch.from_numpy(b), eps=1e-12).numpy()
        got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_rms_norm_matches_torch(self):
        x, w = rand(4, 32, seed=5), rand(32, seed=6)
        xt = torch.from_numpy(x)
        expected = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
                    * torch.from_numpy(w)).numpy()
        got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestMasks:
    def test_causal(self):
        m = np.asarray(causal_mask(4))
        assert (m[np.triu_indices(4, 1)] < -1e8).all()
        assert (m[np.tril_indices(4)] == 0).all()

    def test_causal_offset_matches_full(self):
        full = np.asarray(causal_mask(8))
        step = np.asarray(causal_mask_with_offset(1, 8, 3))
        np.testing.assert_array_equal(step[0], full[3])

    def test_padding_bias_shape(self):
        mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
        b = np.asarray(padding_bias(mask))
        assert b.shape == (2, 1, 1, 3)
        assert b[0, 0, 0, 2] < -1e8 and b[0, 0, 0, 0] == 0


class TestAttention:
    def test_matches_torch_sdpa(self):
        q, k, v = rand(2, 4, 8, 16, seed=7), rand(2, 4, 8, 16, seed=8), rand(2, 4, 8, 16, seed=9)
        expected = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
        got = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_gqa_matches_repeated_kv(self):
        q = rand(1, 8, 4, 16, seed=10)
        k = rand(1, 2, 4, 16, seed=11)
        v = rand(1, 2, 4, 16, seed=12)
        got = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        k_rep = np.repeat(k, 4, axis=1)
        v_rep = np.repeat(v, 4, axis=1)
        expected = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k_rep), torch.from_numpy(v_rep)).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_causal_bias(self):
        q = rand(1, 1, 4, 8, seed=13)
        k = rand(1, 1, 4, 8, seed=14)
        v = rand(1, 1, 4, 8, seed=15)
        bias = causal_mask(4)[None, None]
        expected = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            is_causal=True).numpy()
        got = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_split_merge_roundtrip(self):
        x = jnp.asarray(rand(2, 5, 32, seed=16))
        assert np.allclose(np.asarray(merge_heads(split_heads(x, 4))), np.asarray(x))


class TestRope:
    def test_matches_torch_llama_convention(self):
        # reference convention: rotate_half with duplicated-freq cos/sin tables
        head_dim, seq = 16, 6
        cos, sin = rope_tables(head_dim, 32, theta=10000.0)
        q = rand(1, 2, seq, head_dim, seed=17)
        k = rand(1, 2, seq, head_dim, seed=18)
        qr, kr = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin, jnp.arange(seq))

        inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2) / head_dim))
        t = np.arange(seq)
        freqs = np.outer(t, inv)
        emb = np.concatenate([freqs, freqs], axis=-1)
        c, s = np.cos(emb), np.sin(emb)

        def rot_half(x):
            h = x.shape[-1] // 2
            return np.concatenate([-x[..., h:], x[..., :h]], axis=-1)

        q_expected = q * c[None, None] + rot_half(q) * s[None, None]
        np.testing.assert_allclose(np.asarray(qr), q_expected.astype(np.float32), atol=1e-5)

    def test_offset_positions(self):
        cos, sin = rope_tables(8, 32)
        q = jnp.asarray(rand(1, 1, 1, 8, seed=19))
        k = q
        q5, _ = apply_rope(q, k, cos, sin, jnp.asarray([5]))
        # rotating a single token at position 5 equals position 5 of a full-seq rotate
        qfull = jnp.broadcast_to(q, (1, 1, 6, 8))
        qf, _ = apply_rope(qfull, qfull, cos, sin, jnp.arange(6))
        np.testing.assert_allclose(np.asarray(q5)[0, 0, 0], np.asarray(qf)[0, 0, 5], atol=1e-6)


class TestPooling:
    def test_mean_pool_ignores_padding(self):
        h = jnp.asarray(rand(2, 4, 8, seed=20))
        mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]])
        got = np.asarray(mean_pool(h, mask))
        expected0 = np.asarray(h)[0, :2].mean(axis=0)
        np.testing.assert_allclose(got[0], expected0, atol=1e-6)

    def test_last_token_pool(self):
        h = jnp.asarray(rand(1, 4, 8, seed=21))
        mask = jnp.asarray([[1, 1, 1, 0]])
        got = np.asarray(pool(PoolingStrategy.LAST, h, mask))
        np.testing.assert_allclose(got[0], np.asarray(h)[0, 2], atol=1e-6)


class TestBucketing:
    def test_seq_bucket(self):
        assert seq_bucket(1) == 8
        assert seq_bucket(9) == 16
        assert seq_bucket(128) == 128
        assert seq_bucket(129) == 256
        assert seq_bucket(300, max_len=256) == 256

    def test_batch_bucket(self):
        assert batch_bucket(3) == 4
        assert batch_bucket(1) == 1
