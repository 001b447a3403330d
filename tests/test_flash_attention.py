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


class TestCacheOffset:
    """Chunked-prefill form: queries at q_offset over a cache of kv_len
    (VERDICT item 4 — flash for cache-reuse prefills, no [S,T] scores)."""

    def test_offset_matches_reference(self):
        import jax.numpy as jnp
        from kjarni_tpu.ops.masks import NEG_INF
        S, T, off = 128, 384, 200  # queries 200..327 over cache 0..327
        q = jnp.asarray(rand(1, 2, S, 32, seed=30))
        k = jnp.asarray(rand(1, 2, T, 32, seed=31))
        v = jnp.asarray(rand(1, 2, T, 32, seed=32))
        kv_len = off + S
        i = off + np.arange(S)[:, None]
        j = np.arange(T)[None, :]
        bias = np.where((j <= i) & (j < kv_len), 0.0, NEG_INF)
        ref = attention(q, k, v, jnp.asarray(bias)[None, None].astype(jnp.float32))
        got = flash_attention(q, k, v, causal=True, q_offset=jnp.int32(off),
                              kv_len=jnp.int32(kv_len), block_q=64,
                              block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_kv_len_masks_garbage_tail(self):
        import jax.numpy as jnp
        S, T, off = 64, 256, 64
        q = jnp.asarray(rand(1, 1, S, 32, seed=33))
        k_clean = rand(1, 1, T, 32, seed=34)
        v_clean = rand(1, 1, T, 32, seed=35)
        kv_len = off + S
        # poison the tail beyond kv_len: output must not change
        k_dirty = k_clean.copy()
        v_dirty = v_clean.copy()
        k_dirty[:, :, kv_len:] = 1e3
        v_dirty[:, :, kv_len:] = -1e3
        a = flash_attention(jnp.asarray(q), jnp.asarray(k_clean),
                            jnp.asarray(v_clean), causal=True,
                            q_offset=jnp.int32(off), kv_len=jnp.int32(kv_len),
                            block_q=64, block_k=64, interpret=True)
        b = flash_attention(jnp.asarray(q), jnp.asarray(k_dirty),
                            jnp.asarray(v_dirty), causal=True,
                            q_offset=jnp.int32(off), kv_len=jnp.int32(kv_len),
                            block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_offset_zero_equals_plain_causal(self):
        import jax.numpy as jnp
        q = jnp.asarray(rand(1, 2, 128, 32, seed=36))
        k = jnp.asarray(rand(1, 2, 128, 32, seed=37))
        v = jnp.asarray(rand(1, 2, 128, 32, seed=38))
        plain = flash_attention(q, k, v, causal=True, interpret=True)
        off = flash_attention(q, k, v, causal=True, q_offset=jnp.int32(0),
                              kv_len=jnp.int32(128), interpret=True)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(off),
                                   atol=1e-6)

    def test_offset_with_window(self):
        import jax.numpy as jnp
        from kjarni_tpu.ops.masks import NEG_INF
        S, T, off, window = 128, 256, 100, 48
        q = jnp.asarray(rand(1, 1, S, 32, seed=39))
        k = jnp.asarray(rand(1, 1, T, 32, seed=40))
        v = jnp.asarray(rand(1, 1, T, 32, seed=41))
        kv_len = off + S
        i = off + np.arange(S)[:, None]
        j = np.arange(T)[None, :]
        bias = np.where((j <= i) & (j > i - window) & (j < kv_len), 0.0,
                        NEG_INF)
        ref = attention(q, k, v, jnp.asarray(bias)[None, None].astype(jnp.float32))
        got = flash_attention(q, k, v, causal=True, window=window,
                              q_offset=jnp.int32(off), kv_len=jnp.int32(kv_len),
                              block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_llama_chunked_prefill_flash_matches_xla(self):
        """Decoder-level: cache-reuse prefill with kv_bucket + flash equals
        the materialized-scores path (interpret mode on CPU)."""
        import jax
        import jax.numpy as jnp
        import kjarni_tpu.ops.pallas.flash_attention as fa
        from kjarni_tpu.models import llama as kllama

        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        from __graft_entry__ import _random_llama
        cfg, params = _random_llama({"num_layers": 2, "max_seq_len": 512})
        params = jax.tree.map(jnp.asarray, params)

        orig = fa.flash_attention
        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)
        fa.flash_attention = interp
        try:
            ids1 = jnp.asarray(np.random.default_rng(0).integers(
                0, cfg.vocab_size, (1, 128)), jnp.int32)
            ids2 = jnp.asarray(np.random.default_rng(1).integers(
                0, cfg.vocab_size, (1, 128)), jnp.int32)
            # turn 1 prefill (fills cache 0..128), then turn-2 suffix at 128
            ck, cv = kllama.init_cache(cfg, 1, 512)
            _, ck, cv = kllama.forward(params, cfg, ids1, ck, cv, 0)
            lg_ref, ck_r, cv_r = kllama.forward(params, cfg, ids2, ck, cv,
                                                jnp.int32(128))
            ck2, cv2 = kllama.init_cache(cfg, 1, 512)
            _, ck2, cv2 = kllama.forward(params, cfg, ids1, ck2, cv2, 0)
            lg_fl, ck_f, cv_f = kllama.forward(params, cfg, ids2, ck2, cv2,
                                               jnp.int32(128), use_flash=True,
                                               kv_bucket=256)
            np.testing.assert_allclose(np.asarray(lg_fl), np.asarray(lg_ref),
                                       atol=3e-4, rtol=1e-3)
        finally:
            fa.flash_attention = orig


class TestBlockAutotune:
    """Measured block-size table (VERDICT r2 item 6)."""

    def test_table_points(self):
        from kjarni_tpu.ops.pallas.flash_attention import pick_blocks
        # llama-1B reuse shape: the measured 1.6x winner
        assert pick_blocks(512, 4096, 64) == (256, 512)
        # small shapes keep the conservative defaults
        assert pick_blocks(64, 256, 64) == (128, 128)
        # mid shapes stay within the measured-safe hull
        assert pick_blocks(512, 1024, 64) == (256, 256)
        # the compile-pathological 512/1024 config is never emitted
        for s in (128, 512, 2048, 8192):
            for t in (128, 512, 4096, 16384):
                bq, bk = pick_blocks(s, t, 64)
                assert (bq, bk) != (512, 1024)
                assert bq <= 256 and bk <= 512

    def test_autotuned_blocks_match_reference(self):
        """Auto-picked 256-class blocks must be numerically identical to the
        explicit 128/128 kernel (interpret mode)."""
        from kjarni_tpu.ops.pallas.flash_attention import flash_attention
        rng = np.random.default_rng(9)
        q = jnp.asarray(rng.standard_normal((1, 4, 256, 32)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 2, 640, 32)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 2, 640, 32)), jnp.float32)
        ref = flash_attention(q, k, v, causal=True, q_offset=384, kv_len=640,
                              block_q=128, block_k=128, interpret=True)
        got = flash_attention(q, k, v, causal=True, q_offset=384, kv_len=640,
                              interpret=True)   # table: (256, 256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
