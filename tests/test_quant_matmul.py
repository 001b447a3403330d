"""Int8 weight-only matmul (XLA convert-fused production path) vs reference.

Round 2 note: the round-1 hand-written Pallas kernel was deleted per the
beat-or-delete rule — it reached ~410 GB/s vs 755 GB/s for the XLA
convert-fused path, which already sits at the HBM roofline (see
ops/pallas/quant_matmul.py for the full decision record).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kjarni_tpu.ops.pallas.quant_matmul import (int8_matmul, int8_matmul_xla,
                                                int8_matmul_reference,
                                                quantize_weights_int8)


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 32)).astype(np.float32)
        q, s = quantize_weights_int8(w)
        deq = q.astype(np.float32) * s[None, :]
        assert np.abs(deq - w).max() < np.abs(w).max() / 127 + 1e-6

    def test_per_channel_scales(self):
        w = np.ones((4, 3), dtype=np.float32)
        w[:, 1] *= 100
        q, s = quantize_weights_int8(w)
        assert s[1] > s[0]
        assert (np.abs(q) <= 127).all()


class TestInt8Matmul:
    @pytest.mark.parametrize("shape", [(8, 128, 128), (16, 256, 384),
                                       (100, 300, 200), (1, 512, 256)])
    def test_matches_reference(self, shape):
        M, K, N = shape
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        w = rng.standard_normal((K, N)).astype(np.float32)
        q, s = quantize_weights_int8(w)
        ref = np.asarray(int8_matmul_reference(x, jnp.asarray(q), jnp.asarray(s)))
        got = np.asarray(int8_matmul_xla(x, jnp.asarray(q), jnp.asarray(s)))
        np.testing.assert_allclose(got, ref, atol=2e-2 * np.abs(ref).max(),
                                   rtol=2e-2)

    def test_alias_is_xla_path(self):
        assert int8_matmul is int8_matmul_xla

    def test_close_to_full_precision(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((8, 256)).astype(np.float32)
        w = rng.standard_normal((256, 128)).astype(np.float32)
        q, s = quantize_weights_int8(w)
        exact = x @ w
        got = np.asarray(int8_matmul_xla(jnp.asarray(x), jnp.asarray(q),
                                         jnp.asarray(s)))
        # int8 weight-only quantization keeps cosine parity high
        cos = (got.ravel() @ exact.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(exact))
        assert cos > 0.999
