"""core/kvcache.py working-slice helpers: plain arrays and the quantized
dict cache, any position axis, write-back identity."""

import jax.numpy as jnp
import numpy as np

from kjarni_tpu.core.kvcache import slice_working, write_back


def test_plain_array_roundtrip():
    full = jnp.arange(2 * 3 * 4 * 8 * 2, dtype=jnp.float32).reshape(
        2, 3, 4, 8, 2)
    w = slice_working(full, 4, axis=3)
    assert w.shape == (2, 3, 4, 4, 2)
    w = w + 100.0
    out = write_back(full, w)
    np.testing.assert_array_equal(np.asarray(out[..., :4, :]),
                                  np.asarray(full[..., :4, :]) + 100.0)
    np.testing.assert_array_equal(np.asarray(out[..., 4:, :]),
                                  np.asarray(full[..., 4:, :]))


def test_quantized_dict_cache():
    full = {"q": jnp.zeros((2, 1, 3, 8, 4), jnp.int8),
            "s": jnp.ones((2, 1, 3, 8), jnp.float32)}
    w = slice_working(full, 2, axis=3)
    assert w["q"].shape == (2, 1, 3, 2, 4)
    assert w["s"].shape == (2, 1, 3, 2)
    w = {"q": w["q"] + 1, "s": w["s"] * 2}
    out = write_back(full, w)
    assert int(out["q"][0, 0, 0, 0, 0]) == 1
    assert int(out["q"][0, 0, 0, 5, 0]) == 0
    assert float(out["s"][0, 0, 0, 1]) == 2.0
    assert float(out["s"][0, 0, 0, 7]) == 1.0


def test_tuple_of_caches():
    ck = jnp.zeros((1, 1, 2, 6, 2))
    cv = jnp.ones((1, 1, 2, 6, 2))
    wk, wv = slice_working((ck, cv), 3, axis=3)
    assert wk.shape[3] == 3 and wv.shape[3] == 3
    ok, ov = write_back((ck, cv), (wk + 5, wv))
    assert float(ok[0, 0, 0, 0, 0]) == 5.0
    assert float(ok[0, 0, 0, 4, 0]) == 0.0
