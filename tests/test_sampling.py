"""Sampling-chain unit tests, mirroring the reference suite (sampling.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kjarni_tpu.generate.sampling import (NEG_INF, SamplingParams,
                                          apply_no_repeat_ngram,
                                          apply_repetition_penalty,
                                          fast_argmax, min_p_filter,
                                          process_logits, sample_token,
                                          top_k_filter, top_p_filter)


def arr(*xs):
    return jnp.asarray(xs, dtype=jnp.float32)


class TestTopK:
    def test_basic(self):
        f = np.asarray(top_k_filter(arr(1.0, 5.0, 3.0, 4.0, 2.0), 3))
        assert np.isfinite(f[[1, 2, 3]]).all()
        assert f[0] <= NEG_INF and f[4] <= NEG_INF

    def test_k_equals_len(self):
        f = np.asarray(top_k_filter(arr(1.0, 2.0, 3.0), 3))
        assert np.isfinite(f).all()

    def test_k_one(self):
        f = np.asarray(top_k_filter(arr(1.0, 5.0, 3.0), 1))
        assert np.isfinite(f[1])
        assert f[0] <= NEG_INF and f[2] <= NEG_INF


class TestTopP:
    def test_keeps_top(self):
        f = np.asarray(top_p_filter(arr(0.0, 1.0, 2.0, 3.0), 0.9))
        assert np.isfinite(f[3])

    def test_p_one_keeps_all(self):
        f = np.asarray(top_p_filter(arr(1.0, 2.0, 3.0, 4.0), 1.0))
        assert np.isfinite(f).all()

    def test_small_p_keeps_dominant(self):
        f = np.asarray(top_p_filter(arr(1.0, 2.0, 10.0), 0.01))
        assert np.isfinite(f[2])
        assert f[0] <= NEG_INF and f[1] <= NEG_INF


class TestMinP:
    def test_drops_low_prob(self):
        f = np.asarray(min_p_filter(arr(0.0, 0.0, 10.0), 0.5))
        assert np.isfinite(f[2])
        assert f[0] <= NEG_INF


class TestRepetitionPenalty:
    def test_positive_logits_divided(self):
        logits = arr(2.0, 4.0, 6.0)
        tokens = jnp.asarray([1], dtype=jnp.int32)
        valid = jnp.asarray([1], dtype=jnp.int32)
        out = np.asarray(apply_repetition_penalty(logits, tokens, valid, 2.0))
        np.testing.assert_allclose(out, [2.0, 2.0, 6.0])

    def test_negative_logits_multiplied(self):
        logits = arr(-2.0, -4.0, 1.0)
        tokens = jnp.asarray([0, 1], dtype=jnp.int32)
        valid = jnp.ones(2, dtype=jnp.int32)
        out = np.asarray(apply_repetition_penalty(logits, tokens, valid, 2.0))
        np.testing.assert_allclose(out, [-4.0, -8.0, 1.0])

    def test_per_occurrence_compounding(self):
        # reference semantics: token seen twice → penalty applied twice
        logits = arr(8.0, 1.0)
        tokens = jnp.asarray([0, 0], dtype=jnp.int32)
        valid = jnp.ones(2, dtype=jnp.int32)
        out = np.asarray(apply_repetition_penalty(logits, tokens, valid, 2.0))
        np.testing.assert_allclose(out, [2.0, 1.0])

    def test_invalid_positions_ignored(self):
        logits = arr(4.0, 4.0)
        tokens = jnp.asarray([0, 1], dtype=jnp.int32)
        valid = jnp.asarray([1, 0], dtype=jnp.int32)
        out = np.asarray(apply_repetition_penalty(logits, tokens, valid, 2.0))
        np.testing.assert_allclose(out, [2.0, 4.0])


class TestNoRepeatNgram:
    def test_trigram_ban(self):
        # history [0,1,2,0,1] with n=3: prefix [0,1] matched at pos 0 → ban 2
        logits = jnp.ones(5)
        tokens = jnp.asarray([0, 1, 2, 0, 1, 0, 0, 0], dtype=jnp.int32)
        out = np.asarray(apply_no_repeat_ngram(logits, tokens, jnp.int32(5), 3))
        assert out[2] <= NEG_INF / 2
        np.testing.assert_allclose(out[[0, 1, 3, 4]], 1.0)

    def test_bigram_ban(self):
        logits = jnp.ones(4)
        tokens = jnp.asarray([0, 1, 0, 0, 0, 0, 0, 0], dtype=jnp.int32)
        out = np.asarray(apply_no_repeat_ngram(logits, tokens, jnp.int32(3), 2))
        assert out[1] <= NEG_INF / 2

    def test_too_short_history(self):
        logits = jnp.ones(3)
        tokens = jnp.asarray([0, 0, 0, 0], dtype=jnp.int32)
        out = np.asarray(apply_no_repeat_ngram(logits, tokens, jnp.int32(1), 3))
        np.testing.assert_allclose(out, 1.0)

    def test_no_repeats(self):
        logits = jnp.ones(4)
        tokens = jnp.asarray([0, 1, 2, 3, 0, 0, 0, 0], dtype=jnp.int32)
        out = np.asarray(apply_no_repeat_ngram(logits, tokens, jnp.int32(4), 3))
        assert np.isfinite(out).all()


class TestFastArgmax:
    """fast_argmax must be bit-identical to jnp.argmax (first-occurrence
    tie-breaking) — it replaces it in the greedy decode hot path."""

    def test_random_vectors_match(self):
        for i in range(8):
            x = jax.random.normal(jax.random.PRNGKey(i), (1031,))
            assert int(fast_argmax(x)) == int(jnp.argmax(x))

    def test_tie_takes_first_occurrence(self):
        x = arr(1.0, 7.0, 3.0, 7.0, 7.0)
        assert int(fast_argmax(x)) == int(jnp.argmax(x)) == 1

    def test_all_equal(self):
        x = jnp.zeros((257,), jnp.float32)
        assert int(fast_argmax(x)) == 0

    def test_all_neg_inf_mask(self):
        # a fully-masked logits row (whisper suppress path worst case)
        x = jnp.full((64,), -jnp.inf, jnp.float32)
        assert int(fast_argmax(x)) == int(jnp.argmax(x)) == 0

    def test_max_at_last_position(self):
        x = jnp.arange(513, dtype=jnp.float32)
        assert int(fast_argmax(x)) == 512

    def test_batched_rows_match(self):
        x = jax.random.normal(jax.random.PRNGKey(7), (6, 257))
        got = fast_argmax(x)
        ref = jnp.argmax(x, axis=-1)
        assert got.shape == (6,)
        assert (got == ref).all()

    def test_under_jit_and_quantized_margins(self):
        # bf16-roundtripped logits produce many exact ties; parity must hold
        f = jax.jit(lambda v: (fast_argmax(v), jnp.argmax(v)))
        for i in range(8):
            x = jax.random.normal(jax.random.PRNGKey(100 + i), (4096,))
            x = x.astype(jnp.bfloat16).astype(jnp.float32)
            a, b = f(x)
            assert int(a) == int(b)


class TestSampleToken:
    def test_greedy_argmax(self):
        tok = sample_token(arr(1.0, 5.0, 3.0, 2.0), jax.random.PRNGKey(0),
                           SamplingParams(), greedy=True)
        assert int(tok) == 1

    def test_topk1_low_temp_deterministic(self):
        sp = SamplingParams(temperature=0.1, top_k=1, top_p=None, min_p=None)
        for i in range(10):
            tok = sample_token(arr(1.0, 2.0, 10.0, 0.5, 0.1),
                               jax.random.PRNGKey(i), sp, greedy=False)
            assert int(tok) == 2

    def test_sample_in_range(self):
        sp = SamplingParams(temperature=1.0, top_k=None, top_p=None, min_p=None)
        for i in range(20):
            tok = sample_token(arr(1.0, 2.0, 3.0), jax.random.PRNGKey(i), sp,
                               greedy=False)
            assert 0 <= int(tok) < 3


class TestProcessLogits:
    def test_noop_when_disabled(self):
        logits = arr(1.0, 2.0, 3.0)
        tokens = jnp.zeros(4, dtype=jnp.int32)
        out = process_logits(logits, tokens, jnp.int32(0), 1.0, 0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(logits))
