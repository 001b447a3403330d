"""On-device sampling: greedy / top-k / top-p / min-p, penalties, n-gram blocking.

Rebuild of kjarni-transformers/src/common/sampling.rs. The reference mutates an
f32 logits vector on the host per token; here the whole chain — repetition
penalty over the generated-token history, no-repeat-ngram blocking, filtering,
softmax sampling — is a jittable function over a FIXED-capacity token buffer, so
it fuses into the decode step and never leaves the device (SURVEY §7 "penalty
ops on dynamic history ... fixed-capacity token buffer with masks").

Semantics notes (matched to the reference, which differs from HF in one spot):
sampling.rs:8 applies the penalty once per *occurrence*, compounding for
repeated tokens — we reproduce that via penalty**count.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Cf. common/mod.rs:19 (defaults match)."""

    temperature: float = 0.7
    top_k: Optional[int] = 50
    top_p: Optional[float] = 0.9
    min_p: Optional[float] = 0.1


@dataclasses.dataclass(frozen=True)
class BeamSearchParams:
    """Cf. common/mod.rs:39."""

    num_beams: int = 4
    length_penalty: float = 1.0
    early_stopping: bool = True


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Cf. common/mod.rs:68 GenerationConfig (defaults match)."""

    max_new_tokens: Optional[int] = 50
    max_length: int = 100
    min_length: int = 0
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    add_bos_token: bool = True
    strategy: str = "sample"  # "greedy" | "sample" | "beam"
    sampling: SamplingParams = SamplingParams()
    beam: BeamSearchParams = BeamSearchParams()
    seed: Optional[int] = None

    @staticmethod
    def greedy(**kw) -> "GenerationConfig":
        return GenerationConfig(strategy="greedy", **kw)


def apply_repetition_penalty(logits: jnp.ndarray, tokens: jnp.ndarray,
                             valid: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """logits [V]; tokens [T] history buffer; valid [T] 0/1 mask.

    Matches sampling.rs:8: per-occurrence compounding, sign-dependent
    divide/multiply.
    """
    V = logits.shape[-1]
    counts = jnp.zeros(V, dtype=jnp.float32).at[tokens].add(
        valid.astype(jnp.float32), mode="drop")
    factor = jnp.power(penalty, counts)
    return jnp.where(logits < 0, logits * factor, logits / factor)


def apply_no_repeat_ngram(logits: jnp.ndarray, tokens: jnp.ndarray,
                          length: jnp.ndarray, ngram_size: int) -> jnp.ndarray:
    """Ban tokens that would complete a repeated n-gram (sampling.rs:32).

    tokens: [T] fixed buffer holding `length` generated tokens. The current
    prefix is the last n-1 valid tokens; every historical window matching that
    prefix bans its completing token.
    """
    n = ngram_size
    T = tokens.shape[0]
    if n <= 1 or T < n:
        return logits
    # prefix: tokens[length-(n-1) .. length)
    prefix_idx = length - (n - 1) + jnp.arange(n - 1)
    prefix = tokens[jnp.clip(prefix_idx, 0, T - 1)]
    # all windows of size n-1 starting at i in [0, T-n]
    starts = jnp.arange(T - n + 1)
    win_idx = starts[:, None] + jnp.arange(n - 1)[None, :]
    windows = tokens[win_idx]  # [T-n+1, n-1]
    match = jnp.all(windows == prefix[None, :], axis=1)
    # window must lie fully within history: i + n <= length, and history must
    # be long enough to have a prefix at all
    valid = (starts + n <= length) & (length >= n - 1)
    banned = tokens[starts + n - 1]
    delta = jnp.zeros_like(logits).at[banned].add(
        jnp.where(match & valid, NEG_INF, 0.0), mode="drop")
    return logits + delta


def fast_argmax(logits: jnp.ndarray) -> jnp.ndarray:
    """First-occurrence argmax over the last axis as two plain reductions.

    XLA lowers jnp.argmax to a variadic (value, index)-pair reduction that
    vectorizes poorly on the TPU VPU — the round-5 decode ablation priced it
    at ~0.098 ms/tok over the 128k llama vocab (5% of the 1B int8 step), and
    scripts/argmax_bench.py measured this formulation at 104.6 µs vs
    jnp.argmax's 130.4 µs on-chip (1.25x, BASELINE.md round 5). The same
    result is two trivially-vectorizable reductions: a plain max, then a
    plain int32 min over the indices that achieve it. Tie-breaking matches
    jnp.argmax exactly (lowest index wins), so greedy decode output is
    bit-identical (tests/test_sampling.py::TestFastArgmax).

    Accepts [..., V]; reduces the last axis. Requires NaN-free logits
    (decode logits are finite or NEG_INF/-inf masks); the jnp.minimum guard
    keeps the result in-range even if that is violated.
    """
    v = logits.shape[-1]
    m = jnp.max(logits, axis=-1, keepdims=True)
    idx = jnp.where(logits == m, jnp.arange(v, dtype=jnp.int32),
                    jnp.int32(v))
    return jnp.minimum(jnp.min(idx, axis=-1), v - 1).astype(jnp.int32)


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep top-k logits, NEG_INF the rest (sampling.rs:145)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals = jax.lax.top_k(logits, k)[0]
    cutoff = vals[..., -1]
    return jnp.where(logits >= cutoff, logits, NEG_INF)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (sampling.rs:154): keep the smallest prefix of the
    sorted distribution with cumulative prob > p (the boundary token that
    crosses p is kept)."""
    sorted_logits = jnp.sort(logits)[::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs)
    # keep while cumulative prob up to and including this token hasn't yet
    # exceeded p, plus the first token that crosses it
    keep_sorted = (cum - probs) <= p  # prob mass before this token <= p
    # find the logit cutoff: smallest kept logit
    cutoff = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf))
    return jnp.where(logits >= cutoff, logits, NEG_INF)


def min_p_filter(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """Drop tokens with prob < min_p * max_prob (sampling.rs:131)."""
    probs = jax.nn.softmax(logits)
    cutoff = jnp.max(probs) * min_p
    return jnp.where(probs >= cutoff, logits, NEG_INF)


def sample_token(logits: jnp.ndarray, rng: jax.Array, params: SamplingParams,
                 greedy: bool) -> jnp.ndarray:
    """Full sampling chain (sampling.rs:81 sample_token). logits: [V]."""
    if greedy:
        return fast_argmax(logits)
    if params.top_k is not None:
        logits = top_k_filter(logits, params.top_k)
    if params.top_p is not None:
        logits = top_p_filter(logits, params.top_p)
    if params.min_p is not None:
        logits = min_p_filter(logits, params.min_p)
    temp = 1.0 if params.temperature < 1e-5 else params.temperature
    logits = logits / temp
    return jax.random.categorical(rng, logits).astype(jnp.int32)


def process_logits(logits: jnp.ndarray, tokens: jnp.ndarray, length: jnp.ndarray,
                   cfg_penalty: float, ngram_size: int) -> jnp.ndarray:
    """Penalty + ngram chain applied before sampling (generator.rs:330-376)."""
    if cfg_penalty != 1.0:
        valid = jnp.arange(tokens.shape[0]) < length
        logits = apply_repetition_penalty(logits, tokens, valid, cfg_penalty)
    if ngram_size > 0:
        logits = apply_no_repeat_ngram(logits, tokens, length, ngram_size)
    return logits
