"""Activation functions.

TPU-native rebuild of kjarni-transformers/src/activations.rs:22 — but here each
activation is a pure jnp function that XLA fuses into neighbouring matmuls, so the
reference's "parallel array application" machinery disappears.

The gelu/gelu_new distinction matters for parity (activations.rs:57-62): BERT uses
erf-gelu, GPT-2 uses the tanh approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — HF "gelu".

    bf16 fast path: XLA lowers erf to a long f32 polynomial that costs ~34%
    of MiniLM-encoder throughput on TPU (47k -> 71k sentences/s, measured in
    scripts/encoder_ablation3.py). The tanh approximation differs from exact
    gelu by <5e-4 absolute — below one bf16 ulp over the practical range —
    so on bf16 activations the results agree to within rounding noise
    (verified: max 1-ulp differences only). f32 keeps the exact erf for
    golden parity with the reference (activations.rs:57 gelu_scalar).
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximate GELU — HF "gelu_new"/"gelu_pytorch_tanh" (GPT-2)."""
    return jax.nn.gelu(x, approximate=True)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(x)


ACTIVATIONS = {
    "gelu": gelu,
    "gelu_new": gelu_new,
    "gelu_pytorch_tanh": gelu_new,
    "gelu_fast": gelu_new,
    "relu": relu,
    "silu": silu,
    "swish": silu,
    "tanh": tanh,
}


def get_activation(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation '{name}' (known: {sorted(ACTIVATIONS)})")
