"""Working-slice helpers for fixed-shape KV caches.

The decoder layer scan restacks whatever cache it carries on every step, so
carrying the full allocated context costs capacity-proportional HBM traffic
per token. Fill-proportional decode slices the WORKING cache to the current
bucket once per segment/window and writes it back (measured 1.69x at 16k
allocated ctx — BASELINE.md round-3 long-context memo). Works on plain
[.., T, D] arrays and the quantized dict cache ({"q": .., "s": ..}) alike:
every leaf carries the position axis at the same index.

Used by models/decoder_lm.py (streaming step + fused loop) and
generate/continuous.py (window step).
"""

from __future__ import annotations

import jax


def slice_working(cache, kb: int, axis: int):
    """First `kb` positions of every cache leaf along the position axis."""
    return jax.tree.map(
        lambda a: jax.lax.slice_in_dim(a, 0, kb, axis=axis), cache)


def write_back(full, working):
    """Write a working slice back at the origin of the full cache (aliases
    in place when `full` is a donated buffer)."""
    return jax.tree.map(
        lambda a, aw: jax.lax.dynamic_update_slice(a, aw, (0,) * a.ndim),
        full, working)
