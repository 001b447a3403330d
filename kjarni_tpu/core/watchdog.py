"""Device-hang watchdog: deadline-guarded blocking syncs.

Rebuild of the reference's GPU timeout guard (kjarni-transformers/src/gpu_ops/
timeout.rs:12 `GpuTimeoutConfig`, :73 `poll_with_timeout`): every blocking
device wait gets a configurable deadline and raises a typed error instead of
wedging the caller forever (e.g. when the TPU tunnel drops mid-request).

JAX has no native deadline on `block_until_ready`, so the wait runs in a
daemon thread joined with a timeout. On timeout the worker thread keeps
blocking in the background (XLA cannot be safely interrupted), but the caller
gets control back and can fail the request — the same contract as the
reference's poll loop, which also cannot cancel the GPU work itself.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Callable, Optional, TypeVar

from .errors import DeviceTimeoutError

T = TypeVar("T")

# Default deadline for serve-path requests; None/0 disables.
DEFAULT_TIMEOUT_S = float(os.environ.get("KJARNI_DEVICE_TIMEOUT_S", "0")) or None


def block_with_timeout(tree: T, timeout_s: Optional[float],
                       what: str = "device sync") -> T:
    """jax.block_until_ready(tree) with a deadline.

    Returns the tree on success; raises DeviceTimeoutError if the device has
    not produced the result within `timeout_s` seconds.
    """
    if not timeout_s or timeout_s <= 0:
        import jax
        return jax.block_until_ready(tree)
    return call_with_timeout(
        lambda: __import__("jax").block_until_ready(tree), timeout_s, what)


def call_with_timeout(fn: Callable[[], T], timeout_s: Optional[float],
                      what: str = "device call") -> T:
    """Run fn() in a watchdog thread; raise DeviceTimeoutError on deadline.

    Used by serve to bound whole request bodies (generate/chat/embed) the way
    the reference bounds every GPU poll (timeout.rs:73).
    """
    if not timeout_s or timeout_s <= 0:
        return fn()
    result: list[Any] = []
    error: list[BaseException] = []
    done = threading.Event()

    def _run():
        try:
            result.append(fn())
        except BaseException as e:  # noqa: BLE001 — reraised in caller
            error.append(e)
        finally:
            done.set()

    t = threading.Thread(target=_run, daemon=True, name="kjarni-watchdog")
    t.start()
    if not done.wait(timeout_s):
        raise DeviceTimeoutError(
            f"{what} exceeded {timeout_s:.1f}s deadline — device may be "
            f"wedged (cf. gpu_ops/timeout.rs poll_with_timeout)")
    if error:
        raise error[0]
    return result[0]
