"""Device placement: resolve Device.{AUTO,CPU,TPU} to a jax device.

Rebuild of the reference's device plumbing (KjarniDevice::resolve
kjarni/src/common/device.rs:7,21 and ExecutionPlan presets
execution/plan.rs:35). On TPU the plan collapses to one choice — where the
params live. `jax.jit` dispatches to the devices holding the arguments, so
placing the pytree IS the execution plan; there is no per-stage offload lattice
to maintain (XLA manages HBM/VMEM within the device).
"""

from __future__ import annotations

from typing import Any

import jax

from .errors import InvalidConfigError
from .metadata import Device


def resolve_jax_device(device: Device | str | None):
    """Map the user-facing Device enum to a concrete jax.Device."""
    d = Device.resolve(device)
    if d == Device.CPU:
        return jax.devices("cpu")[0]
    if d == Device.TPU:
        accels = [x for x in jax.devices() if x.platform != "cpu"]
        if not accels:
            raise InvalidConfigError(
                "device='tpu' requested but no accelerator is available")
        return accels[0]
    # AUTO: default device (accelerator when present)
    return jax.devices()[0]


def place_params(params: Any, device: Device | str | None) -> Any:
    """Place a params pytree on the resolved device (the execution plan)."""
    dev = resolve_jax_device(device)
    return jax.tree.map(lambda x: jax.device_put(x, dev), params)
