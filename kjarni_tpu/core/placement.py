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


# ---------------------------------------------------------------------------
# Per-stage host offload (ExecutionPlan, execution/plan.rs:4)
# ---------------------------------------------------------------------------
#
# The reference places each stage (embeddings / layers / lm_head) on Cpu or
# Wgpu (from_load_config plan.rs:11; presets full_cpu/full_gpu/
# gpu_offload_ends/gpu_offload_head plan.rs:35-65). The TPU-native analogue is
# XLA memory spaces: a stage's weights live in `pinned_host` (host RAM) instead
# of HBM, and the stage's compute runs on the host CPU *inside* the jitted
# program via `compute_on("device_host")` — no extra Python dispatches, works
# inside lax.while_loop (the fused decode loop). This frees
# vocab_size x hidden x dtype bytes of HBM per offloaded table; only the
# gathered rows / final logits cross PCIe.

import dataclasses


@dataclasses.dataclass(frozen=True)
class ExecutionPlan:
    """Where the embedding table and the lm head live: "device" | "host".

    The transformer layer stack always stays on device — offloading the
    FLOP-dense stack would defeat the TPU (the reference's full_cpu preset maps
    to device="cpu" instead).
    """
    embeddings: str = "device"
    lm_head: str = "device"

    @classmethod
    def resolve(cls, plan: "ExecutionPlan | str | None") -> "ExecutionPlan":
        if plan is None:
            return cls()
        if isinstance(plan, ExecutionPlan):
            return plan
        presets = {
            "device": cls(),
            "full_device": cls(),
            "offload_embeddings": cls(embeddings="host"),
            "offload_head": cls(lm_head="host"),
            "offload_ends": cls(embeddings="host", lm_head="host"),
        }
        if plan not in presets:
            raise InvalidConfigError(
                f"unknown execution plan '{plan}' "
                f"(expected one of {sorted(presets)})")
        return presets[plan]


def to_host_memory(x):
    """Pin an array in host memory (pinned_host on TPU; no-op on CPU)."""
    return jax.device_put(x, jax.memory.Space.Host)


def host_gather(table, ids):
    """Embedding lookup against a host-resident table, jit-compatible.

    Indices move to host space, the gather runs on the host CPU inside the
    compiled program, and only the gathered rows stream back to HBM.
    """
    from jax.experimental.compute_on import compute_on

    ids_h = jax.device_put(ids, jax.memory.Space.Host)

    @compute_on("device_host")
    @jax.jit
    def _gather(t, i):
        # promise_in_bounds: the default clamp materialises constants in the
        # device memory space, which XLA rejects inside a host region
        return t.at[i].get(mode="promise_in_bounds")

    return jax.device_put(_gather(table, ids_h), jax.memory.Space.Device)


def host_matmul(x, w):
    """lm-head projection against a host-resident [D, V] matrix.

    The [B, D] activations stream to host RAM, the matmul runs on the host
    CPU, and the [B, V] logits stream back — the gpu_offload_head preset
    (plan.rs:56) rebuilt on memory spaces.
    """
    from jax.experimental.compute_on import compute_on

    x_h = jax.device_put(x, jax.memory.Space.Host)

    @compute_on("device_host")
    @jax.jit
    def _mm(a, b):
        return a.astype(b.dtype) @ b

    return jax.device_put(_mm(x_h, w), jax.memory.Space.Device)
