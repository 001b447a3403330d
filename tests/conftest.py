"""Test configuration: force an 8-device CPU mesh before JAX backends initialize.

The image's sitecustomize registers the `axon` TPU platform at interpreter start,
but platform *selection* is lazy — overriding here (before any jax op runs)
steers the whole test session onto a virtual 8-device CPU topology so sharding
tests run without TPU hardware.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
