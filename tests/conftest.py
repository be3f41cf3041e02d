"""Test configuration: force CPU JAX with a virtual 8-device mesh and x64.

Tests never require TPU hardware: sharding is validated on a host-platform
8-device mesh, and numeric comparisons against the oracle run the engine in
'exact' (f64-phase) mode on CPU.  Note the explicit config.update — the
environment may pin JAX_PLATFORMS to a hardware plugin (axon), which a mere
env-var default would not override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
