"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests execute against
``--xla_force_host_platform_device_count=8`` CPU devices, which exercises the
same GSPMD partitioning and collective lowering paths as a real slice.
x64 is enabled so uint64 word layouts (make_packed_int sums 33..64,
pint_test.cpp:82-87) are testable.
"""

import os

# force CPU regardless of ambient env: the unit suite must be runnable
# everywhere; TPU execution is exercised by bench.py and the driver.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the env var alone is not enough under the axon PJRT plugin, which
# registers itself at interpreter startup; the config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
