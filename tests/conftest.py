"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip hardware is not available in CI, so sharding tests use
`xla_force_host_platform_device_count=8`. Parity tests (1e-6 relative chi2
vs the float64 NumPy oracle) need x64, which TPUs only emulate — CPU is the
right backend for correctness; the real-chip benchmark lives in bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's TPU plugin (sitecustomize) overrides JAX_PLATFORMS via
# jax config at interpreter start; override it back — tests must run on the
# virtual 8-device CPU mesh, not the single real chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
