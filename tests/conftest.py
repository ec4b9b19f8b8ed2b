"""Test configuration: force the CPU backend with 8 virtual devices.

The multi-host story is tested the way SURVEY.md §4 prescribes: a virtual 8-device CPU
mesh via --xla_force_host_platform_device_count, so y-sharded halo exchange and the
fold run in CI on one host. x64 is enabled so float64 grid-construction parity checks
against the host-side numpy build are exact.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The env var alone is not enough in environments where a sitecustomize hook imports
# jax (and locks in JAX_PLATFORMS) before conftest runs — update the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
