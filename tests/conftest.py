"""Test configuration: force CPU with 8 virtual devices and float64.

Tests validate numerics against float64 oracles (scipy / dense numpy
re-implementations of the reference math) and exercise multi-device sharding
on a virtual CPU mesh, per the driver contract.  Must run before jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's sitecustomize registers the 'axon' TPU-tunnel PJRT plugin in
# every interpreter and re-adds it to jax_platforms, so the env var alone is
# not enough — override the config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
