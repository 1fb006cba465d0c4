"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

The axon sitecustomize pre-imports jax with the TPU platform first; tests
force the CPU backend (the backend is selected lazily, so this works as long
as no array op ran before conftest import).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
