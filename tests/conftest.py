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

# persistent compile cache: the suite compiles ~100 sizeable XLA programs
# (fused LM loops dominate); on a small CPU host that is tens of minutes of
# pure compile per run.  The on-disk cache keys on the HLO, so code changes
# miss naturally and green re-runs are compile-free.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
