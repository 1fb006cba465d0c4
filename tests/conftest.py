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
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the suite compiles ~100 sizeable XLA programs
# (fused LM loops dominate); on a small CPU host that is tens of minutes of
# pure compile per run.  The on-disk cache keys on the HLO, so code changes
# miss naturally and green re-runs are compile-free.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# -- memory-map budget guard (the round-1 "suite segfaults after ~60 tests") --
#
# Every XLA:CPU executable JIT-loads code into fresh mmap regions, and the
# process-lifetime jit caches keep every executable alive, so a full run
# accumulates mappings monotonically (~600-1000 per fused-LM program) until it
# crosses the kernel's vm.max_map_count (65530 here).  Past the limit mmap()
# fails and XLA segfaults on the unchecked result — at whatever test happens
# to compile next (observed at both compile and cache-deserialize call sites;
# /proc/self/maps measured >41k two-thirds into the suite).  Dropping the jit
# caches releases the executables and their mappings (measured 915 -> 463 maps
# after clear_caches()); the on-disk compilation cache above makes the
# subsequent recompiles cheap cache reads.

def pytest_collection_modifyitems(config, items):
    """``tpu``-marked tests need real hardware AND must not inherit this
    conftest's CPU pin — they run tools in subprocesses.  Skip them unless
    explicitly requested (TBA_TPU_TESTS=1, typically with ``-m tpu``)."""
    if os.environ.get("TBA_TPU_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="TPU hardware test: set TBA_TPU_TESTS=1 (and run on hardware)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


_MAPS_BUDGET = 25_000


def _n_maps() -> int:
    with open("/proc/self/maps", "rb") as f:
        return sum(1 for _ in f)


@pytest.fixture(autouse=True)
def _jax_executable_map_guard():
    yield
    if _n_maps() > _MAPS_BUDGET:
        jax.clear_caches()
