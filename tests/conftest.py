import os
import sys

# Virtual multi-device CPU mesh for sharding tests (stands in for mpirun -n N
# in the reference's pmltest); must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Never use the persistent compile cache on the CPU backend: cached
# XLA:CPU AOT executables embed compile-machine CPU features the cache
# key does not, and loading a mismatched one SEGFAULTED a full test run
# (jax compilation_cache.get_executable_and_time -> SIGSEGV).
os.environ["SAAMGE_TPU_NO_COMPILE_CACHE"] = "1"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU-tunnel plugin (sitecustomize) force-registers itself and
# ignores JAX_PLATFORMS from the environment; pin the platform through the
# config API before any backend is initialized so tests run on the local
# 8-device virtual CPU mesh rather than through the tunnel.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release jit executables/tracing caches at module boundaries.

    With ~200 tests in one process the accumulated executables reach
    GBs and XLA:CPU's native compile has been observed to SEGFAULT on
    the largest program (test_struct_wavefront_bf16_twin_matches) once
    that much is resident — the same test passes in isolation.  The
    12:45 green runs were served by the (since-disabled, itself
    segfault-prone) persistent cache, masking the build-up."""
    yield
    jax.clear_caches()
