"""saamge_tpu: a TPU-native spectral element-based algebraic multigrid (AMGe) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LLNL/saamge
(reference: /root/reference/amg): element agglomeration over a partitioned dual
graph, per-agglomerate generalized eigenproblems defining coarse spaces,
SVD-based tentative prolongators over minimal intersection sets (MISes),
smoothed-aggregation prolongator smoothing, Galerkin (RAP) coarse operators
built recursively into a multilevel hierarchy, polynomial (SAS/Chebyshev)
relaxation, and V-cycle solvers used stand-alone or as PCG preconditioners.

Architecture (TPU-first, not a port):
  - Topology (partitioning, relation tables, MIS discovery) runs once per level
    on host (numpy/scipy), producing static index arrays.
  - Setup numerics (batched AE eigensolves, MIS SVDs, RAP) run either on host
    in float64 (parity path) or as batched padded dense ops on device.
  - The solve phase (V-cycle + PCG) is a single jitted JAX computation over a
    static hierarchy: DIA/banded/ELL SpMV, polynomial smoothers, psum dot products,
    dense Cholesky coarsest solve; sharded over a jax.sharding.Mesh for
    multi-chip runs (replacing the reference's hypre ParCSR + MPI).
"""

import os as _os


def _enable_persistent_compile_cache() -> None:
    """TPU compile times for the batched setup eigensolves are minutes per
    shape while cached runs are milliseconds; a persistent on-disk XLA cache
    makes them one-time.  Opt out with SAAMGE_TPU_NO_COMPILE_CACHE=1.

    NEVER enabled for the CPU backend: a cached XLA:CPU AOT executable
    embeds the compile machine's CPU features and the cache key does
    NOT (jax logs "machine type ... doesn't match" and loading has been
    observed to SEGFAULT the process mid-testsuite on this VM fleet).
    Callers that pin the CPU platform after import (tests/conftest,
    dryrun_multichip, bench's tunnel fallback) must also call
    disable_compile_cache()."""
    if _os.environ.get("SAAMGE_TPU_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    try:
        import jax
        path = _os.environ.get(
            "SAAMGE_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "saamge_tpu", "jax_cache"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def disable_compile_cache() -> None:
    """Turn the persistent compile cache off for this process (REQUIRED
    after pinning the CPU platform — see _enable_persistent_compile_cache)."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass


_enable_persistent_compile_cache()

from saamge_tpu.config import GlobalConfig, TGConfig, CONFIG
from saamge_tpu.fem.mesh import Mesh
from saamge_tpu.api import SpectralAMGSolver, SAAMGePC, SAAMGeAlgPC


def structured_solver_api():
    """Late imports of the structured (brick) fast path, the production
    TPU solve configuration: (BrickGeometry, compile_structured,
    struct_pcg_solve, struct_vcycle_apply, partition_cartesian_3d)."""
    from saamge_tpu.solve.structured import (BrickGeometry,
                                             compile_structured,
                                             struct_pcg_solve,
                                             struct_vcycle_apply)
    from saamge_tpu.topology.part import partition_cartesian_3d
    return (BrickGeometry, compile_structured, struct_pcg_solve,
            struct_vcycle_apply, partition_cartesian_3d)

__version__ = "0.1.0"

__all__ = [
    "GlobalConfig",
    "TGConfig",
    "CONFIG",
    "Mesh",
    "SpectralAMGSolver",
    "SAAMGePC",
    "SAAMGeAlgPC",
]
