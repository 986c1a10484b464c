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
    static hierarchy: ELL/BCSR SpMV, polynomial smoothers, psum dot products,
    dense Cholesky coarsest solve; sharded over a jax.sharding.Mesh for
    multi-chip runs (replacing the reference's hypre ParCSR + MPI).
"""

from saamge_tpu.config import GlobalConfig, TGConfig, CONFIG
from saamge_tpu.fem.mesh import Mesh
from saamge_tpu.api import SpectralAMGSolver, SAAMGePC, SAAMGeAlgPC

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
