"""Distributed (device-mesh) setup: the SharedEntityCommunication analog.

The reference distributes setup with MPI: AEs live on ranks, eigenvector
blocks for MISes crossing rank boundaries are gathered to the MIS master
rank, which runs the SVD and broadcasts the result back
(SharedEntityCommunication.hpp:75-220, contrib.cpp:492-549,
aggregates.cpp:1610-1730).  In the single-controller JAX model the
analog is data sharding over the device mesh:

  - the per-AE eigensolve batch is sharded over the mesh's data axis
    (each shard solves its AEs — SURVEY §2.2 item 5);
  - the per-MIS SVD batch is sharded over the MIS dimension — each
    MIS's stacked eigenvector block is factored on its OWNER shard, and
    XLA moves the contributing blocks across ICI exactly where the
    reference's Isend/Irecv pairs would run;
  - index plumbing (which dofs form which MIS) stays on the controller,
    replacing the reference's rank-0-style offset scans
    (proc_determine_offsets, process.cpp:81-88).

Determinism across device counts (the reference's pmltest invariant:
same iterations with mpirun -n 1 and -n 2) is by construction: sharding
changes data placement, not the reduction order within any MIS block.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def mesh_num_devices(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


@lru_cache(maxsize=32)
def _svd_jit(shape):
    @jax.jit
    def f(M):
        U, S, _ = jnp.linalg.svd(M, full_matrices=False)
        return U, S

    return f


def make_sharded_svd(mesh: Mesh):
    """Returns svd_fn(M (B, s, c) host f64) -> (U, S) computing the
    batched SVD with the batch (MIS/owner) dimension sharded over the
    mesh.  Batch is padded to a device multiple with identity-like
    blocks; results come back as host arrays."""
    ndev = mesh_num_devices(mesh)
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, PartitionSpec(axis))

    x64 = bool(jax.config.jax_enable_x64)

    def svd_fn(M: np.ndarray):
        B, s, c = M.shape
        Bpad = -(-B // ndev) * ndev
        if Bpad != B:
            pad = np.zeros((Bpad - B, s, c), dtype=M.dtype)
            k = min(s, c)
            pad[:, :k, :k] = np.eye(k, dtype=M.dtype)
            M = np.concatenate([M, pad], axis=0)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        M_dev = jax.device_put(jnp.asarray(M, dtype), sharding)
        U, S = _svd_jit((Bpad, s, c))(M_dev)
        return (np.asarray(U, np.float64)[:B],
                np.asarray(S, np.float64)[:B])

    # dedup threshold matched to the compute precision (contrib's
    # svd_eps=1e-10 presumes f64 factors; f32 singular values carry
    # ~1e-7 relative noise that must not defeat the dedup)
    svd_fn.suggested_eps = 1e-10 if x64 else 1e-5
    return svd_fn


def shard_batch(mesh: Mesh, arr) -> jnp.ndarray:
    """device_put with the leading (batch) dim sharded over the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    return jax.device_put(arr, sharding)
