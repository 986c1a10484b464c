"""Halo-exchange sharded SpMV: the scalable distributed smoother kernel.

The generic sharded path (parallel/sharded.py) all_gathers the full vector
per SpMV — correct for any sparsity but O(n) communication per device.
For banded/stencil operators in a row-contiguous 1-D partition (the
natural-order fine operator; RCM-ordered coarse operators), row block i
only needs ``x[lo_i - H : hi_i + H]`` where H is the maximum band offset:
each device exchanges only H-wide edge slices with its two ring neighbors
via ``ppermute`` — the ICI-riding halo exchange that replaces hypre's
ParCSR communication package (SURVEY §2.3).

The device-local kernel is the DIA shifted-read SpMV on the halo-extended
local block, so the whole smoother is gather-free AND all-gather-free.
"""

from __future__ import annotations

import dataclasses
import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class HaloDIA:
    """DIA storage row-sharded over a 1-D mesh with halo width H.

    vals: (k, n_pad) diagonal values (row-aligned: vals[d, i] = A[i, i+off]);
    offsets: static tuple; every |offset| <= H <= local block size."""

    vals: jnp.ndarray
    offsets: tuple
    H: int
    n: int           # logical size
    n_pad: int       # padded (divisible by mesh size)
    mesh: Mesh

    @staticmethod
    def build(A: sp.csr_matrix, mesh: Mesh, dtype=jnp.float32,
              max_diags: int = 1024) -> "HaloDIA":
        A = A.tocsr()
        n = A.shape[0]
        ndev = mesh.devices.size
        n_pad = -(-n // ndev) * ndev
        coo = A.tocoo()
        offs = np.unique(coo.col - coo.row)
        assert len(offs) <= max_diags, f"too many diagonals: {len(offs)}"
        H = int(np.abs(offs).max()) if len(offs) else 0
        block = n_pad // ndev
        assert H <= block, (
            f"halo {H} exceeds local block {block}: use the all-gather path")
        vals = np.zeros((len(offs), n_pad))
        pos = {int(o): k for k, o in enumerate(offs)}
        for o in offs:
            sel = (coo.col - coo.row) == o
            vals[pos[int(o)], coo.row[sel]] = coo.data[sel]
        shard = NamedSharding(mesh, P(None, mesh.axis_names[0]))
        return HaloDIA(jax.device_put(vals.astype(np.dtype(dtype)), shard),
                       tuple(int(o) for o in offs), H, n, n_pad, mesh)


def _halo_extend(x_blk: jnp.ndarray, H: int, axis: str) -> jnp.ndarray:
    """Concatenate left/right neighbor edge slices around the local block
    (ring ppermute; chain ends receive zeros via masking)."""
    ndev = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    right_of = [(d, (d + 1) % ndev) for d in range(ndev)]
    left_of = [(d, (d - 1) % ndev) for d in range(ndev)]
    # my left halo = right edge of my left neighbor
    left_halo = jax.lax.ppermute(x_blk[-H:], axis, right_of)
    right_halo = jax.lax.ppermute(x_blk[:H], axis, left_of)
    left_halo = jnp.where(i == 0, 0.0, left_halo)
    right_halo = jnp.where(i == ndev - 1, 0.0, right_halo)
    return jnp.concatenate([left_halo, x_blk, right_halo])


def _dia_local(vals_blk: jnp.ndarray, offsets, H: int,
               xe: jnp.ndarray) -> jnp.ndarray:
    """Shifted-read SpMV on the halo-extended block: xe has H ghosts on
    each side; local row i reads xe[H + i + off]."""
    nloc = vals_blk.shape[1]
    y = jnp.zeros(nloc, dtype=xe.dtype)
    for k, off in enumerate(offsets):
        xs = jax.lax.dynamic_slice(xe, (H + off,), (nloc,))
        y = y + vals_blk[k] * xs
    return y


def halo_spmv_fn(A: HaloDIA):
    """Returns a jitted y = A @ x with x sharded (dp) and halo exchange."""
    axis = A.mesh.axis_names[0]
    from jax import shard_map

    def local(vals_blk, x_blk):
        xe = _halo_extend(x_blk, A.H, axis)
        return _dia_local(vals_blk, A.offsets, A.H, xe)

    sm = shard_map(local, mesh=A.mesh,
                   in_specs=(P(None, axis), P(axis)), out_specs=P(axis),
                   check_vma=False)
    return jax.jit(lambda x: sm(A.vals, x))


def halo_smoother_fn(A: HaloDIA, dinv: np.ndarray, roots: np.ndarray,
                     dtype=jnp.float32):
    """Jitted sharded polynomial smoother x <- x + D^{-1}(b - A x)/tau per
    root — the solve-phase hot loop with neighbor-only communication."""
    axis = A.mesh.axis_names[0]
    from jax import shard_map

    dpad = np.zeros(A.n_pad)
    dpad[:A.n] = dinv
    shard = NamedSharding(A.mesh, P(axis))
    dinv_d = jax.device_put(dpad.astype(np.dtype(dtype)), shard)
    roots_d = jax.device_put(np.asarray(roots, dtype=np.dtype(dtype)),
                             NamedSharding(A.mesh, P()))

    def local(vals_blk, dinv_blk, roots_r, b_blk, x_blk):
        def body(x, tau):
            xe = _halo_extend(x, A.H, axis)
            Ax = _dia_local(vals_blk, A.offsets, A.H, xe)
            return x + dinv_blk * (b_blk - Ax) / tau, None
        x, _ = jax.lax.scan(body, x_blk, roots_r)
        return x

    sm = shard_map(local, mesh=A.mesh,
                   in_specs=(P(None, axis), P(axis), P(), P(axis), P(axis)),
                   out_specs=P(axis), check_vma=False)
    return jax.jit(lambda b, x: sm(A.vals, dinv_d, roots_d, b, x))
