"""Block-compressed-sparse-row (BCSR) SpMV as a Pallas TPU kernel.

The general-sparsity device format for operators with no stencil structure
(algebraic-mode A, LS-Helmholtz monolithic blocks, coarse Galerkin
operators): rows are grouped into blocks of BR=8 (one f32 sublane tile),
columns into blocks of BC=128 (one lane tile).  Each row block stores its
nonzero 8x128 tiles densely plus the tile's block-column index; tile counts
are padded to the row-block maximum.

The SpMV kernel walks one row block per grid step; the block-column index
array is a scalar-prefetch operand (pltpu.PrefetchScalarGridSpec) so tile
loads `x[pl.ds(c*128, 128)]` are dynamically sliced from the full input
vector held in VMEM.  Each tile contributes `sum(tile * x_slice, axis=1)`
— a VPU fma + row reduction, which is the right unit for SpMV (bandwidth
bound; the MXU would idle on an (8,128)x(128,1) product anyway).

Replaces hypre ParCSR SpMV (SURVEY §2.3) for unstructured operators; the
stencil (DIA) and padded-row (ELL) formats in ops/sparse.py remain the
fast paths when they apply.
"""

from __future__ import annotations

import dataclasses
import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 8      # rows per block (f32 sublane)
BC = 128    # cols per block (lane)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceBCSR:
    tiles: jnp.ndarray      # (RB, T, BR, BC)
    blkcol: jnp.ndarray     # (RB, T) int32, padding tiles point at block 0
    shape: tuple            # logical (n, m)
    interpret: bool = False

    def tree_flatten(self):
        return (self.tiles, self.blkcol), (self.shape, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def n_padded(self):
        return self.tiles.shape[0] * BR

    @property
    def m_padded(self):
        return -(-self.shape[1] // BC) * BC

    @staticmethod
    def try_from_csr(A: sp.spmatrix, dtype=jnp.float32,
                     interpret: bool = False,
                     max_fill: float = 8.0,
                     max_blkcol_bytes: int = 1 << 19
                     ) -> "Optional[DeviceBCSR]":
        """from_csr, or None when the dense-tile fill would be wasteful
        (tiles > max_fill x the CSR nnz bytes) or the block-column index
        would overflow SMEM — the caller falls back to ELL/DIA."""
        A = A.tocsr()
        n, m = A.shape
        coo = A.tocoo()
        rb = coo.row // BR
        cb = coo.col // BC
        key = rb.astype(np.int64) * ((m // BC) + 1) + cb
        nun = len(np.unique(key))
        RB = -(-n // BR)
        counts = np.bincount((np.unique(key) // ((m // BC) + 1)).astype(int),
                             minlength=RB)
        T = max(int(counts.max()) if len(counts) else 0, 1)
        tile_bytes = (-(-RB // 8) * 8) * T * BR * BC * 4
        if tile_bytes > max_fill * max(A.nnz, 1) * 8:
            return None
        if (-(-RB // 8) * 8) * T * 4 > max_blkcol_bytes:
            return None
        return DeviceBCSR.from_csr(A, dtype, interpret)

    @staticmethod
    def from_csr(A: sp.spmatrix, dtype=jnp.float32,
                 interpret: bool = False) -> "DeviceBCSR":
        A = A.tocsr()
        A.sum_duplicates()
        n, m = A.shape
        RB = -(-n // BR)
        coo = A.tocoo()
        rb = coo.row // BR
        cb = coo.col // BC
        # unique (row-block, col-block) pairs
        key = rb.astype(np.int64) * ((m // BC) + 1) + cb
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        uniq, start = np.unique(key_s, return_index=True)
        rb_u = (uniq // ((m // BC) + 1)).astype(np.int64)
        cb_u = (uniq % ((m // BC) + 1)).astype(np.int64)
        counts = np.bincount(rb_u, minlength=RB)
        T = max(int(counts.max()) if len(counts) else 0, 1)

        # pad the row-block count to a multiple of 8: the kernel emits an
        # (8, BR) output block per grid step to satisfy TPU tiling
        RB = -(-RB // 8) * 8
        tiles = np.zeros((RB, T, BR, BC), dtype=np.float32)
        blkcol = np.zeros((RB, T), dtype=np.int32)
        slot_of = {}
        next_slot = np.zeros(RB, dtype=np.int64)
        for u in range(len(uniq)):
            r, c = int(rb_u[u]), int(cb_u[u])
            s = int(next_slot[r])
            next_slot[r] += 1
            slot_of[(r, c)] = s
            blkcol[r, s] = c
        lr = coo.row - rb * BR
        lc = coo.col - cb * BC
        slots = np.array([slot_of[(int(r), int(c))]
                          for r, c in zip(rb, cb)], dtype=np.int64)
        tiles[rb, slots, lr, lc] = coo.data
        return DeviceBCSR(jnp.asarray(tiles, dtype=dtype),
                          jnp.asarray(blkcol), (n, m), interpret)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return bcsr_spmv(self, x)

    def nbytes(self) -> int:
        return self.tiles.size * self.tiles.dtype.itemsize


def _spmv_kernel(blkcol_ref, x_ref, tiles_ref, out_ref):
    gb = pl.program_id(0)
    T = tiles_ref.shape[1]

    for g in range(8):                        # row blocks in this group

        def body(t, acc, g=g):
            c = blkcol_ref[gb * 8 + g, t]
            start = pl.multiple_of(c * BC, BC)
            xs = x_ref[0, pl.ds(start, BC)]   # (BC,) lane-aligned slice
            tile = tiles_ref[g, t]            # ref read: (BR, BC)
            return acc + jnp.sum(tile * xs[None, :], axis=1)

        out_ref[g, :] = jax.lax.fori_loop(
            0, T, body, jnp.zeros((BR,), jnp.float32))


def bcsr_spmv(A: DeviceBCSR, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x.  x is padded to the column-block multiple; the result is
    truncated to the logical row count."""
    n, m = A.shape
    RB, T = A.blkcol.shape
    mp = A.m_padded
    xp = jnp.zeros((1, mp), dtype=A.tiles.dtype).at[0, :m].set(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(RB // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x: whole vector
            pl.BlockSpec((8, T, BR, BC), lambda gb, blkcol: (gb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BR), lambda gb, blkcol: (gb, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((RB, BR), jnp.float32),
        grid_spec=grid_spec,
        interpret=A.interpret,
    )(A.blkcol, xp, A.tiles)
    return y.reshape(-1)[:n].astype(x.dtype)
