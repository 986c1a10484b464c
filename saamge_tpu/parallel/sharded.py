"""Multi-chip solve phase: the V-cycle/PCG sharded over a jax device Mesh.

This replaces the reference's MPI/hypre distribution (SPMD domain
decomposition with overlapped dof/truedof folding + ParCSR halo exchange,
SURVEY §2.2).  Design:

  - Every level's operator rows (and the corresponding vector entries) are
    sharded over a 1-D ``dp`` mesh axis — the analog of elements->ranks.
  - SpMV inside shard_map: each device owns a row block of the ELL arrays
    and holds the full input vector (gathered); it computes its row block,
    then ``all_gather``s the result.  Dot products are local + ``psum``.
    This is the dense-halo variant (correct for any sparsity); the
    halo-restricted exchange is a later optimization.
  - The coarsest dense Cholesky solve is replicated (tiny by construction).

All levels are padded so row counts divide the mesh size; padded rows carry
zero matrix values and zero dinv so they stay exactly zero through the
whole cycle.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pad_to(x: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


@dataclasses.dataclass
class ShardedLevel:
    # row-sharded ELL arrays (padded row counts divisible by mesh size)
    A_cols: jnp.ndarray
    A_vals: jnp.ndarray
    P_cols: jnp.ndarray
    P_vals: jnp.ndarray
    R_cols: jnp.ndarray
    R_vals: jnp.ndarray
    dinv: jnp.ndarray
    roots: jnp.ndarray
    n: int       # padded fine size
    nc: int      # padded coarse size


jax.tree_util.register_pytree_node(
    ShardedLevel,
    lambda l: ((l.A_cols, l.A_vals, l.P_cols, l.P_vals, l.R_cols,
                l.R_vals, l.dinv, l.roots), (l.n, l.nc)),
    lambda aux, ch: ShardedLevel(*ch, n=aux[0], nc=aux[1]),
)


@dataclasses.dataclass
class ShardedHierarchy:
    levels: List[ShardedLevel]
    chol: jnp.ndarray
    mesh: Mesh
    n0: int          # unpadded fine size
    n0_pad: int


def _ell_arrays(Acsr, n_to, n_cols_logical, dtype):
    """Pure-numpy ELL packing (no device placement here)."""
    A = Acsr.tocsr()
    A.sum_duplicates()
    n = A.shape[0]
    row_nnz = np.diff(A.indptr)
    k = max(int(row_nnz.max()) if n else 0, 1)
    cols = np.zeros((n, k), dtype=np.int32)
    vals = np.zeros((n, k), dtype=np.float64)
    rows = np.repeat(np.arange(n), row_nnz)
    pos = np.arange(len(A.data)) - np.repeat(A.indptr[:-1], row_nnz)
    cols[rows, pos] = A.indices
    vals[rows, pos] = A.data
    return _pad_to(cols, n_to), _pad_to(vals, n_to)


def shard_hierarchy(ml, mesh: Mesh, dtype=jnp.float32) -> ShardedHierarchy:
    """Build a ShardedHierarchy from a host MLData over a 1-D mesh."""
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    levels = []
    sizes = []
    for level in ml.levels:
        n = level.A.shape[0]
        sizes.append(-(-n // ndev) * ndev)
    nc_last = ml.levels[-1].tg_data.Ac.shape[0]
    sizes.append(-(-nc_last // ndev) * ndev)

    shard_rows = NamedSharding(mesh, P(axis))
    shard_rows2 = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    for i, level in enumerate(ml.levels):
        tg = level.tg_data
        npad, ncpad = sizes[i], sizes[i + 1]
        A_cols, A_vals = _ell_arrays(level.A, npad, npad, dtype)
        P_cols, P_vals = _ell_arrays(tg.interp, npad, ncpad, dtype)
        R_cols, R_vals = _ell_arrays(tg.restr, ncpad, npad, dtype)
        dinv = _pad_to(np.asarray(tg.poly_data.dinv), npad)
        # NOTE: device_put NUMPY arrays directly with the target sharding.
        # jnp.asarray would first commit to the default device (on an axon
        # TPU-tunnel machine that is the remote chip) and then reshard
        # cross-backend, which is at best slow and can deadlock.
        np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype")
                            else dtype)
        levels.append(ShardedLevel(
            A_cols=jax.device_put(A_cols, shard_rows2),
            A_vals=jax.device_put(A_vals.astype(np_dtype), shard_rows2),
            P_cols=jax.device_put(P_cols, shard_rows2),
            P_vals=jax.device_put(P_vals.astype(np_dtype), shard_rows2),
            R_cols=jax.device_put(R_cols, shard_rows2),
            R_vals=jax.device_put(R_vals.astype(np_dtype), shard_rows2),
            dinv=jax.device_put(dinv.astype(np_dtype), shard_rows),
            roots=jax.device_put(
                np.asarray(tg.poly_data.roots, dtype=np_dtype), repl),
            n=npad, nc=ncpad))
    Ac = ml.levels[-1].tg_data.Ac.toarray()
    Acp = np.eye(sizes[-1])
    Acp[:Ac.shape[0], :Ac.shape[1]] = Ac
    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    chol = jax.device_put(np.linalg.cholesky(Acp).astype(np_dtype), repl)
    return ShardedHierarchy(levels, chol, mesh, ml.levels[0].A.shape[0],
                            sizes[0])


# ---------------------------------------------------------------------------
# inside-shard_map kernels.  Vectors passed around REPLICATED; row blocks
# computed locally then all_gathered (ICI collective).


def _spmv_local(cols_blk, vals_blk, x_full, axis):
    y_blk = jnp.einsum("nk,nk->n", vals_blk,
                       jnp.take(x_full, cols_blk, axis=0))
    return jax.lax.all_gather(y_blk, axis, tiled=True)


def _smooth(lv: ShardedLevel, b, x, axis):
    def body(x, tau):
        Ax = _spmv_local(lv.A_cols, lv.A_vals, x, axis)
        # dinv is row-sharded: gather to apply on the replicated vector
        dinv_full = jax.lax.all_gather(lv.dinv, axis, tiled=True)
        x = x + dinv_full * (b - Ax) / tau
        return x, None
    x, _ = jax.lax.scan(body, x, lv.roots)
    return x


def make_sharded_vcycle(h: ShardedHierarchy):
    """Returns a jitted function b (replicated) -> z = B^{-1} b."""
    axis = h.mesh.axis_names[0]

    def vcycle(levels, chol, b, x, depth):
        lv = levels[depth]
        x = _smooth(lv, b, x, axis)
        Ax = _spmv_local(lv.A_cols, lv.A_vals, x, axis)
        res = b - Ax
        resc = _spmv_local(lv.R_cols, lv.R_vals, res, axis)
        if depth + 1 < len(levels):
            xc = jnp.zeros_like(resc)
            xc = vcycle(levels, chol, resc, xc, depth + 1)
        else:
            y = jax.scipy.linalg.solve_triangular(chol, resc, lower=True)
            xc = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
        x = x + _spmv_local(lv.P_cols, lv.P_vals, xc, axis)
        x = _smooth(lv, b, x, axis)
        return x

    level_specs = []
    for lv in h.levels:
        level_specs.append(ShardedLevel(
            A_cols=P(axis, None), A_vals=P(axis, None),
            P_cols=P(axis, None), P_vals=P(axis, None),
            R_cols=P(axis, None), R_vals=P(axis, None),
            dinv=P(axis), roots=P(), n=lv.n, nc=lv.nc))

    from jax.experimental.shard_map import shard_map

    def apply_fn(levels, chol, b):
        return vcycle(levels, chol, b, jnp.zeros_like(b), 0)

    smapped = shard_map(
        apply_fn, mesh=h.mesh,
        in_specs=(level_specs, P(), P()),
        out_specs=P(),
        check_rep=False)
    return jax.jit(lambda b: smapped(h.levels, h.chol, b))


def make_sharded_pcg(h: ShardedHierarchy, rel_tol: float = 1e-6,
                     max_iter: int = 100):
    """Full PCG step: returns jitted solve(b) -> (x, iters).

    Dot products are plain jnp dots on the replicated vectors (XLA folds
    them; in the fully sharded variant they become local dots + psum)."""
    vc = make_sharded_vcycle(h)
    A0_cols, A0_vals = h.levels[0].A_cols, h.levels[0].A_vals
    axis = h.mesh.axis_names[0]
    from jax.experimental.shard_map import shard_map

    spmv = jax.jit(shard_map(
        lambda c, v, x: _spmv_local(c, v, x, axis),
        mesh=h.mesh, in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=P(), check_rep=False))

    def solve(b, max_iter=max_iter):
        x = jnp.zeros_like(b)
        r = b
        z = vc(r)
        nom0 = z @ r
        lim = nom0 * rel_tol * rel_tol
        d = z
        nom = nom0
        it = 0
        while it < max_iter and float(nom) > float(lim):
            Ad = spmv(A0_cols, A0_vals, d)
            alpha = nom / (d @ Ad)
            x = x + alpha * d
            r = r - alpha * Ad
            z = vc(r)
            betanom = r @ z
            d = z + (betanom / nom) * d
            nom = betanom
            it += 1
        return x, it

    return solve


def make_sharded_pcg_jit(h: ShardedHierarchy, rel_tol: float = 1e-6,
                         max_iter: int = 100):
    """Fully-jitted sharded PCG: the vcycle+SpMV run through shard_map and
    the iteration is a lax.while_loop — ONE XLA computation end-to-end,
    dot products local on replicated vectors (psum-free because vectors are
    replicated; in a fully distributed-vector variant they become
    local-dot + psum).  Returns solve(b) -> (x, iters)."""
    axis = h.mesh.axis_names[0]
    from jax.experimental.shard_map import shard_map

    lv0 = h.levels[0]
    spmv = shard_map(
        lambda c, v, x: _spmv_local(c, v, x, axis),
        mesh=h.mesh, in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=P(), check_rep=False)

    def vcycle_once(levels, chol, b):
        def body(levels, chol, r):
            def vcycle(levels, chol, bb, x, depth):
                lv = levels[depth]
                x = _smooth(lv, bb, x, axis)
                Ax = _spmv_local(lv.A_cols, lv.A_vals, x, axis)
                res = bb - Ax
                resc = _spmv_local(lv.R_cols, lv.R_vals, res, axis)
                if depth + 1 < len(levels):
                    xc = vcycle(levels, chol, resc, jnp.zeros_like(resc),
                                depth + 1)
                else:
                    y = jax.scipy.linalg.solve_triangular(chol, resc,
                                                          lower=True)
                    xc = jax.scipy.linalg.solve_triangular(chol.T, y,
                                                           lower=False)
                x = x + _spmv_local(lv.P_cols, lv.P_vals, xc, axis)
                x = _smooth(lv, bb, x, axis)
                return x
            return vcycle(levels, chol, r, jnp.zeros_like(r), 0)
        return shard_map(body, mesh=h.mesh,
                         in_specs=(_level_specs(h), P(), P()),
                         out_specs=P(), check_rep=False)(levels, chol, b)

    @jax.jit
    def solve(b):
        z = vcycle_once(h.levels, h.chol, b)
        nom0 = z @ b
        lim = nom0 * rel_tol * rel_tol

        def cond(st):
            x, r, d, Ad, nom, it = st
            return jnp.logical_and(nom > lim, it < max_iter)

        def body(st):
            x, r, d, Ad, nom, it = st
            alpha = nom / (d @ Ad)
            x = x + alpha * d
            r = r - alpha * Ad
            z = vcycle_once(h.levels, h.chol, r)
            betanom = r @ z
            d = z + (betanom / nom) * d
            Ad = spmv(lv0.A_cols, lv0.A_vals, d)
            return (x, r, d, Ad, betanom, it + 1)

        st = (jnp.zeros_like(b), b, z,
              spmv(lv0.A_cols, lv0.A_vals, z), nom0, jnp.int32(0))
        x, r, d, Ad, nom, it = jax.lax.while_loop(cond, body, st)
        return x, it

    return solve


def _level_specs(h: ShardedHierarchy):
    axis = h.mesh.axis_names[0]
    specs = []
    for lv in h.levels:
        specs.append(ShardedLevel(
            A_cols=P(axis, None), A_vals=P(axis, None),
            P_cols=P(axis, None), P_vals=P(axis, None),
            R_cols=P(axis, None), R_vals=P(axis, None),
            dinv=P(axis), roots=P(), n=lv.n, nc=lv.nc))
    return specs
