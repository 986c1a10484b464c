"""Blocked Pallas stencil kernels (ops/pallas_stencil.py) vs scipy.

The blocked path is the production format for stencil operators beyond
VMEM (reference hot loop tg.cpp:91-131 / smpr.hpp:319-339); these run in
interpreter mode on the CPU test mesh."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax
import jax.numpy as jnp

from saamge_tpu.ops.sparse import DeviceDIA
from saamge_tpu.ops.pallas_stencil import PallasDIA, blocked_dia_smoother

INTERP = jax.devices()[0].platform == "cpu"


def _stencil_matrix(n, seed=0):
    """Random 27-point stencil operator on an n^3 grid (row-aligned DIA +
    the equivalent CSR)."""
    N = n ** 3
    offs = sorted(dz * n * n + dy * n + dx
                  for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dx in (-1, 0, 1))
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((len(offs), N))
    for k, o in enumerate(offs):
        if o >= 0:
            vals[k, N - o:] = 0
        else:
            vals[k, :-o] = 0
    rows, cols, data = [], [], []
    for k, o in enumerate(offs):
        i = np.arange(max(0, -o), min(N, N - o))
        rows.append(i)
        cols.append(i + o)
        data.append(vals[k, i])
    A = sp.csr_matrix((np.concatenate(data),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(N, N))
    dia = DeviceDIA(jnp.asarray(vals, jnp.float32), tuple(offs), (N, N))
    return A, dia


@pytest.fixture(scope="module")
def op():
    A, dia = _stencil_matrix(8)
    return A, PallasDIA.from_dia(dia, interpret=INTERP)


def test_spmv_matches_scipy(op):
    A, p = op
    x = np.random.default_rng(1).standard_normal(A.shape[0]) \
        .astype(np.float32)
    y = np.asarray(p.matvec(jnp.asarray(x)))
    ref = A @ x
    assert np.abs(y - ref).max() <= 1e-5 * np.abs(ref).max()


def test_residual_haloed(op):
    A, p = op
    rng = np.random.default_rng(2)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    b = rng.standard_normal(A.shape[0]).astype(np.float32)
    rh = p.residual_h(p.pad(jnp.asarray(b)), p.pad(jnp.asarray(x)))
    r = np.asarray(p.unpad(rh))
    ref = b - A @ x
    assert np.abs(r - ref).max() <= 1e-5 * np.abs(ref).max()
    # halo rows must come back zero (chainability invariant)
    rh = np.asarray(rh)
    assert np.all(rh[:p.hr] == 0) and np.all(rh[-p.hr:] == 0)


def test_smoother_matches_host_roots(op):
    A, p = op
    rng = np.random.default_rng(3)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    b = rng.standard_normal(A.shape[0]).astype(np.float32)
    dinv = (1.0 / np.abs(A.diagonal() + 3.0)).astype(np.float32)
    roots = [2.0, 3.0, 4.0]
    sm = blocked_dia_smoother(p, jnp.asarray(dinv), roots)
    got = np.asarray(sm(jnp.asarray(b), jnp.asarray(x)))
    ref = x.copy()
    for t in roots:
        ref = ref + dinv * (b - A @ ref) / t
    assert np.abs(got - ref).max() <= 1e-4 * np.abs(ref).max()


def test_compiled_hierarchy_blocked_path(monkeypatch):
    """Force the blocked-stencil selection in compile_hierarchy and check
    the full V-cycle PCG still converges to the same answer."""
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.fem import assemble
    from saamge_tpu.api import SpectralAMGSolver
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.solve import compiled as C
    import saamge_tpu.ops.pallas_smoother as psm

    mesh = hex_mesh(6)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    A, b, em, _, _ = assemble.build_discrete_problem(
        mesh, coef=1.0, rhs=1.0, ess_attr_marker=ess)
    opts = SolverOptions(num_levels=2, correct_nulspace=False,
                         first_elems_per_agg=32, elems_per_agg=32,
                         device_setup=False)
    s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess)

    h_ref = C.compile_hierarchy(s.ml)
    monkeypatch.setattr(psm, "fits_vmem", lambda *a, **k: False)
    h_blk = C.compile_hierarchy(s.ml)
    from saamge_tpu.ops.pallas_stencil import PallasDIA
    assert isinstance(h_blk.levels[0].A, PallasDIA)

    bdev = jnp.asarray(b, jnp.float32)
    x1, it1, _ = C.pcg_solve(h_ref, bdev, max_iter=60)
    x2, it2, _ = C.pcg_solve(h_blk, bdev, max_iter=60)
    assert int(it1) == int(it2)
    assert np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-3)
