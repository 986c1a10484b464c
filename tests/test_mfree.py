"""Matrix-free Q1 fine-level kernels (ops/pallas_mfree.py) vs the
stored-DIA operator: the recomputed-from-coefficients stencil must
reproduce the assembled (BC-eliminated, keep_diag) operator exactly, and
drop into the structured hierarchy with unchanged PCG behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from saamge_tpu.api import SpectralAMGSolver
from saamge_tpu.config import SolverOptions
from saamge_tpu.fem import assemble
from saamge_tpu.fem.mesh import hex_mesh
from saamge_tpu.ops.pallas_mfree import MatrixFreeQ1
from saamge_tpu.ops.pallas_stencil import PallasDIA
from saamge_tpu.ops.sparse import DeviceDIA
from saamge_tpu.topology.part import partition_cartesian_3d
from saamge_tpu.solve.structured import (BrickGeometry, _zlane_csr,
                                         compile_structured,
                                         struct_pcg_solve,
                                         struct_vcycle_apply)


def _problem(n=6, contrast=1.0, seed=0):
    mesh = hex_mesh(n)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    rng = np.random.default_rng(seed)
    coefs = 10.0 ** rng.uniform(-contrast, contrast, mesh.num_elements)
    A, b, em, _, ess_dofs = assemble.build_discrete_problem(
        mesh, coef=coefs, rhs=1.0, ess_attr_marker=ess)
    em0, c = assemble.diffusion_factorized(mesh, coefs)
    return mesh, A, b, em, ess, ess_dofs, em0, c


@pytest.mark.parametrize("nzp", [0, 128])
def test_mfree_matches_stored_dia(nzp):
    n = 6
    _, A, _, _, _, ess_dofs, em0, c = _problem(n, contrast=1.0)
    dims = (n + 1, n + 1, n + 1)
    Ac = _zlane_csr(A, dims, nzp) if nzp else A
    dia = DeviceDIA.try_from_csr(Ac, jnp.float32, max_diags=64)
    A0 = PallasDIA.from_dia(dia, interpret=True)
    mf = MatrixFreeQ1.build(c, ess_dofs, em0, dims, nzp, A0,
                            cdtype=jnp.float32, interpret=True, A_csr=A)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(Ac.shape[0]).astype(np.float32)
    b = rng.standard_normal(Ac.shape[0]).astype(np.float32)
    dinv = rng.standard_normal(Ac.shape[0]).astype(np.float32)
    xh, bh = A0.pad(jnp.asarray(x)), A0.pad(jnp.asarray(b))
    dh = A0.pad(jnp.asarray(dinv))
    it = jnp.asarray([0.7], jnp.float32)
    for name, ref, got in [
            ("spmv", A0.matvec_h(xh), mf.matvec_h(xh)),
            ("residual", A0.residual_h(bh, xh), mf.residual_h(bh, xh)),
            ("root", A0.root_h(it, bh, dh, xh),
             mf.root_h(it, bh, dh, xh))]:
        r = np.asarray(A0.unpad(ref))
        g = np.asarray(mf.unpad(got))
        assert np.abs(r - g).max() <= 1e-5 * np.abs(r).max(), name


def test_mfree_rejects_nonfactorizing_operator():
    n = 6
    _, A, _, _, _, ess_dofs, em0, c = _problem(n)
    dims = (n + 1, n + 1, n + 1)
    dia = DeviceDIA.try_from_csr(A, jnp.float32, max_diags=64)
    A0 = PallasDIA.from_dia(dia, interpret=True)
    # perturb one element coefficient: the total diagonal check must
    # catch that (em0, c) no longer reproduces the operator
    c_bad = np.array(c, copy=True)
    c_bad[3] *= 1.5
    with pytest.raises(ValueError, match="factorization"):
        MatrixFreeQ1.build(c_bad, ess_dofs, em0, dims, 0, A0,
                           cdtype=jnp.float32, interpret=True, A_csr=A)


@pytest.mark.parametrize("fine_layout", ["flat", "zlane"])
def test_structured_mfree_vcycle_and_pcg(fine_layout):
    n, nb = 8, 2
    mesh, A, b, em, ess, ess_dofs, em0, c = _problem(n, contrast=1.0,
                                                     seed=3)
    part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
    opts = SolverOptions(num_levels=2, correct_nulspace=False,
                         elems_per_agg=4, device_setup=False)
    s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess,
                          partitioning=part)
    geo = BrickGeometry((nb, nb, nb), (n // nb,) * 3)
    h_ref = compile_structured(s.ml, geo, fine_layout=fine_layout)
    h_mf = compile_structured(s.ml, geo, fine_layout=fine_layout,
                              mfree=(em0, c, ess_dofs))
    assert isinstance(h_mf.A0s, MatrixFreeQ1)
    bdev = jnp.asarray(b, jnp.float32)
    y_ref = np.asarray(struct_vcycle_apply(h_ref, bdev))
    y_mf = np.asarray(struct_vcycle_apply(h_mf, bdev))
    # f32 c/m twin: same cycle up to arithmetic reassociation
    assert np.abs(y_ref - y_mf).max() <= 1e-4 * np.abs(y_ref).max()
    _, it_ref, _ = struct_pcg_solve(h_ref, bdev, max_iter=60)
    _, it_mf, _ = struct_pcg_solve(h_mf, bdev, max_iter=60)
    assert int(it_mf) == int(it_ref)


def test_structured_mfree_bf16_iterations():
    """bf16 coefficient/mask fields perturb only the preconditioner:
    PCG must converge within a couple of iterations of the f32 twin
    (same contract as the stored-bf16 smoother twin test)."""
    n, nb = 8, 2
    mesh, A, b, em, ess, ess_dofs, em0, c = _problem(n, contrast=2.0,
                                                     seed=5)
    part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
    opts = SolverOptions(num_levels=2, correct_nulspace=False,
                         elems_per_agg=4, device_setup=False)
    s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess,
                          partitioning=part)
    geo = BrickGeometry((nb, nb, nb), (n // nb,) * 3)
    h32 = compile_structured(s.ml, geo)
    h16 = compile_structured(s.ml, geo, smoother_dtype=jnp.bfloat16,
                             mfree=(em0, c, ess_dofs))
    assert h16.A0s.c_h.dtype == jnp.bfloat16
    bdev = jnp.asarray(b, jnp.float32)
    _, it32, _ = struct_pcg_solve(h32, bdev, max_iter=60)
    _, it16, res16 = struct_pcg_solve(h16, bdev, max_iter=60)
    assert int(it16) <= int(it32) + 2
    assert float(res16) <= 1e-6 * np.linalg.norm(b) * 1.01


def test_full_mfree_capacity_pcg():
    """hbm_frugal + mfree: NO stored fine operator at all — the PCG
    matvec is an exact-f32 matrix-free twin (A0 keeps placeholder
    values only) and the smoother recomputes in bf16.  The solve must
    still reach the true tolerance against the assembled operator."""
    import numpy as np
    import jax.numpy as jnp
    from saamge_tpu.api import SpectralAMGSolver
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.topology.part import partition_cartesian_3d
    from saamge_tpu.solve.structured import (BrickGeometry,
                                             compile_structured,
                                             struct_pcg_solve)
    n, nb = 8, 4
    mesh = hex_mesh(n)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    rng = np.random.default_rng(5)
    coefs = 10.0 ** rng.uniform(-1.0, 1.0, mesh.num_elements)
    A, b, em, _, ess_dofs = assemble.build_discrete_problem(
        mesh, coef=coefs, rhs=1.0, ess_attr_marker=ess)
    part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
    s = SpectralAMGSolver(
        A, mesh, em,
        SolverOptions(num_levels=3, correct_nulspace=False,
                      device_setup=False),
        ess_attr_marker=ess, partitioning=part)
    fac = assemble.diffusion_factorized(mesh, coefs)
    geo = BrickGeometry((nb,) * 3, (n // nb,) * 3)
    hf = compile_structured(
        s.ml, geo, fine_layout="flat", mid_format="brickblock",
        mid_dtype=jnp.bfloat16, smoother_dtype=jnp.bfloat16,
        rp_dtype=jnp.bfloat16, window_contract=True, mid_resident=False,
        mfree=(fac[0], fac[1], ess_dofs), hbm_frugal=True,
        ainv_dtype=jnp.bfloat16)
    assert hf.A0m is not None
    assert hf.A0.vals2.shape[1] == 1        # no stored fine operator
    assert hf.A1d.blocks.size <= 32         # no stored mid blocks
    x, it, _ = struct_pcg_solve(hf, jnp.asarray(b, jnp.float32),
                                max_iter=80)
    rel = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
    assert rel < 1e-4, rel
    assert int(it) <= 10
