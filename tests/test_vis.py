"""VTK visualization output (GLVis analog)."""

import os

import numpy as np

from saamge_tpu.api import (SpectralAMGSolver, bdr_dof_flags,
                            checkerboard_coef, geometric_partitioning)
from saamge_tpu.fem import assemble, vis
from saamge_tpu.fem.mesh import quad_mesh


def test_vtk_outputs(tmp_path):
    mesh = quad_mesh(8)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    A, b, em, _, _ = assemble.build_discrete_problem(
        mesh, coef=checkerboard_coef, rhs=1.0, ess_attr_marker=ess)
    flags = bdr_dof_flags(mesh, ess)
    rels = geometric_partitioning(A, mesh, flags, 4)

    p1 = os.path.join(tmp_path, "parts.vtk")
    vis.save_partitioning(p1, mesh, rels.partitioning)
    p2 = os.path.join(tmp_path, "aggs.vtk")
    vis.save_aggregates(p2, mesh, rels)
    p3 = os.path.join(tmp_path, "sol.vtk")
    vis.save_solution(p3, mesh, np.linspace(0, 1, mesh.num_dofs(1)))

    for p in (p1, p2, p3):
        txt = open(p).read()
        assert txt.startswith("# vtk DataFile")
        assert "CELLS 64" in txt
    assert "SCALARS AE" in open(p2).read()

    gf = os.path.join(tmp_path, "x.gf")
    x = np.arange(5.0)
    vis.write_gridfunction(gf, x)
    np.testing.assert_allclose(vis.read_gridfunction(gf), x)
