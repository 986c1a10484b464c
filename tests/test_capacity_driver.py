"""Driver-grade capacity measurement script (scripts/run_capacity.py):
both timing rungs exercised end-to-end on a small CPU bundle.

The 33M-dof artifact of record depends on this script surviving the
tunnel's failure modes; here the full-program path and the forced
component-wise fallback (SAAMGE_CAPACITY_FORCE_COMPONENTS) both run on
a small hierarchy and must emit complete bench-schema JSON with a
positive V-cycle time and converged split-program PCG.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_bundle(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from run_scale_setup import solve_bundle

    from saamge_tpu.api import SpectralAMGSolver
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.topology.part import (partition_cartesian_3d,
                                          partition_cartesian_bricks)

    n, nb = 16, 8
    mesh = hex_mesh(n)
    rng = np.random.default_rng(7)
    coefs = 10.0 ** rng.uniform(-1.0, 1.0, mesh.num_elements)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    A, b, em, _, ess_dofs = assemble.build_discrete_problem(
        mesh, coef=coefs, rhs=1.0, ess_attr_marker=ess)
    part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
    supers = (2, 2, 2)
    s = SpectralAMGSolver(
        A, mesh, em,
        SolverOptions(num_levels=3, correct_nulspace=False,
                      nu_relax=[3, 1]),
        ess_attr_marker=ess, partitioning=part,
        coarse_part_override=lambda i: partition_cartesian_bricks(
            (nb,) * 3, supers))
    out = {"ndof": A.shape[0], "levels": [A.shape[0]],
           "phases": {}, "peak_rss_gb": 0.0}
    bundle = solve_bundle(s.ml, b, out, supers=supers)
    fac = assemble.diffusion_factorized(mesh, coefs)
    bundle["mfree"] = (fac[0], fac[1], ess_dofs)
    path = tmp_path_factory.mktemp("cap") / "bundle16.pkl"
    with open(path, "wb") as f:
        pickle.dump(bundle, f)
    return str(path)


def _run(bundle, force_components):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    if force_components:
        env["SAAMGE_CAPACITY_FORCE_COMPONENTS"] = "1"
    else:
        env.pop("SAAMGE_CAPACITY_FORCE_COMPONENTS", None)
    out = subprocess.run(
        [sys.executable, "scripts/run_capacity.py", bundle, "--direct"],
        capture_output=True, text=True, timeout=900, cwd=".", env=env)
    assert out.returncode == 0, out.stderr[-1500:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_capacity_full_program_path(small_bundle):
    d = _run(small_bundle, force_components=False)
    e = d["extra"]
    assert e["stage"] == "complete", e
    assert e["timing_method"] == "chained_x0_slope"
    assert e["vcycle_ms"] > 0 and d["value"] > 0
    assert e["pcg_iters_1e-8"] >= e["pcg_iters_1e-6"] > 0
    assert e["pcg_rel_res"] < 1e-5


def test_capacity_component_fallback(small_bundle):
    d = _run(small_bundle, force_components=True)
    e = d["extra"]
    assert e["stage"] == "complete", e
    assert e["timing_method"] == "component_sum_slope"
    assert all(v is not None and v >= 0
               for v in e["component_ms"].values()), e["component_ms"]
    assert e["pcg_preconditioner"] == "component_composed"
    assert e["pcg_iters_1e-8"] >= e["pcg_iters_1e-6"] > 0
    assert e["pcg_rel_res"] < 1e-5
