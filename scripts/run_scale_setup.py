"""Large-problem setup scaling demonstration (VERDICT r2 item 10).

Runs the full flagship setup pipeline — Cartesian hex mesh, slab-add
stencil assembly, brick partitioning, spectral AE coarsening (device
pipeline on TPU, host eigensolver otherwise), multilevel hierarchy —
at multi-million-dof sizes on one host + one chip, and prints one JSON
line with per-phase wall times and peak RSS.

The reference demonstrates the same scaling through MPI process counts
(mltest.cpp with an SPE10-sized run, aggregates.cpp:712-831 distributed
tables); the single-controller analog is host-memory-bounded setup with
device-offloaded numerics, so the relevant budget here is host RAM and
wall time.

Usage: python scripts/run_scale_setup.py [--n 200] [--levels 3]
       (n=200 -> 8.12M dofs)
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--brick", type=int, default=8)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--theta", type=float, default=1e-4)
    ap.add_argument("--contrast", type=float, default=2.0)
    ap.add_argument("--host-setup", action="store_true")
    ap.add_argument("--solve", action="store_true",
                    help="also compile the structured hierarchy and run "
                         "a PCG solve (TPU only)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor an explicit CPU request (the axon sitecustomize ignores
        # the env var; the config API wins — cf. tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.devices()[0].platform == "tpu"

    from saamge_tpu.api import SpectralAMGSolver
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.topology.part import partition_cartesian_3d
    from saamge_tpu.utils.logging import TIMERS

    phases = {}
    t0 = time.perf_counter()
    mesh = hex_mesh(args.n)
    phases["mesh_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(7)
    coefs = 10.0 ** rng.uniform(-args.contrast, args.contrast,
                                mesh.num_elements)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    t0 = time.perf_counter()
    A, b, em, _, _ = assemble.build_discrete_problem(
        mesh, coef=coefs, rhs=1.0, ess_attr_marker=ess)
    phases["assemble_s"] = round(time.perf_counter() - t0, 2)
    ndof = A.shape[0]

    nb = args.n // args.brick
    t0 = time.perf_counter()
    part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
    phases["partition_s"] = round(time.perf_counter() - t0, 2)

    opts = SolverOptions(
        num_levels=args.levels, correct_nulspace=False,
        first_theta=args.theta, theta=args.theta, nu_relax=[3, 1],
        device_setup=on_tpu and not args.host_setup)
    t0 = time.perf_counter()
    s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess,
                          partitioning=part)
    phases["setup_s"] = round(time.perf_counter() - t0, 2)
    phases["setup_device_pipeline_s"] = round(
        TIMERS.total("setup.device_pipeline"), 2)
    phases["setup_eig_phase_s"] = round(
        TIMERS.total("setup.device_pipeline.eigh"), 2)
    phases["setup_rap_s"] = round(TIMERS.total("setup.rap"), 2)

    out = {
        "metric": f"scale_setup_n{ndof}",
        "ndof": ndof,
        "levels": [lv.A.shape[0] for lv in s.ml.levels]
        + [s.ml.levels[-1].tg_data.Ac.shape[0]],
        "nnz": int(A.nnz),
        "phases": phases,
        "total_s": round(sum(v for k, v in phases.items()
                             if k.endswith("_s")
                             and not k.startswith("setup_device")
                             and k != "setup_eig_phase_s"
                             and k != "setup_rap_s"), 2),
        "peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "platform": jax.devices()[0].platform,
    }

    if args.solve and on_tpu:
        import jax.numpy as jnp
        from saamge_tpu.solve.structured import (BrickGeometry,
                                                 compile_structured,
                                                 struct_pcg_solve)
        geo = BrickGeometry((nb, nb, nb), (args.brick,) * 3)
        t0 = time.perf_counter()
        h = compile_structured(s.ml, geo, mid_dtype=jnp.bfloat16,
                               smoother_dtype=jnp.bfloat16,
                               rp_dtype=jnp.bfloat16, fine_layout="zlane")
        out["compile_s"] = round(time.perf_counter() - t0, 2)
        bdev = jnp.asarray(b, jnp.float32)
        x, iters, relres = struct_pcg_solve(h, bdev, max_iter=200)
        out["pcg_iters"] = int(iters)
        out["rel_res"] = float(relres)
        R = 20
        @jax.jit
        def chain(hier, b0):
            def body(c, _):
                return hier.vcycle(b0, c), ()
            y, _ = jax.lax.scan(body, jnp.zeros_like(b0), jnp.zeros(R))
            return jnp.sum(y)
        float(chain(h, bdev))
        t0 = time.perf_counter()
        float(chain(h, bdev * 1.000001))
        dt = (time.perf_counter() - t0) / R
        out["vcycle_ms"] = round(dt * 1e3, 3)
        out["dofs_per_sec"] = round(ndof / dt, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
