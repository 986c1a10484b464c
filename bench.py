"""Benchmark: multilevel V-cycle throughput on 3D Poisson (the BASELINE.json
metric — DOFs/sec/chip of the solve-phase hot loop, reference tg_cycle_atb).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "dofs/s", "vs_baseline": N}

vs_baseline is MEASURED: the same V-cycle applied through scipy-CSR host
kernels on this machine (the reference's serial hypre path is the same
algorithm over the same kind of CSR kernels), i.e.
vs_baseline = host_vcycle_time / device_vcycle_time.
"""

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny problem (CI / CPU smoke)")
    ap.add_argument("--n", type=int, default=0,
                    help="hex mesh resolution (elements per side)")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--host-setup", action="store_true",
                    help="force the host (numpy f64) setup path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    if args.n:
        n = args.n
    elif args.small or platform == "cpu":
        n = 10
    else:
        n = 40

    from saamge_tpu.api import SpectralAMGSolver
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.solve.compiled import compile_hierarchy, vcycle_apply

    t0 = time.perf_counter()
    mesh = hex_mesh(n)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    # generator meshes are uniform: host assembly integrates one element
    # and broadcasts (assemble_jax covers unstructured meshes on device)
    A, b, em, _, _ = assemble.build_discrete_problem(
        mesh, coef=1.0, rhs=1.0, ess_attr_marker=ess)
    num_levels = args.levels if A.shape[0] > 5000 else 2
    # device assembly is a single cheap kernel; the batched device
    # eigensolves are NOT used here — their per-bucket eigh compiles run
    # through remote compilation on tunneled backends and cost far more
    # than the host solves save (measured: 210-560s vs ~40s host)
    opts = SolverOptions(num_levels=num_levels, correct_nulspace=False,
                         first_elems_per_agg=256, elems_per_agg=256,
                         device_setup=False)
    s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess)
    setup_s = time.perf_counter() - t0

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    h = compile_hierarchy(s.ml, dtype=dtype)
    bdev = jnp.asarray(b, dtype=dtype)

    # The whole rep loop runs inside ONE jitted call (serialized through the
    # carried value) and the scalar fetch forces real completion — this
    # measures device time free of both async-queue lies and per-dispatch
    # RPC overhead on tunneled backends.
    from saamge_tpu.solve.compiled import precond

    @jax.jit
    def chain(hier, b0, reps_arr):
        def body(y, _):
            y = precond(hier, b0 + 1e-30 * y)
            return y, ()
        y, _ = jax.lax.scan(body, jnp.zeros_like(b0), reps_arr)
        return jnp.sum(y)

    reps_arr = jnp.zeros(args.reps)
    float(chain(h, bdev, reps_arr))          # compile + warmup
    t0 = time.perf_counter()
    float(chain(h, bdev, reps_arr))
    dt = (time.perf_counter() - t0) / args.reps

    ndof = A.shape[0]
    dofs_per_sec = ndof / dt

    # measured CPU baseline: the same V-cycle through scipy CSR on this
    # host (the reference's serial hypre path is the same algorithm on the
    # same kind of CSR kernels)
    from saamge_tpu.solve.vcycle import VCycleSolver
    vs_host = VCycleSolver(s.ml.finest.tg_data)
    vs_host.set_operator(A)
    xh = np.zeros(ndof)
    vs_host.mult(b, xh)                      # warm caches
    host_reps = 3
    t0 = time.perf_counter()
    for _ in range(host_reps):
        vs_host.mult(b, xh)
    host_dt = (time.perf_counter() - t0) / host_reps

    total_nnz_ops = 0.0
    for lv in s.ml.levels:
        deg = len(lv.tg_data.poly_data.roots)
        total_nnz_ops += (2 * deg + 1) * lv.A.nnz \
            + lv.tg_data.interp.nnz + lv.tg_data.restr.nnz
    ops_per_dof = total_nnz_ops / ndof
    vs = host_dt / dt                        # speedup over measured CPU

    print(json.dumps({
        "metric": f"3d_poisson_vcycle_dofs_per_sec_{platform}"
                  f"_n{ndof}_L{len(s.ml.levels) + 1}",
        "value": round(dofs_per_sec, 1),
        "unit": "dofs/s",
        "vs_baseline": round(vs, 3),
        "extra": {"setup_s": round(setup_s, 2), "vcycle_ms": round(dt * 1e3, 3),
                  "host_vcycle_ms": round(host_dt * 1e3, 3),
                  "ndof": ndof, "platform": platform,
                  "ops_per_dof": round(ops_per_dof, 1)},
    }))


if __name__ == "__main__":
    main()
