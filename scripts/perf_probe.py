"""Per-component V-cycle timing probe on the real TPU.

Times each piece of the structured hierarchy's V-cycle (solve/structured.py)
via jitted lax.scan chains ending in a scalar fetch — the only reliable
timing method through the tunneled backend (block_until_ready lies; see
CLAUDE.md).  Locates where the measured cycle time goes so the roofline
work (VERDICT r2 items 2 and "weak" 2) targets the real bottleneck.

Usage: python scripts/perf_probe.py [--n 96] [--rebuild]
Caches the host setup product (pickle) in /tmp/saamge_probe_ml{n}.pkl so
kernel iterations don't pay the ~80 s setup each run.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_ml(n, brick, levels, theta):
    from saamge_tpu.api import SpectralAMGSolver
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.topology.part import partition_cartesian_3d

    mesh = hex_mesh(n)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    rng = np.random.default_rng(7)
    coefs = 10.0 ** rng.uniform(-2.0, 2.0, mesh.num_elements)
    A, b, em, _, _ = assemble.build_discrete_problem(
        mesh, coef=coefs, rhs=1.0, ess_attr_marker=ess)
    nb = n // brick
    part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
    opts = SolverOptions(num_levels=levels, correct_nulspace=False,
                         first_theta=theta, theta=theta, nu_relax=[3, 1],
                         device_setup=True)
    s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess,
                          partitioning=part)
    return s.ml, A, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--brick", type=int, default=8)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = f"/tmp/saamge_probe_ml{args.n}.pkl"
    if os.path.exists(cache) and not args.rebuild:
        with open(cache, "rb") as f:
            ml, A, b = pickle.load(f)
        print(f"loaded cached setup from {cache}")
    else:
        t0 = time.perf_counter()
        theta = 0.003 if args.n ** 3 < 500_000 else 1e-4
        ml, A, b = build_ml(args.n, args.brick, args.levels, theta)
        print(f"setup {time.perf_counter() - t0:.1f}s")
        with open(cache + ".tmp", "wb") as f:
            pickle.dump((ml, A, b), f)
        os.replace(cache + ".tmp", cache)

    from saamge_tpu.solve.structured import (BrickGeometry,
                                             compile_structured)
    nb = args.n // args.brick
    geo = BrickGeometry((nb, nb, nb), (args.brick,) * 3)
    t0 = time.perf_counter()
    h = compile_structured(ml, geo, mid_dtype=jnp.bfloat16)
    print(f"compile_structured {time.perf_counter() - t0:.1f}s")

    n0 = h.n_fine
    bdev = jnp.asarray(b, jnp.float32)
    results = {}

    def timed(name, make_body, carry0, reps, traffic_bytes=None,
              operands=()):
        """scan-chain timing: body(carry) -> carry, sequential dep.
        Large arrays must come through ``operands`` (traced jit args) —
        closure-captured device arrays embed as program constants and
        blow the remote-compile request size limit."""
        @jax.jit
        def chain(c0, *ops):
            def body(c, _):
                return make_body(c, *ops), ()
            y, _ = jax.lax.scan(body, c0, jnp.zeros(reps))
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x), y, jnp.float32(0.0))

        float(chain(carry0, *operands))           # compile+warm
        t0 = time.perf_counter()
        float(chain(carry0, *operands))
        dt = (time.perf_counter() - t0) / reps
        entry = {"ms": round(dt * 1e3, 4)}
        if traffic_bytes:
            entry["gbps"] = round(traffic_bytes / dt / 1e9, 1)
            entry["mb"] = round(traffic_bytes / 1e6, 1)
        results[name] = entry
        print(name, entry, flush=True)

    # ---- level 0 pieces ------------------------------------------------
    A0 = h.A0
    k0 = len(A0.offsets)
    npad = A0.n_rows_pad * 128
    bh = h.pad0(bdev)
    xh0 = h.pad0(jnp.ones(n0, jnp.float32))
    it0 = h.taus0[0]
    # traffic per root pass: k diags + x read + b + dinv + out
    root_bytes = (k0 + 4) * npad * 4

    timed("L0_root_pass",
          lambda xh, hh: hh.A0.root_h(it0, bh, hh.dinv0h, xh),
          xh0, 500, root_bytes, operands=(h,))
    timed("L0_residual", lambda xh, hh: hh.A0.residual_h(bh, xh),
          xh0, 500, (k0 + 3) * npad * 4, operands=(h,))
    timed("L0_spmv", lambda xh, hh: hh.A0.matvec_h(xh), xh0, 500,
          (k0 + 2) * npad * 4, operands=(h,))

    # ---- restriction / prolongation -----------------------------------
    res0 = jnp.ones(n0, jnp.float32)
    bs, box, NB = h.Rst.shape
    rp_bytes = (NB * bs * box + n0) * 4

    def r_chain(c, hh):
        # carry a scalar to force sequential re-execution
        rc = hh.apply_R(res0 * (1.0 + 1e-12 * c))
        return jnp.sum(rc)

    timed("applyR", r_chain, jnp.float32(0.0), 300, rp_bytes,
          operands=(h,))

    xcf = jnp.ones(h.n_flat, jnp.float32)

    def p_chain(c, hh):
        y = hh.apply_P(xcf * (1.0 + 1e-12 * c))
        return jnp.sum(y)

    timed("applyP", p_chain, jnp.float32(0.0), 300, rp_bytes,
          operands=(h,))

    # ---- mid level -----------------------------------------------------
    if h.A1d is not None:
        from saamge_tpu.solve.structured import BrickBlockOp
        if isinstance(h.A1d, BrickBlockOp):
            n_mid = h.n_flat
            a1_bytes = h.A1d.nbytes
        else:
            n_mid = h.A1d.shape[0]
            a1_bytes = h.A1d.size * h.A1d.dtype.itemsize
        x1 = jnp.ones(n_mid, jnp.float32)
        timed("mid_matvec", lambda x, hh: hh._mid_matvec(x), x1, 500,
              a1_bytes, operands=(h,))

        def mid_smooth(x, hh):
            for it in hh.taus1:
                x = x + hh.dinv1 * (jnp.ones(n_mid) - hh._mid_matvec(x)) \
                    * it[0]
            return x

        timed("mid_smoother_all_roots", mid_smooth, x1, 100,
              len(h.taus1) * a1_bytes, operands=(h,))

        n2 = h.Ainv.shape[0]
        timed("coarsest_R1_Ainv_P1",
              lambda x, hh: x + hh.R1.T @ (hh.Ainv @ (hh.R1 @ x)), x1,
              300, (2 * h.R1.size + n2 * n2) * 4, operands=(h,))

        # the padded-layout bridge gathers
        def bridge(c):
            rc = jnp.ones(h.n_flat) * (1.0 + 1e-12 * c)
            b1 = rc[h.flat_id]
            xc = jnp.zeros(h.n_flat).at[h.flat_id].set(b1)
            return jnp.sum(xc)

        timed("flatid_gather_scatter", bridge, jnp.float32(0.0), 300)

    # ---- pad/unpad glue ------------------------------------------------
    def pad_unpad(c, hh):
        xh = hh.pad0(bdev * (1.0 + 1e-12 * c))
        return jnp.sum(hh.unpad0(xh))

    timed("pad_unpad", pad_unpad, jnp.float32(0.0), 500, 4 * n0 * 4,
          operands=(h,))

    # ---- whole cycle ---------------------------------------------------
    timed("full_vcycle", lambda x, hier, b0: hier.vcycle(b0, x),
          jnp.zeros(n0, jnp.float32), 50, operands=(h, bdev))

    print(json.dumps({"n0": n0, "k0": k0, "NB": NB, "bs": bs, "box": box,
                      "n_c": 0,
                      "results": results}))


if __name__ == "__main__":
    main()
