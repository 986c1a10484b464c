"""Per-component V-cycle probe from a cached solve bundle.

Loads the ``--hier-cache`` bundle written by scripts/run_scale_setup.py,
compiles the structured hierarchy (same flags as the scale driver), and
times every component of the cycle in cycle-matched scan chains — the
same instrumentation bench.py applies at the flagship size, available
at ANY cached size.  This is how the n=256 mid-level rectangle win and
the n=200 window-kernel win were found (CLAUDE.md round-3 notes): the
full-cycle number alone cannot localize a slack component.

Usage:
  python scripts/run_scale_setup.py --n 128 --hier-cache /tmp/h128.pkl
  python scripts/probe_cycle.py --hier-cache /tmp/h128.pkl

Prints one JSON line: full-cycle draws + per-component ms + the
explained/unexplained split.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hier-cache", type=str, required=True)
    ap.add_argument("--brick", type=int, default=8)
    ap.add_argument("--layout", type=str, default="",
                    help="override the z-pad-ratio layout rule")
    ap.add_argument("--no-wavefront", action="store_true")
    ap.add_argument("--no-mid-resident", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    with open(args.hier_cache, "rb") as f:
        bundle = pickle.load(f)
    ml, b, out = bundle["ml"], bundle["b"], bundle["out"]
    supers = bundle.get("supers")
    ndof = out["ndof"]
    n = round(ndof ** (1 / 3)) - 1
    nb = n // args.brick

    from saamge_tpu.ops.pallas_stencil import PallasDIA
    from saamge_tpu.ops.pallas_wavefront import plan_segments
    from saamge_tpu.solve.structured import (BrickBlockOp, BrickGeometry,
                                             compile_structured)

    geo = BrickGeometry((nb, nb, nb), (args.brick,) * 3)
    nzn = n + 1
    layout = args.layout or (
        "zlane" if (-(-nzn // 128) * 128) / nzn <= 1.35 else "flat")
    t0 = time.perf_counter()
    h = compile_structured(ml, geo, mid_dtype=jnp.bfloat16,
                           smoother_dtype=jnp.bfloat16,
                           rp_dtype=jnp.bfloat16, fine_layout=layout,
                           super_bricks=supers, window_contract=True,
                           wavefront=not args.no_wavefront,
                           # None = the VMEM fits gate decides (True
                           # FORCES the resident kernel and Mosaic-OOMs
                           # on shapes the gate rejects, e.g. n=200)
                           mid_resident=(False if args.no_mid_resident
                                         else None))
    compile_s = time.perf_counter() - t0
    bdev = jnp.asarray(b, jnp.float32)

    res = {"ndof": ndof, "layout": layout, "compile_s": round(compile_s, 2),
           "mid_resident": h.A1kT is not None}

    # --- full-cycle draws ----------------------------------------------
    draws = []
    for R in (args.reps, args.reps + 1, args.reps + 2):
        @jax.jit
        def chain(hier, b0):
            def body(c, _):
                return hier.vcycle(b0, c), ()
            y, _ = jax.lax.scan(body, jnp.zeros_like(b0), jnp.zeros(R))
            return jnp.sum(y)
        float(chain(h, bdev))
        t0 = time.perf_counter()
        float(chain(h, bdev * 1.000001))
        draws.append((time.perf_counter() - t0) / R)
    dt = min(draws)
    res["vcycle_ms_draws"] = [round(d * 1e3, 3) for d in draws]
    res["vcycle_ms"] = round(dt * 1e3, 3)
    res["dofs_per_sec"] = round(ndof / dt, 1)

    # --- per-component chains (bench.py's instrumentation) --------------
    measured = {}

    def timed_chain(name, body_fn, carry0, reps_c, operands=()):
        unroll = 4
        steps = max(1, reps_c // unroll)

        @jax.jit
        def cchain(c0, *ops):
            def body(c, _):
                for _ in range(unroll):
                    c = body_fn(c, *ops)
                return c, ()
            y, _ = jax.lax.scan(body, c0, jnp.zeros(steps))
            return jax.tree_util.tree_reduce(
                lambda a, v: a + jnp.sum(v), y, jnp.float32(0.0))
        float(cchain(carry0, *operands))
        tc = time.perf_counter()
        float(cchain(carry0, *operands))
        measured[name] = round(
            (time.perf_counter() - tc) / (steps * unroll) * 1e3, 4)

    bh = h.pad0(bdev)
    xh0 = h.pad0(jnp.ones(ndof, jnp.float32))
    it0 = h.taus0[0]
    timed_chain("l0_root_pass_ms",
                lambda xh, hh: (hh.A0s or hh.A0).root_h(
                    it0, bh, hh.dinv0h, xh),
                xh0, 100, operands=(h,))
    timed_chain("l0_residual_ms",
                lambda xh, hh: (hh.A0s or hh.A0).residual_h(bh, xh),
                xh0, 100, operands=(h,))
    A0m = h.A0s if h.A0s is not None else h.A0
    wf_segs = None
    if h.wavefront and isinstance(A0m, PallasDIA):
        lead = 0 if A0m.interpret else 1
        wf_segs = plan_segments(A0m, len(h.taus0), True, lead)
        res["wavefront_segments"] = [list(t) for t in wf_segs] \
            if wf_segs is not None else None
    if wf_segs is not None:
        def pre_body(xh, hh):
            am = hh.A0s if hh.A0s is not None else hh.A0
            x2, r2 = hh._smooth_h(am, hh.taus0, hh.dinv0h, bh, xh,
                                  emit_res=True)
            return x2 + 1e-30 * r2
        timed_chain("l0_presmooth_ms", pre_body, xh0, 40, operands=(h,))
        timed_chain("l0_postsmooth_ms",
                    lambda xh, hh: hh._smooth_h(
                        hh.A0s if hh.A0s is not None else hh.A0,
                        hh.taus0, hh.dinv0h, bh, xh),
                    xh0, 40, operands=(h,))
    res0 = jnp.ones(ndof, jnp.float32)
    timed_chain("apply_R_ms",
                lambda c, hh: jnp.sum(hh.apply_R(res0 * (1 + 1e-12 * c))),
                jnp.float32(0.0), 60, operands=(h,))
    xcf = jnp.ones(h.n_flat, jnp.float32)
    timed_chain("apply_P_ms",
                lambda c, hh: jnp.sum(hh.apply_P(xcf * (1 + 1e-12 * c))),
                jnp.float32(0.0), 60, operands=(h,))
    if h.A1d is not None:
        n_mid = h.dinv1.shape[0]
        timed_chain("mid_matvec_ms", lambda x, hh: hh._mid_matvec(x),
                    jnp.ones(n_mid, jnp.float32), 100, operands=(h,))
        if h.A1kT is not None:
            from saamge_tpu.ops.pallas_midsmooth import mid_chain, pad_vec
            A1 = h.A1d
            NBm = int(np.prod(A1.bricks))
            bsm = A1.bs
            b2m = pad_vec(jnp.ones(n_mid, jnp.float32), bsm, NBm)
            d2m = pad_vec(h.dinv1, bsm, NBm)

            def mid_pre(x2, hh, b2, d2):
                xo, ro = mid_chain(hh.A1kT, A1.doffs, A1.rects, A1.bricks,
                                   bsm, NBm, hh.taus1, b2, d2, x2,
                                   emit_res=True, sym=hh.mid_sym)
                return xo + 1e-30 * ro

            timed_chain("mid_chain_pre_ms", mid_pre, jnp.zeros_like(b2m),
                        60, operands=(h, b2m, d2m))
            timed_chain("mid_chain_post_ms",
                        lambda x2, hh, b2, d2: mid_chain(
                            hh.A1kT, A1.doffs, A1.rects, A1.bricks, bsm,
                            NBm, hh.taus1, b2, d2, x2, sym=hh.mid_sym),
                        jnp.zeros_like(b2m), 60, operands=(h, b2m, d2m))
        timed_chain("coarsest_ms",
                    lambda x, hh: x + hh._coarsest_correct(x),
                    jnp.ones(n_mid, jnp.float32), 100, operands=(h,))
        deg0 = len(h.taus0)
        deg1 = len(h.taus1)
        if wf_segs is not None:
            l0_ms = measured["l0_presmooth_ms"] \
                + measured["l0_postsmooth_ms"]
        else:
            l0_ms = (2 * deg0 * measured["l0_root_pass_ms"]
                     + measured["l0_residual_ms"])
        if h.A1kT is not None:
            mid_ms = measured["mid_chain_pre_ms"] \
                + measured["mid_chain_post_ms"]
        else:
            mid_ms = (2 * deg1 + 1) * measured["mid_matvec_ms"]
        explained = (l0_ms + measured["apply_R_ms"]
                     + measured["apply_P_ms"] + mid_ms
                     + measured["coarsest_ms"])
        measured["explained_ms"] = round(explained, 3)
        measured["unexplained_ms"] = round(dt * 1e3 - explained, 3)
    res["measured_components"] = measured

    # operator/format facts for the traffic model
    if isinstance(h.A1d, BrickBlockOp):
        res["mid_packed_mb"] = round(
            (sum(a.size * a.dtype.itemsize for a in h.A1kT) if h.A1kT
             else h.A1d.traffic_bytes) / 1e6, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
