"""Driver-grade single-chip CAPACITY measurement (VERDICT r4 item 1).

Measures the solve hot loop (reference tg_cycle_atb,
/root/reference/amg/src/tg.cpp:91-131) at the capacity point — by
default the 33.1M-dof n=320 hierarchy — in the full-capacity
configuration: NO stored fine operator (exact-f32 matrix-free PCG
matvec + bf16 matrix-free smoother twin, ops/pallas_mfree.py),
placeholder mid blocks with numpy-prepped lane-chunked matvec arrays
(ops/pallas_midmv.py), no redundant Rst upload, bf16 coarsest inverse.

Architecture mirrors bench.py: a SUPERVISOR process with a wall-clock
budget relaunches itself as a child that snapshots a bench-schema JSON
payload after every milestone; on child hang/death/budget overrun the
supervisor emits the last snapshot, so a partial run still produces an
artifact of record.  The tunnel-specific failure modes (axon's opaque
per-program resource ceiling rejects scan-fused chains at this size
and is session-flaky even for the single-program V-cycle — PARITY.md
round-4 capacity notes) are handled as recorded fallbacks:

  timing ladder: (1) chained x0-operand executions, slope of N=30 vs
  N=10 wall (removes dispatch+fetch overhead); (2) independent
  dispatches, same slope.  PCG runs split-program (one V-cycle
  program + one matvec program + host scalars).  Each rung's outcome
  lands in the JSON (``timing_method``, ``tunnel_errors``).

Geometry/configuration are DERIVED FROM THE BUNDLE (ADVICE r4): n from
ndof, the brick grid from the level-0 AE count, supers/mfree from the
bundle fields.  Produce the bundle with
  python scripts/run_scale_setup.py --n 320 --brick 8 --host-setup \
      --mfree --frugal --hier-cache /tmp/hier320.pkl
Usage:
  python scripts/run_capacity.py [bundle.pkl] [--budget S] [--direct]
"""

import argparse
import json
import os
import pickle
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def _emitter(path):
    import bench
    return bench.Emitter(path)


def run_child(args):
    import bench
    emit = _emitter(args.status_file)
    extra = {"stage": "start", "platform": "unknown",
             "bundle": args.bundle, "tunnel_errors": {}}
    payload = {"metric": "capacity_incomplete", "value": 0.0,
               "unit": "dofs/s", "vs_baseline": 0.0, "extra": extra}
    emit.emit(payload)

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor an explicit CPU request through the config API — the
        # axon sitecustomize overrides the env var alone (CLAUDE.md;
        # without this the CPU-pinned test subprocesses attach to the
        # REMOTE TPU and can poison a concurrent capacity session)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from saamge_tpu.solve.structured import (BrickGeometry,
                                             compile_structured)
    extra["platform"] = jax.devices()[0].platform

    t0 = time.perf_counter()
    with open(args.bundle, "rb") as f:
        bundle = pickle.load(f)
    ml, rhs = bundle["ml"], bundle["b"]
    supers, mfree_t = bundle.get("supers"), bundle.get("mfree")
    out_meta = bundle.get("out", {})
    ndof = len(rhs)
    n = round(ndof ** (1.0 / 3.0)) - 1
    assert (n + 1) ** 3 == ndof, (n, ndof)
    nparts = ml.levels[0].rels.nparts
    nb = round(nparts ** (1.0 / 3.0))
    assert nb ** 3 == nparts, (nb, nparts)
    assert n % nb == 0, (n, nb)
    brick = n // nb
    extra.update({
        "stage": "loaded", "ndof": ndof, "n": n, "brick": brick,
        "levels": out_meta.get("levels"),
        "setup_phases": out_meta.get("phases"),
        "setup_peak_rss_gb": out_meta.get("peak_rss_gb"),
        "load_s": round(time.perf_counter() - t0, 1),
        "mfree": mfree_t is not None, "supers": supers,
    })
    payload["metric"] = (f"3d_poisson_capacity_vcycle_dofs_per_sec_"
                         f"{extra['platform']}_n{ndof}_L3")
    emit.emit(payload)

    geo = BrickGeometry((nb,) * 3, (brick,) * 3)
    # coarsest inverse precomputed ON HOST and cached next to the
    # bundle: the chunked device inverse at n2 ~ 17k balloons the
    # tunnel server's arena and poisons the session (measured round 5:
    # client-side live arrays 4.19 GB, yet a 132 MB program is denied
    # after compile; plain uploads of the same bytes are fine)
    ainv_pre = None
    apath = args.bundle + ".ainv.npy"
    n2 = ml.levels[1].tg_data.Ac.shape[0]
    if n2 > 4096:
        if os.path.exists(apath):
            ainv_pre = np.load(apath)
            extra["ainv_host"] = "cached"
        else:
            import scipy.linalg as sla
            t0 = time.perf_counter()
            Ac2h = np.asarray(ml.levels[1].tg_data.Ac.todense(),
                              np.float32)
            ainv_pre = sla.cho_solve(
                sla.cho_factor(Ac2h, lower=True),
                np.eye(n2, dtype=np.float32))
            np.save(apath, ainv_pre)
            extra["ainv_host"] = f"computed {time.perf_counter()-t0:.0f}s"
        emit.emit(payload)
    t0 = time.perf_counter()
    h = compile_structured(ml, geo, mid_dtype=jnp.bfloat16,
                           smoother_dtype=jnp.bfloat16,
                           rp_dtype=jnp.bfloat16,
                           fine_layout="flat", super_bricks=supers,
                           window_contract=True, wavefront=True,
                           mfree=mfree_t, hbm_frugal=True,
                           ainv_dtype=jnp.bfloat16,
                           ainv_precomputed=ainv_pre)
    del bundle, ml
    extra["compile_s"] = round(time.perf_counter() - t0, 1)
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        extra["hbm_in_use_gb"] = round(ms.get("bytes_in_use", 0) / 1e9, 2)
    except Exception:
        pass
    extra["stage"] = "compiled"
    emit.emit(payload)

    bdev = jnp.asarray(rhs, jnp.float32)
    vc1 = jax.jit(lambda hier, b0: hier.vcycle(b0, jnp.zeros_like(b0)))
    full_ok = True
    if os.environ.get("SAAMGE_CAPACITY_FORCE_COMPONENTS"):
        # operational/test hook: skip the fused program (e.g. when a
        # session is known to sit over the tunnel's per-program ceiling)
        full_ok = False
        extra["stage"] = "full_vcycle_skipped"
    else:
        try:
            t0 = time.perf_counter()
            y = vc1(h, bdev)
            s = float(jnp.sum(y))
            assert np.isfinite(s), s
            extra["first_vcycle_s"] = round(time.perf_counter() - t0, 1)
            extra["stage"] = "vcycle_once"
        except Exception as e:
            # the tunnel's opaque per-program resource ceiling
            # (PARITY.md round-4 capacity notes): the full V-cycle
            # program is session-flaky at 33M — fall back to
            # component-wise timing
            full_ok = False
            extra["tunnel_errors"]["full_vcycle"] = (
                type(e).__name__ + ": " + str(e)[:160])
            extra["stage"] = "full_vcycle_failed"
    emit.emit(payload)

    # --- V-cycle timing ladder ----------------------------------------
    # slope of wall(N=30) - wall(N=10) over 20 executions strips the
    # constant dispatch + fetch + RPC cost; two draws each N, min taken
    # (first-draw compile-lottery outliers, CLAUDE.md round-4)
    def slope_time(runner):
        ts = {}
        for N in (10, 30, 10, 30):
            t0 = time.perf_counter()
            runner(N)
            ts.setdefault(N, []).append(time.perf_counter() - t0)
        extra["timing_draws_s"] = {str(k): [round(x, 3) for x in v]
                                   for k, v in ts.items()}
        return (min(ts[30]) - min(ts[10])) / 20

    dt = None
    apply_B = lambda r: vc1(h, r)                      # noqa: E731
    if full_ok:
        vc = jax.jit(lambda hier, b0, x0: hier.vcycle(b0, x0))
        try:
            float(jnp.sum(vc(h, bdev, jnp.zeros_like(bdev))))

            def run_chain(N):
                x = jnp.zeros_like(bdev)
                for _ in range(N):
                    x = vc(h, bdev, x)
                float(jnp.sum(x))

            dt = slope_time(run_chain)
            extra["timing_method"] = "chained_x0_slope"
        except Exception as e:
            extra["tunnel_errors"]["chained"] = (type(e).__name__
                                                 + ": " + str(e)[:120])

            def run_indep(N):
                y = None
                for i in range(N):
                    y = vc1(h, bdev * (1.0 + 1e-9 * i))
                float(jnp.sum(y))

            dt = slope_time(run_indep)
            extra["timing_method"] = "independent_dispatch_slope"
    else:
        # COMPONENT-WISE fallback: each V-cycle stage as its own
        # program (all executed at 33M in round 4 even when the fused
        # program exhausts).  Vector-returning programs so the cycle
        # composes (and serves as the split PCG preconditioner); each
        # component timed by the two-point slope over async-chained
        # dispatches with one final scalar fetch.
        from saamge_tpu.solve.structured import mid_correct

        @jax.jit
        def c_sm_pre(hier, b0, x0):
            A0x = hier.A0s if hier.A0s is not None else hier.A0
            xh, resh = hier._smooth_h(A0x, hier.taus0, hier.dinv0h,
                                      hier.pad0(b0), hier.pad0(x0),
                                      emit_res=True)
            return hier.unpad0(xh), hier.unpad0(resh)

        @jax.jit
        def c_sm_post(hier, b0, x0):
            A0x = hier.A0s if hier.A0s is not None else hier.A0
            xh = hier._smooth_h(A0x, hier.taus0, hier.dinv0h,
                                hier.pad0(b0), hier.pad0(x0))
            return hier.unpad0(xh)

        @jax.jit
        def c_R(hier, res):
            return hier.apply_R(res)

        @jax.jit
        def c_mid(hier, rc):
            return mid_correct(hier, rc)

        @jax.jit
        def c_addP(hier, x, xc):
            return x + hier.apply_P(xc)

        def vc_comp(r):
            x, res = c_sm_pre(h, r, jnp.zeros_like(r))
            rc = c_R(h, res)
            xc = c_mid(h, rc)
            x = c_addP(h, x, xc)
            return c_sm_post(h, r, x)

        def time_part(name, step, fetch):
            """slope of N=12 vs N=4 async-chained executions."""
            try:
                fetch(step())               # compile + first run
                ts = {}
                for N in (4, 12, 4, 12):
                    t0 = time.perf_counter()
                    y = None
                    for _ in range(N):
                        y = step()
                    fetch(y)
                    ts.setdefault(N, []).append(
                        time.perf_counter() - t0)
                # clamp: at small scale the two-point slope can dip
                # below zero in host-noise; a component never costs
                # negative time
                return max((min(ts[12]) - min(ts[4])) / 8 * 1e3, 0.0)
            except Exception as e:
                extra["tunnel_errors"][name] = (
                    type(e).__name__ + ": " + str(e)[:120])
                return None

        try:
            # a tripped per-program ceiling poisons the session: even
            # these allocations then fail — record and bail gracefully
            # (the component path needs a FRESH process with
            # SAAMGE_CAPACITY_FORCE_COMPONENTS=1)
            zeros = jnp.zeros_like(bdev)
            rc0 = jnp.zeros(h.n_flat, jnp.float32)
            float(jnp.sum(zeros))
        except Exception as e:
            extra["tunnel_errors"]["session_poisoned"] = (
                type(e).__name__ + ": " + str(e)[:120])
            extra["stage"] = "failed"
            emit.emit(payload)
            return payload
        comp_ms = {
            "smooth_pre_res": time_part(
                "smooth_pre_res", lambda: c_sm_pre(h, bdev, zeros),
                lambda y: float(jnp.sum(y[0]))),
            "apply_R": time_part(
                "apply_R", lambda: c_R(h, bdev),
                lambda y: float(jnp.sum(y))),
            "mid_correct": time_part(
                "mid_correct", lambda: c_mid(h, rc0),
                lambda y: float(jnp.sum(y))),
            "addP": time_part(
                "addP", lambda: c_addP(h, bdev, rc0),
                lambda y: float(jnp.sum(y))),
            "smooth_post": time_part(
                "smooth_post", lambda: c_sm_post(h, bdev, zeros),
                lambda y: float(jnp.sum(y))),
        }
        extra["component_ms"] = comp_ms
        emit.emit(payload)
        if all(v is not None for v in comp_ms.values()):
            dt = sum(comp_ms.values()) / 1e3
            extra["timing_method"] = "component_sum_slope"
            # the full program is unusable this session: the split PCG
            # below composes the component programs instead
            apply_B = vc_comp
            extra["pcg_preconditioner"] = "component_composed"
    if dt is None:
        extra["stage"] = "failed"
        emit.emit(payload)
        return payload
    extra["vcycle_ms"] = round(dt * 1e3, 3)
    payload["value"] = round(ndof / dt, 1)
    host_ref_ms = out_meta.get("host_vcycle_ms")
    if host_ref_ms:
        payload["vs_baseline"] = round(host_ref_ms / (dt * 1e3), 3)
    extra["stage"] = "timed"
    emit.emit(payload)

    # --- split-program PCG (the tunnel rejects the fused while-loop at
    # this size): one V-cycle program + one matvec program, host
    # scalars; MFEM CGSolver semantics at rel 1e-6, continued to 1e-8
    # (the BASELINE.json tolerance)
    mv = jax.jit(lambda hier, x: hier.matvec0(x))
    d2 = jax.jit(lambda a, c: a @ c)
    try:
        t0 = time.perf_counter()
        z = apply_B(bdev)
        nom0 = float(d2(z, bdev))
        lim6, lim8 = nom0 * 1e-12, nom0 * 1e-16
        x = jnp.zeros_like(bdev)
        r = bdev
        d = z
        Ad = mv(h, d)
        nom, it = nom0, 0
        it6 = None
        while nom > lim8 and it < 200:
            alpha = nom / float(d2(d, Ad))
            x = x + alpha * d
            r = r - alpha * Ad
            z = apply_B(r)
            betanom = float(d2(r, z))
            d = z + (betanom / nom) * d
            Ad = mv(h, d)
            nom = betanom
            it += 1
            if it6 is None and nom <= lim6:
                it6 = it
        rel = float(jnp.linalg.norm(bdev - mv(h, x))
                    / jnp.linalg.norm(bdev))
        extra["pcg_iters_1e-6"] = it6
        extra["pcg_iters_1e-8"] = it
        extra["pcg_rel_res"] = rel
        extra["pcg_wall_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        extra["tunnel_errors"]["pcg"] = (type(e).__name__
                                         + ": " + str(e)[:120])
    extra["stage"] = "complete"
    emit.emit(payload)
    return payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle", nargs="?", default="/tmp/hier320.pkl")
    ap.add_argument("--budget", type=float, default=2400.0)
    ap.add_argument("--direct", action="store_true",
                    help="in-process, no supervisor")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--status-file", type=str, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child or args.direct:
        payload = run_child(args)
        if args.direct:
            print(json.dumps(payload))
        return 0

    fd, status = tempfile.mkstemp(prefix="capacity_status_",
                                  suffix=".json")
    os.close(fd)
    os.unlink(status)
    cmd = ([sys.executable, os.path.abspath(__file__)] + sys.argv[1:]
           + ["--child", "--status-file", status])
    t_start = time.monotonic()
    child = subprocess.Popen(cmd, stdout=sys.stderr, stderr=sys.stderr)
    budget_exceeded = False
    while True:
        rc = child.poll()
        if rc is not None:
            break
        if time.monotonic() - t_start > args.budget:
            budget_exceeded = True
            child.terminate()
            try:
                rc = child.wait(timeout=20)
            except subprocess.TimeoutExpired:
                child.kill()
                rc = child.wait()
            break
        time.sleep(1.0)

    payload = None
    if os.path.exists(status):
        try:
            with open(status) as f:
                payload = json.load(f)
            os.unlink(status)
        except Exception:
            payload = None
    if payload is None:
        payload = {"metric": "capacity_no_snapshot", "value": 0.0,
                   "unit": "dofs/s", "vs_baseline": 0.0,
                   "extra": {"stage": "no_snapshot"}}
    payload.setdefault("extra", {})
    payload["extra"]["wall_s"] = round(time.monotonic() - t_start, 1)
    if budget_exceeded:
        payload["extra"]["budget_exceeded"] = True
    elif rc != 0:
        payload["extra"]["child_rc"] = rc
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
