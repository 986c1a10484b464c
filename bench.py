"""Benchmark: multilevel V-cycle throughput on 3D Poisson (the BASELINE
metric — DOFs/sec/chip of the solve-phase hot loop, reference
tg_cycle_atb, tg.cpp:91-131).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "dofs/s", "vs_baseline": N,
   "extra": {...}}

Process architecture (round-4: the driver must ALWAYS get the line):
a SUPERVISOR parent spawns the measurement as a child process that
writes a progressively-enriched result snapshot to a status file after
every milestone (setup done -> compiled -> V-cycle measured [primary]
-> microbenchmarks -> optional component probes).  The parent enforces
a wall-clock ``--budget`` (default 1500 s): if the child hangs (the
axon tunnel has been observed to stall indefinitely inside one remote
compile RPC) or overruns, the parent kills it and prints the LAST
COMPLETE snapshot — so a slow-compile session degrades the artifact's
detail, never its existence.  Round 3 recorded nothing (rc=124)
because everything was emitted only at the very end of one process.

Setup caching: the full host setup (60-300 s at n=96, dominated by
remote-compile latency of the device eig pipeline) is pickled to
``.bench_cache/`` keyed by (n, brick, levels, theta, contrast,
bundle-version).  A rerun loads the bundle and goes straight to the
solve-phase measurement — any previous bench run leaves the cache warm
for the driver.

Measurement semantics (unchanged from round 3):
- vs_baseline is MEASURED: the same V-cycle applied through scipy-CSR
  host kernels on this machine (the reference's serial hypre path is the
  same algorithm over the same kind of CSR kernels).
- roofline_fraction compares the measured V-cycle time against a MINIMAL
  traffic model (operator values once per pass + 3 vector streams, f32)
  at the peak HBM stream rate measured on the same chip right before the
  timing — the strictest honest model (a CSR code would also stream
  column indices; stored-format padding is NOT counted).
- eig_device_fraction is the share of the device-setup pipeline spent in
  the batched eigensolver itself (vs assembly/masking/transfers): the
  closer to 1, the closer setup is to pure MXU dense-eig throughput.

The TPU path uses the structured brick hierarchy (solve/structured.py):
Cartesian brick agglomeration, blocked Pallas stencil passes, dense-block
P/R, exact coarse solve — the two-grid configuration the reference itself
tests (tg_solve + UMFPACK/AMG coarse, tg.cpp:991-1012).
"""

import argparse
import json
import os
import pickle
import subprocess
import sys
import tempfile
import time
import types

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import numpy as np

BUNDLE_VERSION = 1


# ----------------------------------------------------------------------
# snapshot emitter: the child's contract with the supervisor

class Emitter:
    def __init__(self, path):
        self.path = path
        self.payload = None

    def emit(self, payload):
        self.payload = payload
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)


def _skeleton(stage, platform="unknown", **extra):
    e = {"stage": stage, "platform": platform}
    e.update(extra)
    return {"metric": "bench_incomplete", "value": 0.0, "unit": "dofs/s",
            "vs_baseline": 0.0, "extra": e}


# ----------------------------------------------------------------------
# microbenchmarks (unchanged from round 3)

def measure_peak_stream(jnp, jax):
    """Peak HBM rate: max over two independent kernels, each streaming
    read-c + read-buffer + write-c = 3 N 4 bytes per step.

    (a) XLA chain: R barrier-separated nonlinear triad steps over K
        round-robin buffers, unrolled in one jitted program (a lone
        fused chain collapses to one read — the round-2 bug that
        recorded 2292 GB/s; the barrier chain instead was seen to
        UNDER-read at ~240 GB/s in some sessions).
    (b) Pallas chain: the same triad as an explicit blocked kernel —
        Mosaic cannot collapse or keep blocks resident across calls.

    The max of the two honest kernels is the peak estimate; both raw
    readings are reported so a fallback/disagreement is visible."""
    N = 64 * 1024 * 1024            # 256 MB per buffer
    K = 4

    def run(fn, c0, ops, traffic):
        float(fn(c0, *ops))
        best = float("inf")
        for k in range(2):
            t0 = time.perf_counter()
            float(fn(c0 * (1.0 + 1e-7 * (k + 1)), *ops))
            best = min(best, time.perf_counter() - t0)
        return traffic / best / 1e9

    bufs = tuple(jnp.full(N, 1.0 + 0.1 * i, jnp.float32)
                 for i in range(K))
    c0 = jnp.ones(N, jnp.float32)

    R = 128

    @jax.jit
    def f_xla(c, *bs):
        # statically-indexed buffers (a dynamic_index_in_dim copies the
        # 256 MB slice first, silently adding 2 streams per step)
        for r in range(R):
            c = jnp.abs(c) + 0.5 * bs[r % K]
            c = jax.lax.optimization_barrier(c)
        return jnp.sum(c)

    gb_xla = run(f_xla, c0, bufs, R * 3 * N * 4)

    from jax.experimental import pallas as pl
    BLK = 512 * 1024
    triad = pl.pallas_call(
        lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
            slice(None), jnp.abs(a_ref[...]) + 0.5 * b_ref[...]),
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec((BLK,), lambda i: (i,))] * 2,
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32))
    RP = 64

    @jax.jit
    def f_pl(c, *bs):
        for r in range(RP):
            c = jax.lax.optimization_barrier(triad(c, bs[r % K]))
        return jnp.sum(c)

    gb_pl = run(f_pl, c0, bufs, RP * 3 * N * 4)

    # pure-read pattern (STREAM-style best-of: the triad's 2R+1W mix
    # pays write-allocate overhead; a read-reduce exposes the raw read
    # stream, which is what the stencil passes mostly are)
    RD = 64

    @jax.jit
    def f_rd(c, *bs):
        acc = jnp.float32(0.0) * c[0]
        for r in range(RD):
            acc = jax.lax.optimization_barrier(
                acc + jnp.max(bs[r % K] * (1.0 + acc * 1e-30)))
        return acc

    gb_rd = run(f_rd, c0, bufs, RD * N * 4)
    del bufs, c0
    raw = {"xla_triad": round(gb_xla, 1), "pallas_triad": round(gb_pl, 1),
           "read": round(gb_rd, 1)}
    measured = max(gb_xla, gb_pl, gb_rd)
    # fall back to the v5e HBM spec only if the reading is implausible,
    # and report the raw values so the fallback is visible in the JSON
    if not (100.0 < measured < 1000.0):
        return 819.0, raw
    return measured, raw


def measure_vpu_gflops(jnp, jax):
    """Measured VPU FMA throughput (GFLOP/s) with the stencil root
    pass's actual program structure: K independent (vals_k * x) FMAs
    accumulated per output element over VMEM-resident blocks — the
    wavefront kernel's apply_stencil loop (ops/pallas_wavefront.py:
    153-159).  A dependent-chain probe measures FMA *latency*, not
    throughput, and under-read the rate ~7x, which made the bench's
    compute bound 7x looser than the measurement (VERDICT r4 weak 1) —
    always match program structure (CLAUDE.md round-3 traps)."""
    from jax.experimental import pallas as pl
    K, BR, M = 27, 64, 1024       # 27 offsets; (K,BR,M) f32 = 6.75 MB VMEM
    R = 131072                    # ~944 GFLOP/call: well past the ~30 ms
    #                               RPC floor (R=256 measured 35 GF/s —
    #                               pure floor; R=131072 measured 2.0 TF/s)

    def kern(v_ref, x_ref, o_ref):
        v = v_ref[...]

        def body(r, acc):
            y = v[0] * acc
            for k in range(1, K):
                y = y + v[k] * acc      # K independent FMAs, full ILP
            return y * jnp.float32(1e-2)

        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])

    f_pl = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((BR, M), jnp.float32))
    fj = jax.jit(lambda v, x: jnp.sum(f_pl(v, x)))
    v = jnp.full((K, BR, M), 1.0007, jnp.float32)
    x = jnp.full((BR, M), 0.5, jnp.float32)
    float(fj(v, x))
    best = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        float(fj(v * (1.0 + 1e-7 * (k + 1)), x))
        best = min(best, time.perf_counter() - t0)
    # per round per element: v[0]*acc (1) + (K-1) multiply-adds
    # (2K-2) + the final scale (1) = 2K ops
    return 2.0 * K * BR * M * R / best / 1e9


# ----------------------------------------------------------------------
# setup bundle (cacheable minimal solve product)

def _ml_shim(ml):
    """Minimal picklable shim of the attributes compile_structured
    reads (solve/structured.py) — same shape as
    scripts/run_scale_setup.solve_bundle, kept standalone so bench.py
    has no scripts/ dependency."""
    lv0, lv1 = ml.levels[0], ml.levels[1]
    rels = lv0.rels
    rels1 = lv1.rels
    tg0, tg1 = lv0.tg_data, lv1.tg_data
    return types.SimpleNamespace(levels=[
        types.SimpleNamespace(
            A=lv0.A,
            rels=types.SimpleNamespace(
                num_mises=rels.num_mises, mis_to_AE=rels.mis_to_AE,
                nparts=rels.nparts),
            tg_data=types.SimpleNamespace(
                smooth_interp=tg0.smooth_interp,
                poly_data=tg0.poly_data, tent_interp=tg0.tent_interp,
                interp_data=types.SimpleNamespace(
                    mis_numcoarsedof=tg0.interp_data.mis_numcoarsedof),
                Ac=tg0.Ac)),
        types.SimpleNamespace(
            rels=types.SimpleNamespace(
                num_mises=rels1.num_mises, mis_to_AE=rels1.mis_to_AE,
                nparts=rels1.nparts),
            tg_data=types.SimpleNamespace(
                smooth_interp=tg1.smooth_interp,
                restr=tg1.restr, tent_interp=tg1.tent_interp,
                interp_data=types.SimpleNamespace(
                    mis_numcoarsedof=tg1.interp_data.mis_numcoarsedof),
                poly_data=tg1.poly_data, Ac=tg1.Ac)),
    ])


def _level_stats(ml):
    stats = []
    for lv in ml.levels:
        tg = lv.tg_data
        stats.append({
            "n": int(lv.A.shape[0]), "nnz": int(lv.A.nnz),
            "deg": int(len(tg.poly_data.roots)),
            "interp_nnz": int(tg.interp.nnz),
            "restr_nnz": int(tg.restr.nnz),
            "interp_rows": int(tg.interp.shape[0]),
            "interp_cols": int(tg.interp.shape[1]),
            "Ac_n": int(tg.Ac.shape[0]),
        })
    return stats


def _cache_path(cache_dir, n, brick, levels, theta, contrast):
    key = f"n{n}_b{brick}_L{levels}_t{theta:g}_c{contrast:g}_v{BUNDLE_VERSION}"
    return os.path.join(cache_dir, f"bundle_{key}.pkl")


# ----------------------------------------------------------------------
# the measurement (child process)

def run_bench(args):
    emit = Emitter(args.status_file)
    emit.emit(_skeleton("start"))

    # --- tunnel liveness probe ----------------------------------------
    # The axon tunnel has been observed to list devices fine but hang
    # INDEFINITELY on the first compile RPC (a trivial matmul > 30 min).
    # Probe compile+execute in a SUBPROCESS (a hung RPC is not
    # interruptible in-process) and pin the CPU platform if it fails,
    # so the artifact says platform=cpu + tunnel_unresponsive=true
    # instead of the driver recording nothing.
    tunnel_unresponsive = False
    if os.environ.get("JAX_PLATFORMS") != "cpu" and not args.no_probe:
        probe_src = ("import jax, jax.numpy as jnp; "
                     "print(float(jax.jit(lambda x: (x * x + 1.0).sum())"
                     "(jnp.ones((256, 256)))))")
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               timeout=args.probe_timeout,
                               capture_output=True)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            tunnel_unresponsive = True
            os.environ["JAX_PLATFORMS"] = "cpu"
            print(f"[bench] TPU tunnel unresponsive "
                  f"(probe > {args.probe_timeout:.0f}s or failed); "
                  f"falling back to the CPU platform", file=sys.stderr)

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor an explicit CPU request (the axon sitecustomize ignores
        # the env var; the config API wins — cf. tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        # CPU backend => no persistent compile cache (machine-feature-
        # mismatched CPU AOT loads segfault; saamge_tpu.__init__)
        jax.config.update("jax_compilation_cache_dir", None)
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if args.n:
        n = args.n
    elif args.small or not on_tpu:
        n = 16
    else:
        n = 96
    structured = on_tpu and n >= 32 and n % args.brick == 0
    ndof_expect = (n + 1) ** 3
    theta = args.theta
    if theta == 0.0:
        # keep the coarse space dense-inverse-sized at scale
        theta = 0.003 if ndof_expect < 500_000 else 1e-4

    emit.emit(_skeleton("probed", platform,
                        tunnel_unresponsive=tunnel_unresponsive, n=n))

    from saamge_tpu.utils.logging import TIMERS

    # --- setup (cached when possible) ---------------------------------
    cpath = _cache_path(args.cache_dir, n, args.brick, args.levels,
                        theta, args.contrast)
    bundle = None
    if structured and not args.no_cache and os.path.exists(cpath):
        try:
            with open(cpath, "rb") as f:
                bundle = pickle.load(f)
            if bundle.get("version") != BUNDLE_VERSION:
                bundle = None
        except Exception as e:                      # corrupt cache
            print(f"[bench] cache load failed: {e}", file=sys.stderr)
            bundle = None
    from_cache = bundle is not None

    if from_cache:
        ml = bundle["ml"]
        b = bundle["b"]
        supers = bundle["supers"]
        level_stats = bundle["level_stats"]
        coarse_dims = bundle["coarse_dims"]
        n_ae0, nparts0 = bundle["n_ae0"], bundle["nparts0"]
        host_dt = bundle["host_vcycle_ms"] / 1e3
        setup_times = bundle["setup"]
        ndof = bundle["ndof"]
        nb = n // args.brick
        print(f"[bench] setup bundle loaded from {cpath}", file=sys.stderr)
    else:
        from saamge_tpu.api import SpectralAMGSolver
        from saamge_tpu.config import SolverOptions
        from saamge_tpu.fem import assemble
        from saamge_tpu.fem.mesh import hex_mesh

        t0 = time.perf_counter()
        mesh = hex_mesh(n)
        ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
        rng = np.random.default_rng(7)
        coefs = 10.0 ** rng.uniform(-args.contrast, args.contrast,
                                    mesh.num_elements)
        A, b, em, _, _ = assemble.build_discrete_problem(
            mesh, coef=coefs, rhs=1.0, ess_attr_marker=ess)
        assemble_s = time.perf_counter() - t0
        ndof = A.shape[0]

        t0 = time.perf_counter()
        if structured:
            from saamge_tpu.topology.part import (
                partition_cartesian_3d, partition_cartesian_bricks)
            nb = n // args.brick
            part = partition_cartesian_3d(mesh.elem_centers(), nb, nb, nb)
            # superbrick 3rd-level partitioning (~64 bricks per
            # superbrick) keeps the coarsest restriction block-diagonal
            # (solve/structured.py build_structured_interp2)
            sgrid = min((d for d in range(1, nb + 1) if nb % d == 0),
                        key=lambda d: abs(d - nb / 4))
            supers = (sgrid,) * 3 if (args.levels >= 3 and sgrid > 1) \
                else None
            override = (lambda i: partition_cartesian_bricks(
                (nb,) * 3, supers)) if supers else None
            opts = SolverOptions(
                num_levels=args.levels, correct_nulspace=False,
                first_theta=theta, theta=theta, nu_relax=[3, 1],
                device_setup=not args.host_setup)
            s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess,
                                  partitioning=part,
                                  coarse_part_override=override)
        else:
            supers = None
            nb = 0
            num_levels = args.levels if ndof > 5000 else 2
            opts = SolverOptions(
                num_levels=num_levels, correct_nulspace=False,
                first_theta=theta, theta=theta,
                first_elems_per_agg=256, elems_per_agg=256,
                device_setup=False)
            s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess)
        setup_s = time.perf_counter() - t0
        setup_times = {
            "assemble_s": round(assemble_s, 2),
            "setup_s": round(setup_s, 2),
            "setup_device_pipeline_s": round(
                TIMERS.total("setup.device_pipeline"), 2),
            "setup_eig_phase_s": round(
                TIMERS.total("setup.device_pipeline.eigh"), 2),
            "setup_rr_refine_s": round(
                TIMERS.total("setup.device_pipeline.rr"), 2),
        }
        level_stats = _level_stats(s.ml)
        coarse_dims = [int(lv.tg_data.Ac.shape[0]) for lv in s.ml.levels]
        rels0 = s.ml.levels[0].rels
        n_ae0 = int(rels0.AE_to_dof.row_sizes()[0])
        nparts0 = int(rels0.nparts)

        # --- measured CPU baseline: same V-cycle through scipy CSR ----
        from saamge_tpu.solve.vcycle import VCycleSolver
        vs_host = VCycleSolver(s.ml.finest.tg_data)
        vs_host.set_operator(s.ml.finest.A)
        xh = np.zeros(ndof)
        vs_host.mult(b, xh)
        host_reps = 1 if ndof > 500_000 else 3
        t0 = time.perf_counter()
        for _ in range(host_reps):
            vs_host.mult(b, xh)
        host_dt = (time.perf_counter() - t0) / host_reps

        ml = s.ml
        if structured and not args.no_cache:
            os.makedirs(args.cache_dir, exist_ok=True)
            bundle = {
                "version": BUNDLE_VERSION, "ml": _ml_shim(s.ml), "b": b,
                "supers": supers, "level_stats": level_stats,
                "coarse_dims": coarse_dims, "n_ae0": n_ae0,
                "nparts0": nparts0,
                "host_vcycle_ms": host_dt * 1e3,
                "setup": setup_times, "ndof": ndof,
            }
            with open(cpath + ".tmp", "wb") as f:
                pickle.dump(bundle, f)
            os.replace(cpath + ".tmp", cpath)
            print(f"[bench] setup bundle cached to {cpath}",
                  file=sys.stderr)

    emit.emit(_skeleton("setup_done", platform, ndof=ndof,
                        from_cache=from_cache, **setup_times))

    # --- compile the device hierarchy ---------------------------------
    t0 = time.perf_counter()
    wf_segs = None
    if structured:
        from saamge_tpu.solve.structured import (BrickGeometry,
                                                 compile_structured,
                                                 struct_pcg_solve)
        geo = BrickGeometry((nb, nb, nb), (args.brick,) * 3)
        # full-bf16 PRECONDITIONER (smoother diagonals, Rst, mid blocks);
        # the PCG operator matvec stays f32 (tests:
        # test_struct_full_bf16_preconditioner_iterations)
        # zlane must amortize its z-pad tax through the faster kernel:
        # measured root passes/V-cycles — n=96 ratio 1.32: zlane wins
        # (2.58 vs 4.09 ms cycle); n=128 ratio 1.98 and n=256 ratio
        # 1.49: flat wins (n=256: 2.35 vs 3.22 ms/pass)
        NZn = n + 1
        zpad_ratio = (-(-NZn // 128) * 128) / NZn
        layout = "zlane" if zpad_ratio <= 1.35 else "flat"
        # wavefront smoother sweeps (ops/pallas_wavefront.py): k chained
        # roots per diagonal HBM stream; _smooth_h falls back to chained
        # root passes whenever the sweep buffers don't fit VMEM
        h = compile_structured(ml, geo, mid_dtype=jnp.bfloat16,
                               smoother_dtype=jnp.bfloat16,
                               rp_dtype=jnp.bfloat16,
                               fine_layout=layout, super_bricks=supers,
                               window_contract=True, wavefront=True)

        def vcycle_once(hier, b0, c):
            # NB: must use the traced argument, not a closure — closure-
            # captured device arrays embed as program constants and blow
            # the remote-compile request past its size limit
            return hier.vcycle(b0, c)

        pcg = struct_pcg_solve

        from saamge_tpu.ops.pallas_stencil import PallasDIA
        from saamge_tpu.ops.pallas_wavefront import plan_segments
        A0m = h.A0s if h.A0s is not None else h.A0
        if h.wavefront and isinstance(A0m, PallasDIA):
            lead = 0 if A0m.interpret else 1
            wf_segs = plan_segments(A0m, len(h.taus0), True, lead)
    else:
        from saamge_tpu.solve.compiled import (compile_hierarchy,
                                               pcg_solve)
        h = compile_hierarchy(ml, dtype=jnp.float32)

        def vcycle_once(hier, b0, c):
            from saamge_tpu.solve.compiled import vcycle
            return vcycle(hier, b0, c)

        pcg = lambda hh, bb, **kw: pcg_solve(hh, bb, **kw)  # noqa: E731
    compile_s = time.perf_counter() - t0

    bdev = jnp.asarray(b, jnp.float32)
    x, iters, _ = pcg(h, bdev, max_iter=200)
    iters = int(iters)
    # the BASELINE.json metric is iteration parity at tol 1e-8
    # (mltest.cpp:639,775 squares rel_tol; VERDICT r4 item 6): the
    # tolerance is an operand, so this reuses the compiled program
    _, iters8, _ = pcg(h, bdev, rel_tol=1e-8, max_iter=200)
    iters8 = int(iters8)

    emit.emit(_skeleton("compiled", platform, ndof=ndof,
                        pcg_iters=iters, pcg_iters_1e_8=iters8,
                        compile_s=round(compile_s, 2)))

    # --- V-cycle timing: whole rep chain inside ONE jitted call, three
    # independently-compiled chains (different scan lengths = separate
    # autotune draws — the tunnel's slow-process lottery, CLAUDE.md; a
    # 4.2x draw spread was observed in one process, so two draws leave
    # too much tail risk in the single recorded number) ---
    draws = []
    for R in (args.reps, args.reps + 1, args.reps + 2):
        @jax.jit
        def chain(hier, b0):
            def body(c, _):
                return vcycle_once(hier, b0, c), ()
            y, _ = jax.lax.scan(body, jnp.zeros_like(b0), jnp.zeros(R))
            return jnp.sum(y)

        float(chain(h, bdev))
        t0 = time.perf_counter()
        float(chain(h, bdev * 1.000001))
        draws.append((time.perf_counter() - t0) / R)
    dt = min(draws)
    dofs_per_sec = ndof / dt

    # ============ PRIMARY PAYLOAD (emitted before anything else can
    # hang: stream/VPU/eig microbenchmarks and component probes only
    # ENRICH it) ========================================================
    num_solve_levels = len(level_stats) + 1
    extra = {
        "ndof": ndof, "platform": platform,
        "tunnel_unresponsive": tunnel_unresponsive,
        "structured": structured, "theta": theta,
        "setup_from_cache": from_cache,
        "coarse_dims": coarse_dims,
        "pcg_iters_1e-6": iters,
        "pcg_iters_1e-8": iters8,
        "vcycle_ms": round(dt * 1e3, 3),
        "vcycle_ms_draws": [round(d * 1e3, 3) for d in draws],
        "host_vcycle_ms": round(host_dt * 1e3, 3),
        "compile_s": round(compile_s, 2),
        "mid_resident": bool(structured and h.A1kT is not None),
        "stage": "primary",
    }
    extra.update(setup_times)
    payload = {
        "metric": f"3d_poisson_vcycle_dofs_per_sec_{platform}"
                  f"_n{ndof}_L{num_solve_levels}",
        "value": round(dofs_per_sec, 1),
        "unit": "dofs/s",
        "vs_baseline": round(host_dt / dt, 3),
        "extra": extra,
    }
    emit.emit(payload)

    # --- microbenchmarks (enrichment) ---------------------------------
    if on_tpu:
        peak_gbps, raw_stream = measure_peak_stream(jnp, jax)
        vpu_gflops = measure_vpu_gflops(jnp, jax)
    else:
        peak_gbps, raw_stream = 0.0, {}
        vpu_gflops = 0.0

    # --- minimal-traffic roofline model -------------------------------
    # bytes_model: nnz values once per pass + 3 vector streams (the
    # strictest honest model).  bytes_actual: what the chosen formats
    # really stream — the gap between the two IS the quantified blocker
    # (the mid level is floored at ~one coarse dof per MIS by the MIS
    # topology, and at that size its dense operator streams n_c^2 per
    # pass vs nnz in the model).
    bytes_model = 0.0
    bytes_actual = 0.0
    level_detail = []
    flops_levels = []           # per-level VPU FLOPs per cycle (compute
    #                             model: the stencil smoother is VPU-
    #                             bound at flagship, not stream-bound)
    for i, st in enumerate(level_stats):
        deg = st["deg"]
        passes = 2 * deg + 1                      # pre+post smooth + resid
        nrows = st["n"]
        bm = passes * (st["nnz"] + 3 * nrows) * 4
        bm += (st["interp_nnz"] + st["restr_nnz"]
               + 2 * (st["interp_rows"] + st["interp_cols"])) * 4
        if structured and i == 0:
            A0x = h.A0s if h.A0s is not None else h.A0
            it0sz = A0x.vals2.dtype.itemsize
            npad0 = h.A0.n_rows_pad * 128
            # compute model: (2 deg + 1) root-equivalent passes, each
            # 2 FLOP per (diagonal, padded element); wavefront sweeps
            # recompute the overlap rows (w2/br amplification)
            from saamge_tpu.ops.pallas_wavefront import _geom as _wfgeom
            if wf_segs is not None:
                _, w2a = _wfgeom(A0x.offsets, A0x.br, A0x.hb)
                c_amp = w2a / A0x.br
            else:
                c_amp = 1.0
            flops_levels.append(
                passes * 2 * len(h.A0.offsets) * c_amp * npad0)
            if wf_segs is not None:
                # wavefront sweeps: diagonals/b/dinv stream once per
                # SEGMENT (not per root pass); x-in is overlap-amplified
                # by the window rows w2/br; outputs 1 (+1 residual)
                from saamge_tpu.ops.pallas_wavefront import (
                    _geom, plan_segments)
                lead0 = 0 if A0x.interpret else 1
                segs_post = plan_segments(A0x, deg, False, lead0)
                _, w2 = _geom(A0x.offsets, A0x.br, A0x.hb)
                amp = w2 / A0x.br
                ba = 0.0
                for k_seg, emit_r in list(wf_segs) + list(segs_post):
                    ba += (len(h.A0.offsets) * npad0 * it0sz
                           + (2 + amp + 1 + (1 if emit_r else 0))
                           * npad0 * 4)
            else:
                ba = passes * (len(h.A0.offsets) * npad0 * it0sz
                               + 3 * npad0 * 4)
            if h.Wc is not None:
                # fused window kernels stream the Lz-padded tent slab
                # once per apply (R and P) + 4 shifted node-grid reads
                rstw = h.Wc[0]
                ba += 2 * (rstw.size * rstw.dtype.itemsize
                           + 4 * npad0 * 4) + 2 * nrows * 4
            else:
                ba += (h.Rst.size * h.Rst.dtype.itemsize
                       + 2 * h.Rst.shape[2] * h.Rst.shape[0] * 4
                       + 2 * nrows * 4)
        elif structured and i == 1:
            from saamge_tpu.solve.structured import BrickBlockOp
            # the chunked Pallas matvec (A1kC, ops/pallas_midmv.py)
            # streams the FULL per-offset packed blocks each pass — no
            # symmetry halving on that path, so traffic_bytes (which
            # halves under sym_stream) would under-model it ~2x
            chunked_b = (sum(a.size * a.dtype.itemsize for a in h.A1kC)
                         if getattr(h, "A1kC", None) is not None
                         else None)
            if isinstance(h.A1d, BrickBlockOp):
                mid_elems_b = (chunked_b if chunked_b is not None
                               else h.A1d.traffic_bytes)
                flops_levels.append(
                    passes * 2 * mid_elems_b
                    / h.A1d.blocks.dtype.itemsize)
            else:
                flops_levels.append(passes * 2 * nrows * nrows)
            if isinstance(h.A1d, BrickBlockOp) and h.A1kT is not None:
                # VMEM-resident chains: the packed per-offset rectangles
                # stream HBM->VMEM once per chain, two chains per cycle;
                # vectors (x, b, d in; x [+res] out) stream per chain
                from saamge_tpu.ops.pallas_midsmooth import SUB
                Lpad = h.A1kT[0].shape[-1]
                packed_b = sum(a.size * a.dtype.itemsize for a in h.A1kT)
                bsp = -(-h.A1d.bs // SUB) * SUB
                ba = 2 * packed_b + 9 * bsp * Lpad * 4
            elif isinstance(h.A1d, BrickBlockOp) and chunked_b is not None:
                # lane-chunked streamed Pallas matvec: full packed
                # per-offset blocks once per pass + vector streams
                ba = passes * (chunked_b + 3 * h.dinv1.shape[0] * 4)
            elif isinstance(h.A1d, BrickBlockOp):
                # brick-block operator streams its (k, bs, bs, NB) blocks
                ba = passes * (h.A1d.traffic_bytes
                               + 3 * h.dinv1.shape[0] * 4)
            else:
                ba = passes * (nrows * nrows * 2 + 3 * nrows * 4)
            # coarsest restriction/prolongation stream (block-diagonal
            # superbrick tent blocks, or the dense R1 twice)
            if h.Rst1 is not None:
                ba += 2 * h.Rst1.size * h.Rst1.dtype.itemsize
            elif h.R1 is not None:
                ba += 2 * h.R1.size * h.R1.dtype.itemsize
        else:
            ba = bm
            flops_levels.append(0.0)
        bytes_model += bm
        bytes_actual += ba
        det = {"n": nrows, "passes": passes,
               "model_mb": round(bm / 1e6, 1),
               "actual_mb": round(ba / 1e6, 1)}
        if peak_gbps and vpu_gflops:
            st_ms = ba / (peak_gbps * 1e9) * 1e3
            cp_ms = flops_levels[i] / (vpu_gflops * 1e9) * 1e3
            det["stream_ms"] = round(st_ms, 3)
            det["compute_ms"] = round(cp_ms, 3)
            det["bound"] = "compute" if cp_ms > st_ms else "stream"
        level_detail.append(det)
    n2 = level_stats[-1]["Ac_n"]
    bytes_model += (n2 * n2 + 2 * n2) * 4         # coarsest dense solve
    bytes_actual += (n2 * n2 + 2 * n2) * 4
    # NOTE: the minimal model counts operator values in f32; the bf16
    # preconditioner streams LESS than the model, so roofline_fraction
    # can legitimately approach/exceed 1 when the cycle runs at stream
    # rate.  format_fraction (measured time vs the bytes the chosen
    # formats+dtypes really stream) is the capped-at-1 efficiency.
    roofline_ms = bytes_model / (peak_gbps * 1e9) * 1e3 if peak_gbps \
        else float("nan")
    roofline_fraction = roofline_ms / (dt * 1e3) if peak_gbps else 0.0
    format_ms = bytes_actual / (peak_gbps * 1e9) * 1e3 if peak_gbps \
        else float("nan")
    format_fraction = format_ms / (dt * 1e3) if peak_gbps else 0.0
    # the BOUND model: each level costs max(its format-traffic stream
    # time, its VPU compute time) — at flagship the fine level is
    # compute-bound (54 FLOP/node/root vs a bf16 diagonal stream), so a
    # stream-only model under-predicts the achievable cycle time
    if peak_gbps and vpu_gflops:
        bound_ms = sum(max(d.get("stream_ms", 0.0),
                           d.get("compute_ms", 0.0))
                       for d in level_detail)
        bound_ms += (n2 * n2 + 2 * n2) * 4 / (peak_gbps * 1e9) * 1e3
        bound_fraction = bound_ms / (dt * 1e3)
    else:
        bound_ms, bound_fraction = float("nan"), 0.0

    eig_s = setup_times.get("setup_device_pipeline_s", 0.0)
    eig_phase_s = setup_times.get("setup_eig_phase_s", 0.0)

    def _r3(v):
        # NaN is not valid strict JSON; null the unmeasured fields
        return round(v, 3) if v == v and v not in (float("inf"),) else None

    extra.update({
        "peak_stream_gbps": round(peak_gbps, 1),
        "measured_stream_gbps": raw_stream,
        "vpu_gflops": round(vpu_gflops, 1),
        "roofline_model_ms": _r3(roofline_ms),
        "roofline_fraction": _r3(roofline_fraction),
        "format_traffic_ms": _r3(format_ms),
        "format_fraction": _r3(format_fraction),
        "bound_model_ms": _r3(bound_ms),
        "bound_fraction": _r3(bound_fraction),
        "levels": level_detail,
        "wavefront_segments": ([list(t) for t in wf_segs]
                               if structured and wf_segs is not None
                               else None),
        # eigensolver share of the device pipeline: the execution is
        # pure batched MXU matmuls (ops/filtered_eig.py); wall time
        # beyond a few seconds is remote-compile latency
        "eig_device_fraction": (round(eig_phase_s / max(eig_s, 1e-9), 3)
                                if eig_s else None),
        "stage": "models",
    })
    emit.emit(payload)

    # --- setup eigensolver throughput vs MXU dense capability ---------
    # (the BASELINE >=70%-of-MXU target): measured at the REAL setup
    # shapes — AE operator size and chunked batch — via the same
    # scan-chain method.
    eig_exec = None
    if on_tpu and structured and not args.host_setup:
        from saamge_tpu.ops.filtered_eig import measure_eig_throughput
        n_pad = -(-max(n_ae0, 8) // 32) * 32
        batch = min(512, nparts0)
        if n_pad >= 192:
            eig_exec = measure_eig_throughput(batch, n_pad, m=64)
    extra["eig_exec"] = eig_exec
    extra["stage"] = "eig"
    emit.emit(payload)

    # --- measured per-component times (opt-in: each probe is another
    # independent remote compile; the driver path must stay lean) -----
    if args.components and structured:
        measured = {}

        def timed_chain(name, body_fn, carry0, reps_c, operands=()):
            # large arrays must arrive through ``operands`` (traced jit
            # args): closure-captured device arrays embed as program
            # constants and blow the remote-compile request size limit.
            # UNROLL=4 applications per scan step: a one-op-per-step
            # scan chain measures 2-4x slower than the same op composed
            # inside a larger step (measured, CLAUDE.md round-3) — the
            # cycle composes many ops per step, so match that structure.
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
            extra["measured_components"] = measured
            emit.emit(payload)

        bh = h.pad0(bdev)
        xh0 = h.pad0(jnp.ones(ndof, jnp.float32))
        it0 = h.taus0[0]
        # measure the operator the PRECONDITIONER actually streams (the
        # bf16 twin when present), not the f32 PCG matvec operator
        timed_chain("l0_root_pass_ms",
                    lambda xh, hh: (hh.A0s or hh.A0).root_h(
                        it0, bh, hh.dinv0h, xh),
                    xh0, 400, operands=(h,))
        timed_chain("l0_residual_ms",
                    lambda xh, hh: (hh.A0s or hh.A0).residual_h(bh, xh),
                    xh0, 400, operands=(h,))
        if wf_segs is not None:
            def pre_body(xh, hh):
                am = hh.A0s if hh.A0s is not None else hh.A0
                x2, r2 = hh._smooth_h(am, hh.taus0, hh.dinv0h, bh, xh,
                                      emit_res=True)
                return x2 + 1e-30 * r2
            timed_chain("l0_presmooth_ms", pre_body, xh0, 100,
                        operands=(h,))
            timed_chain("l0_postsmooth_ms",
                        lambda xh, hh: hh._smooth_h(
                            hh.A0s if hh.A0s is not None else hh.A0,
                            hh.taus0, hh.dinv0h, bh, xh),
                        xh0, 100, operands=(h,))
        res0 = jnp.ones(ndof, jnp.float32)
        timed_chain(
            "apply_R_ms",
            lambda c, hh: jnp.sum(hh.apply_R(res0 * (1 + 1e-12 * c))),
            jnp.float32(0.0), 200, operands=(h,))
        xcf = jnp.ones(h.n_flat, jnp.float32)
        timed_chain(
            "apply_P_ms",
            lambda c, hh: jnp.sum(hh.apply_P(xcf * (1 + 1e-12 * c))),
            jnp.float32(0.0), 200, operands=(h,))
        if h.A1d is not None:
            n_mid = h.dinv1.shape[0]
            timed_chain("mid_matvec_ms",
                        lambda x, hh: hh._mid_matvec(x),
                        jnp.ones(n_mid, jnp.float32), 300, operands=(h,))
            if h.A1kT is not None:
                # VMEM-resident smoothing chains (ops/pallas_midsmooth):
                # the cycle runs one pre chain (roots + residual) and one
                # post chain instead of 2*deg1+1 operator streams
                from saamge_tpu.ops.pallas_midsmooth import (mid_chain,
                                                             pad_vec)
                A1 = h.A1d
                NBm = int(np.prod(A1.bricks))
                bsm = A1.bs
                b2m = pad_vec(jnp.ones(n_mid, jnp.float32), bsm, NBm)
                d2m = pad_vec(h.dinv1, bsm, NBm)

                def mid_pre(x2, hh, b2, d2):
                    xo, ro = mid_chain(hh.A1kT, A1.doffs, A1.rects,
                                       A1.bricks, bsm, NBm, hh.taus1,
                                       b2, d2, x2, emit_res=True,
                                       sym=hh.mid_sym)
                    return xo + 1e-30 * ro

                timed_chain("mid_chain_pre_ms", mid_pre,
                            jnp.zeros_like(b2m), 200,
                            operands=(h, b2m, d2m))
                timed_chain(
                    "mid_chain_post_ms",
                    lambda x2, hh, b2, d2: mid_chain(
                        hh.A1kT, A1.doffs, A1.rects, A1.bricks, bsm,
                        NBm, hh.taus1, b2, d2, x2, sym=hh.mid_sym),
                    jnp.zeros_like(b2m), 200, operands=(h, b2m, d2m))
            timed_chain(
                "coarsest_ms",
                lambda x, hh: x + hh._coarsest_correct(x),
                jnp.ones(n_mid, jnp.float32), 300, operands=(h,))
            deg0 = len(h.taus0)
            deg1 = len(h.taus1)
            if wf_segs is not None:
                l0_ms = (measured["l0_presmooth_ms"]
                         + measured["l0_postsmooth_ms"])
            else:
                l0_ms = (2 * deg0 * measured["l0_root_pass_ms"]
                         + measured["l0_residual_ms"])
            if h.A1kT is not None:
                mid_ms = (measured["mid_chain_pre_ms"]
                          + measured["mid_chain_post_ms"])
            else:
                mid_ms = (2 * deg1 + 1) * measured["mid_matvec_ms"]
            explained = (l0_ms
                         + measured["apply_R_ms"]
                         + measured["apply_P_ms"]
                         + mid_ms
                         + measured["coarsest_ms"])
            measured["explained_ms"] = round(explained, 3)
            measured["unexplained_ms"] = round(dt * 1e3 - explained, 3)
        extra["measured_components"] = measured

    extra["stage"] = "complete"
    emit.emit(payload)
    return payload


# ----------------------------------------------------------------------

def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny problem (CI / CPU smoke)")
    ap.add_argument("--n", type=int, default=0,
                    help="hex mesh resolution (elements per side)")
    ap.add_argument("--brick", type=int, default=8,
                    help="brick side length in elements")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--theta", type=float, default=0.0,
                    help="spectral tolerance (0 = size-based default)")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--contrast", type=float, default=2.0,
                    help="log10 range of the random element coefficient")
    ap.add_argument("--host-setup", action="store_true",
                    help="force the host (numpy f64) setup path")
    ap.add_argument("--probe-timeout", type=float, default=300.0,
                    help="seconds before declaring the TPU tunnel dead.  "
                         "Degraded windows measured 204-411 s for the "
                         "trivial probe program; in such a window the "
                         "full TPU bench cannot finish inside the budget "
                         "either, so falling back to a complete CPU "
                         "artifact (tunnel_unresponsive=true) is the "
                         "best available outcome")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the tunnel liveness probe")
    ap.add_argument("--budget", type=float, default=1100.0,
                    help="supervisor wall-clock budget (s); on overrun "
                         "the last complete snapshot is emitted.  "
                         "Measured full TPU runs complete in 661-780 s; "
                         "the default stays under the external driver's "
                         "~1200 s timeout so the parent always prints")
    ap.add_argument("--components", action="store_true",
                    help="also run the per-component timed_chain probes "
                         "(each is an extra remote compile)")
    ap.add_argument("--no-cache", action="store_true",
                    help="ignore / don't write the setup bundle cache")
    ap.add_argument("--cache-dir", type=str,
                    default=os.path.join(_REPO, ".bench_cache"))
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--direct", action="store_true",
                    help="run in-process without the supervisor "
                         "(no budget protection)")
    ap.add_argument("--status-file", type=str, default=None,
                    help=argparse.SUPPRESS)
    return ap


def main():
    args = build_parser().parse_args()

    if args.child or args.direct:
        payload = run_bench(args)
        if args.direct:
            print(json.dumps(payload))
        return 0

    # --- supervisor ----------------------------------------------------
    fd, status = tempfile.mkstemp(prefix="bench_status_", suffix=".json")
    os.close(fd)
    os.unlink(status)
    cmd = ([sys.executable, os.path.abspath(__file__)]
           + sys.argv[1:] + ["--child", "--status-file", status])
    t_start = time.monotonic()
    # child stdout -> our stderr: the ONLY stdout line this process
    # prints is the final JSON
    child = subprocess.Popen(cmd, stdout=sys.stderr, stderr=sys.stderr)
    rc = None
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
        payload = _skeleton("no_snapshot")
    payload.setdefault("extra", {})
    payload["extra"]["wall_s"] = round(time.monotonic() - t_start, 1)
    if budget_exceeded:
        payload["extra"]["budget_exceeded"] = True
        print(f"[bench] budget {args.budget:.0f}s exceeded; emitting "
              f"last snapshot (stage={payload['extra'].get('stage')})",
              file=sys.stderr)
    elif rc != 0:
        payload["extra"]["child_rc"] = rc
    sys.stderr.flush()
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
