"""33M-dof single-chip capacity probe (VERDICT r3 item 7).

Loads the n=320 solve bundle (scripts/run_scale_setup.py --n 320
--mfree --frugal --hier-cache PATH), compiles the FULL-capacity
hierarchy — no stored fine operator (exact-f32 matrix-free PCG matvec,
bf16 matrix-free smoother twin), placeholder mid blocks + numpy-prepped
chunked matvec arrays, no redundant Rst upload, bf16 coarsest inverse;
measured static device footprint 3.7 GB — and measures the V-cycle by
the slope of chained single-program executions (the tunnel backend
rejects scan-fused chains at this size, see PARITY.md round-4 capacity
notes), then solves with a split-program PCG.

Usage: python scripts/run_capacity.py [bundle.pkl]
"""
import os, sys, time, pickle
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from saamge_tpu.solve.structured import BrickGeometry, compile_structured
path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hier320.pkl"
with open(path, "rb") as f:
    b = pickle.load(f)
ml, rhs, supers, mfree_t = b["ml"], b["b"], b["supers"], b["mfree"]
geo = BrickGeometry((40,)*3, (8,)*3)
t0 = time.perf_counter()
h = compile_structured(ml, geo, mid_dtype=jnp.bfloat16,
                       smoother_dtype=jnp.bfloat16, rp_dtype=jnp.bfloat16,
                       fine_layout="flat", super_bricks=supers,
                       window_contract=True, wavefront=True,
                       mfree=mfree_t, hbm_frugal=True,
                       ainv_dtype=jnp.bfloat16)
print("compile ok", round(time.perf_counter()-t0,1), flush=True)
del b, ml
bdev = jnp.asarray(rhs, jnp.float32)
n = len(rhs)
# EXACTLY probe D's program (x0 constructed inside): it is known-good
vc1 = jax.jit(lambda hier, b0: hier.vcycle(b0, jnp.zeros_like(b0)))
y = vc1(h, bdev); float(jnp.sum(y))
print("single vcycle ok", flush=True)
# x0-as-operand twin for the chained timing
vc = jax.jit(lambda hier, b0, x0: hier.vcycle(b0, x0))
try:
    y = vc(h, bdev, jnp.zeros_like(bdev)); float(jnp.sum(y))
    print("vc(x0) ok", flush=True)

    def run_N(N):
        x = jnp.zeros_like(bdev)
        t0 = time.perf_counter()
        for i in range(N):
            x = vc(h, bdev, x)
        float(jnp.sum(x))
        return time.perf_counter() - t0
    ts = {}
    for N in (10, 30, 10, 30):
        t = run_N(N); ts.setdefault(N, []).append(t)
        print(f"N={N}: {t:.3f}s", flush=True)
    slope = (min(ts[30]) - min(ts[10])) / 20
    print("VCYCLE_MS(slope)", round(slope*1e3, 2), "DOFS/S",
          round(n/slope/1e6, 1), "M", flush=True)
except Exception as e:
    print("FAIL vc(x0):", type(e).__name__, str(e)[:100], flush=True)
    # fallback: repeat vc1 executions (no dependency chaining) and use
    # the slope of wall time over N dispatches with a final fetch
    def run_N(N):
        t0 = time.perf_counter()
        y = None
        for i in range(N):
            y = vc1(h, bdev * (1.0 + 1e-9 * i))
        float(jnp.sum(y))
        return time.perf_counter() - t0
    ts = {}
    for N in (10, 30, 10, 30):
        t = run_N(N); ts.setdefault(N, []).append(t)
        print(f"indep N={N}: {t:.3f}s", flush=True)
    slope = (min(ts[30]) - min(ts[10])) / 20
    print("VCYCLE_MS(indep slope)", round(slope*1e3, 2), "DOFS/S",
          round(n/slope/1e6, 1), "M", flush=True)

# split-program PCG
mv = jax.jit(lambda hier, x: hier.matvec0(x))
d2 = jax.jit(lambda a, c: a @ c)
try:
    t0 = time.perf_counter()
    z = vc1(h, bdev)
    nom0 = d2(z, bdev)
    lim = float(nom0) * 1e-12
    x = jnp.zeros_like(bdev); r = bdev; d = z; Ad = mv(h, d)
    nom = float(nom0); it = 0
    while nom > lim and it < 150:
        alpha = nom / float(d2(d, Ad))
        x = x + alpha * d
        r = r - alpha * Ad
        z = vc1(h, r)   # note: z = B^-1 r with zero initial guess
        betanom = float(d2(r, z))
        d = z + (betanom / nom) * d
        Ad = mv(h, d)
        nom = betanom
        it += 1
    rel = float(jnp.linalg.norm(bdev - mv(h, x)) / jnp.linalg.norm(bdev))
    print("PCG it=", it, "rel_res", rel,
          round(time.perf_counter()-t0, 1), "s", flush=True)
except Exception as e:
    print("FAIL pcg:", type(e).__name__, str(e)[:100], flush=True)
