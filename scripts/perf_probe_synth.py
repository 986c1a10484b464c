"""Synthetic per-op V-cycle probe at large structured shapes.

Builds a StructuredHierarchy from random device arrays with exactly the
shapes/dtypes/layouts of the scale config (zlane fine layout, bf16
smoother/mid/rp — run_scale_setup.py --solve), so probing an 8M-dof
cycle needs no 35-minute setup, and times the full V-cycle plus each op
via jitted scan chains (the only honest timing through the tunnel; see
CLAUDE.md).

This probe is how the round-3 "588 ms V-cycle at 8.12M dofs" mystery
was resolved: the same shapes in a fresh process measure ~35 ms,
matching the per-level traffic model — the scale run had drawn the
tunnel's slow-process lottery (identical compiled programs run up to
20x slower in some processes).  Per-op results at n=200 (bs=20):
L0 root pass 1.21 ms @ 598 GB/s, applyR/applyP 5.25 ms each (the box
extraction + 6-axis transpose glue, not the contraction, which is
1.3 ms), mid matvec 1.37 ms, coarsest dense R1 9.9 ms @ 709 GB/s.

Usage: python scripts/perf_probe_synth.py [--n 200] [--brick 8]
       [--bs 20] [--n2 5524]
"""
import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from saamge_tpu.solve.structured import (BrickGeometry, BrickBlockOp,
                                         StructuredHierarchy)
from saamge_tpu.ops.sparse import DeviceDIA
from saamge_tpu.ops.pallas_stencil import PallasDIA


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--brick", type=int, default=8)
    ap.add_argument("--bs", type=int, default=20,
                    help="coarse slots per brick (pad width)")
    ap.add_argument("--n2", type=int, default=5524,
                    help="coarsest dimension")
    ap.add_argument("--only-vcycle", action="store_true",
                    help="time only the full V-cycle (lottery sampling)")
    args = ap.parse_args()

    n, brick, bs, n2 = args.n, args.brick, args.bs, args.n2
    nb = n // brick
    geo = BrickGeometry((nb,) * 3, (brick,) * 3)
    NXn, NYn, NZn = geo.nodes
    nzp = -(-NZn // 128) * 128
    nfl = NXn * NYn * nzp
    n_fine = NXn * NYn * NZn
    NB, box = geo.num_bricks, geo.box
    n_flat = NB * bs

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    offs = tuple(dx * (NYn * nzp) + dy * nzp + dz
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                 for dz in (-1, 0, 1))
    vals = jax.random.normal(ks[0], (27, nfl), jnp.float32) * 0.01
    dia = DeviceDIA(vals, offs, (nfl, nfl))
    A0 = PallasDIA.from_dia(dia)
    A0s = PallasDIA.from_dia(dia, dtype=jnp.bfloat16)
    del vals, dia
    dinv0h = A0.pad(jnp.full((nfl,), 0.1, jnp.float32))
    taus0 = tuple(jnp.asarray([0.1], jnp.float32) for _ in range(3))

    Rst = (jax.random.normal(ks[1], (bs, box, NB), jnp.float32) * 0.01) \
        .astype(jnp.bfloat16)
    blocks = (jax.random.normal(ks[2], (27, bs, bs, NB), jnp.float32)
              * 0.01).astype(jnp.bfloat16)
    doffs = tuple((dx, dy, dz) for dx in (-1, 0, 1)
                  for dy in (-1, 0, 1) for dz in (-1, 0, 1))
    A1d = BrickBlockOp(blocks, doffs, (nb, nb, nb), bs)
    dinv1 = jnp.full((n_flat,), 0.1, jnp.float32)
    taus1 = (jnp.asarray([0.1], jnp.float32),)
    R1 = (jax.random.normal(ks[3], (n2, n_flat), jnp.float32) * 0.01) \
        .astype(jnp.bfloat16)
    Ainv = jax.random.normal(ks[4], (n2, n2), jnp.float32) * 0.01

    h = StructuredHierarchy(A0, dinv0h, taus0, Rst, A1d, dinv1, taus1,
                            R1, Ainv, geo, n_fine, n_flat, flat_id=None,
                            nzp=nzp, A0s=A0s, Rst_pad=None)
    jax.block_until_ready(h.Rst)
    print("hierarchy built", flush=True)

    bdev = jax.random.normal(ks[5], (n_fine,), jnp.float32)
    results = {}

    def timed(name, make_body, carry0, reps, traffic_bytes=None,
              operands=()):
        @jax.jit
        def chain(c0, *ops):
            def body(c, _):
                return make_body(c, *ops), ()
            y, _ = jax.lax.scan(body, c0, jnp.zeros(reps))
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x), y, jnp.float32(0.0))

        t0 = time.perf_counter()
        float(chain(carry0, *operands))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(carry0, *operands))
        dt = (time.perf_counter() - t0) / reps
        entry = {"ms": round(dt * 1e3, 4), "compile_s": round(tc, 1)}
        if traffic_bytes:
            entry["gbps"] = round(traffic_bytes / dt / 1e9, 1)
            entry["mb"] = round(traffic_bytes / 1e6, 1)
        results[name] = entry
        print(name, entry, flush=True)

    timed("full_vcycle", lambda x, hier, b0: hier.vcycle(b0, x),
          jnp.zeros(n_fine, jnp.float32), 20, operands=(h, bdev))
    if args.only_vcycle:
        print(json.dumps({"n_fine": n_fine, "results": results}))
        return

    npad = A0.n_rows_pad * 128
    xh0 = h.pad0(jnp.ones(n_fine, jnp.float32))
    bh = h.pad0(bdev)
    it0 = taus0[0]
    timed("L0_root_pass_bf16",
          lambda xh, hh: hh.A0s.root_h(it0, bh, hh.dinv0h, xh),
          xh0, 100, (27 * 2 + 4 * 4) * npad, operands=(h,))
    timed("L0_residual_bf16", lambda xh, hh: hh.A0s.residual_h(bh, xh),
          xh0, 100, (27 * 2 + 3 * 4) * npad, operands=(h,))

    res0 = jnp.ones(n_fine, jnp.float32)
    rp_bytes = NB * bs * box * 2 + n_fine * 4
    timed("applyR",
          lambda c, hh: jnp.sum(hh.apply_R(res0 * (1 + 1e-12 * c))),
          jnp.float32(0.0), 50, rp_bytes, operands=(h,))
    xcf = jnp.ones(n_flat, jnp.float32)
    timed("applyP",
          lambda c, hh: jnp.sum(hh.apply_P(xcf * (1 + 1e-12 * c))),
          jnp.float32(0.0), 50, rp_bytes, operands=(h,))

    x1 = jnp.ones(n_flat, jnp.float32)
    timed("mid_matvec", lambda x, hh: hh._mid_matvec(x), x1, 100,
          A1d.nbytes, operands=(h,))
    timed("coarsest_R1_Ainv_P1",
          lambda x, hh: x + hh.R1.T @ (hh.Ainv @ (hh.R1 @ x)), x1,
          50, 2 * R1.size * 2 + n2 * n2 * 4, operands=(h,))
    timed("pad_unpad",
          lambda c, hh: jnp.sum(hh.unpad0(
              hh.pad0(bdev * (1 + 1e-12 * c)))),
          jnp.float32(0.0), 100, 4 * n_fine * 4, operands=(h,))

    print(json.dumps({"n_fine": n_fine, "results": results}))


if __name__ == "__main__":
    main()
