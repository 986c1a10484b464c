"""Synthetic same-process timing: matrix-free fine kernel
(ops/pallas_mfree.py) vs the stored-bf16 PallasDIA twin, at the real
geometries (n=96 zlane flagship, n=200/256 scale points).

Synthetic values (random c field / diagonals) — identical program
structure to the production passes (scan chain of root_h), so the
ratios transfer; correctness is covered by tests/test_mfree.py.

Usage: python scripts/mfree_probe.py [--n 96] [--layout zlane] [--reps 100]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--layout", default="zlane",
                    choices=["zlane", "flat"])
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import hex_mesh
    from saamge_tpu.ops.pallas_mfree import MatrixFreeQ1, _strides
    from saamge_tpu.ops.pallas_stencil import PallasDIA, LANES

    n = args.n
    NXn = NYn = NZn = n + 1
    dims = (NXn, NYn, NZn)
    nzp = (-(-NZn // 128) * 128) if args.layout == "zlane" else 0
    sx, sy = _strides(dims, nzp)
    n_lin = NXn * NYn * (nzp or NZn)
    offsets = tuple(sorted(dx * sx + dy * sy + dz
                           for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                           for dz in (-1, 0, 1)))
    k = len(offsets)
    br = PallasDIA.block_rows(k)
    n_rows = -(-n_lin // LANES)
    n_rows_pad = -(-n_rows // br) * br
    hr_need = max(abs(divmod(o, LANES)[0]) + 1 for o in offsets)
    hb = max(1, -(-hr_need // br))
    interp = jax.devices()[0].platform == "cpu"

    rng = np.random.default_rng(0)
    vals = rng.uniform(0.5, 1.5, (k, n_rows_pad, LANES))
    A0s = PallasDIA(jnp.asarray(vals, jnp.bfloat16), offsets,
                    (n_lin, n_lin), n_rows_pad, br, hb, interp)
    A0f = PallasDIA(jnp.asarray(vals, jnp.float32), offsets,
                    (n_lin, n_lin), n_rows_pad, br, hb, interp)

    em0 = assemble.diffusion_factorized(hex_mesh(2), 1.0)[0]
    c = 10.0 ** rng.uniform(-2, 2, n ** 3)
    ii = np.arange(NXn)
    bnd = (ii == 0) | (ii == n)
    ess3 = bnd[:, None, None] | bnd[None, :, None] | bnd[None, None, :]
    ess_dofs = np.flatnonzero(ess3.ravel())
    mf = MatrixFreeQ1.build(c, ess_dofs, em0, dims, nzp, A0f,
                            cdtype=jnp.bfloat16, interpret=interp)

    xh = A0f.pad(jnp.asarray(rng.standard_normal(n_lin), jnp.float32))
    bh = A0f.pad(jnp.asarray(rng.standard_normal(n_lin), jnp.float32))
    dh = A0f.pad(jnp.asarray(rng.uniform(0.1, 1.0, n_lin), jnp.float32))
    it = jnp.asarray([0.7], jnp.float32)

    out = {"n": n, "layout": args.layout, "ndof": n ** 3, "k": k,
           "br": br, "hb": hb}

    def timed(name, op):
        # three independently-compiled draws (different scan lengths =
        # separate autotune draws — the tunnel's slow-process lottery,
        # CLAUDE.md / bench.py); record the min and the raw draws
        draws = []
        for R in (args.reps, args.reps + 1, args.reps + 2):
            @jax.jit
            def chain(x0, opr, b0, d0):
                def body(xc, _):
                    return opr.root_h(it, b0, d0, xc), ()
                y, _ = jax.lax.scan(body, x0, jnp.zeros(R))
                return jnp.sum(y)

            float(chain(xh, op, bh, dh))
            t0 = time.perf_counter()
            float(chain(xh * 1.000001, op, bh, dh))
            draws.append(round((time.perf_counter() - t0) / R * 1e3, 4))
        out[name] = min(draws)
        out[name + "_draws"] = draws
        print(name, out[name], draws, flush=True)

    timed("root_stored_bf16_ms", A0s)
    timed("root_mfree_ms", mf)
    timed("root_stored_f32_ms", A0f)
    out["speedup_vs_bf16"] = round(
        out["root_stored_bf16_ms"] / out["root_mfree_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
