"""Fused Pallas polynomial smoother for stencil (DIA) operators.

The solve-phase hot loop (smpr_compute_poly, smpr.hpp:319-339) applies

    for tau in roots:  x += D^{-1} (b - A x) / tau

as degree-many separate SpMV+axpy stages; each stage re-reads the operator
AND round-trips x through HBM.  For stencil operators whose diagonal
values fit VMEM (n up to ~10^5 at 27 diagonals), this kernel runs the
ENTIRE smoother in ONE pallas_call: A's diagonals, b, dinv and the padded
iterate all live in VMEM; every root is a static-offset shifted-read
(VPU) pass — no gathers, no HBM traffic between roots, one dispatch.

Roots and diagonal offsets are compile-time constants (baked into the
kernel), exactly like the reference's fixed SAS root table.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=64)
def _build(offsets: Tuple[int, ...], roots: Tuple[float, ...], n_pad: int,
           H: int, interpret: bool):
    """Compile the fused smoother for static (offsets, roots, n_pad)."""
    k = len(offsets)

    def kernel(vals_ref, b_ref, dinv_ref, x0_ref, out_ref, xe_ref):
        # xe: (1, n_pad + 2H) padded iterate in VMEM
        xe_ref[0, :] = jnp.zeros(n_pad + 2 * H, dtype=jnp.float32)
        xe_ref[0, H:H + n_pad] = x0_ref[0, :]
        b = b_ref[0, :]
        dinv = dinv_ref[0, :]
        for tau in roots:
            Ax = jnp.zeros(n_pad, dtype=jnp.float32)
            for d in range(k):
                off = offsets[d]
                Ax = Ax + vals_ref[d, :] * xe_ref[0, H + off:
                                                  H + off + n_pad]
            xnew = xe_ref[0, H:H + n_pad] + dinv * (b - Ax) * (1.0 / tau)
            xe_ref[0, H:H + n_pad] = xnew
        out_ref[0, :] = xe_ref[0, H:H + n_pad]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n_pad + 2 * H), jnp.float32)],
        interpret=interpret,
    )
    return jax.jit(fn)


def fits_vmem(n: int, k: int, budget_bytes: int = 10 << 20) -> bool:
    """vals (k, n) + b/dinv/x/xe — everything must sit in VMEM."""
    n_pad = _round_up(max(n, 1), 128)
    return (k + 5) * n_pad * 4 <= budget_bytes


def fused_dia_smoother(dia, dinv: jnp.ndarray, roots,
                       interpret: bool = False):
    """Returns smoother(b, x) -> x for a DeviceDIA operator, with all
    ``roots`` applied inside one Pallas kernel."""
    n = dia.shape[0]
    n_pad = _round_up(n, 128)
    offsets = tuple(int(o) for o in dia.offsets)
    H = _round_up(max((abs(o) for o in offsets), default=0) or 1, 128)
    roots_t = tuple(float(t) for t in np.asarray(roots))
    fn = _build(offsets, roots_t, n_pad, H, interpret)

    vals = jnp.zeros((len(offsets), n_pad), dtype=jnp.float32)
    vals = vals.at[:, :n].set(dia.vals.astype(jnp.float32))
    dpad = jnp.zeros((1, n_pad), dtype=jnp.float32).at[0, :n].set(
        dinv.astype(jnp.float32))

    def smoother(b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        bp = jnp.zeros((1, n_pad), dtype=jnp.float32).at[0, :n].set(
            b.astype(jnp.float32))
        xp = jnp.zeros((1, n_pad), dtype=jnp.float32).at[0, :n].set(
            x.astype(jnp.float32))
        out = fn(vals, bp, dpad, xp)
        return out[0, :n].astype(x.dtype)

    return smoother
