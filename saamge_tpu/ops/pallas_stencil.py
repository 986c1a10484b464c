"""Blocked Pallas stencil (DIA) kernels for operators beyond VMEM size.

The solve-phase hot loop streams the operator's diagonals from HBM once
per smoother root / SpMV (smpr_compute_poly, reference smpr.hpp:319-339;
tg_cycle_atb residual, tg.cpp:115) — that traffic (k diagonals x n x 4B)
is the roofline floor, so the only job of this kernel is to run each pass
at HBM stream rate.  XLA's lowering of the naive k-term shifted-slice sum
runs at ~5% of stream rate on TPU (unaligned minor-dim shifts); this
kernel fixes it by construction:

  - vectors live as (rows, 128) tiles in a HALOED layout: ``hr`` zero
    rows above and below the data.  Kernels consume and produce the
    haloed layout, so chained root passes are pure pallas_calls with no
    pad/slice glue between them (the halo is re-zeroed by edge programs
    each pass).
  - a linear stencil offset s splits into a row shift a = s // 128 and a
    lane shift b = s % 128; taps are grouped by b: one lane-roll + select
    per distinct b builds a "shift by b" window, and every tap in the
    group is then a pure row-slice of it.
  - the iterate window (block rows + halo) is DMA'd manually (overlapping
    windows are not a BlockSpec tiling); diagonal values, rhs, dinv and
    the output ride the automatic BlockSpec pipeline.
  - one pallas_call per root: roots are globally sequential (each reads
    neighbor values written by the previous), so the grid barrier between
    calls is semantically required; per-call cost is dominated by the
    unavoidable diagonal streaming.

Kernel modes: 'spmv' (y = A x), 'residual' (y = b - A x) and 'root'
(y = x + dinv (b - A x) / tau — the smpr root step).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(offsets: Tuple[int, ...]):
    """Split each offset into (row shift a, lane shift b), grouped by b."""
    groups = {}
    for d, off in enumerate(offsets):
        a, b = divmod(off, LANES)        # python divmod: 0 <= b < 128
        groups.setdefault(b, []).append((d, a))
    return groups


@lru_cache(maxsize=128)
def _build(offsets: Tuple[int, ...], n_rows_pad: int, br: int, hb: int,
           mode: str, interpret: bool):
    """Haloed-layout kernel.  Vectors are (T, 128) with T = n_rows_pad +
    2*hr, hr = hb*br.  Grid program j writes rows [j*br, (j+1)*br); the
    first/last hb programs own the halo and write zeros."""
    k = len(offsets)
    groups = _plan(offsets)
    hr = hb * br
    t_rows = n_rows_pad + 2 * hr
    w = br + 2 * hr                      # x window rows
    grid = t_rows // br
    nblk = n_rows_pad // br

    def vblk(j):
        # vals block for program j (interior j -> j - hb, edges clamped)
        return jnp.clip(j - hb, 0, nblk - 1)

    def apply_stencil(vals, xwin):
        acc = jnp.zeros((br, LANES), dtype=jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (w - 1, LANES), 1)
        for b, taps in sorted(groups.items()):
            if b == 0:
                shifted = xwin
            else:
                rolled = pltpu.roll(xwin, LANES - b, 1)  # [r, (l+b)%128]
                shifted = jnp.where(lane < LANES - b,
                                    rolled[:-1], rolled[1:])
            for d, a in taps:
                acc = acc + vals[d] * shifted[hr + a:hr + a + br, :]
        return acc

    def body(j, xp_ref, vals_ref, out_ref, xwin_ref, sem, emit):
        interior = jnp.logical_and(j >= hb, j < grid - hb)

        @pl.when(interior)
        def _():
            cp = pltpu.make_async_copy(
                xp_ref.at[pl.ds((j - hb) * br, w), :], xwin_ref, sem)
            cp.start()
            cp.wait()
            out_ref[:, :] = emit(apply_stencil(vals_ref, xwin_ref[:, :]))

        @pl.when(jnp.logical_not(interior))
        def _():
            out_ref[:, :] = jnp.zeros((br, LANES), jnp.float32)

    vspec = pl.BlockSpec((k, br, LANES), lambda j: (0, vblk(j), 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                         memory_space=pltpu.VMEM)

    if mode == "spmv":
        def kernel(xp_ref, vals_ref, out_ref, xwin_ref, sem):
            body(pl.program_id(0), xp_ref, vals_ref, out_ref, xwin_ref,
                 sem, lambda ax: ax)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY), vspec]
    elif mode == "residual":
        def kernel(xp_ref, vals_ref, b_ref, out_ref, xwin_ref, sem):
            body(pl.program_id(0), xp_ref, vals_ref, out_ref, xwin_ref,
                 sem, lambda ax: b_ref[:, :] - ax)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY), vspec, hspec]
    elif mode == "root":
        def kernel(tau_ref, xp_ref, vals_ref, b_ref, dinv_ref, out_ref,
                   xwin_ref, sem):
            def emit(ax):
                xc = xwin_ref[hr:hr + br, :]
                return xc + dinv_ref[:, :] * (b_ref[:, :] - ax) * tau_ref[0]
            body(pl.program_id(0), xp_ref, vals_ref, out_ref, xwin_ref,
                 sem, emit)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY), vspec, hspec,
                    hspec]
    else:  # pragma: no cover
        raise ValueError(mode)

    nbytes = (k + 3) * n_rows_pad * LANES * 4
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((t_rows, LANES), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, LANES), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(flops=2 * k * n_rows_pad * LANES,
                                      bytes_accessed=nbytes,
                                      transcendentals=0),
        interpret=interpret,
    )


@jax.tree_util.register_pytree_node_class
class PallasDIA:
    """DIA operator with blocked Pallas apply — the production format for
    stencil operators too large for the all-in-VMEM fused smoother.

    Layout: vals (k, n_rows_pad, 128) f32.  Vectors are carried in the
    haloed (t_rows, 128) layout between chained kernels; ``pad``/``unpad``
    convert from/to flat (n,) at the level boundaries."""

    def __init__(self, vals2, offsets, shape, n_rows_pad, br, hb,
                 interpret=False):
        self.vals2 = vals2                 # (k, n_rows_pad, 128)
        self.offsets = offsets
        self.shape = shape
        self.n_rows_pad = n_rows_pad
        self.br = br
        self.hb = hb                       # halo blocks (hr = hb * br)
        self.interpret = interpret

    def tree_flatten(self):
        return (self.vals2,), (self.offsets, self.shape, self.n_rows_pad,
                               self.br, self.hb, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def hr(self):
        return self.hb * self.br

    @staticmethod
    def block_rows(k: int, vmem_budget: int = 8 << 20) -> int:
        """Pick block rows so vals blocks double-buffer within budget
        (many-diagonal operators — e.g. the padded brick-major coarse
        DIA with hundreds of offsets — need small row blocks)."""
        br = 512
        while br > 8 and 2 * (k + 3) * br * LANES * 4 > vmem_budget:
            br //= 2
        return br

    @staticmethod
    def from_dia(dia, interpret: bool = False,
                 dtype=jnp.float32) -> "PallasDIA":
        """Build from an ops.sparse.DeviceDIA (vals (k, n) row-aligned,
        row i holds A[i, i+off]; out-of-range entries are zero).

        ``dtype``: storage dtype of the diagonal values.  bf16 halves
        the dominant per-pass stream (the k diagonals); arithmetic stays
        f32 (the kernel promotes).  The block geometry (br/hb) is dtype-
        independent so f32/bf16 twins share the haloed vector layout."""
        n = dia.shape[0]
        k = len(dia.offsets)
        br = PallasDIA.block_rows(k)
        n_rows = _round_up(n, LANES) // LANES
        n_rows_pad = _round_up(n_rows, br)
        hr_need = max(abs(a) + 1 for a in
                      (divmod(int(o), LANES)[0] for o in dia.offsets))
        hb = max(1, -(-hr_need // br))
        vals2 = jnp.zeros((k, n_rows_pad * LANES), dtype=dtype)
        vals2 = vals2.at[:, :n].set(dia.vals.astype(dtype))
        vals2 = vals2.reshape(k, n_rows_pad, LANES)
        return PallasDIA(vals2, tuple(int(o) for o in dia.offsets),
                         dia.shape, n_rows_pad, br, hb, interpret)

    # -- haloed-layout plumbing ------------------------------------------
    def pad(self, x):
        """flat (n,) -> haloed (t_rows, 128)."""
        xp = jnp.zeros(((2 * self.hr + self.n_rows_pad) * LANES,),
                       dtype=jnp.float32)
        xp = jax.lax.dynamic_update_slice(
            xp, x.astype(jnp.float32), (self.hr * LANES,))
        return xp.reshape(-1, LANES)

    def unpad(self, xh, dtype=jnp.float32):
        n = self.shape[0]
        flat = xh.reshape(-1)
        return flat[self.hr * LANES:self.hr * LANES + n].astype(dtype)

    def _fn(self, mode):
        return _build(self.offsets, self.n_rows_pad, self.br, self.hb,
                      mode, self.interpret)

    # -- haloed-layout kernels (chainable) -------------------------------
    def matvec_h(self, xh):
        return self._fn("spmv")(xh, self.vals2)

    def residual_h(self, bh, xh):
        return self._fn("residual")(xh, self.vals2, bh)

    def root_h(self, inv_tau, bh, dinvh, xh):
        """inv_tau must be a (1,) f32 array created OUTSIDE any jit trace:
        a python float would bake a literal into the kernel and Mosaic
        then specializes (duplicates) the program per root — measured 6x
        slower than one kernel reused with a runtime SMEM operand."""
        return self._fn("root")(inv_tau, xh, self.vals2, bh, dinvh)

    # -- flat-vector convenience (PCG matvec etc.) -----------------------
    def matvec(self, x):
        return self.unpad(self.matvec_h(self.pad(x)), x.dtype)


def blocked_dia_smoother(pdia: PallasDIA, dinv, roots):
    """smoother(b, x) -> x applying all roots as chained haloed passes
    (the reference root loop smpr_compute_poly, one stream-rate pass per
    root).  Accepts and returns flat vectors."""
    dinvh = pdia.pad(jnp.asarray(dinv))
    # device arrays, created here (outside jit) — see root_h docstring
    inv_taus = [jnp.asarray([1.0 / float(t)], jnp.float32)
                for t in np.asarray(roots)]

    def smoother(b, x):
        bh = pdia.pad(b)
        xh = pdia.pad(x)
        for it in inv_taus:
            xh = pdia.root_h(it, bh, dinvh, xh)
        return pdia.unpad(xh, x.dtype)

    return smoother
