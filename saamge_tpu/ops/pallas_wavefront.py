"""Wavefront (temporally-blocked) smoother sweeps: k chained polynomial
root passes — optionally plus the trailing residual — in ONE Pallas
kernel that streams the stencil diagonals from HBM ONCE.

The reference's smoothing loop applies the polynomial one root at a time
(smpr_compute_poly, smpr.hpp:319-339), re-reading the operator every
pass; our chained per-root kernels (ops/pallas_stencil.py) inherit that
traffic: a V-cycle with degree-10 smoothing runs 21 fine stencil passes,
each streaming the 27 diagonals (54 B/node bf16) — the dominant cost of
the whole solve at every measured size.  But the apply itself is cheap:
the zlane-style 27-tap roll/select/slice stencil measures 2.2-2.3
TFLOP/s on the VPU when VMEM-resident (54 FLOP/node/root), far above the
~0.6 TFLOP/s-equivalent HBM stream rate.  So the right schedule computes
ALL k roots per HBM pass.

Skewed-wavefront schedule over the haloed row-block grid of
ops.pallas_stencil.PallasDIA (same (t_rows, 128) vector layout, block
rows br, halo blocks hb):

  grid step j computes, for root level r = 1..k(+1),
      block i_r = j - (r-1)*hb
  Level r at block i needs level r-1 values on blocks [i-hb, i+hb];
  the newest of those (i+hb) is computed by level r-1 EARLIER IN THE
  SAME STEP, so levels are evaluated in ascending r.  Intermediate
  levels live in per-level circular VMEM buffers of 2*hb+2 block slots;
  diagonals / b / dinv ride circular buffers sized to the pipeline
  depth ((k_lev-1)*hb + 1 + lead slots) so each HBM block is DMA'd
  exactly once per sweep.  The final root level (and the optional
  residual level) leave through revisit-clamped output BlockSpecs.

Per-sweep HBM traffic: diagonals + b + dinv + x-in + x-window overlap +
outputs — independent of k.  A degree-10 pre-smooth + residual + post-
smooth V-cycle fine level drops from 21 diagonal streams to 2 (plus a
~1.2-2x compute term that the VPU covers at 2.2 TFLOP/s).

Sweeps are split into segments when the circular buffers would exceed
the VMEM budget (plan_segments); chained segments reproduce the exact
chained-kernel arithmetic, so results match blocked_dia_smoother's
root-by-root passes to f32 roundoff.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saamge_tpu.ops.pallas_stencil import PallasDIA, _plan

LANES = 128


def _rem(a, m):
    # int32 modulus regardless of jax_enable_x64 (program-id arithmetic
    # is int32; a python-int operand would promote to int64 under x64)
    return jax.lax.rem(a, jnp.int32(m))

# VMEM budget for the circular buffers (v5e has 128 MB; leave headroom
# for the output pipeline and Mosaic's own staging)
VMEM_BUDGET = 72 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _geom(offsets: Tuple[int, ...], br: int, hb: int):
    """(hpad, w2): the 16-aligned stencil row reach and window rows."""
    hr_need = max(abs(a) + 1 for a in
                  (divmod(int(o), LANES)[0] for o in offsets))
    hpad = _round_up(hr_need, 16)
    assert hpad <= hb * br, (hpad, hb, br)
    return hpad, br + 2 * hpad


def _sweep_vmem_bytes(pdia: PallasDIA, k: int, emit_res: bool,
                      lead: int) -> int:
    kd = len(pdia.offsets)
    br, hb = pdia.br, pdia.hb
    k_lev = k + (1 if emit_res else 0)
    S = 2 * hb + 2
    Sv = (k_lev - 1) * hb + 1 + lead
    hpad, w2 = _geom(pdia.offsets, br, hb)
    it = pdia.vals2.dtype.itemsize
    blk = br * LANES
    return (kd * Sv * blk * it            # diagonal circular buffer
            + (k_lev - 1) * S * blk * 4   # intermediate level buffers
            + 2 * Sv * blk * 4            # b, dinv
            + (lead + 1) * w2 * LANES * 4  # x windows
            + 4 * blk * 4)                # output pipeline slack


def plan_segments(pdia: PallasDIA, n_roots: int, emit_residual: bool,
                  lead: int = 1,
                  vmem_budget: int = VMEM_BUDGET) -> Optional[list]:
    """Split ``n_roots`` chained roots into wavefront segments that fit
    the VMEM budget.  Returns [(k_seg, emit_res_flag), ...] covering the
    roots in order (residual rides the last segment), or None when even
    a 2-level sweep does not fit (caller falls back to chained roots)."""
    kmax = 0
    for k in range(1, n_roots + 1):
        if _sweep_vmem_bytes(pdia, k, emit_residual and k == n_roots,
                             lead) <= vmem_budget:
            kmax = k
        else:
            break
    if kmax < 2 and not (kmax == 1 and n_roots == 1):
        return None
    nseg = -(-n_roots // kmax)
    base, extra = divmod(n_roots, nseg)
    sizes = [base + (1 if s < extra else 0) for s in range(nseg)]
    return [(sz, emit_residual and s == nseg - 1)
            for s, sz in enumerate(sizes)]


@lru_cache(maxsize=64)
def _build_sweep(offsets: Tuple[int, ...], n_rows_pad: int, br: int,
                 hb: int, k: int, emit_res: bool, vdtype, lead: int,
                 interpret: bool):
    """One wavefront segment: k root levels (+ optional residual level).

    Operands: taus (k,) f32 SMEM; xp, vals, b, dinv in HBM (pl.ANY).
    Outputs: x' haloed (t_rows, 128) f32 [, residual haloed]."""
    kd = len(offsets)
    groups = _plan(offsets)
    hpad, w2 = _geom(offsets, br, hb)
    hr = hb * br
    t_rows = n_rows_pad + 2 * hr
    grid_b = t_rows // br                  # haloed-layout row blocks
    nblk = n_rows_pad // br                # diagonal blocks
    D = hb                                 # wavefront skew per level
    k_lev = k + (1 if emit_res else 0)
    G = grid_b + (k_lev - 1) * D
    S = 2 * hb + 2                         # level-buffer slots
    Sv = (k_lev - 1) * D + 1 + lead        # diag/b/dinv slots
    e = hpad - (hb - 1) * br               # edge slice rows (0 < e <= br)
    nbuf = k_lev - 1

    def shift(win, b):
        if b == 0:
            return win
        rolled = pltpu.roll(win, LANES - b, 1)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (win.shape[0] - 1, LANES), 1)
        return jnp.where(lane < LANES - b, rolled[:-1], rolled[1:])

    def apply_stencil(vload, win):
        acc = jnp.zeros((br, LANES), jnp.float32)
        for b, taps in sorted(groups.items()):
            sh = shift(win, b)
            for d, a in taps:
                acc = acc + vload(d) * sh[hpad + a:hpad + a + br, :]
        return acc

    def kernel(tau_ref, xp_ref, vals_ref, b_ref, d_ref, *rest):
        outs = rest[:1 + (1 if emit_res else 0)]
        scr = rest[len(outs):]
        ybufs = scr[:nbuf]
        valsbuf, bbuf, dbuf, xwin = scr[nbuf:nbuf + 4]
        semx, semv, semb, semd = scr[nbuf + 4:nbuf + 8]
        j = pl.program_id(0)

        def x_dma(t):
            start = pl.multiple_of(t * br - hpad, 16)
            return pltpu.make_async_copy(
                xp_ref.at[pl.ds(start, w2), :],
                xwin.at[_rem(t, lead + 1)],
                semx.at[_rem(t, lead + 1)])

        def blk_dma(src, dst, sem, blk_i):
            slot = pl.multiple_of(_rem(blk_i, Sv) * br, 16)
            if src is vals_ref:
                return pltpu.make_async_copy(
                    src.at[:, pl.ds(pl.multiple_of(blk_i * br, 16), br),
                           :],
                    dst.at[:, pl.ds(slot, br), :], sem.at[_rem(
                        blk_i, Sv)])
            return pltpu.make_async_copy(
                src.at[pl.ds(pl.multiple_of(blk_i * br, 16), br), :],
                dst.at[pl.ds(slot, br), :], sem.at[_rem(blk_i, Sv)])

        def starts(t):
            # DMAs whose data is first consumed at step t
            @pl.when(jnp.logical_and(t >= hb, t < grid_b - hb))
            def _():
                x_dma(t).start()
                blk_dma(vals_ref, valsbuf, semv, t - hb).start()
                blk_dma(b_ref, bbuf, semb, t).start()
                blk_dma(d_ref, dbuf, semd, t).start()

        if lead:
            @pl.when(j == 0)
            def _():
                starts(0)
            starts(j + lead)
        else:
            starts(j)

        @pl.when(jnp.logical_and(j >= hb, j < grid_b - hb))
        def _():
            x_dma(j).wait()
            blk_dma(vals_ref, valsbuf, semv, j - hb).wait()
            blk_dma(b_ref, bbuf, semb, j).wait()
            blk_dma(d_ref, dbuf, semd, j).wait()

        def bd_slice(buf, i):
            slot = pl.multiple_of(_rem(i, Sv) * br, 16)
            return buf[pl.ds(slot, br), :]

        def vload_at(i):
            slot = pl.multiple_of(_rem(i - hb, Sv) * br, 16)

            def vload(d):
                return valsbuf[d, pl.ds(slot, br), :].astype(jnp.float32)
            return vload

        def window_from(yb, i):
            parts = []
            for m in range(-hb, hb + 1):
                slot = pl.multiple_of(
                    _rem(i + m, S) * br, 16)
                if m == -hb:
                    parts.append(yb[pl.ds(slot + (br - e), e), :])
                elif m == hb:
                    parts.append(yb[pl.ds(slot, e), :])
                else:
                    parts.append(yb[pl.ds(slot, br), :])
            if len(parts) == 1:
                return parts[0]
            return jnp.concatenate(parts, axis=0)

        def store(r, i, value):
            """Route level r's block i to its consumers."""
            if r < k_lev:
                slot = pl.multiple_of(_rem(i, S) * br, 16)
                ybufs[r - 1][pl.ds(slot, br), :] = value
            if r == k:
                outs[0][:, :] = value
            if emit_res and r == k_lev:
                outs[1][:, :] = value

        zeros = jnp.zeros((br, LANES), jnp.float32)
        for r in range(1, k_lev + 1):
            i_r = j - (r - 1) * D
            in_range = jnp.logical_and(i_r >= 0, i_r < grid_b)
            interior = jnp.logical_and(i_r >= hb, i_r < grid_b - hb)

            @pl.when(interior)
            def _(r=r, i_r=i_r):
                if r == 1:
                    win = xwin[_rem(j, lead + 1)] if lead \
                        else xwin[0]
                else:
                    win = window_from(ybufs[r - 2], i_r)
                ax = apply_stencil(vload_at(i_r), win)
                if emit_res and r == k_lev:
                    val = bd_slice(bbuf, i_r) - ax
                else:
                    xc = win[hpad:hpad + br, :]
                    val = xc + bd_slice(dbuf, i_r) \
                        * (bd_slice(bbuf, i_r) - ax) * tau_ref[r - 1]
                store(r, i_r, val)

            @pl.when(jnp.logical_and(in_range,
                                     jnp.logical_not(interior)))
            def _(r=r, i_r=i_r):
                store(r, i_r, zeros)

    out_shapes = [jax.ShapeDtypeStruct((t_rows, LANES), jnp.float32)]
    out_specs = [pl.BlockSpec(
        (br, LANES),
        lambda j, _s=(k - 1) * D: (jnp.clip(j - _s, 0, grid_b - 1), 0),
        memory_space=pltpu.VMEM)]
    if emit_res:
        out_shapes.append(jax.ShapeDtypeStruct((t_rows, LANES),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec(
            (br, LANES),
            lambda j, _s=k * D: (jnp.clip(j - _s, 0, grid_b - 1), 0),
            memory_space=pltpu.VMEM))

    scratch = ([pltpu.VMEM((S * br, LANES), jnp.float32)] * nbuf
               + [pltpu.VMEM((kd, Sv * br, LANES), vdtype),
                  pltpu.VMEM((Sv * br, LANES), jnp.float32),
                  pltpu.VMEM((Sv * br, LANES), jnp.float32),
                  pltpu.VMEM((lead + 1, w2, LANES), jnp.float32),
                  pltpu.SemaphoreType.DMA((lead + 1,)),
                  pltpu.SemaphoreType.DMA((Sv,)),
                  pltpu.SemaphoreType.DMA((Sv,)),
                  pltpu.SemaphoreType.DMA((Sv,))])

    itv = jnp.dtype(vdtype).itemsize
    nbytes = (kd * n_rows_pad * LANES * itv
              + (3 + w2 / br + len(out_shapes)) * n_rows_pad * LANES * 4)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=(out_shapes[0] if not emit_res else tuple(out_shapes)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(out_specs[0] if not emit_res else tuple(out_specs)),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * kd * k_lev * n_rows_pad * LANES,
            bytes_accessed=int(nbytes), transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def wavefront_smooth(pdia: PallasDIA, inv_taus: tuple, bh, dinvh, xh,
                     emit_residual: bool = False,
                     segments: Optional[list] = None):
    """Chained root passes x <- x + dinv (b - A x) / tau_r over the
    haloed layout, temporally blocked; optionally also returns the
    trailing residual b - A x.  ``inv_taus``: tuple of (1,) f32 device
    arrays (same objects StructuredHierarchy carries).  Returns xh' or
    (xh', resh).  ``segments``: precomputed plan_segments result."""
    lead = 0 if pdia.interpret else 1
    if segments is None:
        segments = plan_segments(pdia, len(inv_taus), emit_residual,
                                 lead)
    assert segments is not None, "wavefront does not fit VMEM"
    pos = 0
    resh = None
    for k_seg, emit in segments:
        tau_vec = jnp.concatenate(
            [t.reshape(-1) for t in inv_taus[pos:pos + k_seg]])
        fn = _build_sweep(pdia.offsets, pdia.n_rows_pad, pdia.br,
                          pdia.hb, k_seg, emit, pdia.vals2.dtype,
                          lead, pdia.interpret)
        out = fn(tau_vec, xh, pdia.vals2, bh, dinvh)
        if emit:
            xh, resh = out
        else:
            xh = out
        pos += k_seg
    if emit_residual:
        return xh, resh
    return xh
