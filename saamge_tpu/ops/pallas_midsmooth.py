"""VMEM-resident mid-level smoothing chains: all polynomial roots (and
the optional trailing residual) of one smoothing sweep over the
brick-block coarse operator in ONE Pallas kernel that DMAs the operator
blocks into VMEM ONCE.

The mid-level Galerkin operator (solve/structured.BrickBlockOp — the
reference's coarse ParCSR from hypre RAP, tg.hpp:696, restricted to the
brick-structured fast path) is small enough at flagship sizes that it
fits v5e VMEM (128 MB), yet the XLA per-root matvec re-streams it from
HBM every pass: a degree-nu_relax cycle runs 2*deg+1 passes
(smpr_compute_poly, smpr.hpp:319-339).  This kernel keeps the blocks
resident for a whole chain of roots, so the cycle's mid level streams
the operator exactly twice (pre-chain + residual, post-chain) regardless
of degree.  MEASURED (n=96 flagship): the chain is DMA-BOUND — the
whole-array HBM->VMEM load costs ~0.48 ms while each additional root is
~0.01 ms — so the resident layout is packed to the used-slot RECTANGLES
(BrickBlockOp.rects, ~42% of the dense slot pairs) per offset, each a
separate dense kernel input: ~2.4x fewer DMA bytes than the dense
(k, s2, s1, L) layout and no sublane-pad waste in the transfer.

Layout: offset k contributes its own input of shape (r2_k, r1pad_k, L)
— input-slot rows r2, output-slot rows r1 padded to the 16-row sublane
tile, brick axis L = NB rounded up to 128 lanes.  The neighbor-brick
shift for offset (dx, dy, dz) is a single lane roll of the (BSp, L)
vector by dx*BY*BZ + dy*BZ + dz: reads that would cross the grid
boundary (or wrap into the lane padding) land on structurally-zero
block entries, so no masking is needed; lane padding of the vectors is
kept zero by zero-padded dinv/b.

Numerics: the block-times-x products run in the BLOCK dtype (a f32
upcast of the blocks is loop-invariant across the chained roots and XLA
hoists it, keeping every offset's f32 copy live — a measured VMEM OOM
at n=128); the slot reduction and the root updates accumulate in f32,
and x stays f32 throughout (the XLA fused bf16 path rounds x itself to
bf16 before the multiply, a comparable rounding class).

Scheduling: two kernel variants picked by ``plan_mid_kernel``.  The
default "batched" schedule lets Mosaic issue every per-offset product
ahead of the reduction chain (fastest, but the peak holds ALL f32
product temps — n=128 sym measured 120.91M scheduled, over the 128 MB
VMEM no matter the vmem_limit, which the scheduler overshoots by the
~1 MB output stack).  The "serial" schedule fences each offset's
product on the running accumulator so only ~2 offsets' temps are in
flight, admitting shapes up to ~64 MB packed at ~5% extra VPU work."""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 16  # sublane tile (bf16; also a multiple of the f32 tile 8)

# Peak-VMEM budgets for the two kernel schedules (MEASURED, not
# capacity bounds).  In the default "batched" schedule Mosaic issues
# all kd per-offset products ahead of the reduction chain, so the
# compiled peak is packed blocks + EVERY (r2, r1p, L) f32 product temp
# (n=128 sym: 120.91M scheduled against 31.9 MB packed; the scheduler
# overshoots any vmem_limit given by the ~1 MB output stack, so limit
# tuning cannot admit it).  The "serial" schedule adds a value
# dependency of each offset's product on the running accumulator
# (jax.lax.optimization_barrier is not lowerable in Pallas TPU
# kernels), so only ~2 offsets' temps are in flight: peak = packed +
# O(2) product temps + vectors.  BATCHED_BUDGET is the scoped limit the
# flagship shape measurably compiles under; SERIAL_BUDGET leaves slack
# for scheduling inexactness under the 124M scoped limit.
BATCHED_BUDGET = 110 * 1024 * 1024
SERIAL_BUDGET = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sym_keep(doffs):
    """Indices of the lexicographically non-negative brick offsets.

    The coarse Galerkin operator is symmetric, so the block of offset
    -d is the slot-transpose of the block of +d shifted by d:
    B_{-d}[s2, s1, p + d] = B_{+d}[s1, s2, p].  Streaming only the kept
    half and applying each block both ways halves the resident DMA.

    Raises on any ONE-SIDED nonzero offset: a dropped negative offset
    with no kept mirror would lose that coupling silently, and a kept
    positive offset with no stored mirror would fabricate one — either
    way the operator is not offset-symmetric and every sym path would
    be silently wrong."""
    have = {tuple(d) for d in doffs}
    for td in have:
        if td != (0, 0, 0) and (-td[0], -td[1], -td[2]) not in have:
            raise ValueError(
                "one-sided brick offset %s has no mirror: the operator "
                "is not offset-symmetric and symmetry halving would "
                "silently mis-apply this coupling" % (td,))
    return tuple(i for i, d in enumerate(doffs)
                 if tuple(d) >= (0, 0, 0))


def plan_mid_kernel(rects, bs: int, NB: int, itemsize: int,
                    doffs=None):
    """Pick the kernel schedule for a shape: ``("batched", peak)``,
    ``("serial", peak)``, or ``(None, peak)`` when even the serialized
    schedule exceeds its budget.  ``doffs`` given = symmetry-halved
    packing (each resident block applied forward + transposed, so the
    per-offset f32 temps double)."""
    sym = doffs is not None
    L = _round_up(NB, LANES)
    BSp = _round_up(bs, SUB)
    keep = _sym_keep(doffs) if sym else range(len(rects))
    rows_k = [rects[i][1] * _round_up(max(rects[i][0], 1), SUB)
              for i in keep]
    packed = sum(rows_k) * L * itemsize
    vec = 8 * BSp * L * 4
    pair = 2 if sym else 1
    batched = packed + vec + sum(rows_k) * L * 4 * pair
    if batched <= BATCHED_BUDGET:
        return "batched", batched
    serial = packed + vec + 2 * pair * max(rows_k, default=0) * L * 4
    if serial <= SERIAL_BUDGET:
        return "serial", serial
    return None, serial


def fits_mid_kernel(rects, bs: int, NB: int, itemsize: int,
                    doffs=None) -> bool:
    return plan_mid_kernel(rects, bs, NB, itemsize, doffs)[0] \
        is not None


@lru_cache(maxsize=32)
def _build_mid_chain(doffs: Tuple[Tuple[int, int, int], ...],
                     rects: Tuple[Tuple[int, int], ...],
                     bricks: Tuple[int, int, int], bs: int, NB: int,
                     k_roots: int, emit_res: bool, vdtype,
                     interpret: bool, sym: bool = False,
                     serialize=None):
    BX, BY, BZ = bricks
    L = _round_up(NB, LANES)
    BSp = _round_up(bs, SUB)
    keep = _sym_keep(doffs) if sym else tuple(range(len(doffs)))
    kd = len(keep)
    if serialize is None:
        serialize = plan_mid_kernel(
            rects, bs, NB, jnp.dtype(vdtype).itemsize,
            doffs if sym else None)[0] == "serial"
    # read-at p + shift == roll right by (L - shift) mod L
    shifts = tuple((int(doffs[i][0]) * BY * BZ
                    + int(doffs[i][1]) * BZ + int(doffs[i][2]))
                   for i in keep)
    krects = tuple(rects[i] for i in keep)

    def kernel(tau_ref, *refs):
        blk = refs[:kd]
        x_ref, b_ref, d_ref = refs[kd:kd + 3]
        outs = refs[kd + 3:]

        def matvec(x):
            acc = jnp.zeros((BSp, L), jnp.float32)
            for k in range(kd):
                if serialize and k:
                    # Value-dependency fence: offset k's product cannot
                    # issue until offset k-1 is folded into acc, so at
                    # most ~2 offsets' (r2, r1p, L) f32 product temps
                    # are in flight (the batched schedule keeps ALL of
                    # them live — measured 120.91M scheduled at n=128
                    # sym vs the 128 MB VMEM).  The mul by 0 is not
                    # folded (not an identity under NaN/Inf) and costs
                    # one (BSp, L) mul+add per offset (~5% VPU).
                    xv = x + acc * 0.0
                else:
                    xv = x
                s = shifts[k]
                xk = pltpu.roll(xv, (L - s) % L, 1) if s % L else xv
                r1, r2 = krects[k]
                r1p = _round_up(max(r1, 1), SUB)
                Bk = blk[k][...]                      # (r2, r1p, L)
                xs = jax.lax.slice(xk, (0, 0), (r2, L))[:, None, :]
                # multiply in the BLOCK dtype: a Bk.astype(f32) here is
                # loop-invariant across the chained roots and XLA hoists
                # it, keeping EVERY offset's f32 copy live — measured
                # 208.75 MB VMEM (= packed input + 2x-sized casts) and
                # an OOM at n=128's 65.7 MB packed size.  The product
                # depends on x, so its temp is reused across offsets.
                prod = Bk * xs.astype(Bk.dtype)
                part = jnp.sum(prod.astype(jnp.float32), axis=0)
                if r1p < BSp:
                    # static zero-pad (scatter-add is not lowerable)
                    part = jnp.pad(part, ((0, BSp - r1p), (0, 0)))
                acc = acc + part
                if sym and s % L:
                    # transposed application of the same resident block
                    # = the -d offset: W[s2, p] = sum_s1 B[s1, s2, p]
                    # x[s1, p], then y[:, p + s] += W[:, p] (a right
                    # roll).  Wrapped/out-of-grid lanes of W are zero
                    # because B[:, :, p] == 0 wherever brick p + d does
                    # not exist, so no masking is needed (same argument
                    # as the forward wrap reads).
                    xs2 = jax.lax.slice(xv, (0, 0), (r1p, L))[None]
                    prod2 = Bk * xs2.astype(Bk.dtype)
                    W = jnp.sum(prod2.astype(jnp.float32), axis=1)
                    W = pltpu.roll(W, s % L, 1)
                    if r2 < BSp:
                        W = jnp.pad(W, ((0, BSp - r2), (0, 0)))
                    acc = acc + W
            return acc

        x = x_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        d = d_ref[:].astype(jnp.float32)

        for r in range(k_roots):
            x = x + d * (b - matvec(x)) * tau_ref[r]
        outs[0][:, :] = x
        if emit_res:
            outs[1][:, :] = b - matvec(x)

    out_shape = [jax.ShapeDtypeStruct((BSp, L), jnp.float32)]
    if emit_res:
        out_shape.append(jax.ShapeDtypeStruct((BSp, L), jnp.float32))
    itv = jnp.dtype(vdtype).itemsize
    packed_rows = sum(r2 * _round_up(max(r1, 1), SUB)
                      for r1, r2 in krects)
    pad_rows = sum(r2 * _round_up(max(r1, 1), SUB) - r2 * r1
                   for r1, r2 in krects)
    # each off-center block is applied twice in sym mode (fwd + transp)
    use_mult = 2 if sym else 1
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape[0] if not emit_res else tuple(out_shape)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (kd + 3),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM)
                   if not emit_res
                   else (pl.BlockSpec(memory_space=pltpu.VMEM),) * 2),
        cost_estimate=pl.CostEstimate(
            flops=2 * use_mult * (packed_rows - pad_rows) * L
            * (k_roots + (1 if emit_res else 0)),
            bytes_accessed=packed_rows * L * itv + 5 * BSp * L * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # Mosaic's scheduled peak tracks the budget from below: the
            # n=128 sym packing (31.9 MB) scheduled to 115.78M at a 110M
            # limit and 120.91M at 120M.  124M leaves 4 MB of headroom
            # to the 128 MB physical VMEM.
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )


def prep_blocksT(op, sym: bool = False) -> Tuple[jnp.ndarray, ...]:
    """BrickBlockOp.blocks (k, s1, s2, NB) -> the kernel's resident
    packed-rectangle inputs: one dense (r2_k, r1pad_k, L) array per
    offset (s2 = input-slot reduction axis leading, used output slots
    r1 padded to the sublane tile, bricks padded to whole lanes).
    With ``sym`` only the lexicographically non-negative offsets are
    packed (the kernel applies each both ways — see _sym_keep).
    One-time host-side cost at compile."""
    _, bs, _, NB = op.blocks.shape
    L = _round_up(NB, LANES)
    keep = _sym_keep(op.doffs) if sym else range(len(op.doffs))
    if sym:
        # symmetry sanity: the -d block must be the slot-transpose of
        # the +d block (shifted by d, a support bijection, so the
        # per-slot-pair square sums match).  One device reduction +
        # one small (k, bs, bs) fetch — NOT per-slice D2H transfers
        # (the tunnel's D2H fetches have been observed to hang).
        import numpy as _np
        dmap = {tuple(d): i for i, d in enumerate(op.doffs)}
        ss = _np.asarray(jnp.sum(op.blocks.astype(jnp.float32) ** 2,
                                 axis=3))
        for i in keep:
            d = tuple(op.doffs[i])
            if d == (0, 0, 0):
                continue
            nd = tuple(-c for c in d)
            assert nd in dmap, "mid operator is not offset-symmetric"
            s_fwd, s_rev = ss[i], ss[dmap[nd]].T
            assert _np.allclose(s_fwd, s_rev, rtol=1e-3,
                                atol=1e-6 * max(1e-30, s_fwd.max())), \
                "mid operator is not offset-symmetric"
    out = []
    for k in keep:
        r1, r2 = op.rects[k]
        r1p = _round_up(max(r1, 1), SUB)
        bT = jnp.transpose(op.blocks[k, :r1, :r2, :], (1, 0, 2))
        out.append(jnp.pad(bT, ((0, 0), (0, r1p - r1), (0, L - NB))))
    return tuple(out)


def pad_vec(v: jnp.ndarray, bs: int, NB: int) -> jnp.ndarray:
    """(bs*NB,) slot-major flat vector -> (BSp, L) tile-padded."""
    L = _round_up(NB, LANES)
    BSp = _round_up(bs, SUB)
    return jnp.pad(v.reshape(bs, NB), ((0, BSp - bs), (0, L - NB)))


def unpad_vec(v2: jnp.ndarray, bs: int, NB: int) -> jnp.ndarray:
    """(BSp, L) -> (bs*NB,) slot-major flat."""
    return v2[:bs, :NB].reshape(-1)


def mid_chain(blocks: Tuple[jnp.ndarray, ...], doffs, rects, bricks,
              bs: int, NB: int, taus: tuple, b2: jnp.ndarray,
              d2: jnp.ndarray, x2: jnp.ndarray, emit_res: bool = False,
              interpret: bool = False, sym: bool = False,
              serialize=None):
    """Run all roots x <- x + d (b - A x) tau_r (and optionally the
    trailing residual b - A x) on (BSp, L) tile-padded vectors.

    ``blocks``: per-offset packed rectangles from ``prep_blocksT``
    (pass ``sym`` consistently with how they were packed);
    ``doffs``/``rects`` are always the FULL operator's;
    ``taus``: tuple of (1,) f32 device arrays; ``serialize``: None =
    pick the schedule by plan_mid_kernel, True/False = force."""
    tau_vec = jnp.concatenate([t.reshape(-1) for t in taus])
    fn = _build_mid_chain(tuple(doffs), tuple(rects), tuple(bricks),
                          bs, NB, len(taus), emit_res,
                          blocks[0].dtype, interpret, sym, serialize)
    return fn(tau_vec, *blocks, x2, b2, d2)
