"""VMEM-resident mid-level smoothing chains: all polynomial roots (and
the optional trailing residual) of one smoothing sweep over the
brick-block coarse operator in ONE Pallas kernel that DMAs the operator
blocks into VMEM ONCE.

The mid-level Galerkin operator (solve/structured.BrickBlockOp — the
reference's coarse ParCSR from hypre RAP, tg.hpp:696, restricted to the
brick-structured fast path) is small enough at flagship sizes (e.g.
n=96: 27x20x20x1728 bf16 = 37 MB) that it fits v5e VMEM (128 MB), yet
the XLA per-root matvec re-streams it from HBM every pass: a
degree-nu_relax cycle runs 2*deg+1 passes (smpr_compute_poly,
smpr.hpp:319-339) = ~340 MB/cycle for a 30 MB-model level.  This kernel
keeps the blocks resident for a whole chain of roots, so the cycle's
mid level streams the operator exactly twice (pre-chain + residual,
post-chain) regardless of degree, and each root costs only VPU work on
the ~42%-dense used-slot rectangles (BrickBlockOp.rects).

Layout: blocks are transposed to (k_off, s2, s1, L) with the brick axis
L = NB rounded up to 128 lanes, so the s2 (input-slot) reduction slices
axis 1 and the fused multiply-add runs over (r1, L) VPU tiles.  The
neighbor-brick shift for offset (dx, dy, dz) is a single lane roll of
the (bs, L) vector by dx*BY*BZ + dy*BZ + dz: reads that would cross the
grid boundary (or wrap into the lane padding) land on structurally-zero
block entries, so no masking is needed; lane padding of the vectors is
kept zero by zero-padded dinv/b.

Numerics: blocks convert bf16->f32 at use; x stays f32 throughout (the
XLA fused path rounds x to bf16 before the multiply, so this kernel is
slightly MORE accurate than the path it replaces)."""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# VMEM budget for the resident blocks (v5e VMEM is 128 MB; bf16 blocks
# relayout in VMEM with the second-minor slot axis padded to 16, a
# <=1.6x inflation at bs=20, and the kernel needs temp room for the
# per-offset products).  72 MB matches the wavefront kernel's proven
# budget; the flagship n=96 mid level (27x20x20x1728 bf16 -> 62 MB
# padded) MEASURED fine under the 110 MB compiler limit.
MID_VMEM_BUDGET = 72 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def mid_kernel_vmem_bytes(kd: int, bs: int, NB: int, itemsize: int,
                          sub_tile: int = 16) -> int:
    """VMEM footprint estimate of the resident transposed blocks."""
    L = _round_up(NB, LANES)
    return kd * bs * _round_up(bs, sub_tile) * L * itemsize


def fits_mid_kernel(kd: int, bs: int, NB: int, itemsize: int) -> bool:
    return mid_kernel_vmem_bytes(kd, bs, NB, itemsize) <= MID_VMEM_BUDGET


@lru_cache(maxsize=32)
def _build_mid_chain(doffs: Tuple[Tuple[int, int, int], ...],
                     rects: Tuple[Tuple[int, int], ...],
                     bricks: Tuple[int, int, int], bs: int, NB: int,
                     k_roots: int, emit_res: bool, vdtype,
                     interpret: bool):
    BX, BY, BZ = bricks
    L = _round_up(NB, LANES)
    kd = len(doffs)
    # read-at p + shift == roll right by (L - shift) mod L
    shifts = tuple((int(dx) * BY * BZ + int(dy) * BZ + int(dz))
                   for (dx, dy, dz) in doffs)

    def kernel(tau_ref, blk_ref, x_ref, b_ref, d_ref, *outs):
        def matvec(x):
            acc = jnp.zeros((bs, L), jnp.float32)
            for k in range(kd):
                s = shifts[k]
                xk = pltpu.roll(x, (L - s) % L, 1) if s % L else x
                r1, r2 = rects[k]
                # NB: lax.slice + [:, None, :] — mixed basic indexing
                # (slice and None together) lowers to an unsupported
                # Mosaic gather
                Bk = jax.lax.slice(blk_ref[k], (0, 0, 0),
                                   (r2, r1, L)).astype(jnp.float32)
                xs = jax.lax.slice(xk, (0, 0), (r2, L))[:, None, :]
                part = jnp.sum(Bk * xs, axis=0)  # (r1, L)
                if r1 < bs:
                    # static zero-pad (scatter-add is not lowerable)
                    part = jnp.pad(part, ((0, bs - r1), (0, 0)))
                acc = acc + part
            return acc

        x = x_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        d = d_ref[:].astype(jnp.float32)

        for r in range(k_roots):
            x = x + d * (b - matvec(x)) * tau_ref[r]
        outs[0][:, :] = x
        if emit_res:
            outs[1][:, :] = b - matvec(x)

    out_shape = [jax.ShapeDtypeStruct((bs, L), jnp.float32)]
    if emit_res:
        out_shape.append(jax.ShapeDtypeStruct((bs, L), jnp.float32))
    itv = jnp.dtype(vdtype).itemsize
    dense_rows = sum(r1 * r2 for r1, r2 in rects)
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape[0] if not emit_res else tuple(out_shape)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM)
                   if not emit_res
                   else (pl.BlockSpec(memory_space=pltpu.VMEM),) * 2),
        cost_estimate=pl.CostEstimate(
            flops=2 * dense_rows * L * (k_roots + (1 if emit_res else 0)),
            bytes_accessed=kd * bs * bs * L * itv + 5 * bs * L * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


def prep_blocksT(op) -> jnp.ndarray:
    """BrickBlockOp.blocks (k, s1, s2, NB) -> the kernel's resident
    layout (k, s2, s1, L): s2 (the input-slot reduction axis) moves to
    the sliceable leading block axis and the brick axis pads to whole
    lanes.  One-time host-side cost at compile."""
    k, bs, _, NB = op.blocks.shape
    L = _round_up(NB, LANES)
    bT = jnp.transpose(op.blocks, (0, 2, 1, 3))
    return jnp.pad(bT, ((0, 0), (0, 0), (0, 0), (0, L - NB)))


def pad_vec(v: jnp.ndarray, bs: int, NB: int) -> jnp.ndarray:
    """(bs*NB,) slot-major flat vector -> (bs, L) lane-padded."""
    L = _round_up(NB, LANES)
    return jnp.pad(v.reshape(bs, NB), ((0, 0), (0, L - NB)))


def unpad_vec(v2: jnp.ndarray, NB: int) -> jnp.ndarray:
    """(bs, L) -> (bs*NB,) slot-major flat."""
    return v2[:, :NB].reshape(-1)


def mid_chain(blocksT: jnp.ndarray, doffs, rects, bricks, bs: int,
              NB: int, taus: tuple, b2: jnp.ndarray, d2: jnp.ndarray,
              x2: jnp.ndarray, emit_res: bool = False,
              interpret: bool = False):
    """Run all roots x <- x + d (b - A x) tau_r (and optionally the
    trailing residual b - A x) on (bs, L) lane-padded vectors.

    ``blocksT``: (kd, bs, bs, L) transposed+padded blocks (s2, s1
    order); ``taus``: tuple of (1,) f32 device arrays."""
    tau_vec = jnp.concatenate([t.reshape(-1) for t in taus])
    fn = _build_mid_chain(tuple(doffs), tuple(rects), tuple(bricks),
                          bs, NB, len(taus), emit_res,
                          blocksT.dtype, interpret)
    return fn(tau_vec, blocksT, x2, b2, d2)
