"""Lane-chunked streamed brick-block matvec: the mid-level Galerkin
operator applied at HBM stream rate when it is too large for the
VMEM-resident chain kernel (ops/pallas_midsmooth.py).

Motivation (measured, n=200 / 8.12M-dof bundle): the XLA rect matvec of
solve/structured.BrickBlockOp streams its 77.6 MB sym-halved rectangle
coverage at only ~82 GB/s — the per-offset ``Bk.astype(f32)`` upcasts
and sliced reduces materialize HBM temps several times the packed bytes
— so the 9 mid passes of a V-cycle cost 8.55 ms of a 16.1 ms cycle.
This kernel streams each packed block byte exactly once per pass.

Layout: bricks are x-major (brick id p = px*BY*BZ + py*BZ + pz,
structured.BrickBlockOp.from_csr), so a contiguous lane range is an
x-slab and the neighbor-brick offset (dx, dy, dz) is the static lane
shift s = dx*BY*BZ + dy*BZ + dz with |s| <= BY*BZ + BZ + 1.  The grid
runs over lane chunks of Lc = roundup(max|s|, 128) lanes:

  - per offset k, the packed rectangle (r2_k, r1p_k, Lpad) block
    (prep_blocks_chunked — input-slot rows r2 leading, used output
    slots padded to the 16-row sublane tile) arrives chunk-by-chunk
    through a standard pipelined BlockSpec (blocks are indexed by the
    OUTPUT lane, so they need no halo);
  - x arrives as THREE shifted block refs of the zero-side-padded
    (BSp, Lc + Lpad + Lc) vector (the ops/pallas_window.py trick),
    concatenated in VMEM to the (BSp, 3*Lc) window that covers every
    p + s read; out-of-grid / padding reads are killed by the
    structurally-zero block entries (same argument as the resident
    kernel's wrapped rolls).

The per-offset products are value-fenced on the running accumulator
(see pallas_midsmooth's serialized schedule) so Mosaic holds ~2 product
temps instead of all kd; the kernel is DMA-bound, so the fence costs
nothing.  Reference semantics: one SpMV of the coarse ParCSR operator
(hypre RAP product, tg.hpp:696) restricted to the brick-structured
fast path.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# double-buffered per-chunk VMEM the packed block refs may occupy; the
# kernel raises the scoped limit to 100 MB, and the window/out/acc need
# the rest.  At nb=40 (33M dofs) a single-chunk plan needs Lc=1664 and
# the 27 block refs cost ~113 MB — over the physical VMEM — hence the
# multi-side-ref plan below.
BLOCK_VMEM_BUDGET = 48 << 20


def chunk_plan(doffs, bricks: Tuple[int, int, int], NB: int,
               rects=None, itemsize: int = 4):
    """(Lc, Lpad, C, nside): lane-chunk size, chunk-padded lane count,
    grid length, and the number of SIDE x-refs per side needed to cover
    the largest offset shift (1 when one chunk covers it).  With
    ``rects`` given, Lc shrinks (min 512) until the double-buffered
    packed block refs fit BLOCK_VMEM_BUDGET — the x window then spans
    2*nside+1 shifted refs instead of 3."""
    _, BY, BZ = bricks
    maxs = max(abs(int(dx)) * BY * BZ + abs(int(dy)) * BZ + abs(int(dz))
               for dx, dy, dz in doffs)
    Lc = max(_round_up(max(maxs, 1), LANES), 512)
    if rects is not None:
        rows = sum(_round_up(max(r1, 1), SUB) * r2 for r1, r2 in rects)
        while Lc > 512 and 2 * itemsize * Lc * rows > BLOCK_VMEM_BUDGET:
            Lc = _round_up(max(Lc // 2, 512), LANES)
        if 2 * itemsize * Lc * rows > BLOCK_VMEM_BUDGET:
            # make a Mosaic VMEM OOM attributable to its cause rather
            # than failing deep inside compile (ADVICE r4): the packed
            # rect rows are too large for any lane-chunk size
            import warnings
            warnings.warn(
                f"pallas_midmv chunk_plan: packed rect rows ({rows}) "
                f"exceed BLOCK_VMEM_BUDGET even at the Lc={Lc} floor "
                f"({2 * itemsize * Lc * rows >> 20} MB > "
                f"{BLOCK_VMEM_BUDGET >> 20} MB); the kernel may fail "
                "VMEM allocation at compile time")
    nside = -(-maxs // Lc) if maxs else 1
    Lpad = _round_up(NB, Lc)
    return Lc, Lpad, Lpad // Lc, max(nside, 1)


def prep_blocks_chunked(op, host_blocks=None
                        ) -> Tuple[Tuple[jnp.ndarray, ...], int]:
    """BrickBlockOp.blocks (k, s1, s2, NB) -> per-offset packed
    (r2_k, r1pad_k, Lpad) arrays for the chunked matvec, plus Lc.
    One-time cost at compile.  ``host_blocks``: do the slice/transpose/
    pad in numpy and upload only the packed result — the device-side
    prep holds several padded temporaries at once, which at 33M-dof
    scale (NB=64000, bs~24) exhausted HBM on top of the resident fine
    operator (observed RESOURCE_EXHAUSTED; the host path is the
    capacity default via compile_structured hbm_frugal)."""
    NB = (host_blocks.shape[3] if host_blocks is not None
          else op.blocks.shape[3])
    dtype = op.blocks.dtype
    Lc, Lpad, _, _ = chunk_plan(op.doffs, op.bricks, NB,
                                rects=tuple(op.rects),
                                itemsize=dtype.itemsize)
    out = []
    for k in range(len(op.doffs)):
        r1, r2 = op.rects[k]
        r1p = _round_up(max(r1, 1), SUB)
        if host_blocks is not None:
            import numpy as np
            bT = np.ascontiguousarray(
                host_blocks[k, :r1, :r2, :].transpose(1, 0, 2))
            padded = np.zeros((r2, r1p, Lpad), np.float32)
            padded[:, :r1, :NB] = bT
            out.append(jnp.asarray(padded, dtype))
        else:
            bT = jnp.transpose(op.blocks[k, :r1, :r2, :], (1, 0, 2))
            out.append(jnp.pad(bT, ((0, 0), (0, r1p - r1),
                                    (0, Lpad - NB))))
    return tuple(out), Lc


def pad_vec_chunked(v: jnp.ndarray, bs: int, NB: int, Lc: int,
                    nside: int = 1):
    """(bs*NB,) slot-major flat -> (BSp, nside*Lc + Lpad + nside*Lc)
    side-padded."""
    Lpad = _round_up(NB, Lc)
    BSp = _round_up(bs, SUB)
    return jnp.pad(v.reshape(bs, NB),
                   ((0, BSp - bs),
                    (nside * Lc, nside * Lc + Lpad - NB)))


@lru_cache(maxsize=32)
def _build_chunked_mv(doffs: Tuple[Tuple[int, int, int], ...],
                      rects: Tuple[Tuple[int, int], ...],
                      bricks: Tuple[int, int, int], bs: int, NB: int,
                      vdtype, interpret: bool):
    _, BY, BZ = bricks
    itemsz = jnp.dtype(vdtype).itemsize
    Lc, Lpad, C, nside = chunk_plan(doffs, bricks, NB,
                                    rects=tuple(rects),
                                    itemsize=itemsz)
    nref = 2 * nside + 1
    BSp = _round_up(bs, SUB)
    kd = len(doffs)
    shifts = tuple(int(dx) * BY * BZ + int(dy) * BZ + int(dz)
                   for dx, dy, dz in doffs)

    def kernel(*refs):
        blk = refs[:kd]
        xrefs = refs[kd:kd + nref]
        out = refs[kd + nref]
        window = jnp.concatenate([r[...] for r in xrefs], axis=1)
        acc = jnp.zeros((BSp, Lc), jnp.float32)
        for k in range(kd):
            r1, r2 = rects[k]
            r1p = _round_up(max(r1, 1), SUB)
            xsl = jax.lax.slice(
                window, (0, nside * Lc + shifts[k]),
                (r2, (nside + 1) * Lc + shifts[k]))
            if k:
                # value fence: serialize the product temps (module doc);
                # same-shape operands — Mosaic cannot broadcast a (1,1)
                # in both sublanes and lanes
                xsl = xsl + jax.lax.slice(acc, (0, 0), (r2, Lc)) * 0.0
            xs = xsl[:, None, :]
            prod = blk[k][...] * xs.astype(blk[k].dtype)
            part = jnp.sum(prod.astype(jnp.float32), axis=0)
            if r1p < BSp:
                part = jnp.pad(part, ((0, BSp - r1p), (0, 0)))
            acc = acc + part
        out[:, :] = acc

    itv = itemsz
    packed_rows = sum(r2 * _round_up(max(r1, 1), SUB)
                      for r1, r2 in rects)
    used_rows = sum(r1 * r2 for r1, r2 in rects)
    in_specs = (
        [pl.BlockSpec((r2, _round_up(max(r1, 1), SUB), Lc),
                      lambda j: (0, 0, j))
         for r1, r2 in rects]
        + [pl.BlockSpec((BSp, Lc), lambda j, _o=o: (0, j + _o))
           for o in range(nref)])
    return pl.pallas_call(
        kernel,
        grid=(C,),
        out_shape=jax.ShapeDtypeStruct((BSp, Lpad), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BSp, Lc), lambda j: (0, j)),
        cost_estimate=pl.CostEstimate(
            flops=2 * used_rows * Lpad,
            bytes_accessed=packed_rows * Lpad * itv
            + 4 * BSp * Lpad * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def chunked_matvec(blocks: Tuple[jnp.ndarray, ...], doffs, rects,
                   bricks, bs: int, NB: int, Lc: int, x: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """y = A x on slot-major flat (bs*NB,) vectors; ``blocks``/``Lc``
    from ``prep_blocks_chunked``."""
    fn = _build_chunked_mv(tuple(doffs), tuple(rects), tuple(bricks),
                           bs, NB, blocks[0].dtype, interpret)
    _, _, _, nside = chunk_plan(tuple(doffs), tuple(bricks), NB,
                                rects=tuple(rects),
                                itemsize=blocks[0].dtype.itemsize)
    xpad = pad_vec_chunked(x, bs, NB, Lc, nside=nside)
    # the same side-padded vector enters through 2*nside+1 shifted
    # block refs (window = concat of consecutive chunks of it)
    y2 = fn(*blocks, *([xpad] * (2 * nside + 1)))
    return y2[:bs, :NB].reshape(-1)
