"""Blocked Pallas kernels for the structured tent P/R contractions.

The slot-major contraction y[c, n] = sum_b Rst[c, b, n] * boxes[b, n]
(and its adjoint C[b, n] = sum_c Rst[c, b, n] * xc[c, n]) streams the
(bs, box, NB) tent blocks once per apply — the whole cost of the
structured restriction/prolongation beyond the box extraction
(solve/structured.py).

v3 (current): keeps the NATURAL slot-major layout — brick axis NB in
LANES, box axis in SUBLANES — and walks a 1-D grid over brick chunks
with the whole (bs, boxp, NB_CHUNK) tent slab as one VMEM block.  The
R reduction runs along the SUBLANE axis per (unrolled) slot and the P
mode accumulates all slots into one resident output block — no
cross-lane shuffles, no HBM revisits, one fetch of the x block per
chunk — so the kernels stream the tent blocks at memory speed.  The
v2/XLA multiply-reduce lowered the box reduction to cross-lane shuffle
chains and ran at 93 GB/s on the 8.12M-dof shapes (bs=20, box=729,
NB=15625, bf16 blocks): applyR 5.25 ms; v3 removes that bottleneck.

History: v1 re-read the output block per box chunk (2.1 ms at n=96);
v2 put the box axis in lanes and matched XLA's multiply-reduce
(0.59 ms at n=96) but both lowered the reduction to cross-lane
shuffle chains.

Reference counterpart: the per-MIS tent interp application inside
hypre's P/R SpMVs (interp.cpp:761, tg.cpp:115-129).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NB_CHUNK = 128          # brick-axis block (lane dim)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=32)
def _build_contract(bs: int, boxp: int, nbp: int, mode: str,
                    interpret: bool):
    """1-D grid over brick chunks; the whole (bs, boxp, NB_CHUNK) tent
    slab is one VMEM block (a few MB), the slot loop is unrolled."""
    assert nbp % NB_CHUNK == 0
    grid = (nbp // NB_CHUNK,)

    r_spec = pl.BlockSpec((bs, boxp, NB_CHUNK), lambda j: (0, 0, j),
                          memory_space=pltpu.VMEM)

    if mode == "R":
        # out[c, n] = sum_b Rst[c, b, n] * xb[b, n]  (sublane reduction)
        def kernel(r_ref, x_ref, o_ref):
            xb = x_ref[:, :]
            for c in range(bs):
                o_ref[c, :] = jnp.sum(
                    r_ref[c].astype(jnp.float32) * xb, axis=0)
        x_spec = pl.BlockSpec((boxp, NB_CHUNK), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bs, nbp), jnp.float32)
        o_spec = pl.BlockSpec((bs, NB_CHUNK), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    elif mode == "P":
        # out[b, n] = sum_c Rst[c, b, n] * xc[c, n]  (VMEM-resident
        # accumulator over the unrolled slot loop, one write-back)
        def kernel(r_ref, x_ref, o_ref):
            acc = r_ref[0].astype(jnp.float32) * x_ref[0, :][None, :]
            for c in range(1, bs):
                acc = acc + (r_ref[c].astype(jnp.float32)
                             * x_ref[c, :][None, :])
            o_ref[:, :] = acc
        x_spec = pl.BlockSpec((bs, NB_CHUNK), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((boxp, nbp), jnp.float32)
        o_spec = pl.BlockSpec((boxp, NB_CHUNK), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    else:  # pragma: no cover
        raise ValueError(mode)

    nbytes = bs * nbp * boxp * 2 + (bs + 2) * nbp * 4 + nbp * boxp * 4
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[r_spec, x_spec],
        out_specs=o_spec,
        cost_estimate=pl.CostEstimate(flops=2 * bs * nbp * boxp,
                                      bytes_accessed=nbytes,
                                      transcendentals=0),
        interpret=interpret,
    )


def pad_rst(rst: jnp.ndarray) -> jnp.ndarray:
    """One-time padded copy of the tent blocks: (bs, box, NB) ->
    (bs, boxp, NBp) with NB padded to a NB_CHUNK multiple (lanes) and
    box to a sublane multiple.  Stored once in the hierarchy so applies
    never re-pad the dominant stream."""
    bs, box, nb = rst.shape
    return jnp.pad(rst, ((0, 0), (0, _round_up(box, 8) - box),
                         (0, _round_up(nb, NB_CHUNK) - nb)))


def contract_R(rt_pad: jnp.ndarray, boxes: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """(bs, boxp, NBp) pre-padded, boxes (box, NB) -> (bs, NB)."""
    bs, boxp, nbp = rt_pad.shape
    box, nb = boxes.shape
    xb = boxes
    if nbp != nb or boxp != box:
        xb = jnp.pad(xb, ((0, boxp - box), (0, nbp - nb)))
    fn = _build_contract(bs, boxp, nbp, "R", interpret)
    return fn(rt_pad, xb.astype(jnp.float32))[:, :nb]


def contract_P(rt_pad: jnp.ndarray, xc: jnp.ndarray, box: int,
               interpret: bool = False) -> jnp.ndarray:
    """(bs, boxp, NBp) pre-padded, xc (bs, NB) -> (box, NB)."""
    bs, boxp, nbp = rt_pad.shape
    _, nb = xc.shape
    if nbp != nb:
        xc = jnp.pad(xc, ((0, 0), (0, nbp - nb)))
    fn = _build_contract(bs, boxp, nbp, "P", interpret)
    return fn(rt_pad, xc.astype(jnp.float32))[:box, :nb]
