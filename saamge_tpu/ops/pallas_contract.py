"""Blocked Pallas kernels for the structured tent P/R contractions.

The slot-major contraction y[c, n] = sum_b Rst[c, b, n] * boxes[b, n]
(and its adjoint C[b, n] = sum_c Rst[c, b, n] * xc[c, n]) streams the
(bs, box, NB) tent blocks once per apply — the whole cost of the
structured restriction/prolongation beyond the box extraction
(solve/structured.py).  Measured at n=96 the v2 kernels match XLA's
multiply-reduce exactly (applyR 0.589 vs 0.591 ms, full cycle 3.05 vs
3.08 ms) — the historical applyR cost was the conv-patches extraction,
not the contraction — so the hierarchy defaults to the XLA path
(use_pallas_contract=False) and keeps these as a tested alternative.
A v1 kernel reducing over the SUBLANE axis was 3.5x slower (2.1 ms:
cross-sublane reduction + output re-reads per box chunk).

v2 stores the tent blocks TRANSPOSED, (bs, NBp, boxp) with the box
axis in lanes, so both contractions reduce (or broadcast) along the
lane axis — the efficient direction on the VPU — and the grid walks
brick chunks with no output revisits:

  R: out[c, nb_chunk] = sum_lanes Rt[c, nb_chunk, :] * xb[nb_chunk, :]
  P: out[nb_chunk, :] = sum_c    Rt[c, nb_chunk, :] * xc[c, nb_chunk]

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
NB_CHUNK = 128          # brick-axis block (sublane dim of Rt blocks)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=32)
def _build_contract(bs: int, nbp: int, boxp: int, mode: str,
                    interpret: bool):
    """1-D grid over brick chunks; each block streams the full box axis
    (lanes) for NB_CHUNK bricks."""
    assert nbp % NB_CHUNK == 0 and boxp % LANES == 0
    grid = (nbp // NB_CHUNK,)

    if mode == "R":
        # out[c, n] = sum_b Rt[c, n, b] * xb[n, b]  (lane reduction)
        def kernel(r_ref, x_ref, o_ref):
            o_ref[:, :] = jnp.sum(
                r_ref[:, :, :].astype(jnp.float32) * x_ref[:, :][None],
                axis=2)
        x_spec = pl.BlockSpec((NB_CHUNK, boxp), lambda j: (j, 0),
                              memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bs, nbp), jnp.float32)
        o_spec = pl.BlockSpec((bs, NB_CHUNK), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    elif mode == "P":
        # out[n, b] = sum_c Rt[c, n, b] * xc[c, n]  (lane broadcast)
        def kernel(r_ref, x_ref, o_ref):
            acc = jnp.zeros((NB_CHUNK, boxp), jnp.float32)
            for c in range(bs):
                acc = acc + (r_ref[c, :, :].astype(jnp.float32)
                             * x_ref[c, :][:, None])
            o_ref[:, :] = acc
        x_spec = pl.BlockSpec((bs, NB_CHUNK), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nbp, boxp), jnp.float32)
        o_spec = pl.BlockSpec((NB_CHUNK, boxp), lambda j: (j, 0),
                              memory_space=pltpu.VMEM)
    else:  # pragma: no cover
        raise ValueError(mode)

    r_spec = pl.BlockSpec((bs, NB_CHUNK, boxp), lambda j: (0, j, 0),
                          memory_space=pltpu.VMEM)
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
    """One-time transposed padded copy of the tent blocks:
    (bs, box, NB) -> (bs, NBp, boxp) with NB padded to a NB_CHUNK
    multiple and box to a LANES multiple.  Stored once in the hierarchy
    so applies never re-pad the ~55 MB stream."""
    bs, box, nb = rst.shape
    rt = jnp.transpose(rst, (0, 2, 1))
    return jnp.pad(rt, ((0, 0), (0, _round_up(nb, NB_CHUNK) - nb),
                        (0, _round_up(box, LANES) - box)))


def contract_R(rt_pad: jnp.ndarray, boxes: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """(bs, NBp, boxp) pre-padded, boxes (box, NB) -> (bs, NB)."""
    bs, nbp, boxp = rt_pad.shape
    box, nb = boxes.shape
    xb = jnp.transpose(boxes, (1, 0))
    if nbp != nb or boxp != box:
        xb = jnp.pad(xb, ((0, nbp - nb), (0, boxp - box)))
    fn = _build_contract(bs, nbp, boxp, "R", interpret)
    return fn(rt_pad, xb)[:, :nb]


def contract_P(rt_pad: jnp.ndarray, xc: jnp.ndarray, box: int,
               interpret: bool = False) -> jnp.ndarray:
    """(bs, NBp, boxp) pre-padded, xc (bs, NB) -> (box, NB)."""
    bs, nbp, boxp = rt_pad.shape
    _, nb = xc.shape
    if nbp != nb:
        xc = jnp.pad(xc, ((0, 0), (0, nbp - nb)))
    fn = _build_contract(bs, nbp, boxp, "P", interpret)
    return jnp.transpose(fn(rt_pad, xc)[:nb, :box], (1, 0))
