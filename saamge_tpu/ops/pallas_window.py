"""Fused window-extraction + tent-contraction Pallas kernels.

The structured tent restriction yc[s, p] = sum_w Rst[s, w, p] *
r3[window(p, w)] was previously computed in two stages: materialize the
overlapping (box, NB) window array in HBM (extract_boxes — three
reshape+concat overlap expansions + a 6-axis transpose) and then stream
it through the v3 contraction kernels (ops/pallas_contract.py).  The
expansion glue measured 2.3-5 ms at 8.12M dofs — 2-4x the contraction
itself — because every XLA lowering of the strided-window relayout
materializes intermediates with tiny minor dims (b+1 = 9 or NBz = 25
lanes, padded to 128 by the TPU tiling; CLAUDE.md round-3 facts).

These kernels never materialize the window array.  Per (px, py) brick
ROW (grid = (BX, BY)):

 - the (bx+1, by+1, Zp) node window is assembled IN VMEM from four
   statically-shifted (bx, by, Zp) blocks of the padded node grid
   (the +1 overlap planes come from the px+1 / py+1 neighbor blocks —
   the same closed-box overlap the XLA expansion materialized in HBM);
 - the z-axis windowing (fine z -> (pz, k) window slots for ALL BZ
   bricks of the row at once) is ONE 0/1 selection matmul on the MXU:
   X = V @ Ez with Ez[z, pz*(bz+1)+k] = [z == bz*pz+k].  Selection by
   matmul is exact for the bf16-truncated operand (each output is a
   single 1*v product) and turns the only lane-dimension relayout of
   the whole apply into MXU work;
 - the tent contraction is an elementwise multiply-reduce against the
   (bs, box_xy, Lz) tent slab of the row (the dominant stream), and
   the per-window-slot k-sum is a second tiny 0/1 matmul (S2).

The P mode is the exact adjoint: slot duplication by S2^T, tent
multiply, z overlap-ACCUMULATION by Ez^T (the matmul adds the shared
z-plane contributions), producing disjoint per-brick-row pieces that
one streaming XLA overlap-add (fold_pieces) assembles into the node
grid — the x/y share planes are accumulated there.

bf16 ONLY: the selection matmuls run one MXU pass, so window values are
truncated to bf16.  That is the same perturbation class as the bf16
Rst multiply of the bench preconditioner (rp_dtype=bfloat16) and only
affects preconditioner quality; the exact-f32 path (extract_boxes +
pallas_contract) remains for f32 hierarchies.

Reference counterpart: the tent P/R SpMVs inside hypre (tg.cpp:115-129,
interp.cpp:761) — here the sparsity is the static brick-window
structure instead of CSR indices.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PZP = 128                 # padded z-brick lane count (BZ <= 128)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_window_tables(brick_elems, bricks, nodes):
    """Host-side 0/1 selection tables for the z windowing.

    Returns (Ez, S2) as numpy f32: Ez (Zp, Lzp) maps fine-z lanes to
    merged (pz, k) window-slot lanes; S2 (Lzp, PZP) sums the k slots of
    each pz.  Their transposes serve the P mode."""
    bz = brick_elems[2]
    BZ = bricks[2]
    NZn = nodes[2]
    assert BZ <= PZP, (BZ, PZP)
    Zp = _round_up(NZn, LANES)
    Lz = BZ * (bz + 1)
    Lzp = _round_up(Lz, LANES)
    Ez = np.zeros((Zp, Lzp), np.float32)
    S2 = np.zeros((Lzp, PZP), np.float32)
    for pz in range(BZ):
        for k in range(bz + 1):
            Ez[bz * pz + k, pz * (bz + 1) + k] = 1.0
            S2[pz * (bz + 1) + k, pz] = 1.0
    return Ez, S2


def relayout_rst(Rst: np.ndarray, brick_elems, bricks) -> np.ndarray:
    """(bs, box, NB) slot-major tent blocks -> the per-brick-row window
    layout (NBxy, bs, box_xy, Lzp): row-major bricks (px*BY+py), window
    x/y slots (i*(by+1)+j) in sublanes, merged (pz, k) lanes."""
    bx, by, bz = brick_elems
    BX, BY, BZ = bricks
    bs, box, NB = Rst.shape
    NBxy = BX * BY
    box_xy = (bx + 1) * (by + 1)
    Lz = BZ * (bz + 1)
    R6 = Rst.reshape(bs, bx + 1, by + 1, bz + 1, NBxy, BZ)
    Rv = R6.transpose(4, 0, 1, 2, 5, 3)     # (NBxy, bs, i, j, BZ, k)
    Rv = np.ascontiguousarray(Rv).reshape(NBxy, bs, box_xy, Lz)
    Lzp = _round_up(Lz, LANES)
    if Lzp != Lz:
        Rv = np.pad(Rv, ((0, 0), (0, 0), (0, 0), (0, Lzp - Lz)))
    return Rv


def _row_tile(BY: int, per_row_bytes: int = 0) -> int:
    """Brick-rows per grid step: DMA amortization (the per-step tent
    slab goes from ~0.8 MB to ~TY x that; 625 64 KB-block steps at
    n=200 measured 2.26 ms vs a ~1.4 ms traffic model — per-step DMA
    issue overhead).  Capped so the double-buffered working set stays
    within the raised scoped-VMEM limit."""
    budget = 40 * 1024 * 1024              # 2x this double-buffered < 96M
    for t in range(min(8, BY), 0, -1):
        if BY % t == 0 and (per_row_bytes == 0
                            or t * per_row_bytes <= budget or t == 1):
            return t
    return 1


def _tile_for(bs, bx, by, box_xy, BY, Zp, Lzp):
    per_row = (bs * box_xy * Lzp * 2 + 4 * bx * by * Zp * 4
               + box_xy * Zp * 4)
    return _row_tile(BY, per_row)


def _window_rows(a, b, c, d, bx, by, t, TY):
    """Assemble the (box_xy, Zp) closed-window row stack for sub-row t
    of the TY-row y-group from the four shifted VMEM blocks."""
    rows = []
    for i in range(bx + 1):
        src = a if i < bx else b
        ri = i if i < bx else 0
        rows.append(src[ri, t * by:(t + 1) * by])
        if t < TY - 1:
            rows.append(src[ri, (t + 1) * by:(t + 1) * by + 1])
        else:
            srcc = c if i < bx else d
            rows.append(srcc[ri, 0:1])
    return jnp.concatenate(rows, axis=0)           # (box_xy, Zp)


@lru_cache(maxsize=16)
def _build_window_R(bs, bx, by, box_xy, BX, BY, Zp, Lzp, interpret):
    TY = _tile_for(bs, bx, by, box_xy, BY, Zp, Lzp)
    grid = (BX, BY // TY)

    def kernel(ez, s2, a, b, c, d, rst, o):
        for t in range(TY):
            V = _window_rows(a, b, c, d, bx, by, t, TY)
            X = jnp.dot(V.astype(jnp.bfloat16), ez[:, :],
                        preferred_element_type=jnp.float32)
            prod = rst[t].astype(jnp.float32) * X[None]
            Y = jnp.sum(prod, axis=1)              # (bs, Lzp)
            o[t] = jnp.dot(Y.astype(jnp.bfloat16), s2[:, :],
                           preferred_element_type=jnp.float32)

    gspec = lambda dx, dy: pl.BlockSpec(            # noqa: E731
        (bx, TY * by, Zp), lambda px, py: (px + dx, py + dy, 0),
        memory_space=pltpu.VMEM)
    nbytes = (BX * BY * bs * box_xy * Lzp * 2      # tent slab (bf16)
              + (BX + 1) * bx * (BY + TY) * by * Zp * 4
              + bs * BX * BY * PZP * 4)
    flops = BX * BY * 2 * (box_xy * Zp * Lzp + bs * box_xy * Lzp
                           + bs * Lzp * PZP)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Zp, Lzp), lambda px, py: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lzp, PZP), lambda px, py: (0, 0),
                         memory_space=pltpu.VMEM),
            gspec(0, 0), gspec(1, 0), gspec(0, 1), gspec(1, 1),
            pl.BlockSpec((TY, bs, box_xy, Lzp),
                         lambda px, py: (px * (BY // TY) + py, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((BX * BY, bs, PZP), jnp.float32),
        out_specs=pl.BlockSpec((TY, bs, PZP),
                               lambda px, py: (px * (BY // TY) + py,
                                               0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=nbytes,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )


@lru_cache(maxsize=16)
def _build_window_P(bs, box_xy, BX, BY, Zp, Lzp, interpret):
    # box_xy = (bx+1)(by+1); reconstruct per-row bytes conservatively
    TY = _tile_for(bs, 0, 0, box_xy, BY, Zp, Lzp)
    grid = (BX, BY // TY)

    def kernel(s2t, ezt, xc, rst, o):
        for t in range(TY):
            xk = jnp.dot(xc[t].astype(jnp.bfloat16), s2t[:, :],
                         preferred_element_type=jnp.float32)  # (bs, Lzp)
            prod = rst[t].astype(jnp.float32) * xk[:, None, :]
            C = jnp.sum(prod, axis=0)              # (box_xy, Lzp)
            o[t] = jnp.dot(C.astype(jnp.bfloat16), ezt[:, :],
                           preferred_element_type=jnp.float32)

    nbytes = (BX * BY * bs * box_xy * Lzp * 2
              + bs * BX * BY * PZP * 4
              + BX * BY * box_xy * Zp * 4)
    flops = BX * BY * 2 * (bs * PZP * Lzp + bs * box_xy * Lzp
                           + box_xy * Lzp * Zp)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PZP, Lzp), lambda px, py: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lzp, Zp), lambda px, py: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TY, bs, PZP),
                         lambda px, py: (px * (BY // TY) + py, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TY, bs, box_xy, Lzp),
                         lambda px, py: (px * (BY // TY) + py, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((BX * BY, box_xy, Zp),
                                       jnp.float32),
        out_specs=pl.BlockSpec((TY, box_xy, Zp),
                               lambda px, py: (px * (BY // TY) + py,
                                               0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=nbytes,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )


def window_R(r3: jnp.ndarray, rstw: jnp.ndarray, ez: jnp.ndarray,
             s2: jnp.ndarray, brick_elems, bricks,
             interpret: bool = False) -> jnp.ndarray:
    """(NXn, NYn, NZn) node grid -> (bs, NB) restricted coarse values
    in the slot-major padded layout."""
    bx, by, bz = brick_elems
    BX, BY, BZ = bricks
    _, bs, box_xy, Lzp = rstw.shape
    Zp = ez.shape[0]
    TY = _tile_for(bs, bx, by, box_xy, BY, Zp, Lzp)
    r3p = jnp.pad(r3, (((0, (BX + 1) * bx - r3.shape[0]),
                        (0, (BY + TY) * by - r3.shape[1]),
                        (0, Zp - r3.shape[2]))))
    fn = _build_window_R(bs, bx, by, box_xy, BX, BY, Zp, Lzp, interpret)
    out = fn(ez, s2, r3p, r3p, r3p, r3p, rstw)     # (NBxy, bs, PZP)
    return out[:, :, :BZ].transpose(1, 0, 2).reshape(bs, BX * BY * BZ)


def _fold(x: jnp.ndarray, axis: int, b: int, nb: int) -> jnp.ndarray:
    """Overlap-add along one axis: (…, nb, b+1, …) -> (…, nb*b+1, …),
    the exact adjoint of extract_boxes' expand — all static slices,
    pads and concats (no scatter)."""
    main = jax.lax.slice_in_dim(x, 0, b, axis=axis + 1)
    extra = jax.lax.slice_in_dim(x, b, b + 1, axis=axis + 1)
    # window plane b of block q lands on plane 0 of block q+1
    lead = jax.lax.slice_in_dim(extra, 0, nb - 1, axis=axis)
    zero = jnp.zeros(extra.shape[:axis] + (1,) + extra.shape[axis + 1:],
                     x.dtype)
    G = jnp.concatenate([zero, lead], axis=axis)   # (…, nb, 1, …)
    pad = [(0, 0)] * x.ndim
    pad[axis + 1] = (0, b - 1)
    G = jnp.pad(G, pad)
    y = (main + G).reshape(x.shape[:axis] + (nb * b,)
                           + x.shape[axis + 2:])
    tail = jax.lax.slice_in_dim(extra, nb - 1, nb, axis=axis)
    tail = tail.reshape(x.shape[:axis] + (1,) + x.shape[axis + 2:])
    return jnp.concatenate([y, tail], axis=axis)


def fold_pieces(pieces: jnp.ndarray, brick_elems, bricks,
                nodes) -> jnp.ndarray:
    """(NBxy, box_xy, Zp) per-brick-row P pieces -> (NXn, NYn, NZn)
    node grid, accumulating the shared x/y planes."""
    bx, by, bz = brick_elems
    BX, BY, BZ = bricks
    Zp = pieces.shape[2]
    P5 = pieces.reshape(BX, BY, bx + 1, by + 1, Zp) \
        .transpose(0, 2, 1, 3, 4)                 # (BX, bx+1, BY, by+1, Zp)
    y = _fold(P5, 2, by, BY)                      # (BX, bx+1, NYn, Zp)
    y = _fold(y, 0, bx, BX)                       # (NXn, NYn, Zp)
    return y[:, :, :nodes[2]]


def window_P(xc: jnp.ndarray, rstw: jnp.ndarray, s2t: jnp.ndarray,
             ezt: jnp.ndarray, brick_elems, bricks, nodes,
             interpret: bool = False) -> jnp.ndarray:
    """(bs, NB) slot-major coarse values -> (NXn, NYn, NZn) node grid
    (adjoint of window_R up to the bf16 operand truncations)."""
    bx, by, bz = brick_elems
    BX, BY, BZ = bricks
    _, bs, box_xy, Lzp = rstw.shape
    Zp = ezt.shape[1]
    x3 = xc.reshape(bs, BX * BY, BZ).transpose(1, 0, 2)
    x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, PZP - BZ)))
    fn = _build_window_P(bs, box_xy, BX, BY, Zp, Lzp, interpret)
    pieces = fn(s2t, ezt, x3, rstw)               # (NBxy, box_xy, Zp)
    return fold_pieces(pieces, brick_elems, bricks, nodes)
