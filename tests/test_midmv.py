"""Lane-chunked streamed brick-block matvec (ops/pallas_midmv.py) vs
the scipy ground truth and the XLA BrickBlockOp.matvec."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saamge_tpu.ops.pallas_midmv import (chunk_plan, chunked_matvec,
                                         prep_blocks_chunked)
from tests.test_midsmooth import _brick_op

INTERP = jax.devices()[0].platform == "cpu"


@pytest.mark.parametrize("bricks,bs,ragged", [
    ((10, 8, 8), 4, True),    # NB=640 > Lc=512 -> 2 chunks, boundary
    ((10, 8, 8), 4, False),   #   reads cross the chunk seam
    ((3, 2, 2), 5, True),     # NB=12 -> single chunk, heavy lane pad
    ((16, 8, 4), 3, True),    # NB=512 == Lc exactly
])
def test_chunked_matvec_matches(bricks, bs, ragged):
    op, A = _brick_op(bricks, bs, seed=hash((bricks, bs)) % 997,
                      ragged_rects=ragged)
    NB = int(np.prod(bricks))
    n = NB * bs
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n).astype(np.float32)

    blocks, Lc = prep_blocks_chunked(op)
    Lc2, Lpad, C, nside = chunk_plan(
        op.doffs, op.bricks, NB, rects=tuple(op.rects),
        itemsize=op.blocks.dtype.itemsize)
    assert Lc == Lc2 and Lpad == C * Lc and Lpad >= NB

    y = chunked_matvec(blocks, op.doffs, op.rects, op.bricks, bs, NB,
                       Lc, jnp.asarray(x), interpret=INTERP)
    y_ref = A @ x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5,
                               atol=2e-5 * np.abs(y_ref).max())
    # and against the XLA matvec (same fp class)
    y_xla = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), y_xla, rtol=2e-5,
                               atol=2e-5 * np.abs(y_ref).max())


def test_chunked_matvec_bf16_blocks():
    """bf16 blocks: same rounding class as the bf16 XLA rect path."""
    import dataclasses
    op, A = _brick_op((10, 8, 8), 4, seed=31, ragged_rects=True)
    op16 = dataclasses.replace(op, blocks=op.blocks.astype(jnp.bfloat16))
    NB, bs = 640, 4
    n = NB * bs
    rng = np.random.default_rng(6)
    x = rng.standard_normal(n).astype(np.float32)
    blocks, Lc = prep_blocks_chunked(op16)
    y = chunked_matvec(blocks, op.doffs, op.rects, op.bricks, bs, NB,
                       Lc, jnp.asarray(x), interpret=INTERP)
    y_ref = A @ x.astype(np.float64)
    err = np.abs(np.asarray(y) - y_ref)
    assert err.max() <= 0.05 * max(1.0, float(np.abs(y_ref).max()))


def test_chunked_matvec_multi_side_refs(monkeypatch):
    """Bounded-VMEM plan: when the packed block refs exceed the VMEM
    budget, Lc shrinks below the largest offset shift and the window
    spans 2*nside+1 shifted refs (the 33M-dof capacity regime where the
    single-chunk plan needed ~113 MB of VMEM).  Forced here by a tiny
    budget so nside >= 2 is exercised at test scale."""
    from saamge_tpu.ops import pallas_midmv as pm
    bricks, bs = (3, 24, 24), 4             # maxs = 576 + 24 + 1 = 601
    op, A = _brick_op(bricks, bs, seed=11, ragged_rects=True)
    NB = int(np.prod(bricks))
    monkeypatch.setattr(pm, "BLOCK_VMEM_BUDGET", 1 << 20)
    try:
        Lc, Lpad, C, nside = chunk_plan(
            op.doffs, op.bricks, NB, rects=tuple(op.rects),
            itemsize=op.blocks.dtype.itemsize)
        assert nside >= 2, (Lc, nside)
        n = NB * bs
        rng = np.random.default_rng(7)
        x = rng.standard_normal(n).astype(np.float32)
        blocks, Lc2 = prep_blocks_chunked(op)
        assert Lc2 == Lc
        y = chunked_matvec(blocks, op.doffs, op.rects, op.bricks, bs,
                           NB, Lc, jnp.asarray(x), interpret=INTERP)
        y_ref = A @ x.astype(np.float64)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5,
                                   atol=2e-5 * np.abs(y_ref).max())
    finally:
        # the budget participates in kernel construction but not in the
        # build cache key; drop the patched-build entries
        pm._build_chunked_mv.cache_clear()
