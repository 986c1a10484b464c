"""VMEM-resident mid-level smoothing chains (ops/pallas_midsmooth.py)
vs the per-root XLA loop over BrickBlockOp.matvec: identical chained
root semantics (smpr_compute_poly, smpr.hpp:319-339) with the operator
blocks DMAed to VMEM once per chain."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax
import jax.numpy as jnp

from saamge_tpu.solve.structured import BrickBlockOp
from saamge_tpu.ops.pallas_midsmooth import (mid_chain, prep_blocksT,
                                             pad_vec, unpad_vec)

INTERP = jax.devices()[0].platform == "cpu"


def _brick_op(bricks, bs, seed=0, ragged_rects=False):
    """Random brick-neighbor-coupled operator as CSR -> BrickBlockOp."""
    BX, BY, BZ = bricks
    NB = BX * BY * BZ
    n = NB * bs
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    pid = np.arange(NB)
    px, py, pz = pid // (BY * BZ), (pid // BZ) % BY, pid % BZ
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                qx, qy, qz = px + dx, py + dy, pz + dz
                ok = ((0 <= qx) & (qx < BX) & (0 <= qy) & (qy < BY)
                      & (0 <= qz) & (qz < BZ))
                p_ok = pid[ok]
                q_ok = (qx * BY + qy)[ok] * BZ + qz[ok]
                # optionally restrict far offsets to low slots so the
                # used-slot rectangles are genuinely ragged
                far = abs(dx) + abs(dy) + abs(dz)
                r1 = bs if (far == 0 or not ragged_rects) else \
                    max(1, bs - far)
                r2 = bs if (far == 0 or not ragged_rects) else \
                    max(1, bs - 2 * far)
                for s1 in range(r1):
                    for s2 in range(r2):
                        rows.append(s1 * NB + p_ok)
                        cols.append(s2 * NB + q_ok)
                        vals.append(
                            rng.standard_normal(len(p_ok)) * 0.05
                            + (2.0 if (far == 0 and s1 == s2) else 0.0))
    A = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n)).tocsr()
    cd_brick = np.tile(np.arange(NB), bs)
    slot = np.repeat(np.arange(bs), NB)
    return BrickBlockOp.from_csr(A, cd_brick, slot, bs, bricks,
                                 dtype=jnp.float32), A


def _reference_chain(op, taus, b, d, x, emit_res):
    for t in taus:
        x = x + d * (b - op.matvec(x)) * t[0]
    if emit_res:
        return x, b - op.matvec(x)
    return x


@pytest.mark.parametrize("bricks,bs,emit_res,ragged", [
    ((3, 2, 2), 4, True, False),
    ((3, 2, 2), 4, False, False),
    ((2, 3, 4), 5, True, True),
    ((4, 4, 4), 3, False, True),
])
def test_mid_chain_matches_root_loop(bricks, bs, emit_res, ragged):
    op, _ = _brick_op(bricks, bs, seed=hash((bricks, bs)) % 1000,
                      ragged_rects=ragged)
    NB = int(np.prod(bricks))
    n = NB * bs
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    d = jnp.asarray(rng.random(n) * 0.3 + 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    taus = tuple(jnp.asarray([t], jnp.float32)
                 for t in (0.31, 0.17, 0.09, 0.23))

    ref = _reference_chain(op, taus, b, d, x, emit_res)

    blocksT = prep_blocksT(op)
    out = mid_chain(blocksT, op.doffs, op.rects, op.bricks, bs, NB,
                    taus, pad_vec(b, bs, NB), pad_vec(d, bs, NB),
                    pad_vec(x, bs, NB), emit_res=emit_res,
                    interpret=INTERP)
    if emit_res:
        x_ref, r_ref = ref
        x_k, r_k = (unpad_vec(out[0], bs, NB), unpad_vec(out[1], bs, NB))
        np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                                   rtol=2e-5, atol=2e-5)
    else:
        x_k = unpad_vec(out, bs, NB)
        np.testing.assert_allclose(np.asarray(x_k), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_mid_chain_bf16_blocks_close():
    """bf16-valued blocks relax a ~1e-2-perturbed operator (same class
    as mid_dtype=bfloat16 on the XLA path)."""
    op, _ = _brick_op((3, 3, 2), 4, seed=11)
    NB, bs = 18, 4
    n = NB * bs
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    d = jnp.asarray(rng.random(n) * 0.3 + 0.1, jnp.float32)
    x = jnp.zeros(n, jnp.float32)
    taus = tuple(jnp.asarray([t], jnp.float32) for t in (0.3, 0.12))
    ref = _reference_chain(op, taus, b, d, x, False)
    import dataclasses
    op16 = dataclasses.replace(op, blocks=op.blocks.astype(jnp.bfloat16))
    out = mid_chain(prep_blocksT(op16), op.doffs, op.rects, op.bricks,
                    bs, NB, taus, pad_vec(b, bs, NB),
                    pad_vec(d, bs, NB), pad_vec(x, bs, NB),
                    interpret=INTERP)
    err = np.abs(np.asarray(unpad_vec(out, bs, NB)) - np.asarray(ref))
    assert err.max() <= 0.05 * max(1.0, float(jnp.abs(ref).max()))


@pytest.mark.parametrize("bricks,bs,emit_res,ragged", [
    ((3, 2, 2), 4, True, False),
    ((2, 3, 4), 5, True, True),
    ((4, 4, 4), 3, False, True),
])
def test_mid_chain_symmetric_halving(bricks, bs, emit_res, ragged):
    """sym=True packs only the non-negative offsets and applies each
    resident block both ways (B_{-d} is the slot-transpose of B_{+d}
    shifted by d) — must match the full-offset chain exactly up to fp
    reassociation."""
    op0, A = _brick_op(bricks, bs, seed=hash((bricks, bs, 5)) % 1000,
                       ragged_rects=ragged)
    Asym = ((A + A.T) * 0.5).tocsr()
    NB = int(np.prod(bricks))
    cd_brick = np.tile(np.arange(NB), bs)
    slot = np.repeat(np.arange(bs), NB)
    op = BrickBlockOp.from_csr(Asym, cd_brick, slot, bs, bricks,
                               dtype=jnp.float32)
    n = NB * bs
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    d = jnp.asarray(rng.random(n) * 0.3 + 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    taus = tuple(jnp.asarray([t], jnp.float32)
                 for t in (0.31, 0.17, 0.09))

    full = mid_chain(prep_blocksT(op), op.doffs, op.rects, op.bricks,
                     bs, NB, taus, pad_vec(b, bs, NB),
                     pad_vec(d, bs, NB), pad_vec(x, bs, NB),
                     emit_res=emit_res, interpret=INTERP)
    blocks_sym = prep_blocksT(op, sym=True)
    assert sum(a.size for a in blocks_sym) \
        < sum(a.size for a in prep_blocksT(op))
    half = mid_chain(blocks_sym, op.doffs, op.rects, op.bricks, bs, NB,
                     taus, pad_vec(b, bs, NB), pad_vec(d, bs, NB),
                     pad_vec(x, bs, NB), emit_res=emit_res,
                     interpret=INTERP, sym=True)
    outs_f = full if emit_res else (full,)
    outs_h = half if emit_res else (half,)
    for f, hh in zip(outs_f, outs_h):
        np.testing.assert_allclose(
            np.asarray(unpad_vec(hh, bs, NB)),
            np.asarray(unpad_vec(f, bs, NB)), rtol=2e-5, atol=2e-5)


def test_prep_blocksT_sym_rejects_nonsymmetric():
    # rects are direction-symmetric here (non-ragged), so the structure
    # check passes and the per-slot-pair VALUE comparison must fire
    op, _ = _brick_op((3, 2, 2), 4, seed=2)   # random — NOT symmetric
    with pytest.raises(AssertionError):
        prep_blocksT(op, sym=True)
    # ragged rects on a nonsymmetric matrix trip the rectangle assert
    op_r, _ = _brick_op((2, 3, 4), 5, seed=3, ragged_rects=True)
    with pytest.raises(AssertionError):
        prep_blocksT(op_r, sym=True)


def test_sym_stream_rect_matvec_matches(monkeypatch):
    """The sym_stream rect branch of BrickBlockOp.matvec (kept offsets
    applied forward + transposed-shifted) vs the ground truth — the
    rect regime is forced by dropping RECT_MIN_BYTES so the branch is
    exercised at test size."""
    import dataclasses
    _, A = _brick_op((3, 3, 2), 4, seed=33, ragged_rects=True)
    NB, bs = 18, 4
    Asym = ((A + A.T) * 0.5).tocsr()
    cd_brick = np.tile(np.arange(NB), bs)
    slot = np.repeat(np.arange(bs), NB)
    op = BrickBlockOp.from_csr(Asym, cd_brick, slot, bs, (3, 3, 2),
                               dtype=jnp.float32)
    op = dataclasses.replace(op, sym_stream=True)
    monkeypatch.setattr(BrickBlockOp, "RECT_MIN_BYTES", 0)
    n = NB * bs
    x = np.random.default_rng(7).standard_normal(n).astype(np.float32)
    y_ref = Asym @ x.astype(np.float64)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=2e-5,
                               atol=2e-5 * np.abs(y_ref).max())
    # the sym stream must actually be halved vs the full rect stream
    op_full = dataclasses.replace(op, sym_stream=False)
    assert op.traffic_bytes < op_full.traffic_bytes
    y_full = np.asarray(op_full.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_full, rtol=2e-5,
                               atol=2e-5 * np.abs(y_ref).max())


def test_sym_rejects_one_sided_offset():
    """An offset stored only in one direction (the hazard from_csr's
    rect symmetrization warns about) must RAISE in every sym path, not
    silently drop/fabricate the coupling (_sym_keep guard)."""
    from saamge_tpu.ops.pallas_midsmooth import _sym_keep
    bs, bricks = 2, (2, 2, 2)
    BX, BY, BZ = bricks
    NB = BX * BY * BZ
    n = bs * NB
    pid = np.arange(NB)
    px = pid // (BY * BZ)
    rows = [np.arange(n)]               # unit diagonal, all slots
    cols = [np.arange(n)]
    vals = [np.ones(n)]
    # one-sided coupling: brick p -> p - BY*BZ (dx = -1) ONLY
    src = pid[px > 0]
    rows.append(src)                    # slot 0
    cols.append(src - BY * BZ)
    vals.append(np.full(len(src), 0.5))
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    cd_brick = np.tile(np.arange(NB), bs)
    slot = np.repeat(np.arange(bs), NB)
    op = BrickBlockOp.from_csr(A, cd_brick, slot, bs, bricks,
                               dtype=jnp.float32)
    assert any(tuple(d) == (-1, 0, 0) for d in op.doffs)
    with pytest.raises(ValueError, match="one-sided"):
        _sym_keep(op.doffs)
    with pytest.raises(ValueError, match="one-sided"):
        prep_blocksT(op, sym=True)
    with pytest.raises(ValueError, match="one-sided"):
        op._sym_keep()


def test_fits_gate_measured_shapes():
    """The schedule planner (ops/pallas_midsmooth.plan_mid_kernel)
    keeps the measured flagship shape on the batched schedule, moves
    the measured-OOM n=128 one to the serialized schedule (batched
    peak = packed + ALL f32 product temps: 120.91M scheduled at n=128
    sym vs 128 MB VMEM), and still rejects n=200-class mid levels
    (even 2 serialized product temps blow the budget at L=15744)."""
    from saamge_tpu.ops.pallas_midsmooth import (fits_mid_kernel,
                                                 plan_mid_kernel)
    doffs27 = tuple((dx, dy, dz) for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1) for dz in (-1, 0, 1))
    # n=96 flagship: 27 offsets, bs=20, NB=1728 -> L=1792, measured
    # 28.7 MB packed, compiles and runs on the batched schedule
    rects96 = [(11, 20)] * 27       # ~ the measured 42%-dense rects
    assert plan_mid_kernel(tuple(rects96), 20, 1728, 2)[0] == "batched"
    # n=128: NB=4096 -> L=4096; the batched schedule measurably OOMs
    # (120.91M scoped at sym) but the serialized one fits
    rects128 = [(11, 20)] * 27
    assert plan_mid_kernel(tuple(rects128), 20, 4096, 2,
                           doffs=doffs27)[0] == "serial"
    assert fits_mid_kernel(tuple(rects128), 20, 4096, 2, doffs=doffs27)
    # n=200-class: NB=15625 -> L=15744; a single offset's product temp
    # is ~64 MB f32 — rejected on either schedule
    rects200 = [(20, 32)] * 27
    assert not fits_mid_kernel(tuple(rects200), 32, 15625, 2)
    assert plan_mid_kernel(tuple(rects200), 32, 15625, 2)[0] is None
    # the planner counts r1 padded to the 16-row sublane tile: r1=1
    # and r1=16 must cost the same peak, r1=17 strictly more
    assert plan_mid_kernel(((1, 1),), 4, 128, 2)[1] \
        == plan_mid_kernel(((16, 1),), 4, 128, 2)[1]
    assert plan_mid_kernel(((17, 1),), 20, 128, 2)[1] \
        > plan_mid_kernel(((16, 1),), 20, 128, 2)[1]


@pytest.mark.parametrize("sym", [False, True])
def test_mid_chain_serialized_matches(sym):
    """The serialized schedule (value-dependency fence between
    per-offset products) is numerically identical to the batched one
    up to fp reassociation."""
    op0, A = _brick_op((3, 3, 2), 4, seed=21, ragged_rects=True)
    NB, bs = 18, 4
    if sym:
        Asym = ((A + A.T) * 0.5).tocsr()
        cd_brick = np.tile(np.arange(NB), bs)
        slot = np.repeat(np.arange(bs), NB)
        op = BrickBlockOp.from_csr(Asym, cd_brick, slot, bs, (3, 3, 2),
                                   dtype=jnp.float32)
    else:
        op = op0
    n = NB * bs
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    d = jnp.asarray(rng.random(n) * 0.3 + 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    taus = tuple(jnp.asarray([t], jnp.float32) for t in (0.31, 0.17))
    blocks = prep_blocksT(op, sym=sym)
    outs = [mid_chain(blocks, op.doffs, op.rects, op.bricks, bs, NB,
                      taus, pad_vec(b, bs, NB), pad_vec(d, bs, NB),
                      pad_vec(x, bs, NB), emit_res=True,
                      interpret=INTERP, sym=sym, serialize=ser)
            for ser in (False, True)]
    for f, s in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(unpad_vec(s, bs, NB)),
                                   np.asarray(unpad_vec(f, bs, NB)),
                                   rtol=2e-5, atol=2e-5)
