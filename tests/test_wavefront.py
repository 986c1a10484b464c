"""Wavefront smoother sweeps (ops/pallas_wavefront.py) vs the chained
per-root kernels: identical chained-root semantics (smpr_compute_poly,
smpr.hpp:319-339) with the diagonals streamed once per sweep."""

import numpy as np
import scipy.sparse as sp
import pytest

import jax
import jax.numpy as jnp

from saamge_tpu.ops.sparse import DeviceDIA
from saamge_tpu.ops.pallas_stencil import PallasDIA
from saamge_tpu.ops.pallas_wavefront import (plan_segments,
                                             wavefront_smooth)

INTERP = jax.devices()[0].platform == "cpu"


def _stencil(nx, ny, nz, br, seed=0):
    """Random SPD-ish 27-point stencil on an (nx, ny, nz) node grid, as
    a PallasDIA with a chosen block-row size (small br forces multi-
    block wavefronts and hb > 1 geometries)."""
    N = nx * ny * nz
    offs = sorted(dx * ny * nz + dy * nz + dz
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dz in (-1, 0, 1))
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((len(offs), N)) * 0.1
    vals[offs.index(0)] = 2.0 + rng.random(N)
    for k, o in enumerate(offs):
        if o >= 0:
            vals[k, N - o:] = 0
        else:
            vals[k, :-o] = 0
    dia = DeviceDIA(jnp.asarray(vals, jnp.float32), tuple(offs), (N, N))
    n_rows = -(-N // 128)
    n_rows_pad = -(-n_rows // br) * br
    hr_need = max(abs(a) + 1 for a in
                  (divmod(int(o), 128)[0] for o in offs))
    hb = max(1, -(-hr_need // br))
    vals2 = jnp.zeros((len(offs), n_rows_pad * 128), jnp.float32)
    vals2 = vals2.at[:, :N].set(dia.vals).reshape(len(offs),
                                                  n_rows_pad, 128)
    return PallasDIA(vals2, tuple(offs), (N, N), n_rows_pad, br, hb,
                     interpret=INTERP)


def _chained(pdia, inv_taus, bh, dinvh, xh):
    for it in inv_taus:
        xh = pdia.root_h(it, bh, dinvh, xh)
    return xh


def _setup(pdia, seed, n_roots):
    rng = np.random.default_rng(seed)
    n = pdia.shape[0]
    b = pdia.pad(jnp.asarray(rng.standard_normal(n), jnp.float32))
    d = pdia.pad(jnp.asarray(rng.random(n) + 0.5, jnp.float32))
    x = pdia.pad(jnp.asarray(rng.standard_normal(n), jnp.float32))
    taus = tuple(jnp.asarray([1.0 / t], jnp.float32)
                 for t in (rng.random(n_roots) + 1.0))
    return b, d, x, taus


@pytest.mark.parametrize("dims,br,k", [
    ((10, 10, 10), 16, 3),    # hb=1, several blocks
    ((6, 20, 26), 16, 4),     # row reach 17 > br -> hb=2
    ((8, 8, 8), 128, 2),      # single data block, hb=1 edge geometry
])
def test_wavefront_matches_chained(dims, br, k):
    pdia = _stencil(*dims, br)
    b, d, x, taus = _setup(pdia, 1, k)
    ref = np.asarray(pdia.unpad(_chained(pdia, taus, b, d, x)))
    got_h = wavefront_smooth(pdia, taus, b, d, x)
    got = np.asarray(pdia.unpad(got_h))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 1e-5 * scale
    # halo rows stay zero (chainability invariant)
    gh = np.asarray(got_h)
    assert np.all(gh[:pdia.hr] == 0) and np.all(gh[-pdia.hr:] == 0)


def test_wavefront_residual_output():
    pdia = _stencil(10, 10, 10, 16)
    b, d, x, taus = _setup(pdia, 2, 3)
    xs = _chained(pdia, taus, b, d, x)
    ref_x = np.asarray(pdia.unpad(xs))
    ref_r = np.asarray(pdia.unpad(pdia.residual_h(b, xs)))
    got_xh, got_rh = wavefront_smooth(pdia, taus, b, d, x,
                                      emit_residual=True)
    assert np.abs(np.asarray(pdia.unpad(got_xh)) - ref_x).max() \
        <= 1e-5 * np.abs(ref_x).max()
    assert np.abs(np.asarray(pdia.unpad(got_rh)) - ref_r).max() \
        <= 1e-5 * np.abs(ref_r).max()
    gh = np.asarray(got_rh)
    assert np.all(gh[:pdia.hr] == 0) and np.all(gh[-pdia.hr:] == 0)


def test_wavefront_segment_split():
    """A tiny VMEM budget forces multiple chained segments."""
    pdia = _stencil(10, 10, 10, 16)
    b, d, x, taus = _setup(pdia, 3, 6)
    segs = plan_segments(pdia, 6, True, lead=0,
                         vmem_budget=800 * 1024)
    assert segs is not None and len(segs) >= 2
    assert sum(s for s, _ in segs) == 6 and segs[-1][1]
    xs = _chained(pdia, taus, b, d, x)
    ref_x = np.asarray(pdia.unpad(xs))
    ref_r = np.asarray(pdia.unpad(pdia.residual_h(b, xs)))
    got_xh, got_rh = wavefront_smooth(pdia, taus, b, d, x,
                                      emit_residual=True, segments=segs)
    assert np.abs(np.asarray(pdia.unpad(got_xh)) - ref_x).max() \
        <= 1e-5 * np.abs(ref_x).max()
    assert np.abs(np.asarray(pdia.unpad(got_rh)) - ref_r).max() \
        <= 1e-5 * np.abs(ref_r).max()


def test_wavefront_single_root():
    pdia = _stencil(8, 8, 8, 16)
    b, d, x, taus = _setup(pdia, 4, 1)
    ref = np.asarray(pdia.unpad(_chained(pdia, taus, b, d, x)))
    got = np.asarray(pdia.unpad(wavefront_smooth(pdia, taus, b, d, x)))
    assert np.abs(got - ref).max() <= 1e-5 * np.abs(ref).max()


def test_wavefront_bf16_twin():
    """bf16 diagonal storage (the production smoother twin)."""
    pdia = _stencil(10, 10, 10, 16)
    pb = PallasDIA(pdia.vals2.astype(jnp.bfloat16), pdia.offsets,
                   pdia.shape, pdia.n_rows_pad, pdia.br, pdia.hb,
                   interpret=INTERP)
    b, d, x, taus = _setup(pdia, 5, 3)
    ref = np.asarray(pb.unpad(_chained(pb, taus, b, d, x)))
    got = np.asarray(pb.unpad(wavefront_smooth(pb, taus, b, d, x)))
    assert np.abs(got - ref).max() <= 1e-5 * max(np.abs(ref).max(), 1.0)
