"""Device sparse formats: banded (gather-free) and Pallas BCSR."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from saamge_tpu.ops.bcsr import DeviceBCSR
from saamge_tpu.ops.sparse import (DeviceBanded, DeviceDIA, DeviceELL,
                                   device_matrix, rcm_permutation)


def _band_matrix(n=100, bw=5, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.diags([rng.standard_normal(n - abs(k)) for k in range(-bw, bw + 1)],
                 offsets=list(range(-bw, bw + 1)), format="csr")
    return A.tocsr()


def test_banded_matches_scipy():
    A = _band_matrix(123, 7)
    B = DeviceBanded.try_from_csr(A, dtype=jnp.float64)
    assert B is not None
    x = np.random.default_rng(1).standard_normal(123)
    y = np.asarray(B.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_banded_fill_guard():
    # an arrow matrix has full bandwidth: banded must refuse
    n = 256
    A = sp.lil_matrix((n, n))
    A.setdiag(2.0)
    A[0, :] = 1.0
    A[:, 0] = 1.0
    assert DeviceBanded.try_from_csr(A.tocsr(), max_fill=8.0) is None


def test_rcm_reduces_band():
    A = _band_matrix(200, 4)
    perm = np.random.default_rng(0).permutation(200)
    Ashuf = A[np.ix_(perm, perm)].tocsr()
    p = rcm_permutation(Ashuf)
    Aback = Ashuf[np.ix_(p, p)].tocoo()
    bw = np.abs(Aback.col - Aback.row).max()
    assert bw <= 3 * 4 + 2


def test_device_matrix_selection():
    # stencil -> DIA
    A = _band_matrix(200, 2)
    assert isinstance(device_matrix(A), DeviceDIA)
    # wide band with many distinct offsets -> banded
    A2 = _band_matrix(400, 45)
    m = device_matrix(A2)
    assert isinstance(m, DeviceBanded)
    # scattered -> ELL
    A3 = sp.random(300, 300, density=0.02, random_state=0,
                   format="csr") + sp.identity(300)
    assert isinstance(device_matrix(A3.tocsr(), banded_max_fill=2.0),
                      DeviceELL)


def test_bcsr_interpret_matches_scipy():
    A = sp.random(100, 150, density=0.05, random_state=0, format="csr")
    B = DeviceBCSR.try_from_csr(A, interpret=True, max_fill=1e9)
    assert B is not None
    x = np.random.default_rng(2).standard_normal(150).astype(np.float32)
    y = np.asarray(B.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, (A @ x).astype(np.float32), atol=1e-4)
