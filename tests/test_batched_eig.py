"""Batched device eigensolves (ops.batched_eig) vs the host Eigensolver."""

import numpy as np
import pytest

from saamge_tpu.ops.batched_eig import (batched_spectral_cut,
                                        batched_weighted_l1)
from saamge_tpu.setup.spectral import Eigensolver, weighted_l1_diag


def _rand_spd_laplacian(n, rng):
    """1D Laplacian-like SPD matrix with random weights."""
    w = rng.uniform(0.5, 2.0, n - 1)
    A = np.zeros((n, n))
    for i in range(n - 1):
        A[i, i] += w[i]
        A[i + 1, i + 1] += w[i]
        A[i, i + 1] -= w[i]
        A[i + 1, i] -= w[i]
    A += np.eye(n) * 1e-8
    return A


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(7)
    return [_rand_spd_laplacian(n, rng)
            for n in [5, 17, 17, 33, 64, 40, 8, 100]]


def test_batched_weighted_l1_matches_host(mats):
    n = 17
    stack = np.stack([m for m in mats if m.shape[0] == n])
    got = batched_weighted_l1(stack)
    for k, m in enumerate([m for m in mats if m.shape[0] == n]):
        np.testing.assert_allclose(got[k], weighted_l1_diag(m), rtol=1e-12)


def test_batched_cut_counts_match_host(mats):
    theta = 0.05
    cut, skipped, bdiags = batched_spectral_cut(mats, theta)
    eig = Eigensolver(use_truncated=False)
    for i, A in enumerate(mats):
        ev_h, skip_h, B_h = eig.solve(A, theta)
        assert cut[i].shape == ev_h.shape, f"AE {i}"
        np.testing.assert_allclose(bdiags[i], B_h, rtol=1e-10)
        np.testing.assert_allclose(skipped[i], skip_h, rtol=1e-6, atol=1e-9)
        # same invariant subspace: B-orthogonal projector difference small
        Pb_h = ev_h @ ev_h.T * B_h[None, :]
        Pb_d = cut[i] @ cut[i].T * bdiags[i][None, :]
        np.testing.assert_allclose(Pb_d, Pb_h, atol=1e-6)


def test_batched_cut_b_orthonormal(mats):
    cut, _, bdiags = batched_spectral_cut(mats, 0.05)
    for X, B in zip(cut, bdiags):
        G = X.T @ (B[:, None] * X)
        np.testing.assert_allclose(G, np.eye(X.shape[1]), atol=1e-6)


def test_truncated_mode_caps(mats):
    big = [m for m in mats if m.shape[0] > 64]
    # theta high enough that everything under the cap qualifies
    cut, _, _ = batched_spectral_cut(big, 0.9, use_truncated=True,
                                     max_vectors=4)
    for X in cut:
        assert X.shape[1] <= 4


def test_end_to_end_same_iterations():
    """Full solver with device_setup=True converges like the host path."""
    from saamge_tpu.api import SpectralAMGSolver, checkerboard_coef
    from saamge_tpu.config import SolverOptions
    from saamge_tpu.fem import assemble
    from saamge_tpu.fem.mesh import quad_mesh

    mesh = quad_mesh(20)
    ess = np.ones(mesh.max_bdr_attr(), dtype=np.int64)
    A, b, em, _, _ = assemble.build_discrete_problem(
        mesh, coef=checkerboard_coef, ess_attr_marker=ess)

    iters = {}
    for device_setup in (False, True):
        opts = SolverOptions(num_levels=2, correct_nulspace=False,
                             first_elems_per_agg=32,
                             device_setup=device_setup)
        s = SpectralAMGSolver(A, mesh, em, opts, ess_attr_marker=ess)
        res = s.solve(b)
        assert res.converged
        iters[device_setup] = res.iterations
    assert abs(iters[True] - iters[False]) <= 1, iters


def test_batched_cut_sharded_over_mesh(mats):
    """Distributed setup: AE batches row-sharded over the device mesh give
    the same spectral cuts."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 4:
        devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 devices")
    mesh = Mesh(np.array(devs[:4]), axis_names=("dp",))
    theta = 0.05
    cut0, skip0, b0 = batched_spectral_cut(mats, theta)
    cut1, skip1, b1 = batched_spectral_cut(mats, theta, mesh=mesh)
    for i in range(len(mats)):
        assert cut0[i].shape == cut1[i].shape
        np.testing.assert_allclose(b0[i], b1[i], rtol=1e-12)
        np.testing.assert_allclose(abs(cut0[i]), abs(cut1[i]), atol=1e-5)


def test_filtered_eig_warmup_threads_harmless():
    """Concurrent compile warm-up must populate the dispatch cache
    without perturbing the real computation's results."""
    import numpy as np
    import jax.numpy as jnp
    from saamge_tpu.ops.filtered_eig import (batched_smallest_eigs,
                                             warmup_threads)
    rng = np.random.default_rng(0)
    B, n, m = 4, 48, 8
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    M = jnp.asarray((A + A.transpose(0, 2, 1)) / (2 * np.sqrt(n))
                    + 2.0 * np.eye(n, dtype=np.float32))
    w_ref, X_ref, _ = batched_smallest_eigs(M, m)
    for t in warmup_threads(B, n, m):
        t.join(timeout=120)
    w2, X2, _ = batched_smallest_eigs(M, m)
    assert np.allclose(w_ref, w2, rtol=0, atol=1e-6)
