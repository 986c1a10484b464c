"""Chebyshev-filtered batched subspace eigensolver (MXU-native).

XLA's TPU eigh runs at ~60 GFLOP/s (measured: 122 s for 1728 solves of
n=736 — it is a Jacobi sweep chain that barely touches the MXU), while
batched matmuls run at tens of TFLOP/s.  The setup pipeline only needs
the ~10-50 SMALLEST eigenpairs of each (scaled) AE operator, so the
right TPU shape is filtered subspace iteration built ENTIRELY from
batched matmuls:

  1. Gershgorin upper bound sigma per matrix (one |M| row sum);
  2. rounds of a degree-d Chebyshev filter p(M) X via the three-term
     recurrence — p amplifies [0, a] against [a, sigma] exponentially in
     d — followed by Cholesky-QR re-orthonormalization (matmul +
     batched triangular solve);
  3. the filter cutoff a is set adaptively from a Rayleigh-Ritz estimate
     of the m-th eigenvalue after the first round;
  4. one final m x m Rayleigh-Ritz on HOST in f64 (the projected
     matrices are tiny; host LAPACK is faster than a device tiny-eigh
     and gives f64 eigenvalues for the theta cut).

This replaces the reference's per-AE LAPACK dsygv / ARPACK dispatch
(xpacks.cpp:224-315, arpacks.cpp:220) for the batched device path.
Accuracy: the subspace is exact up to filter leakage; downstream the
pipeline re-Rayleigh-Ritzes against the f64 sparse AE operators, so only
MISSED directions would matter — guarded by the m = need + margin
subspace width and the parity tests.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


def _cheb_filter(M, X, a, sigma, degree):
    """X <- T_degree(L) X with L = (2 M - (a+sigma) I) / (sigma - a):
    |T_d| <= 1 on [a, sigma], grows like exp(2 d sqrt(a'/..)) below a."""
    c = (a + sigma) / 2.0
    h = (sigma - a) / 2.0

    def lmap(V):
        return (jnp.einsum("bij,bjm->bim", M, V,
                           precision="highest",
                           preferred_element_type=jnp.float32)
                - c[:, None, None] * V) / h[:, None, None]

    T0 = X
    T1 = lmap(X)
    for _ in range(degree - 1):
        T2 = 2.0 * lmap(T1) - T0
        T0, T1 = T1, T2
    return T1


def _orthonormalize(X, eps=1e-6):
    """Cholesky QR (one pass; adequate at f32 for filter iterates)."""
    G = jnp.einsum("bim,bin->bmn", X, X, precision="highest",
                   preferred_element_type=jnp.float32)
    m = X.shape[2]
    G = G + eps * jnp.trace(G, axis1=1, axis2=2)[:, None, None] \
        * jnp.eye(m, dtype=X.dtype) / m
    L = jnp.linalg.cholesky(G)
    # X <- X L^{-T}
    Xt = jax.lax.linalg.triangular_solve(
        L, jnp.swapaxes(X, 1, 2), left_side=True, lower=True,
        transpose_a=False)
    return jnp.swapaxes(Xt, 1, 2)


@lru_cache(maxsize=16)
def _build(n: int, m: int, degree: int, rounds: int):
    @jax.jit
    def first(M, X0, a_frac):
        absM = jnp.abs(M)
        sigma = jnp.max(jnp.sum(absM, axis=2), axis=1) * 1.01
        a = a_frac * sigma
        X = _orthonormalize(X0)
        X = _cheb_filter(M, X, a, sigma, degree)
        X = _orthonormalize(X)
        # RR estimate for the adaptive cutoff
        T = jnp.einsum("bim,bij,bjn->bmn", X, M, X, precision="highest",
                       preferred_element_type=jnp.float32)
        ew = jnp.linalg.eigvalsh(0.5 * (T + jnp.swapaxes(T, 1, 2)))
        return X, sigma, ew

    @jax.jit
    def rest(M, X, a, sigma):
        for _ in range(rounds - 1):
            X = _cheb_filter(M, X, a, sigma, degree)
            X = _orthonormalize(X)
        T = jnp.einsum("bim,bij,bjn->bmn", X, M, X, precision="highest",
                       preferred_element_type=jnp.float32)
        return X, T

    return first, rest


def batched_smallest_eigs(M, m: int, degree: int = 16, rounds: int = 4,
                          a_frac: float = 0.05, seed: int = 0):
    """Approximate the m smallest eigenpairs of each SPD matrix in the
    (B, n, n) f32 stack.  Returns (evals (B, m) f64 host, X (B, n, m)
    device f32) with eigenvalues ascending."""
    B, n, _ = M.shape
    first, rest = _build(n, m, degree, rounds)
    rng = np.random.default_rng(seed)
    X0 = jnp.asarray(rng.standard_normal((B, n, m)), jnp.float32)
    X, sigma, ew = first(M, X0, jnp.float32(a_frac))
    # adaptive cutoff: just above the m-th Ritz value but CLAMPED well
    # below sigma — with m much wider than the wanted low cluster the
    # m-th Ritz value sits in the spectral bulk, and a cutoff near sigma
    # makes the filter a no-op (measured 5e-3 span error on the lowest
    # modes).  The clamp keeps exponential suppression of the bulk; the
    # low cluster (what the theta cut uses) converges fastest.
    ew_host = np.asarray(ew, np.float64)
    a = np.minimum(np.maximum(ew_host[:, -1] * 1.5, 1e-8),
                   np.asarray(sigma, np.float64) * 0.05)
    X, T = rest(M, X, jnp.asarray(a, jnp.float32), sigma)
    T_host = np.asarray(T, np.float64)
    w, V = np.linalg.eigh(0.5 * (T_host + T_host.transpose(0, 2, 1)))
    Xr = jnp.einsum("bim,bmn->bin", X, jnp.asarray(V, jnp.float32),
                    precision="highest", preferred_element_type=jnp.float32)
    return w, Xr
