"""Tentative prolongator assembly over MISes.

Host path for ContribTent (contrib.cpp): restrict each containing AE's kept
eigenvectors to the MIS (CommunicateEigenvectors, contrib.cpp:492 — in the
sharded setting this is the owner-computes reduce; on one host it is a pure
gather), zero essential-boundary rows and drop all-zero columns
(contrib_filter_boundary, contrib.cpp:102), normalize the surviving columns,
SVD the concatenated block (xpack_svd_dense_arr, xpacks.cpp:494), keep left
singular vectors with sigma > svd_eps * sigma_max (xpack_orth_set,
xpacks.cpp:591, svd_eps = 1e-10), and insert the orthonormal block as the
MIS's columns of the tentative P (contrib_tent_insert_simple,
contrib.cpp:168).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

from saamge_tpu.topology.agglomerate import AggPartRels
from saamge_tpu.utils.logging import sa_print

SVD_EPS = 1e-10  # contrib.cpp:61


@dataclasses.dataclass
class TentativeInterp:
    """Outputs of the tentative-P build consumed by coarse levels
    (interp_data_t fields: mis_tent_interps, mis_numcoarsedof,
    local_coarse_one_representation, coarse_truedof_offset)."""

    P: sp.csr_matrix
    mis_tent_interps: List[np.ndarray]
    mis_numcoarsedof: np.ndarray
    local_coarse_one_representation: Optional[np.ndarray]
    coarse_truedof_offset: int = 0


def restrict_evects_to_mis(rels: AggPartRels, mis: int, ae: int,
                           cut_evects: np.ndarray) -> np.ndarray:
    """agg_restrict_to_agg_enforce (aggregates.cpp:1143): rows of the AE's
    eigenvector block at the MIS's dofs, in mis_to_dof row order."""
    mis_dofs = rels.mis_to_dof.row(mis)
    loc = rels.dofs_local_ids_in_AE(mis_dofs, ae)
    assert (loc >= 0).all()
    return cut_evects[loc, :]


def _filter_boundary(rels: AggPartRels, block: np.ndarray,
                     mis_dofs: np.ndarray,
                     avoid_ess_bdr_dofs: bool) -> np.ndarray:
    """contrib_filter_boundary: zero rows on essential boundary, drop columns
    that become entirely zero."""
    out = block.copy()
    if avoid_ess_bdr_dofs:
        ess = rels.is_dof_ess(mis_dofs)
        out[ess, :] = 0.0
    keep = np.abs(out).sum(axis=0) > 0.0
    return out[:, keep]


def _svd_orth(blocks: List[np.ndarray], eps: float = SVD_EPS) -> np.ndarray:
    """Column-normalize, concatenate, SVD, keep sigma > eps*sigma_max."""
    cols = []
    for b in blocks:
        for j in range(b.shape[1]):
            v = b[:, j]
            nrm = np.linalg.norm(v)
            if nrm > 0.0:
                cols.append(v / nrm)
    if not cols:
        return np.zeros((blocks[0].shape[0], 0))
    M = np.stack(cols, axis=1)
    U, s, _ = np.linalg.svd(M, full_matrices=False)
    if s.size == 0 or s[0] <= 0.0:
        return np.zeros((M.shape[0], 0))
    k = int((s > eps * s[0]).sum())  # count of sigma > eps*sigma_max
    return U[:, :k]


def build_tentative(rels: AggPartRels,
                    cut_evects_arr: List[np.ndarray],
                    avoid_ess_bdr_dofs: bool = True,
                    scaling_P: bool = False,
                    extra_vectors=None) -> TentativeInterp:
    """contrib_mises + SVDInsert (contrib.cpp:551-716).

    ``extra_vectors``: optional callable(mis, mis_dofs) -> block to append
    (polynomial/RBM enrichment, ExtendWith* in contrib.cpp:300-460)."""
    num_mises = rels.num_mises
    ND = rels.ND
    mis_tent_interps: List[np.ndarray] = [None] * num_mises
    mis_numcoarsedof = np.zeros(num_mises, dtype=np.int64)
    one_rep = [] if scaling_P else None

    rows_idx, cols_idx, vals = [], [], []
    filled_cols = 0
    for mis in range(num_mises):
        mis_dofs = rels.mis_to_dof.row(mis)
        dim = len(mis_dofs)
        # gather restricted blocks from each containing AE
        blocks = []
        if cut_evects_arr is not None:
            for ae in rels.mis_to_AE.row(mis):
                blocks.append(restrict_evects_to_mis(
                    rels, mis, int(ae), cut_evects_arr[int(ae)]))
        if extra_vectors is not None:
            eb = extra_vectors(mis, mis_dofs)
            if eb is not None and eb.shape[1] > 0:
                blocks.append(eb)
        # all-essential MIS contributes nothing (SVDInsert, contrib.cpp:577)
        if avoid_ess_bdr_dofs and bool(rels.is_dof_ess(mis_dofs).all()):
            mis_numcoarsedof[mis] = 0
            mis_tent_interps[mis] = np.zeros((dim, 0))
            continue
        if dim == 1:
            basis = np.ones((1, 1))
        else:
            filtered = [_filter_boundary(rels, b, mis_dofs,
                                         avoid_ess_bdr_dofs) for b in blocks]
            basis = _svd_orth(filtered)
            if basis.shape[1] == 0:
                sa_print(5, "WARNING: completely zero contribution on "
                            "mis %d!", mis)
                mis_numcoarsedof[mis] = 0
                mis_tent_interps[mis] = np.zeros((dim, 0))
                continue
        mis_tent_interps[mis] = basis
        ncd = basis.shape[1]
        mis_numcoarsedof[mis] = ncd
        for j in range(ncd):
            nz = basis[:, j] != 0.0
            rows_idx.append(mis_dofs[nz])
            cols_idx.append(np.full(int(nz.sum()), filled_cols + j,
                                    dtype=np.int64))
            vals.append(basis[nz, j])
        if scaling_P and ncd > 0:
            x, *_ = np.linalg.lstsq(basis, np.ones(dim), rcond=None)
            nrm = np.linalg.norm(x)
            one_rep.extend((x / nrm).tolist())
        filled_cols += ncd

    if rows_idx:
        P = sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows_idx), np.concatenate(cols_idx))),
            shape=(ND, filled_cols)).tocsr()
    else:
        P = sp.csr_matrix((ND, 0))
    return TentativeInterp(
        P=P, mis_tent_interps=mis_tent_interps,
        mis_numcoarsedof=mis_numcoarsedof,
        local_coarse_one_representation=(
            np.asarray(one_rep) if scaling_P else None))


# ---------------------------------------------------------------------------
# non-spectral / enrichment vector factories


def ones_vectors(rels: AggPartRels):
    """contrib_ones (contrib.cpp:474): one constant vector per MIS."""
    def make(mis, mis_dofs):
        return np.ones((len(mis_dofs), 1))
    return make


def linear_vectors(rels: AggPartRels, coords: np.ndarray):
    """contrib_linears (ExtendWithPolynomials order 1): constants + linears."""
    def make(mis, mis_dofs):
        c = coords[mis_dofs]   # (dim_mis, sdim)
        return np.concatenate([np.ones((len(mis_dofs), 1)), c], axis=1)
    return make


def rbm_vectors(rels: AggPartRels, coords: np.ndarray, sdim: int):
    """ExtendWithRBMs (contrib.cpp:353): rigid body modes for elasticity.

    DoF numbering is byVDIM (interleaved components); coords has one row per
    node.  Modes: translations per component + rotations."""
    def make(mis, mis_dofs):
        n = len(mis_dofs)
        nodes = mis_dofs // sdim
        comps = mis_dofs % sdim
        x = coords[nodes]     # (n, sdim)
        cols = []
        for d in range(sdim):
            t = np.zeros(n)
            t[comps == d] = 1.0
            cols.append(t)
        if sdim == 2:
            # rotation: u = (y, -x) (contrib.cpp:408-412)
            r = np.zeros(n)
            r[comps == 0] = x[comps == 0, 1]
            r[comps == 1] = -x[comps == 1, 0]
            cols.append(r)
        elif sdim == 3:
            # (y,-x,0), (0,z,-y), (-z,0,x) (contrib.cpp:414-436)
            r = np.zeros(n)
            r[comps == 0] = x[comps == 0, 1]
            r[comps == 1] = -x[comps == 1, 0]
            cols.append(r)
            r = np.zeros(n)
            r[comps == 1] = x[comps == 1, 2]
            r[comps == 2] = -x[comps == 2, 1]
            cols.append(r)
            r = np.zeros(n)
            r[comps == 0] = -x[comps == 0, 2]
            r[comps == 2] = x[comps == 2, 0]
            cols.append(r)
        return np.stack(cols, axis=1)
    return make
