"""Matrix-free Q1 stencil kernels: recompute the fine-level operator's
27 diagonals in VMEM from the element coefficient field.

The structured fine level is a Q1 hex operator on a uniform mesh whose
element matrices factor as ``em_e = c_e * K`` (assemble.py
diffusion_factorized; the reference assembles the same product per
element, fem.hpp:453-484 + DiffusionIntegrator).  Every DIA value is
then a <=8-term weighted sum of neighboring element coefficients:

    A[u, u+delta] = sum_{(l,l'): corner(l')-corner(l)=delta}
                        K[l,l'] * c(u - corner(l))

so a smoother/residual pass can stream the ~1-value-per-node coefficient
field (bf16) instead of the 27 stored diagonals (54 B/node/pass stored
vs ~4 B/node recomputed, at ~91 extra FMA/node).  This is the TPU analog
of a matrix-free FEM operator apply; the reference has no equivalent
(hypre stores CSR), which is why its V-cycle is CSR-stream bound
(tg.cpp:91-131).

MEASURED (v5e, multi-draw min, scripts/mfree_probe.py): the recompute is
VPU-bound, not stream-bound — root pass 0.319 ms vs the stored-bf16
twin's 0.326 ms at n=96 zlane (parity), 1.63 vs 1.10 ms at n=200 flat
(182 FLOP/node executes at ~0.9 TFLOP/s, above the VPU:HBM balance
point).  So this kernel is a MEMORY-CAPACITY feature, not a speed
feature: it removes the k*n stored-diagonal array (918 MB bf16 at 17M
dofs) at speed parity on the flagship geometry and a ~1.5x smoother-pass
tax at scale.  The stored-bf16 twin remains the perf default.

Essential-BC elimination (keep_diag, assemble.eliminate_essential_bc)
is reproduced in-kernel from the node mask m (1 = free, 0 = essential):

    A_elim x = m .* A_full(m .* x) + (1 - m) .* (d .* x),
    d(u) = A_full diagonal = sum_l K[l,l] c(u - corner(l))

(d is the delta=0 value, computed anyway).  The coefficient field is
zero-padded outside the element box, which automatically zeroes every
wrapped/out-of-range stencil tap — the same property the stored-DIA
kernels get from their explicit zeros.

The kernel consumes and produces the SAME haloed (t_rows, 128) vector
layout as ops.pallas_stencil.PallasDIA (it is built to a PallasDIA
twin's block geometry), so it drops into StructuredHierarchy as the
``A0s`` smoother/residual operator with no layout glue.  Supports both
the flat lexicographic and the z-lane fine layouts (the linear strides
are parameters; offset -> (row, lane) splits are generic).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# MFEM hex corner ordering (fem/mesh.py hex_mesh elems stacking):
# bottom face CCW then top face.
CORNERS = ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
           (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))


def _strides(dims: Tuple[int, int, int], nzp: int):
    """(sx, sy) linear node strides for the flat or z-lane layout."""
    NXn, NYn, NZn = dims
    if nzp:
        return NYn * nzp, nzp
    return NYn * NZn, NZn


def _delta_pairs(K, sx: int, sy: int):
    """{linear offset delta: ((corner l, weight K[l,l']), ...)} over the
    27 Q1 stencil couplings."""
    deltas = {}
    for l, (ax, ay, az) in enumerate(CORNERS):
        for lp, (bx, by, bz) in enumerate(CORNERS):
            off = (bx - ax) * sx + (by - ay) * sy + (bz - az)
            deltas.setdefault(off, []).append((l, float(K[l][lp])))
    return {off: tuple(pairs) for off, pairs in deltas.items()}


def _shift(win, b: int):
    """Window shifted by lane offset b (existing pallas_stencil pattern):
    result[r, l] = win value at linear position (base + r)*128 + l + b,
    valid rows [0, w-1)."""
    if b == 0:
        return win
    rolled = pltpu.roll(win, LANES - b, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32,
                                    (win.shape[0] - 1, LANES), 1)
    return jnp.where(lane < LANES - b, rolled[:-1], rolled[1:])


@lru_cache(maxsize=64)
def _build_mfree(dims: Tuple[int, int, int], nzp: int, K: tuple,
                 n_rows_pad: int, br: int, hb: int, mode: str,
                 cdtype, interpret: bool):
    """Matrix-free kernel over the haloed layout (t_rows = n_rows_pad +
    2*hb*br rows).  Program j writes rows [j*br, (j+1)*br); edge programs
    re-zero the halo (identical contract to pallas_stencil._build)."""
    sx, sy = _strides(dims, nzp)
    deltas = _delta_pairs(K, sx, sy)
    corn_off = tuple(-(cx * sx + cy * sy + cz) for (cx, cy, cz) in CORNERS)

    def split(off):
        return divmod(off, LANES)            # 0 <= b < 128

    all_a = [split(o)[0] for o in deltas] + [split(o)[0] for o in corn_off]
    # 16-row alignment: the bf16 window DMA start (j*br - hpad) must be a
    # provable multiple of the packed (2-per-sublane) row tiling; br is a
    # power of two >= 16 here, so a 16-aligned hpad keeps it aligned.
    hpad = -(-(max(abs(a) for a in all_a) + 1) // 16) * 16
    assert br % 16 == 0, br
    hr = hb * br
    assert hpad <= hr, (hpad, hr)
    w = br + 2 * hpad
    t_rows = n_rows_pad + 2 * hr
    grid = t_rows // br

    # delta taps grouped by lane shift (zlane: 3 groups; flat: <= 9)
    dgroups = {}
    for off, pairs in deltas.items():
        a, b = split(off)
        dgroups.setdefault(b, []).append((a, off == 0, pairs))
    # corner (c-field) shifts grouped by lane shift (zlane: 2 groups)
    cgroups = sorted({split(o)[1] for o in corn_off})
    c_ab = [split(o) for o in corn_off]

    def compute(xwin, cwin, mwin):
        xm = xwin * mwin.astype(jnp.float32)
        cw = cwin.astype(jnp.float32)
        cshift = {b: _shift(cw, b) for b in cgroups}

        def cslice(l):
            a, b = c_ab[l]
            return cshift[b][hpad + a:hpad + a + br]

        acc = jnp.zeros((br, LANES), jnp.float32)
        dval = None
        for b, taps in sorted(dgroups.items()):
            xs = _shift(xm, b)
            for a, is_center, pairs in taps:
                val = pairs[0][1] * cslice(pairs[0][0])
                for l, wgt in pairs[1:]:
                    val = val + wgt * cslice(l)
                if is_center:
                    dval = val
                acc = acc + val * xs[hpad + a:hpad + a + br]
        mc = mwin[hpad:hpad + br].astype(jnp.float32)
        xc = xwin[hpad:hpad + br]
        yhat = mc * acc + (1.0 - mc) * (dval * xc)
        return yhat, xc

    def body(j, xp_ref, cp_ref, mp_ref, out_ref, xwin_ref, cwin_ref,
             mwin_ref, sems, emit):
        interior = jnp.logical_and(j >= hb, j < grid - hb)

        @pl.when(interior)
        def _():
            start = pl.multiple_of(j * br - hpad, 16)
            cps = [pltpu.make_async_copy(
                src.at[pl.ds(start, w), :], dst, sems.at[i])
                for i, (src, dst) in enumerate(
                    ((xp_ref, xwin_ref), (cp_ref, cwin_ref),
                     (mp_ref, mwin_ref)))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            yhat, xc = compute(xwin_ref[:, :], cwin_ref[:, :],
                               mwin_ref[:, :])
            out_ref[:, :] = emit(yhat, xc)

        @pl.when(jnp.logical_not(interior))
        def _():
            out_ref[:, :] = jnp.zeros((br, LANES), jnp.float32)

    hspec = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                         memory_space=pltpu.VMEM)
    any3 = [pl.BlockSpec(memory_space=pl.ANY)] * 3

    if mode == "spmv":
        def kernel(xp_ref, cp_ref, mp_ref, out_ref, *scratch):
            body(pl.program_id(0), xp_ref, cp_ref, mp_ref, out_ref,
                 *scratch, lambda yhat, xc: yhat)
        in_specs = any3
    elif mode == "residual":
        def kernel(xp_ref, cp_ref, mp_ref, b_ref, out_ref, *scratch):
            body(pl.program_id(0), xp_ref, cp_ref, mp_ref, out_ref,
                 *scratch, lambda yhat, xc: b_ref[:, :] - yhat)
        in_specs = any3 + [hspec]
    elif mode == "root":
        def kernel(tau_ref, xp_ref, cp_ref, mp_ref, b_ref, dinv_ref,
                   out_ref, *scratch):
            def emit(yhat, xc):
                return xc + dinv_ref[:, :] * (b_ref[:, :] - yhat) \
                    * tau_ref[0]
            body(pl.program_id(0), xp_ref, cp_ref, mp_ref, out_ref,
                 *scratch, emit)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + any3 \
            + [hspec, hspec]
    else:  # pragma: no cover
        raise ValueError(mode)

    # traffic: x/c/m windows (window/block overlap counted) + b/dinv/out
    nbytes = int((3 * w / br + 3) * n_rows_pad * LANES * 4)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((t_rows, LANES), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, LANES), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, LANES), jnp.float32),
                        pltpu.VMEM((w, LANES), cdtype),
                        pltpu.VMEM((w, LANES), cdtype),
                        pltpu.SemaphoreType.DMA((3,))],
        cost_estimate=pl.CostEstimate(
            flops=2 * 91 * n_rows_pad * LANES,
            bytes_accessed=nbytes, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )


@jax.tree_util.register_pytree_node_class
class MatrixFreeQ1:
    """Matrix-free twin of a PallasDIA fine operator (same haloed
    layout/block geometry, same root_h/residual_h/matvec_h interface) —
    drop-in ``A0s`` for StructuredHierarchy.

    ``c_h``/``m_h``: element-coefficient and free-dof-mask fields in the
    haloed (t_rows, 128) node layout (c zero-padded outside the element
    box; both may be bf16 — the values they produce perturb only the
    preconditioner, same class as the stored-bf16 twin)."""

    def __init__(self, c_h, m_h, K: tuple, dims, nzp, shape,
                 n_rows_pad, br, hb, interpret=False):
        self.c_h = c_h
        self.m_h = m_h
        self.K = K
        self.dims = dims
        self.nzp = nzp
        self.shape = shape
        self.n_rows_pad = n_rows_pad
        self.br = br
        self.hb = hb
        self.interpret = interpret

    def tree_flatten(self):
        return (self.c_h, self.m_h), (self.K, self.dims, self.nzp,
                                      self.shape, self.n_rows_pad,
                                      self.br, self.hb, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def hr(self):
        return self.hb * self.br

    @property
    def vals2(self):
        # traffic accounting stand-in (bench): the streamed "values"
        # array of this operator is the coefficient field
        return self.c_h

    @property
    def offsets(self):
        # one logical diagonal stream (c) — bench traffic model hook
        return (0,)

    @staticmethod
    def build(c_elem: np.ndarray, ess_dofs: np.ndarray, em0: np.ndarray,
              dims, nzp: int, like, cdtype=jnp.bfloat16,
              interpret: bool = False,
              A_csr=None) -> "MatrixFreeQ1":
        """``c_elem``: per-element coefficients, flat in the mesh's
        lexicographic element order or already (nx, ny, nz); ``ess_dofs``:
        essential dof ids in the ORIGINAL flat node numbering; ``em0``:
        the (8, 8) reference element matrix; ``like``: the PallasDIA twin
        whose haloed layout to match; ``A_csr``: when given, the full
        assembled operator's diagonal is checked against the (c, em0)
        reconstruction on every row (total, not sampled — a mismatch
        means the factorization does not reproduce the operator)."""
        NXn, NYn, NZn = dims
        nx, ny, nz = NXn - 1, NYn - 1, NZn - 1
        c3 = np.asarray(c_elem, np.float64).reshape(nx, ny, nz)
        cg = np.zeros((NXn, NYn, NZn))
        cg[:nx, :ny, :nz] = c3
        m = np.ones(NXn * NYn * NZn)
        m[np.asarray(ess_dofs, np.int64)] = 0.0
        K = np.asarray(em0, np.float64)

        if A_csr is not None:
            # total diagonal check: d(u) = sum_l K[l,l] c(u - corner(l))
            d = np.zeros((NXn, NYn, NZn))
            for l, (ax, ay, az) in enumerate(CORNERS):
                d[ax:ax + nx, ay:ay + ny, az:az + nz] += K[l, l] * c3
            dia = np.asarray(A_csr.diagonal())
            if not np.allclose(d.ravel(), dia, rtol=1e-8, atol=0.0):
                raise ValueError(
                    "(em0, c) factorization does not reproduce the "
                    "operator diagonal — matrix-free fine level invalid "
                    "for this problem")

        def to_layout(g3):
            if nzp:
                gz = np.zeros((NXn, NYn, nzp))
                gz[:, :, :NZn] = g3
                return gz.ravel()
            return g3.ravel()

        def halo(flat):
            hr = like.hb * like.br
            out = np.zeros(((like.n_rows_pad + 2 * hr) * LANES,))
            out[hr * LANES:hr * LANES + flat.size] = flat
            return jnp.asarray(out.reshape(-1, LANES), cdtype)

        Kt = tuple(tuple(float(v) for v in row) for row in K)
        return MatrixFreeQ1(
            halo(to_layout(cg)), halo(to_layout(m.reshape(dims))),
            Kt, tuple(int(v) for v in dims), int(nzp), like.shape,
            like.n_rows_pad, like.br, like.hb, interpret)

    # -- haloed-layout plumbing (same contract as PallasDIA) -------------
    def pad(self, x):
        xp = jnp.zeros(((2 * self.hr + self.n_rows_pad) * LANES,),
                       dtype=jnp.float32)
        xp = jax.lax.dynamic_update_slice(
            xp, x.astype(jnp.float32), (self.hr * LANES,))
        return xp.reshape(-1, LANES)

    def unpad(self, xh, dtype=jnp.float32):
        n = self.shape[0]
        flat = xh.reshape(-1)
        return flat[self.hr * LANES:self.hr * LANES + n].astype(dtype)

    def _fn(self, mode):
        return _build_mfree(self.dims, self.nzp, self.K, self.n_rows_pad,
                            self.br, self.hb, mode,
                            self.c_h.dtype, self.interpret)

    # -- haloed-layout kernels (chainable) -------------------------------
    def matvec_h(self, xh):
        return self._fn("spmv")(xh, self.c_h, self.m_h)

    def residual_h(self, bh, xh):
        return self._fn("residual")(xh, self.c_h, self.m_h, bh)

    def root_h(self, inv_tau, bh, dinvh, xh):
        """Same contract as PallasDIA.root_h (inv_tau a (1,) f32 device
        array created outside jit)."""
        return self._fn("root")(inv_tau, xh, self.c_h, self.m_h, bh,
                                dinvh)

    def matvec(self, x):
        return self.unpad(self.matvec_h(self.pad(x)), x.dtype)
