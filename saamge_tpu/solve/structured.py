"""Gather-free structured hierarchy: the production TPU solve path for
structured hex meshes with brick agglomeration.

TPU element gathers run ~50x slower than streamed reads (measured 0.14
Gelem/s vs ~950 GB/s stream on v5e), so the generic ELL formats that are
natural on CPUs (hypre CSR SpMV, interp_global_tent_assemble products —
reference tg.cpp:91-131, interp.cpp:761) are the wrong shape for this
hardware.  With a Cartesian brick partitioning (topology/part.py
partition_cartesian_3d) the whole solve phase becomes gather-free:

 - FINE level: 27-point stencil -> blocked Pallas DIA passes
   (ops/pallas_stencil.py).
 - TENTATIVE P/R: every MIS is a face/edge/corner/interior box of the
   brick grid and lies inside its MASTER brick's closed dof box (master =
   lowest containing AE, the reference's lowest-owner-rank rule,
   aggregates.cpp:271-299).  Restriction is therefore
   strided-window extraction (axis-by-axis reshape+concat overlap
   decomposition, _extract_boxes — pure strided copies, measured 5.7x
   the conv_general_dilated_patches lowering it replaced) + one batched
   dense contraction per brick;
   prolongation is the transposed contraction + an 8-piece static-slice
   overlap assembly (upper-half-open tiling: dof plane g = k*b belongs to
   brick k-1, so pieces are disjoint static slices — no scatter).
 - COARSE dofs live in a brick-major PADDED layout: brick p's coarse dofs
   occupy slots [p*bs, p*bs + count_p), zero-padded to a common bs.  The
   Galerkin operator couples brick p only to its <=27 brick neighbors
   (tent P supports live in closed brick boxes; the fine stencil reaches
   one node), so it is stored as a BRICK-BLOCK operator: one dense
   (NB, bs, bs) block array per nonzero brick offset, applied as a single
   batched MXU contraction against 27 statically-shifted views of the
   padded coarse vector — gather-free, and (in bf16) ~100x less traffic
   than the dense operator it replaces.
 - COARSEST: dense inverse applied as a matvec (triangular solves are
   serial and measured 4-8 ms at 8-16k on TPU; an inverse matvec is one
   streamed GEMV at <1 ms, and exactness only affects preconditioner
   quality, cf. the reference's UMFPACK/BoomerAMG coarse solve,
   tg.cpp:991-1012).

Reference counterparts: tg_cycle_atb (tg.cpp:91), interp tent blocks
(contrib.cpp:551-716), coarse Dof_TrueDof block offsets
(aggregates.cpp:1693-1702).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from saamge_tpu.ops.pallas_stencil import PallasDIA
from saamge_tpu.ops.sparse import DeviceDIA

MAX_STRUCT_DIAGS = 4096


# ---------------------------------------------------------------------------
# host-side builders


@dataclasses.dataclass
class BrickGeometry:
    """Static geometry of a brick-partitioned structured hex mesh.

    Nodes per dim are (BX*bx+1, BY*by+1, BZ*bz+1); fine dof id is
    x-major lexicographic (fem/mesh.py hex_mesh vid)."""

    bricks: Tuple[int, int, int]      # (BX, BY, BZ)
    brick_elems: Tuple[int, int, int]  # (bx, by, bz)

    @property
    def nodes(self):
        (BX, BY, BZ), (bx, by, bz) = self.bricks, self.brick_elems
        return (BX * bx + 1, BY * by + 1, BZ * bz + 1)

    @property
    def num_bricks(self):
        return int(np.prod(self.bricks))

    @property
    def box(self):
        bx, by, bz = self.brick_elems
        return (bx + 1) * (by + 1) * (bz + 1)


def coarse_brick_numbering(rels, mis_numcoarsedof: np.ndarray):
    """Group coarse dofs by the master brick of their MIS (master = min
    containing AE) and assign slots; returns (brick, slot, bs) per coarse
    dof plus counts.  This is the coarse Dof_TrueDof block structure of
    the reference (aggregates.cpp:1610-1730) specialized to bricks."""
    nm = rels.num_mises
    ncd = np.asarray(mis_numcoarsedof, dtype=np.int64)
    # master AE per MIS = min of the containing AEs
    m2a = rels.mis_to_AE
    sizes = m2a.row_sizes()
    master = np.full(nm, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(master, np.repeat(np.arange(nm), sizes), m2a.indices)
    cd_mis = np.repeat(np.arange(nm), ncd)
    cd_brick = master[cd_mis]
    counts = np.bincount(cd_brick, minlength=rels.nparts)
    bs = int(counts.max())
    # slot = position within brick, coarse dofs in ascending c order
    order = np.argsort(cd_brick, kind="stable")
    slot = np.empty(len(cd_mis), dtype=np.int64)
    starts = np.zeros(rels.nparts + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot[order] = np.arange(len(cd_mis)) - starts[cd_brick[order]]
    return cd_brick, slot, bs, counts


def build_structured_interp(rels, P: sp.csr_matrix,
                            mis_numcoarsedof: np.ndarray,
                            geo: BrickGeometry):
    """Dense per-brick tentative interpolation blocks.

    Returns (Rst, cd_brick, slot, bs): Rst (NB, bs, box) with
    Rst[p, s, boxpos] = P[fine dof at boxpos of brick p's closed box,
    coarse dof (p, s)] — the per-MIS tent interps regrouped by master
    brick (contrib.cpp mis_tent_interps)."""
    (BX, BY, BZ) = geo.bricks
    (bx, by, bz) = geo.brick_elems
    NXn, NYn, NZn = geo.nodes
    NB, box = geo.num_bricks, geo.box
    cd_brick, slot, bs, _ = coarse_brick_numbering(rels, mis_numcoarsedof)

    Pc = P.tocsc()
    n_c = Pc.shape[1]
    assert len(cd_brick) == n_c, (len(cd_brick), n_c)
    rows = Pc.indices
    vals = Pc.data
    col_of = np.repeat(np.arange(n_c), np.diff(Pc.indptr))
    # fine dof -> grid coords (x-major lex: ix*NYn*NZn + iy*NZn + iz)
    ix, rem = np.divmod(rows, NYn * NZn)
    iy, iz = np.divmod(rem, NZn)
    pb = cd_brick[col_of]
    pz = pb % BZ
    py = (pb // BZ) % BY
    px = pb // (BY * BZ)
    u = ix - px * bx
    v = iy - py * by
    w = iz - pz * bz
    ok = ((u >= 0) & (u <= bx) & (v >= 0) & (v <= by)
          & (w >= 0) & (w <= bz))
    if not np.all(ok):
        raise ValueError(
            "tent column escapes its master brick's closed box — "
            "partitioning is not brick-structured")
    boxpos = (u * (by + 1) + v) * (bz + 1) + w
    Rst = np.zeros((NB, bs, box), dtype=np.float32)
    Rst[pb, slot[col_of], boxpos] = vals
    return Rst, cd_brick, slot, bs


def build_structured_interp2(rels1, P1: sp.csr_matrix,
                             mis_numcoarsedof1: np.ndarray,
                             geo: BrickGeometry, supers,
                             cd_brick: np.ndarray, slot: np.ndarray,
                             bs: int):
    """Block-diagonal level-2 tent restriction blocks over superbricks.

    In the slot-major master-brick layout every level-2 tent column is
    supported on level-1 dofs whose MASTER brick lies inside the
    column's master superbrick: a dof with master brick p in superbrick
    S' belongs to AE2 S' (its MIS1 is contained in brick p), so its
    MIS2 signature-min is <= S' — a master-S MIS2 can only hold dofs
    with master bricks in S.  Hence R1 is BLOCK-DIAGONAL over
    superbricks (no window overlap, unlike the node-grid fine level)
    and applies as a reshape/transpose + one batched contraction —
    replacing the dense (n2, n_flat) restriction (7 GB/cycle at 8.12M
    dofs) with the ~NB2*bs2*win tent blocks.

    Returns (Rst1 (bs2, win, NB2), cd2_brick, slot2, bs2) with
    win = bs*sx*sy*sz and window position ((s*sx+lx)*sy+ly)*sz+lz
    (matching apply_R1's reshape/transpose).  Reference counterpart:
    coarse-level Dof_TrueDof blocks, aggregates.cpp:1610-1730."""
    (BX, BY, BZ) = geo.bricks
    SX, SY, SZ = supers
    if BX % SX or BY % SY or BZ % SZ:
        raise ValueError("supers must divide the brick grid evenly")
    sx, sy, sz = BX // SX, BY // SY, BZ // SZ
    cd2_brick, slot2, bs2, _ = coarse_brick_numbering(
        rels1, mis_numcoarsedof1)
    NB2 = SX * SY * SZ
    win = bs * sx * sy * sz
    Pc = P1.tocsc()
    n2 = Pc.shape[1]
    assert len(cd2_brick) == n2, (len(cd2_brick), n2)
    rows = Pc.indices                       # level-1 coarse dof ids
    vals = Pc.data
    col_of = np.repeat(np.arange(n2), np.diff(Pc.indptr))
    p = cd_brick[rows]
    s = slot[rows]
    pz = p % BZ
    py = (p // BZ) % BY
    px = p // (BY * BZ)
    S = cd2_brick[col_of]
    Sz = S % SZ
    Sy = (S // SZ) % SY
    Sx = S // (SY * SZ)
    lx, ly, lz = px - Sx * sx, py - Sy * sy, pz - Sz * sz
    ok = ((lx >= 0) & (lx < sx) & (ly >= 0) & (ly < sy)
          & (lz >= 0) & (lz < sz))
    if not np.all(ok):
        raise ValueError(
            "level-2 tent column escapes its master superbrick — "
            "the 3rd-level partitioning is not superbrick-structured")
    winpos = ((s * sx + lx) * sy + ly) * sz + lz
    Rst1 = np.zeros((bs2, win, NB2), dtype=np.float32)
    Rst1[slot2[col_of], winpos, S] = vals
    return Rst1, cd2_brick, slot2, bs2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BrickBlockOp:
    """Mid-level Galerkin operator in the SLOT-MAJOR padded brick layout
    (coarse dof (brick p, slot s) lives at flat id s*NB + p).

    blocks[k, s1, s2, p] = Ac[(p, s1), (p + doffs[k], s2)] over the <=27
    nonzero brick offsets.  Slot-major puts the large brick axis in the
    TPU lane dimension, so the matvec is a pure VPU multiply-reduce
    streaming the blocks once (a brick-major layout makes this a batch
    of bs x bs GEMVs, which lowers to MXU-dispatch-bound tiny matmuls —
    measured 31 GB/s vs stream).  Neighbor values come from <=27
    statically-shifted views of the brick-shell-padded vector — no
    gathers; traffic = k * NB * bs^2 * itemsize per pass (vs n_c^2
    dense; the coarse Dof_TrueDof block structure of the reference,
    aggregates.cpp:1610-1730, specialized to bricks)."""

    blocks: jnp.ndarray      # (k, bs, bs, NB), f32 or bf16
    doffs: tuple             # k static (dx, dy, dz) brick offsets
    bricks: tuple            # (BX, BY, BZ) static
    bs: int                  # static
    # per-offset used-slot rectangles (r1_k, r2_k): slot pairs beyond
    # the rectangle are structurally zero (far brick offsets couple
    # only low slots), so the matvec slices them away — 2.4x less
    # HBM traffic at n=256 (4564 of 27*20^2 slot pairs read) with the
    # dense storage layout (and hence the sharded path) unchanged.
    # None = dense rectangles (legacy behavior).
    rects: Optional[tuple] = None
    # symmetry-halved streaming: the operator is symmetric (a Galerkin
    # product), so B_{-d}[s2, s1, p + d] = B_{+d}[s1, s2, p]; the rect
    # matvec then reads only the lexicographically non-negative offsets
    # and applies each slice both ways (forward + transposed-shifted),
    # halving the HBM block stream.  Storage stays full so the sharded
    # path (which never calls this matvec) is unchanged.
    sym_stream: bool = False

    def tree_flatten(self):
        return (self.blocks,), (self.doffs, self.bricks, self.bs,
                                self.rects, self.sym_stream)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def nbytes(self):
        return self.blocks.size * self.blocks.dtype.itemsize

    def _sym_keep(self):
        # single source of truth for the keep-set rule (and its
        # one-sided-offset guard): ops/pallas_midsmooth._sym_keep
        from saamge_tpu.ops.pallas_midsmooth import _sym_keep
        return _sym_keep(self.doffs)

    @property
    def traffic_bytes(self):
        """Bytes the matvec actually streams (rect slices when the
        rect path is active, else the full blocks)."""
        NB = int(np.prod(self.bricks))
        it = self.blocks.dtype.itemsize
        if self.rects is None or self.nbytes < self.RECT_MIN_BYTES:
            return self.blocks.size * it
        keep = self._sym_keep() if self.sym_stream \
            else range(len(self.doffs))
        return sum(self.rects[i][0] * self.rects[i][1]
                   for i in keep) * NB * it

    # Below this blocks size the whole operator is VMEM-resident and ONE
    # fused multiply-reduce beats 27 sliced ops (measured at n=96: 39 MB
    # blocks, fused 0.18 ms vs sliced 0.80 — per-op dispatch dominates
    # when nothing streams from HBM).  Above it the matvec is HBM-bound
    # and the rectangle slicing wins (n=256: 708 MB, 2.22 -> ~1 ms).
    RECT_MIN_BYTES = 96 * 1024 * 1024

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        (BX, BY, BZ), bs = self.bricks, self.bs
        NB = BX * BY * BZ
        x4 = x.reshape(bs, BX, BY, BZ)
        xp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (1, 1)))
        use_rect = (self.rects is not None
                    and self.nbytes >= self.RECT_MIN_BYTES)
        if not use_rect:
            views = [
                jax.lax.slice(xp, (0, 1 + dx, 1 + dy, 1 + dz),
                              (bs, 1 + dx + BX, 1 + dy + BY, 1 + dz + BZ))
                .reshape(bs, -1)
                for (dx, dy, dz) in self.doffs]
            xs = jnp.stack(views).astype(self.blocks.dtype)  # (k, bs, NB)
            y = jnp.sum(self.blocks.astype(jnp.float32)
                        * xs[:, None, :, :].astype(jnp.float32),
                        axis=(0, 2))
            return y.reshape(-1)
        # per-offset multiply-reduce over the used-slot rectangle only;
        # f32 accumulation, one stream over the sliced blocks.  With
        # sym_stream only the non-negative offsets are read; each slice
        # additionally contributes the -d coupling as a transposed
        # product shifted by +d (exact — same values, reassociated)
        keep = self._sym_keep() if self.sym_stream \
            else range(len(self.doffs))
        y = jnp.zeros((bs, NB), jnp.float32)
        for i in keep:
            dx, dy, dz = self.doffs[i]
            r1, r2 = self.rects[i]
            view = jax.lax.slice(
                xp, (0, 1 + dx, 1 + dy, 1 + dz),
                (r2, 1 + dx + BX, 1 + dy + BY, 1 + dz + BZ)
            ).reshape(r2, NB).astype(self.blocks.dtype)
            Bk = jax.lax.slice(self.blocks, (i, 0, 0, 0),
                               (i + 1, r1, r2, NB))[0]
            Bf = Bk.astype(jnp.float32)
            part = jnp.sum(Bf * view[None].astype(jnp.float32), axis=1)
            y = y.at[:r1].add(part)
            if self.sym_stream and (dx, dy, dz) != (0, 0, 0):
                # W[s2, p] = sum_s1 B[s1, s2, p] x[s1, p], scattered to
                # brick p + d via a pad-and-slice shift (out-of-grid
                # targets are dropped; B[:, :, p] is zero there anyway)
                x1 = jax.lax.slice(
                    x4, (0, 0, 0, 0), (r1, BX, BY, BZ)
                ).reshape(r1, NB).astype(self.blocks.dtype)
                W = jnp.sum(Bf * x1[:, None].astype(jnp.float32),
                            axis=0)
                W4 = jnp.pad(W.reshape(r2, BX, BY, BZ),
                             ((0, 0), (1, 1), (1, 1), (1, 1)))
                sh = jax.lax.slice(
                    W4, (0, 1 - dx, 1 - dy, 1 - dz),
                    (r2, 1 - dx + BX, 1 - dy + BY, 1 - dz + BZ))
                y = y.at[:r2].add(sh.reshape(r2, NB))
        return y.reshape(-1)

    @staticmethod
    def from_csr(Ac: sp.csr_matrix, cd_brick: np.ndarray,
                 slot: np.ndarray, bs: int, bricks: Tuple[int, int, int],
                 dtype=jnp.float32,
                 host_blocks_out: Optional[list] = None
                 ) -> "BrickBlockOp":
        """``host_blocks_out``: when a list is passed, the host numpy
        blocks are appended to it and the DEVICE blocks are a (k,1,1,1)
        placeholder — the HBM-frugal mode for operators consumed only
        through the packed chunked-matvec arrays (capacity runs: the
        full padded blocks are GBs at 33M dofs and the chunked path
        never reads them)."""
        BX, BY, BZ = bricks
        coo = Ac.tocoo()
        p, q = cd_brick[coo.row], cd_brick[coo.col]
        pz, qz = p % BZ, q % BZ
        py, qy = (p // BZ) % BY, (q // BZ) % BY
        px, qx = p // (BY * BZ), q // (BY * BZ)
        dx, dy, dz = qx - px, qy - py, qz - pz
        if max(np.abs(dx).max(), np.abs(dy).max(), np.abs(dz).max()) > 1:
            raise ValueError(
                "coarse coupling beyond brick neighbors — partitioning "
                "is not brick-structured")
        dkey = (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1)
        used = np.unique(dkey)
        kmap = np.full(27, -1, dtype=np.int64)
        kmap[used] = np.arange(len(used))
        NB = BX * BY * BZ
        blocks = np.zeros((len(used), bs, bs, NB), dtype=np.float64)
        np.add.at(blocks, (kmap[dkey], slot[coo.row], slot[coo.col], p),
                  coo.data)
        doffs = tuple((int(u) // 9 - 1, (int(u) // 3) % 3 - 1,
                       int(u) % 3 - 1) for u in used)
        # used-slot rectangle per offset (see class docstring)
        ki = kmap[dkey]
        s1a, s2a = slot[coo.row], slot[coo.col]
        rects = []
        for j in range(len(used)):
            m = ki == j
            rects.append((int(s1a[m].max()) + 1, int(s2a[m].max()) + 1))
        # direction-symmetrize the rectangles (rect of -d := transpose
        # of rect of +d): a fp-level cancellation in the host RAP could
        # otherwise make the pattern one-sided, breaking the symmetric
        # halving paths' structural assumption
        dmap = {d: j for j, d in enumerate(doffs)}
        for j, d in enumerate(doffs):
            nd = (-d[0], -d[1], -d[2])
            if nd in dmap:
                jn = dmap[nd]
                r1, r2 = rects[j]
                rects[j] = (max(r1, rects[jn][1]), max(r2, rects[jn][0]))
        if host_blocks_out is not None:
            host_blocks_out.append(blocks)
            dev = jnp.zeros((len(used), 1, 1, 1), dtype)
        else:
            dev = jnp.asarray(blocks, dtype)
        return BrickBlockOp(dev, doffs,
                            (BX, BY, BZ), bs, rects=tuple(rects))


def extract_boxes(r3: jnp.ndarray, brick_elems, bricks) -> jnp.ndarray:
    """Node grid -> (box, NB) overlapping closed-brick windows
    p[(dx,dy,dz), (i,j,k)] = r3[bx*i+dx, by*j+dy, bz*k+dz].

    Axis-by-axis overlap decomposition instead of
    conv_general_dilated_patches: the dx<b rows come from the plain
    non-overlapping reshape and the dx=b row is the next brick's first
    plane (one strided slice) — 3 reshape+concat passes of pure strided
    copies.  Measured 0.154 vs 0.875 ms for the conv patches at n=96
    (the conv lowers gather-heavy on TPU and serializes the surrounding
    cycle).  Requires r3.shape[d] == bricks[d]*brick_elems[d] + 1."""
    def expand(x, axis, b, nb):
        main = jax.lax.slice_in_dim(x, 0, nb * b, axis=axis)
        main = main.reshape(x.shape[:axis] + (nb, b)
                            + x.shape[axis + 1:])
        extra = jax.lax.slice_in_dim(x, b, nb * b + 1, stride=b,
                                     axis=axis)
        extra = extra.reshape(x.shape[:axis] + (nb, 1)
                              + x.shape[axis + 1:])
        return jnp.concatenate([main, extra], axis=axis + 1)

    (BX, BY, BZ) = bricks
    (bx, by, bz) = brick_elems
    X = expand(r3, 0, bx, BX)          # (BX, bx+1, NYn, NZn)
    X = expand(X, 2, by, BY)           # (BX, bx+1, BY, by+1, NZn)
    X = expand(X, 4, bz, BZ)
    box = (bx + 1) * (by + 1) * (bz + 1)
    return X.transpose(1, 3, 5, 0, 2, 4).reshape(box, -1)


# ---------------------------------------------------------------------------
# device-side structured hierarchy


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StructuredHierarchy:
    """3-level (or 2-level) gather-free hierarchy.

    Level 0: blocked Pallas stencil, optionally in the Z-LANE layout
    (``nzp`` > 0): dof (ix, iy, iz) lives at (ix*NYn + iy)*nzp + iz with
    nzp = NZn rounded up to 128, so the 27 stencil offsets
    dx*NYn*nzp + dy*nzp + dz have only THREE distinct lane shifts
    (dz in {-1,0,1}) vs ~27 for the flat lexicographic layout.  Measured
    at n=96: zlane runs the kernel faster (627 vs 586 GB/s effective)
    but streams nzp/NZn ~1.3x more padded diagonal bytes, a net LOSS
    single-chip (0.240 vs 0.194 ms/pass) — its real purpose is the
    SHARDED path (parallel/structured_sharded.py), where an x-plane
    being a whole number of 128-lane rows makes the halo exchange a
    static row-slice ppermute.

    Level 1 (optional): BrickBlockOp on the SLOT-MAJOR padded coarse
    layout (flat id = slot*NB + brick), or a dense (n_c, n_c) operator
    on the unpadded coarse dofs bridged via ``flat_id``.  Coarsest:
    dense inverse matvec."""

    A0: PallasDIA
    dinv0h: jnp.ndarray
    taus0: tuple                  # (1,) f32 device scalars (1/tau)
    Rst: jnp.ndarray              # (bs, box, NB) — slot-major SoA
    # level 1 (None for two-level).
    A1d: Optional[object]
    dinv1: Optional[jnp.ndarray]  # (n_c,) or (n_flat,) f32
    taus1: Optional[tuple]
    R1: Optional[jnp.ndarray]     # (n2, n_c) or (n2, n_flat) dense restr
    Ainv: jnp.ndarray             # dense inverse of the coarsest operator
    geo: BrickGeometry            # static
    n_fine: int                   # static
    n_flat: int                   # static (NB * bs)
    # real (non-padding) slot ids: padded layout <-> unpadded coarse dofs
    flat_id: Optional[jnp.ndarray] = None
    nzp: int = 0                  # static; 0 = flat layout
    # optional bf16-valued twin of A0 (same block geometry/halo layout)
    # used by the smoother and residual passes INSIDE the preconditioner;
    # matvec0 (the PCG operator) always applies the f32 A0
    A0s: Optional[PallasDIA] = None
    # pre-padded Rst copy for the Pallas contraction kernels
    Rst_pad: Optional[jnp.ndarray] = None
    # structured coarsest restriction (replaces the dense R1): per-
    # superbrick tent blocks (bs2, win, NB2), the superbrick grid, and
    # the padded->real level-2 dof bridge (build_structured_interp2)
    Rst1: Optional[jnp.ndarray] = None
    supers: Optional[tuple] = None          # static (SX, SY, SZ)
    flat_id2: Optional[jnp.ndarray] = None
    # fused window-contraction tables (ops/pallas_window.py, bf16 mode):
    # (rstw, ez, s2, s2t, ezt) — replaces extract_boxes + Rst/Rst_pad in
    # the tent applies when present
    Wc: Optional[tuple] = None
    # temporally-blocked fine-level smoothing (ops/pallas_wavefront.py):
    # all roots (+ the pre-smooth's trailing residual) per HBM diagonal
    # stream instead of one kernel per root
    wavefront: bool = False
    # VMEM-resident mid-level smoothing (ops/pallas_midsmooth.py): the
    # transposed lane-padded blocks (k, s2, s1, L); when set, each mid
    # smoothing chain runs as ONE Pallas kernel that DMAs the operator
    # to VMEM once (2 operator streams/cycle instead of 2*deg1+1)
    A1kT: Optional[jnp.ndarray] = None
    # A1kT holds only the lexicographically non-negative offsets (the
    # kernel applies each resident block both ways — symmetry halves
    # the DMA; ops/pallas_midsmooth._sym_keep)
    mid_sym: bool = False
    # lane-chunked streamed mid matvec (ops/pallas_midmv.py): packed
    # per-offset rectangles for operators too large for the resident
    # chain — streams each block byte once per pass (the XLA rect
    # matvec measures ~6x over stream at n=200)
    A1kC: Optional[tuple] = None
    mid_Lc: int = 0               # static chunk size of A1kC
    # full-capacity mode (hbm_frugal + mfree): the PCG operator itself
    # is an exact-f32 matrix-free twin — NO stored fine operator at all
    # (A0.vals2 is then a placeholder; only pad/unpad geometry remains)
    A0m: Optional[object] = None

    def tree_flatten(self):
        return ((self.A0, self.dinv0h, self.taus0, self.Rst, self.A1d,
                 self.dinv1, self.taus1, self.R1, self.Ainv,
                 self.flat_id, self.A0s, self.Rst_pad, self.Rst1,
                 self.flat_id2, self.Wc, self.A1kT, self.A1kC,
                 self.A0m),
                (self.geo, self.n_fine, self.n_flat, self.nzp,
                 self.supers, self.wavefront, self.mid_sym,
                 self.mid_Lc))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:9], aux[0], aux[1], aux[2],
                   flat_id=children[9], nzp=aux[3], A0s=children[10],
                   Rst_pad=children[11], Rst1=children[12],
                   supers=aux[4], flat_id2=children[13],
                   Wc=children[14], wavefront=aux[5],
                   A1kT=children[15], mid_sym=aux[6],
                   A1kC=children[16], mid_Lc=aux[7],
                   A0m=children[17])

    # -- fine-level layout plumbing --------------------------------------
    def _to_zlane(self, x):
        NXn, NYn, NZn = self.geo.nodes
        x3 = x.reshape(NXn, NYn, NZn)
        return jnp.pad(x3, ((0, 0), (0, 0), (0, self.nzp - NZn))) \
            .reshape(-1)

    def _from_zlane3(self, xz):
        """z-lane flat -> (NXn, NYn, NZn) grid."""
        NXn, NYn, NZn = self.geo.nodes
        return xz.reshape(NXn, NYn, self.nzp)[:, :, :NZn]

    def pad0(self, x):
        """original flat (n,) -> haloed kernel layout."""
        return self.A0.pad(self._to_zlane(x) if self.nzp else x)

    def unpad0(self, xh, dtype=jnp.float32):
        """haloed kernel layout -> original flat (n,)."""
        if not self.nzp:
            return self.A0.unpad(xh, dtype)
        return self._from_zlane3(self.A0.unpad(xh, dtype)) \
            .reshape(-1)

    def matvec0(self, x):
        """y = A x on original-layout flat vectors (the PCG operator)."""
        op = self.A0m if self.A0m is not None else self.A0
        return self.unpad0(op.matvec_h(self.pad0(x)), x.dtype)

    # -- structured tentative P/R apply ---------------------------------
    def apply_R(self, res_flat: jnp.ndarray) -> jnp.ndarray:
        """coarse = R res: fused window-contract kernel when Wc is set
        (bf16 mode — no HBM window array at all); otherwise strided
        window extraction + slot-major multiply-reduce; output in the
        slot-major padded layout."""
        r3 = res_flat.reshape(self.geo.nodes)
        if self.Wc is not None:
            from saamge_tpu.ops.pallas_window import window_R
            rstw, ez, s2, _, _ = self.Wc
            yc = window_R(r3, rstw, ez, s2, self.geo.brick_elems,
                          self.geo.bricks, interpret=self.A0.interpret)
            return yc.reshape(-1)
        boxes = extract_boxes(r3, self.geo.brick_elems,
                              self.geo.bricks)    # (box, NB)
        if self.Rst_pad is not None:
            from saamge_tpu.ops.pallas_contract import contract_R
            yc = contract_R(self.Rst_pad, boxes,
                            interpret=self.A0.interpret)
        else:
            yc = jnp.sum(self.Rst * boxes[None], axis=1)   # (bs, NB)
        return yc.reshape(-1)

    def apply_P(self, xc_flat: jnp.ndarray) -> jnp.ndarray:
        """fine = P^T-style prolongation: slot-major multiply-reduce +
        8-piece static-slice overlap assembly (pieces are disjoint
        because dof plane g = k*b belongs to brick k-1 — the
        master/minimum rule)."""
        (BX, BY, BZ) = self.geo.bricks
        (bx, by, bz) = self.geo.brick_elems
        bs = self.Rst.shape[0]
        xc = xc_flat.reshape(bs, -1)              # (bs, NB)
        if self.Wc is not None:
            from saamge_tpu.ops.pallas_window import window_P
            rstw, _, _, s2t, ezt = self.Wc
            y3 = window_P(xc, rstw, s2t, ezt, self.geo.brick_elems,
                          self.geo.bricks, self.geo.nodes,
                          interpret=self.A0.interpret)
            return y3.reshape(-1)
        if self.Rst_pad is not None:
            from saamge_tpu.ops.pallas_contract import contract_P
            C = contract_P(self.Rst_pad, xc, self.geo.box,
                           interpret=self.A0.interpret)
        else:
            C = jnp.sum(self.Rst * xc[:, None, :], axis=0)  # (box, NB)
        C = C.reshape(bx + 1, by + 1, bz + 1, BX, BY, BZ) \
            .transpose(3, 4, 5, 0, 1, 2)
        y3 = jnp.zeros(self.geo.nodes, dtype=jnp.float32)

        def interleave(piece, dims):
            # piece (B_d..., b_d...) -> transpose to (B,b) pairs, flatten
            nd = len(dims)
            permute = []
            for d in range(nd):
                permute += [d, nd + d]
            out = piece.transpose(permute)
            return out.reshape([piece.shape[d] * piece.shape[nd + d]
                                for d in range(nd)])

        # S = set of dims pinned at global plane 0
        y3 = y3.at[1:, 1:, 1:].set(
            interleave(C[:, :, :, 1:, 1:, 1:], (0, 1, 2)))
        y3 = y3.at[0, 1:, 1:].set(
            interleave(C[0, :, :, 0, 1:, 1:], (0, 1)))
        y3 = y3.at[1:, 0, 1:].set(
            interleave(C[:, 0, :, 1:, 0, 1:], (0, 1)))
        y3 = y3.at[1:, 1:, 0].set(
            interleave(C[:, :, 0, 1:, 1:, 0], (0, 1)))
        y3 = y3.at[0, 0, 1:].set(interleave(C[0, 0, :, 0, 0, 1:], (0,)))
        y3 = y3.at[0, 1:, 0].set(interleave(C[0, :, 0, 0, 1:, 0], (0,)))
        y3 = y3.at[1:, 0, 0].set(interleave(C[:, 0, 0, 1:, 0, 0], (0,)))
        y3 = y3.at[0, 0, 0].set(C[0, 0, 0, 0, 0, 0])
        return y3.reshape(-1)

    # -- structured coarsest R1/P1 (block-diagonal over superbricks) ----
    # (implementations shared with MidBundle below: the sharded mirror
    # runs the SAME functions on a replicated coarse vector)
    @property
    def bs(self) -> int:
        return self.Rst.shape[0]

    @property
    def interpret(self) -> bool:
        return self.A0.interpret

    def _super_dims(self):
        return _mid_super_dims(self)

    def apply_R1(self, rc_flat: jnp.ndarray) -> jnp.ndarray:
        return mid_apply_R1(self, rc_flat)

    def apply_P1(self, y2: jnp.ndarray) -> jnp.ndarray:
        return mid_apply_P1(self, y2)

    def _coarsest_correct(self, r1: jnp.ndarray) -> jnp.ndarray:
        return mid_coarsest_correct(self, r1)

    # -- cycle ----------------------------------------------------------
    def _smooth_h(self, A, taus, dinvh, bh, xh, emit_res=False):
        """All fine-level roots; with ``emit_res`` also the trailing
        residual b - A x.  When ``wavefront`` is on and A is a stencil
        operator, the whole chain runs as temporally-blocked sweeps
        (one diagonal stream per sweep instead of per root)."""
        if self.wavefront and isinstance(A, PallasDIA):
            from saamge_tpu.ops.pallas_wavefront import (plan_segments,
                                                         wavefront_smooth)
            lead = 0 if A.interpret else 1
            segs = plan_segments(A, len(taus), emit_res, lead)
            if segs is not None:
                return wavefront_smooth(A, taus, bh, dinvh, xh,
                                        emit_residual=emit_res,
                                        segments=segs)
        for it in taus:
            xh = A.root_h(it, bh, dinvh, xh)
        if emit_res:
            return xh, A.residual_h(bh, xh)
        return xh

    def _mid_matvec(self, x):
        return mid_matvec(self, x)

    def vcycle(self, b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """tg_cycle_atb (tg.cpp:91) on the structured formats."""
        A0 = self.A0s if self.A0s is not None else self.A0
        bh, xh = self.pad0(b), self.pad0(x)
        xh, resh = self._smooth_h(A0, self.taus0, self.dinv0h, bh, xh,
                                  emit_res=True)
        res = self.unpad0(resh)
        rc = self.apply_R(res)
        if self.A1d is not None:
            xc = mid_correct(self, rc)
        else:
            yc = self.Ainv @ rc[self.flat_id]
            xc = jnp.zeros_like(rc).at[self.flat_id].set(yc)
        xh = xh + self.pad0(self.apply_P(xc))
        xh = self._smooth_h(A0, self.taus0, self.dinv0h, bh, xh)
        return self.unpad0(xh)


# ---------------------------------------------------------------------------
# mid-level + coarsest correction, shared between the single-chip
# hierarchy and the sharded mirror (parallel/structured_sharded.py).
# Every function takes a duck-typed ``m`` exposing the mid/coarsest
# fields (StructuredHierarchy or MidBundle) so the sharded path runs
# the EXACT single-chip op sequence on a replicated coarse vector —
# one kernel configuration, one semantics (VERDICT r3 item 4).


def _mid_super_dims(m):
    (BX, BY, BZ), (SX, SY, SZ) = m.geo.bricks, m.supers
    return (SX, SY, SZ), (BX // SX, BY // SY, BZ // SZ)


def mid_apply_R1(m, rc_flat: jnp.ndarray) -> jnp.ndarray:
    """level-2 restriction on the slot-major padded level-1 vector:
    regroup bricks by superbrick (a ~1 MB reshape/transpose) + one
    batched contraction of the block-diagonal tent blocks."""
    (SX, SY, SZ), (sx, sy, sz) = _mid_super_dims(m)
    bs = m.bs
    W = rc_flat.reshape(bs, SX, sx, SY, sy, SZ, sz) \
        .transpose(0, 2, 4, 6, 1, 3, 5) \
        .reshape(bs * sx * sy * sz, SX * SY * SZ)
    return jnp.sum(m.Rst1.astype(jnp.float32)
                   * W[None].astype(jnp.float32), axis=1)  # (bs2,NB2)


def mid_apply_P1(m, y2: jnp.ndarray) -> jnp.ndarray:
    """adjoint of mid_apply_R1: (bs2, NB2) -> slot-major (n_flat,)."""
    (SX, SY, SZ), (sx, sy, sz) = _mid_super_dims(m)
    bs = m.bs
    W = jnp.sum(m.Rst1.astype(jnp.float32)
                * y2[:, None, :].astype(jnp.float32), axis=0)
    return W.reshape(bs, sx, sy, sz, SX, SY, SZ) \
        .transpose(0, 4, 1, 5, 2, 6, 3) \
        .reshape(-1)


def mid_coarsest_correct(m, r1: jnp.ndarray) -> jnp.ndarray:
    """x1 += P1 Ainv R1 r1 term of the cycle on the padded mid
    layout; dense-R1 or structured per what compile built."""
    if m.Rst1 is not None:
        rc2 = mid_apply_R1(m, r1).reshape(-1)
        y2 = m.Ainv @ rc2[m.flat_id2]
        y2p = jnp.zeros_like(rc2).at[m.flat_id2].set(y2)
        nb2 = m.Rst1.shape[2]
        return mid_apply_P1(m, y2p.reshape(-1, nb2))
    y2 = m.Ainv @ (m.R1 @ r1)
    return m.R1.T @ y2


def mid_matvec(m, x):
    if m.A1kC is not None:
        from saamge_tpu.ops.pallas_midmv import chunked_matvec
        A1 = m.A1d
        return chunked_matvec(m.A1kC, A1.doffs, A1.rects,
                              A1.bricks, A1.bs,
                              int(np.prod(A1.bricks)), m.mid_Lc,
                              x, interpret=m.interpret)
    if isinstance(m.A1d, BrickBlockOp):
        return m.A1d.matvec(x)
    return jnp.dot(m.A1d, x.astype(m.A1d.dtype),
                   preferred_element_type=jnp.float32)


def mid_correct(m, rc: jnp.ndarray) -> jnp.ndarray:
    """The whole coarse correction from the restricted residual ``rc``
    (slot-major padded layout): pre mid-chain, coarsest correction,
    post mid-chain (tg_cycle_atb's recursive coarse solve, tg.cpp:126,
    at the mid level)."""
    padded_mid = isinstance(m.A1d, BrickBlockOp)
    b1 = rc if padded_mid else rc[m.flat_id]
    if m.A1kT is not None and padded_mid:
        # VMEM-resident chains: operator streams to VMEM once
        # per chain (pre+residual, post) instead of per root
        from saamge_tpu.ops.pallas_midsmooth import (
            mid_chain, pad_vec, unpad_vec)
        A1 = m.A1d
        NBm = int(np.prod(A1.bricks))
        b2 = pad_vec(b1, A1.bs, NBm)
        d2 = pad_vec(m.dinv1, A1.bs, NBm)
        x2, r2 = mid_chain(m.A1kT, A1.doffs, A1.rects,
                           A1.bricks, A1.bs, NBm, m.taus1,
                           b2, d2, jnp.zeros_like(b2),
                           emit_res=True,
                           interpret=m.interpret,
                           sym=m.mid_sym)
        x1 = unpad_vec(x2, A1.bs, NBm) \
            + mid_coarsest_correct(m, unpad_vec(r2, A1.bs, NBm))
        x2 = mid_chain(m.A1kT, A1.doffs, A1.rects,
                       A1.bricks, A1.bs, NBm, m.taus1,
                       b2, d2, pad_vec(x1, A1.bs, NBm),
                       interpret=m.interpret,
                       sym=m.mid_sym)
        xc = unpad_vec(x2, A1.bs, NBm)
    else:
        x1 = jnp.zeros_like(b1)
        for it in m.taus1:
            x1 = x1 + m.dinv1 * (b1 - mid_matvec(m, x1)) * it[0]
        r1 = b1 - mid_matvec(m, x1)
        x1 = x1 + mid_coarsest_correct(m, r1)
        for it in m.taus1:
            x1 = x1 + m.dinv1 * (b1 - mid_matvec(m, x1)) * it[0]
        xc = x1 if padded_mid \
            else jnp.zeros_like(rc).at[m.flat_id].set(x1)
    return xc


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MidBundle:
    """The mid + coarsest sub-hierarchy as a standalone (replicable)
    pytree: exactly the fields the shared mid_* functions read.  The
    sharded mirror replicates one of these per device and runs
    ``mid_correct`` on the all-gathered coarse residual, so the
    multi-chip mid level is the SAME kernels (resident Pallas chains,
    chunked matvec, superbrick coarsest) in the SAME op order as the
    single-chip flagship configuration."""
    A1d: Optional[object]
    dinv1: Optional[jnp.ndarray]
    taus1: Optional[tuple]
    R1: Optional[jnp.ndarray]
    Ainv: jnp.ndarray
    flat_id: Optional[jnp.ndarray]
    Rst1: Optional[jnp.ndarray]
    flat_id2: Optional[jnp.ndarray]
    A1kT: Optional[jnp.ndarray]
    A1kC: Optional[tuple]
    geo: BrickGeometry            # static
    supers: Optional[tuple]       # static
    mid_sym: bool                 # static
    mid_Lc: int                   # static
    bs: int                       # static
    interpret: bool               # static
    n_flat: int                   # static

    def tree_flatten(self):
        return ((self.A1d, self.dinv1, self.taus1, self.R1, self.Ainv,
                 self.flat_id, self.Rst1, self.flat_id2, self.A1kT,
                 self.A1kC),
                (self.geo, self.supers, self.mid_sym, self.mid_Lc,
                 self.bs, self.interpret, self.n_flat))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def mid_bundle(h: StructuredHierarchy) -> Optional[MidBundle]:
    """Extract the replicable mid+coarsest bundle from a 3-level
    hierarchy (None for two-level)."""
    if h.A1d is None:
        return None
    return MidBundle(
        A1d=h.A1d, dinv1=h.dinv1, taus1=h.taus1, R1=h.R1, Ainv=h.Ainv,
        flat_id=h.flat_id, Rst1=h.Rst1, flat_id2=h.flat_id2,
        A1kT=h.A1kT, A1kC=h.A1kC, geo=h.geo, supers=h.supers,
        mid_sym=h.mid_sym, mid_Lc=h.mid_Lc, bs=h.bs,
        interpret=h.interpret, n_flat=h.n_flat)


@jax.jit
def struct_vcycle_apply(h: StructuredHierarchy, b: jnp.ndarray):
    return h.vcycle(b, jnp.zeros_like(b))


def struct_pcg_solve(h: StructuredHierarchy, b: jnp.ndarray,
                     rel_tol: float = 1e-6, abs_tol: float = 0.0,
                     max_iter: int = 200):
    """MFEM-CGSolver-semantics PCG on the structured hierarchy; the
    tolerances become device scalars (no retrace per tolerance)."""
    return _struct_pcg(h, b, jnp.asarray(rel_tol, b.dtype),
                       jnp.asarray(abs_tol, b.dtype), max_iter)


@partial(jax.jit, static_argnames=("max_iter",))
def _struct_pcg(h: StructuredHierarchy, b: jnp.ndarray,
                rel_tol, abs_tol, max_iter: int):
    def matvec(x):
        return h.matvec0(x)

    z = h.vcycle(b, jnp.zeros_like(b))
    nom0 = z @ b
    lim = jnp.maximum(nom0 * rel_tol * rel_tol, abs_tol * abs_tol)
    Ad0 = matvec(z)

    def cond(state):
        x, r, d, Ad, nom, it = state
        return jnp.logical_and(nom > lim, it < max_iter)

    def body(state):
        x, r, d, Ad, nom, it = state
        alpha = nom / (d @ Ad)
        x = x + alpha * d
        r = r - alpha * Ad
        z = h.vcycle(r, jnp.zeros_like(r))
        betanom = r @ z
        d = z + (betanom / nom) * d
        return (x, r, d, matvec(d), betanom, it + 1)

    state = (jnp.zeros_like(b), b, z, Ad0, nom0, jnp.int32(0))
    x, r, d, Ad, nom, it = jax.lax.while_loop(cond, body, state)
    return x, it, nom


# ---------------------------------------------------------------------------
# compiler: host MLData -> StructuredHierarchy


def _zlane_csr(A: sp.csr_matrix, nodes, nzp: int) -> sp.csr_matrix:
    """Permute a stencil operator into the z-lane numbering
    (ix, iy, iz) -> (ix*NYn + iy)*nzp + iz (empty pad rows)."""
    NXn, NYn, NZn = nodes
    old = np.arange(A.shape[0])
    iz = old % NZn
    iy = (old // NZn) % NYn
    ix = old // (NZn * NYn)
    newid = (ix * NYn + iy) * nzp + iz
    coo = A.tocoo()
    n_new = NXn * NYn * nzp
    return sp.coo_matrix(
        (coo.data, (newid[coo.row], newid[coo.col])),
        shape=(n_new, n_new)).tocsr()


def compile_structured(ml, geo: BrickGeometry,
                       interpret: Optional[bool] = None,
                       mid_dtype=jnp.float32,
                       mid_format: str = "brickblock",
                       fine_layout: str = "flat",
                       smoother_dtype=None,
                       rp_dtype=jnp.float32,
                       use_pallas_contract: bool = False,
                       window_contract: bool = False,
                       super_bricks: Optional[Tuple[int, int, int]] = None,
                       mfree: Optional[tuple] = None,
                       wavefront: bool = False,
                       mid_resident: Optional[bool] = None,
                       hbm_frugal: bool = False,
                       ainv_dtype=jnp.float32,
                       ainv_precomputed: Optional[np.ndarray] = None,
                       ) -> StructuredHierarchy:
    """Build the structured device hierarchy from a host setup product.

    ``ml`` must come from a brick partitioning (partition_cartesian_3d)
    with an unsmoothed tentative P on the finest coarsening; supports 2
    or 3 host levels (3rd-level partitioning may be unstructured — its
    operator only appears through the dense R1/coarsest inverse).

    ``mid_dtype``: storage dtype of the mid-level operator.
    jnp.bfloat16 halves its matvec traffic; the smoother then relaxes a
    ~1e-2-perturbed operator, which only perturbs preconditioner quality
    (the reference's coarse solve is itself one approximate BoomerAMG
    V-cycle, tg.hpp:724-730).

    ``mid_format``: 'brickblock' (default — per-brick-offset dense
    blocks in the slot-major padded layout, ~n_c^2/(27*NB*bs^2)x less
    traffic than dense) or 'dense'.

    ``fine_layout``: 'flat' (default) or 'zlane' (3 lane-shift groups
    in the Pallas stencil, see StructuredHierarchy docstring —
    REQUIRED by the sharded path, whose plane halos must be whole
    128-lane rows; single-chip the z-pad traffic outweighs the shuffle
    savings: measured 0.240 vs 0.194 ms/pass at n=96).

    ``smoother_dtype``: when set (jnp.bfloat16), the smoother and
    residual passes inside the preconditioner stream a bf16-valued twin
    of the fine operator (halving the dominant diagonal traffic);
    matvec0 — the PCG operator — keeps the f32 values.

    ``rp_dtype``: storage dtype of the structured tent blocks Rst
    (P and R share the array, so the preconditioner stays symmetric).

    ``use_pallas_contract``: route the tent P/R contractions through the
    blocked Pallas kernels (ops/pallas_contract.py) instead of XLA's
    multiply-reduce (v3 kernels measure within noise of the XLA path).

    ``window_contract``: fuse window extraction INTO the tent
    contractions (ops/pallas_window.py) — no HBM window array; the
    z windowing becomes one-pass bf16 MXU selection matmuls, so this
    path truncates window values to bf16 (same perturbation class as
    rp_dtype=bfloat16, which it is intended to accompany).  Takes
    precedence over ``use_pallas_contract``.

    ``mfree``: (em0, c_elem, ess_dofs) — when the fine operator factors
    per element as ``em_e = c_e * em0`` (assemble.diffusion_factorized),
    replace the STORED smoother/residual twin with the matrix-free
    kernel (ops/pallas_mfree.py): the 27 diagonals are recomputed in
    VMEM from the bf16 coefficient field each pass.  A MEMORY-CAPACITY
    option, not a speed one: measured VPU-bound at parity with the
    stored-bf16 twin at n=96 zlane and ~1.5x slower at n>=200 flat
    (see the pallas_mfree docstring), while removing the k*n diagonal
    store (918 MB bf16 at 17M dofs).  The factorization is validated
    against every row's diagonal at build.  matvec0 (the PCG operator)
    keeps the stored f32 operator.

    ``wavefront``: temporally-blocked fine-level smoothing
    (ops/pallas_wavefront.py) — each smoothing chain (and the
    pre-smooth's trailing residual) runs as one skewed-wavefront sweep
    streaming the diagonals ONCE instead of once per root.  Measured
    (bf16 twin, 10 roots + residual): 16.9 -> 5.6 ms at n=200 zlane,
    1.25 -> 0.97 ms at n=96 zlane.  Falls back to chained passes when
    the sweep's circular buffers exceed VMEM or the smoother is the
    matrix-free twin.

    ``mid_resident``: run each mid-level smoothing chain as ONE Pallas
    kernel with the brick-block operator VMEM-resident
    (ops/pallas_midsmooth.py) — the operator streams from HBM twice
    per cycle (pre-chain+residual, post-chain) instead of 2*deg1+1
    times.  None (default) = auto: on whenever mid_format='brickblock'
    and the packed used-slot rectangles fit the kernel's VMEM budget.

    ``super_bricks``: (SX, SY, SZ) superbrick grid of the 3rd-level
    partitioning (topology.part.partition_cartesian_bricks passed as
    ``coarse_part_override(1)`` at setup).  Replaces the dense
    coarsest restriction with the block-diagonal per-superbrick tent
    blocks (build_structured_interp2) — at 8.12M dofs the dense R1
    streams 7 GB/cycle, the blocks ~0.08 GB.  Requires
    mid_format='brickblock' and an unsmoothed P1."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    lv0 = ml.levels[0]
    tg0 = lv0.tg_data
    assert not tg0.smooth_interp, "structured path needs the tent P"

    dinv_np = np.asarray(tg0.poly_data.dinv, np.float64)
    if fine_layout == "zlane":
        NXn, NYn, NZn = geo.nodes
        nzp = -(-NZn // 128) * 128
        A0csr = _zlane_csr(lv0.A, geo.nodes, nzp)
        dz = np.zeros(NXn * NYn * nzp)
        dz.reshape(NXn, NYn, nzp)[:, :, :NZn] = \
            dinv_np.reshape(NXn, NYn, NZn)
        dinv_np = dz
    else:
        nzp = 0
        A0csr = lv0.A
    dia0 = DeviceDIA.try_from_csr(A0csr, jnp.float32, max_diags=64)
    assert dia0 is not None, "finest operator is not stencil-structured"
    A0 = PallasDIA.from_dia(dia0, interpret=interpret)
    A0s = None
    A0m = None
    if mfree is not None:
        from saamge_tpu.ops.pallas_mfree import MatrixFreeQ1
        em0_mf, c_mf, ess_mf = mfree
        A0s = MatrixFreeQ1.build(
            c_mf, ess_mf, em0_mf, geo.nodes, nzp, A0,
            cdtype=(smoother_dtype if smoother_dtype is not None
                    else jnp.float32),
            interpret=interpret, A_csr=lv0.A)
        if hbm_frugal:
            # full capacity mode: the PCG matvec is an exact-f32
            # matrix-free twin too — the k*n f32 diagonal store
            # (3.6 GB at 33M dofs) never lives in HBM; A0 keeps only
            # its pad/unpad geometry (placeholder values)
            from saamge_tpu.ops.pallas_stencil import LANES as _LN
            A0m = MatrixFreeQ1.build(
                c_mf, ess_mf, em0_mf, geo.nodes, nzp, A0,
                cdtype=jnp.float32, interpret=interpret)
            A0 = PallasDIA(
                jnp.zeros((len(A0.offsets), 1, _LN), jnp.float32),
                A0.offsets, A0.shape, A0.n_rows_pad, A0.br, A0.hb,
                A0.interpret)
    elif smoother_dtype is not None and smoother_dtype != jnp.float32:
        A0s = PallasDIA.from_dia(dia0, interpret=interpret,
                                 dtype=smoother_dtype)
    del dia0
    dinv0h = A0.pad(jnp.asarray(dinv_np, jnp.float32))
    pd0 = tg0.poly_data
    assert pd0.roots2 is None or len(pd0.roots2) == 0, \
        "structured path implements single-chain root families only " \
        "(use the compiled/sharded paths for invx)"
    taus0 = tuple(jnp.asarray([1.0 / float(t)], jnp.float32)
                  for t in np.asarray(pd0.roots))

    Rst_bm, cd_brick, slot, bs = build_structured_interp(
        lv0.rels, tg0.tent_interp, tg0.interp_data.mis_numcoarsedof, geo)
    # slot-major SoA: (NB, bs, box) -> (bs, box, NB)
    Rst = np.ascontiguousarray(Rst_bm.transpose(1, 2, 0))
    NB = geo.num_bricks
    n_flat = NB * bs
    flat_id = slot * NB + cd_brick

    Ac1 = tg0.Ac.tocsr()
    if len(ml.levels) >= 2:
        tg1 = ml.levels[1].tg_data
        pd1 = tg1.poly_data
        dinv1_np = np.asarray(pd1.dinv, np.float64)
        n2 = tg1.restr.shape[0]
        R1 = Rst1_dev = flat_id2 = None
        if mid_format == "brickblock":
            hb_out = [] if hbm_frugal else None
            A1d = BrickBlockOp.from_csr(Ac1, cd_brick, slot, bs,
                                        geo.bricks, mid_dtype,
                                        host_blocks_out=hb_out)
            # Galerkin => symmetric: halve the streaming-rect matvec's
            # block reads (no effect below RECT_MIN_BYTES or on the
            # sharded path, which shards the full blocks itself)
            A1d = dataclasses.replace(A1d, sym_stream=True)
            # padded-layout companions (padding slots: dinv 0 so the
            # smoother leaves them untouched; R1 columns 0)
            dinv1p = np.zeros(n_flat)
            dinv1p[flat_id] = dinv1_np
            dinv1 = jnp.asarray(dinv1p, jnp.float32)
            if super_bricks is not None:
                assert not tg1.smooth_interp, \
                    "structured coarsest restriction needs the tent P1"
                Rst1_np, cd2_brick, slot2, bs2 = build_structured_interp2(
                    ml.levels[1].rels, tg1.tent_interp,
                    tg1.interp_data.mis_numcoarsedof, geo, super_bricks,
                    cd_brick, slot, bs)
                NB2 = int(np.prod(super_bricks))
                Rst1_dev = jnp.asarray(Rst1_np, rp_dtype)
                flat_id2 = jnp.asarray(slot2 * NB2 + cd2_brick,
                                       jnp.int32)
            else:
                R1p = np.zeros((n2, n_flat))
                R1p[:, flat_id] = np.asarray(tg1.restr.todense(),
                                             dtype=np.float64)
                # rp_dtype (bf16 in the bench config) halves the dense
                # coarsest-restriction stream — 0.8 GB/cycle at n=128;
                # applies upcast to f32 (mixed-dtype matmul promotion)
                R1 = jnp.asarray(R1p, rp_dtype)
        else:
            A1d = jnp.asarray(np.asarray(Ac1.todense()), mid_dtype)
            dinv1 = jnp.asarray(dinv1_np, jnp.float32)
            R1 = jnp.asarray(np.asarray(tg1.restr.todense(),
                                        dtype=np.float64), rp_dtype)
        taus1 = tuple(jnp.asarray([1.0 / float(t)], jnp.float32)
                      for t in np.asarray(pd1.roots))
        A1kT = None
        mid_sym = False
        A1kC = None
        mid_Lc = 0
        if isinstance(A1d, BrickBlockOp) and hbm_frugal:
            # capacity mode: the device blocks are a placeholder (see
            # from_csr host_blocks_out) — the mid level runs ONLY
            # through the packed chunked-matvec arrays, prepped in
            # numpy so no padded temporaries ever touch HBM
            from saamge_tpu.ops.pallas_midmv import prep_blocks_chunked
            A1kC, mid_Lc = prep_blocks_chunked(A1d,
                                               host_blocks=hb_out[0])
        elif isinstance(A1d, BrickBlockOp):
            from saamge_tpu.ops.pallas_midsmooth import (fits_mid_kernel,
                                                         prep_blocksT)
            _, bs_m, _, NB_m = A1d.blocks.shape
            # symmetry-halved packing (each resident block applied both
            # ways): half the chain DMA, and it admits mid levels up to
            # 2x the budget that the full packing rejects
            fits = fits_mid_kernel(tuple(A1d.rects), bs_m, NB_m,
                                   A1d.blocks.dtype.itemsize,
                                   doffs=A1d.doffs)
            if mid_resident and not fits:
                from saamge_tpu.utils.logging import sa_print
                sa_print(1, "mid_resident=True overrides the VMEM fits "
                         "gate (packed blocks exceed the measured spill "
                         "budget; expect a Mosaic VMEM OOM at compile, "
                         "see ops/pallas_midsmooth.py)")
            if mid_resident or (mid_resident is None and fits):
                mid_sym = True
                A1kT = prep_blocksT(A1d, sym=True)
            elif (A1d.rects is not None
                  and A1d.nbytes >= A1d.RECT_MIN_BYTES):
                # too large for the resident chain AND in the HBM-bound
                # regime: lane-chunked streamed Pallas matvec (the XLA
                # rect matvec materializes f32 temps — measured ~6x
                # over stream at n=200, ops/pallas_midmv.py)
                from saamge_tpu.ops.pallas_midmv import \
                    prep_blocks_chunked
                A1kC, mid_Lc = prep_blocks_chunked(A1d)
        Ac2 = np.asarray(tg1.Ac.todense(), dtype=np.float64)
        if hbm_frugal and window_contract:
            # the fused window kernels are the only tent-apply path in
            # use; skip the redundant slot-major Rst upload (a second
            # multi-GB copy of the tent at 33M dofs).  bs stays
            # recoverable from the placeholder's leading dim.
            rst_dev = jnp.zeros((Rst.shape[0], 1, 1), rp_dtype)
        else:
            rst_dev = jnp.asarray(Rst, rp_dtype)
        if ainv_precomputed is not None:
            # capacity escape hatch: the chunked device
            # cho_factor/cho_solve at n2 ~ 17k has a history of
            # ballooning the tunnel server's arena (a full-width solve
            # once requested 98 GB; round-5 sessions were left unable
            # to execute even a 132 MB program afterwards) — callers
            # can precompute the inverse on host (run_capacity caches
            # it next to the bundle) and skip the device factorization
            ainv_dev = jnp.asarray(ainv_precomputed, ainv_dtype)
        else:
            ainv_dev = _device_spd_inverse(Ac2)
            if ainv_dtype != jnp.float32:
                # capacity option: the coarsest dense inverse is n2^2
                # f32 (1.14 GB at n2=16849); bf16 halves it.  Only
                # perturbs a preconditioner component — the reference's
                # coarse solve is one approximate BoomerAMG V-cycle
                # (tg.hpp:724-730)
                ainv_dev = ainv_dev.astype(ainv_dtype)
        return StructuredHierarchy(
            A0, dinv0h, taus0, rst_dev,
            A1d, dinv1, taus1, R1,
            ainv_dev, geo, lv0.A.shape[0], n_flat,
            flat_id=jnp.asarray(flat_id, jnp.int32), nzp=nzp, A0s=A0s,
            Rst_pad=_maybe_pad_rst(rst_dev, use_pallas_contract
                                   and not window_contract),
            Rst1=Rst1_dev, supers=super_bricks, flat_id2=flat_id2,
            Wc=_maybe_window(Rst, geo, window_contract),
            wavefront=wavefront, A1kT=A1kT, mid_sym=mid_sym,
            A1kC=A1kC, mid_Lc=mid_Lc, A0m=A0m)

    # two-level: coarsest inverse stored UNPADDED (n_c x n_c)
    rst_dev = jnp.asarray(Rst, rp_dtype)
    return StructuredHierarchy(
        A0, dinv0h, taus0, rst_dev,
        None, None, None, None,
        _device_spd_inverse(np.asarray(Ac1.todense())),
        geo, lv0.A.shape[0], n_flat,
        flat_id=jnp.asarray(flat_id, jnp.int32), nzp=nzp, A0s=A0s,
        Rst_pad=_maybe_pad_rst(rst_dev, use_pallas_contract
                               and not window_contract),
        Wc=_maybe_window(Rst, geo, window_contract),
        wavefront=wavefront, A0m=A0m)


def _maybe_window(Rst_np: np.ndarray, geo: BrickGeometry,
                  window_contract: bool):
    """Build the fused window-contraction tables (bf16 tent slab in the
    per-brick-row layout + the 0/1 z-selection matrices)."""
    if not window_contract:
        return None
    from saamge_tpu.ops.pallas_window import (build_window_tables,
                                              relayout_rst)
    rstw = jnp.asarray(
        relayout_rst(np.asarray(Rst_np, np.float32), geo.brick_elems,
                     geo.bricks), jnp.bfloat16)
    Ez, S2 = build_window_tables(geo.brick_elems, geo.bricks, geo.nodes)
    return (rstw,
            jnp.asarray(Ez, jnp.bfloat16),
            jnp.asarray(S2, jnp.bfloat16),
            jnp.asarray(np.ascontiguousarray(S2.T), jnp.bfloat16),
            jnp.asarray(np.ascontiguousarray(Ez.T), jnp.bfloat16))


def _maybe_pad_rst(rst_dev, use_pallas_contract: bool):
    if not use_pallas_contract:
        return None
    from saamge_tpu.ops.pallas_contract import pad_rst
    return pad_rst(rst_dev)


def _device_spd_inverse(Ac: np.ndarray) -> jnp.ndarray:
    """Explicit SPD inverse, computed on device (Cholesky + two batched
    triangular solves against I on the MXU).  At coarse sizes (5-20k) the
    single-core host LAPACK inverse takes minutes; the device factorize-
    and-solve is seconds, and the inverse is consumed on device anyway.
    f32 accuracy only perturbs the coarse solve of a preconditioner
    (exactness is not required — the reference's default coarse solve is
    ONE BoomerAMG V-cycle, tg.hpp:724-730)."""
    n = Ac.shape[0]
    if n <= 4096:
        return jnp.asarray(np.linalg.inv(Ac), jnp.float32)
    A_dev = jnp.asarray(Ac, jnp.float32)
    C = jax.scipy.linalg.cho_factor(A_dev, lower=True)
    del A_dev
    # solve against I in column chunks: one full-width cho_solve
    # materializes O(n^2)-sized temps per block step and OOMs HBM for
    # n ~ 20k (observed 98G requested)
    cols = []
    step = 2048
    eye = np.eye(n, dtype=np.float32)
    for j in range(0, n, step):
        cols.append(jax.scipy.linalg.cho_solve(
            C, jnp.asarray(eye[:, j:j + step])))
    out = jnp.concatenate(cols, axis=1)
    del C, cols
    return out
