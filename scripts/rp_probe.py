"""Micro-probe: apply_R / apply_P implementation variants on the TPU.

conv_general_dilated_patches measured 1.0 ms for the n=96 restriction
(VERDICT r3 work); candidate replacements express the closed-box
extraction as 3 nested reshape+strided-slice+concat steps (pure copies)
with either (a) a 6D transpose to the (box, NB) lane-major contraction
layout, or (b) a brick-expanded Rst layout contracted in nested order.
Run after `perf_probe.py` has cached the setup pickle.
"""

import pickle
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ml, A, b = pickle.load(open('/tmp/saamge_probe_ml96.pkl', 'rb'))
    from saamge_tpu.solve.structured import (BrickGeometry,
                                             compile_structured)
    geo = BrickGeometry((12, 12, 12), (8, 8, 8))
    h = compile_structured(ml, geo)
    (BX, BY, BZ) = geo.bricks
    (bx, by, bz) = geo.brick_elems
    NXn, NYn, NZn = geo.nodes
    bs, box, NB = h.Rst.shape
    res0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        h.n_fine), jnp.float32)

    def timed(name, fn, reps, ops):
        @jax.jit
        def chain(c0, *o):
            def body(c, _):
                return fn(c, *o), ()
            y, _ = jax.lax.scan(body, c0, jnp.zeros(reps))
            return jnp.sum(y)
        float(chain(jnp.float32(0.0), *ops))
        t0 = time.perf_counter()
        float(chain(jnp.float32(0.0), *ops))
        print(name, round((time.perf_counter() - t0) / reps * 1e3, 4),
              "ms", flush=True)

    def extract_nested(r3):
        t = r3
        bulk = t[:-1].reshape(BX, bx, NYn, NZn)
        face = t[bx::bx][:, None]
        t = jnp.concatenate([bulk, face], axis=1)
        bulk = t[:, :, :-1].reshape(BX, bx + 1, BY, by, NZn)
        face = t[:, :, by::by][:, :, :, None]
        t = jnp.concatenate([bulk, face], axis=3)
        bulk = t[..., :-1].reshape(BX, bx + 1, BY, by + 1, BZ, bz)
        face = t[..., bz::bz][..., None]
        return jnp.concatenate([bulk, face], axis=5)

    # variant 0: current (conv patches)
    timed("applyR_conv", lambda c, hh:
          jnp.sum(hh.apply_R(res0 * (1 + 1e-12 * c))), 300, (h,))

    # variant 1: nested extraction + 6D transpose -> (box, NB) layout
    def applyR_nested_T(c, rst):
        r3 = (res0 * (1 + 1e-12 * c)).reshape(geo.nodes)
        t = extract_nested(r3)             # (BX,bx1,BY,by1,BZ,bz1)
        boxes = t.transpose(1, 3, 5, 0, 2, 4).reshape(box, NB)
        return jnp.sum(jnp.sum(rst * boxes[None], axis=1))

    timed("applyR_nested_T", applyR_nested_T, 300, (h.Rst,))

    # variant 2: nested extraction + brick-expanded Rst, nested reduce
    rst7 = np.asarray(h.Rst).reshape(bs, bx + 1, by + 1, bz + 1,
                                     BX, BY, BZ)
    rst7 = jnp.asarray(np.ascontiguousarray(
        rst7.transpose(0, 4, 1, 5, 2, 6, 3)))  # (bs,BX,bx1,BY,by1,BZ,bz1)

    def applyR_nested7(c, rst):
        r3 = (res0 * (1 + 1e-12 * c)).reshape(geo.nodes)
        t = extract_nested(r3)
        y = jnp.sum(rst * t[None], axis=(2, 4, 6))   # (bs,BX,BY,BZ)
        return jnp.sum(y)

    timed("applyR_nested7", applyR_nested7, 300, (rst7,))

    # applyP variants ---------------------------------------------------
    xcf = jnp.asarray(np.random.default_rng(1).standard_normal(
        h.n_flat), jnp.float32)

    timed("applyP_current", lambda c, hh:
          jnp.sum(hh.apply_P(xcf * (1 + 1e-12 * c))), 300, (h,))

    def assemble_nested(C):
        """adjoint of extract_nested: (BX,bx1,BY,by1,BZ,bz1) -> nodes.
        Overlap planes ADD (the non-master pieces are zero columns of
        the tent P, so adding them is exact)."""
        bulk = C[..., :bz]
        bulk = bulk.at[..., 1:, 0].add(C[..., :-1, bz])
        zm = jnp.concatenate(
            [bulk.reshape(BX, bx + 1, BY, by + 1, BZ * bz),
             C[..., -1, bz][..., None]], axis=-1)
        bulk = zm[:, :, :, :by]
        bulk = bulk.at[:, :, 1:, 0].add(zm[:, :, :-1, by])
        ym = jnp.concatenate(
            [bulk.reshape(BX, bx + 1, BY * by, NZn),
             zm[:, :, -1, by][:, :, None]], axis=2)
        bulk = ym[:, :bx]
        bulk = bulk.at[1:, 0].add(ym[:-1, bx])
        return jnp.concatenate(
            [bulk.reshape(BX * bx, NYn, NZn), ym[-1, bx][None]], axis=0)

    def applyP_nested7(c, rst):
        xc = (xcf * (1 + 1e-12 * c)).reshape(bs, BX, BY, BZ)
        C = jnp.sum(rst * xc[:, :, None, :, None, :, None], axis=0)
        return jnp.sum(assemble_nested(C))

    timed("applyP_nested7", applyP_nested7, 300, (rst7,))

    # correctness of the nested pair vs the production pair
    r3 = res0.reshape(geo.nodes)
    t = extract_nested(r3)
    boxes = t.transpose(1, 3, 5, 0, 2, 4).reshape(box, NB)
    rc_ref = np.asarray(h.apply_R(res0))
    rc_nested = np.asarray(
        jnp.sum(rst7 * t[None], axis=(2, 4, 6)).reshape(bs * NB))
    print("applyR nested max diff:",
          float(np.abs(rc_nested - rc_ref).max()))
    y_ref = np.asarray(h.apply_P(xcf))
    xc = xcf.reshape(bs, BX, BY, BZ)
    C = jnp.sum(rst7 * xc[:, :, None, :, None, :, None], axis=0)
    y_nested = np.asarray(assemble_nested(C)).reshape(-1)
    print("applyP nested max diff:",
          float(np.abs(y_nested - y_ref).max()),
          "scale", float(np.abs(y_ref).max()))


if __name__ == "__main__":
    main()
