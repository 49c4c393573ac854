#!/usr/bin/env python
"""Microbench: dense per-cell top-k variants + detection-mask variants.

The profile says detect-candidates costs 0.41 ms/frame and the mask 0.20 ms
— both dominated by full-image ops (chunked lax.top_k over ~18k-px cells;
a 7x7 49-tap OR reduce_window).  Candidates:

  topk A (current): 128-chunk top_k  ->  top_k of survivors
  topk B: k sequential argmax passes (max-reduce + first-index tie-break,
          identical ordering: descending value, ties toward lower flat index)
  mask A (current): one 7x7 reduce_window OR
  mask B: separable (7,1) then (1,7) reduce_window OR (14 taps vs 49)

Each timed scan-amortized (reps inside one lax.scan).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from uav_airvision_tpu.ops import gridops, fast


def scan_time(body, init, reps, label):
    f = jax.jit(lambda c: lax.scan(lambda c, _: (body(c), None), c, None,
                                   length=reps)[0])
    out = jax.block_until_ready(f(init))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(init))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:34s} {ms:8.3f} ms/iter")
    return out


def topk_argmax(score, grid_row, grid_col, k):
    """k argmax passes per cell; ties toward lower row-major index."""
    H, W = score.shape
    cell_h = int(np.ceil(H / grid_row))
    cell_w = int(np.ceil(W / grid_col))
    ph, pw = cell_h * grid_row, cell_w * grid_col
    padded = jnp.full((ph, pw), jnp.asarray(-1, score.dtype)).at[:H, :W].set(score)
    cells = (
        padded.reshape(grid_row, cell_h, grid_col, cell_w)
        .transpose(0, 2, 1, 3)
        .reshape(grid_row * grid_col, cell_h * cell_w)
    )
    n_cells, cell_sz = cells.shape
    neg = jnp.iinfo(jnp.int32).min if cells.dtype == jnp.int32 else -jnp.inf

    idxs, vals = [], []
    work = cells
    for _ in range(k):
        i = jnp.argmax(work, axis=1)          # first max = lowest index
        v = jnp.take_along_axis(work, i[:, None], axis=1)[:, 0]
        work = work.at[jnp.arange(n_cells), i].set(neg)
        idxs.append(i)
        vals.append(v)
    idx = jnp.stack(idxs, axis=1)
    val = jnp.stack(vals, axis=1)
    cy = idx // cell_w
    cx = idx % cell_w
    gr = jnp.arange(n_cells) // grid_col
    gc = jnp.arange(n_cells) % grid_col
    ys = gr[:, None] * cell_h + cy
    xs = gc[:, None] * cell_w + cx
    return ys, xs, val


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.default_rng(0)
    H, W = 480, 752
    img = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]}  reps={reps}")

    keep, score0 = jax.jit(lambda im: fast.detect_fast(im, 15))(
        img.astype(jnp.float32))
    score0 = jax.block_until_ready(score0.astype(jnp.int32))

    # correctness cross-check on a realistic sparse score map
    for k in (5, 8):
        ya, xa, va = jax.jit(
            lambda s: gridops.dense_grid_topk(s, 4, 5, k))(score0)
        yb, xb, vb = jax.jit(lambda s: topk_argmax(s, 4, 5, k))(score0)
        same = (np.array_equal(np.asarray(ya), np.asarray(yb))
                and np.array_equal(np.asarray(xa), np.asarray(xb))
                and np.array_equal(np.asarray(va), np.asarray(vb)))
        print(f"k={k} exact match: {same}")
        if not same:
            m = np.asarray(va) != np.asarray(vb)
            print("  first diff cells:", np.argwhere(m)[:5])

    def bodyA(c):
        ys, xs, vals = gridops.dense_grid_topk(c, 4, 5, 5)
        return c.at[0, 0].set(vals[0, 0] % 3)

    def bodyB(c):
        ys, xs, vals = topk_argmax(c, 4, 5, 5)
        return c.at[0, 0].set(vals[0, 0] % 3)

    scan_time(bodyA, score0, reps, "topk A: chunked lax.top_k")
    scan_time(bodyB, score0, reps, "topk B: k argmax passes")

    # ---- mask variants -----------------------------------------------------
    pts = jnp.asarray(rng.uniform([3, 3], [W - 4, H - 4], (104, 2)), jnp.float32)

    def maskA(c):
        ix = jnp.floor(c[:, 0]).astype(jnp.int32)
        iy = jnp.floor(c[:, 1]).astype(jnp.int32)
        pm = jnp.zeros((H, W), bool).at[iy, ix].set(True, mode="drop")
        d = lax.reduce_window(pm, False, lax.bitwise_or, (7, 7), (1, 1), "SAME")
        return jnp.clip(c + d[0, 0], 3.0, 460.0)

    def maskB(c):
        ix = jnp.floor(c[:, 0]).astype(jnp.int32)
        iy = jnp.floor(c[:, 1]).astype(jnp.int32)
        pm = jnp.zeros((H, W), bool).at[iy, ix].set(True, mode="drop")
        d = lax.reduce_window(pm, False, lax.bitwise_or, (7, 1), (1, 1), "SAME")
        d = lax.reduce_window(d, False, lax.bitwise_or, (1, 7), (1, 1), "SAME")
        return jnp.clip(c + d[0, 0], 3.0, 460.0)

    a = scan_time(maskA, pts, reps, "mask A: 7x7 OR window")
    b = scan_time(maskB, pts, reps, "mask B: separable OR")
    da = jax.jit(lambda p: maskA(p))(pts)
    db = jax.jit(lambda p: maskB(p))(pts)
    print("mask outputs equal:", bool(jnp.all(da == db)))
