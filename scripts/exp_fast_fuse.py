#!/usr/bin/env python
"""FAST detector HBM-traffic experiment: the production fast_score_map
materializes (16,H,W) ring / (24,H,W) diff stacks; variants below try to keep
the whole computation in one XLA fusion that reads the image ~17x and writes
only the outputs.  Usage: exp_fast_fuse.py [reps]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_uav"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from uav_airvision_tpu.ops import fast as F
from uav_airvision_tpu.ops.fast import _CIRCLE, _shifted, ARC


def fast_score_map_fused(img, threshold: int):
    """Same math as ops.fast.fast_score_map, expressed without stacked
    (16/24,H,W) intermediates: 16 shifted diffs held as a python list, the
    9-wide rolling min via the same log-depth tree but on list elements
    (pairwise mins of (H,W) arrays), max over the 16 arc starts as a tree.
    All elementwise over (H,W) planes -> one or few XLA fusions."""
    f = img.astype(jnp.bfloat16)
    H, W = f.shape
    d = [_shifted(f, int(dy), int(dx)) - f for dy, dx in _CIRCLE]

    def slide9(xs):  # xs: list of 16+8 planes; rolling 9-min, 16 outputs
        x = xs + xs[: ARC - 1]
        m2 = [jnp.minimum(x[i], x[i + 1]) for i in range(len(x) - 1)]
        m4 = [jnp.minimum(m2[i], m2[i + 2]) for i in range(len(m2) - 2)]
        m8 = [jnp.minimum(m4[i], m4[i + 4]) for i in range(len(m4) - 4)]
        return [jnp.minimum(m8[i], x[i + 8]) for i in range(16)]

    def tree_max(xs):
        while len(xs) > 1:
            xs = [jnp.maximum(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)] + (
                [xs[-1]] if len(xs) % 2 else [])
        return xs[0]

    bright = tree_max(slide9(d))
    dark = tree_max(slide9([-x for x in d]))
    score = (jnp.maximum(bright, dark) - 1).astype(jnp.int32)
    thr = jnp.asarray(threshold, jnp.bfloat16)
    corner = (bright > thr) | (dark > thr)
    ay = jnp.arange(H, dtype=jnp.int32)
    ax = jnp.arange(W, dtype=jnp.int32)
    border = (((ay >= 3) & (ay < H - 3))[:, None]
              & ((ax >= 3) & (ax < W - 3))[None, :])
    corner = corner & border
    score = jnp.where(corner, score, 0)
    return corner, score


def detect_fused(img, threshold, mask=None):
    corner, score = fast_score_map_fused(img, threshold)
    if mask is not None:
        score = jnp.where(mask, score, 0)
        corner = corner & mask
    keep = F.nonmax_3x3(score) & corner
    return keep, jnp.where(keep, score, 0)


def scan_time(body, init, reps, label):
    def scanned(c):
        out, _ = lax.scan(lambda c, _: (body(c), None), c, None, length=reps)
        return out

    f = jax.jit(scanned)
    out = f(init)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    out = f(init)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:28s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.default_rng(0)
    H, W = 480, 752
    img = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]}  reps={reps}", flush=True)

    # equivalence first (CPU-cheap shapes fine on device too)
    k0, s0 = jax.jit(lambda im: F.detect_fast(im, 15))(img)
    k1, s1 = jax.jit(lambda im: detect_fused(im, 15))(img)
    same = bool(jnp.all(k0 == k1)) and bool(jnp.all(s0 == s1))
    print(f"bit-identical: {same}", flush=True)
    assert same

    def body_prod(c):
        keep, score = F.detect_fast(c, 15)
        return c + score.astype(jnp.float32) * 1e-9

    def body_fused(c):
        keep, score = detect_fused(c, 15)
        return c + score.astype(jnp.float32) * 1e-9

    imgf = img.astype(jnp.float32)
    scan_time(body_prod, imgf, reps, "detect_fast (production)")
    scan_time(body_fused, imgf, reps, "detect_fast (list-fused)")
