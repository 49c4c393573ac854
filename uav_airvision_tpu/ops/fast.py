"""FAST-9/16 corner detector as whole-image vectorized ops (VPU-friendly).

Replaces the reference's ``cv2.FastFeatureDetector`` (reference
src/image_processing/feature_initializer.py:45-60 and feature_adder.py:52-77)
with a TPU formulation: the 16-pixel Bresenham circle becomes 16 shifted
copies of the image; the "9 contiguous" test and the OpenCV corner score
(max-over-arcs of min-over-arc thresholds, minus 1) become rolling min/max
reductions over the circle axis; non-max suppression is a 3x3 strict-max
filter — all dense elementwise work, no data-dependent shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Bresenham circle of radius 3, contiguous ring order, (dy, dx)
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC = 9  # FAST-9


def _shifted(img, dy, dx):
    """img shifted so that out[y, x] = img[y + dy, x + dx], zero padded.
    slice + pad (not .at[].set: a scatter XLA can't always fuse)."""
    H, W = img.shape
    src = img[max(dy, 0) : H + min(dy, 0), max(dx, 0) : W + min(dx, 0)]
    return jnp.pad(src, ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))))


def fast_score_map(img, threshold: int):
    """(corner_mask, score) maps for FAST-9/16 with OpenCV scoring.

    img: (H, W) uint8/float.  The 3-pixel border is excluded.
    """
    # bf16 internally: every value here is a uint8 pixel difference or FAST
    # score, i.e. an integer with |v| <= 255 < 2^8, exactly representable in
    # bf16's 8-bit significand — same results as int32 at half the VPU/HBM
    # traffic.  (256 is the exactness ceiling: wider-depth images or summed
    # arcs would need the cast revisited.)
    f = img.astype(jnp.bfloat16)
    H, W = f.shape

    # All (H, W) planes kept as a python list — never stacked into a
    # (16/24, H, W) array.  Stack/concatenate force HBM materialization of
    # ~100 MB of intermediates; as individual planes the whole min/max tree
    # stays inside one or two XLA fusions that read the image ~17x and write
    # only the outputs (measured 0.180 -> 0.112 ms/frame on v5e, bit-equal:
    # scripts/exp_fast_fuse.py).
    d = [_shifted(f, int(dy), int(dx)) - f for dy, dx in _CIRCLE]

    def slide9(xs):
        # rolling min over 9 consecutive ring positions (wrap-around), as the
        # same log-depth sliding-window tree, on list elements
        x = xs + xs[: ARC - 1]
        m2 = [jnp.minimum(x[i], x[i + 1]) for i in range(len(x) - 1)]
        m4 = [jnp.minimum(m2[i], m2[i + 2]) for i in range(len(m2) - 2)]
        m8 = [jnp.minimum(m4[i], m4[i + 4]) for i in range(len(m4) - 4)]
        return [jnp.minimum(m8[i], x[i + 8]) for i in range(16)]

    def tree_max(xs):
        while len(xs) > 1:
            xs = [jnp.maximum(xs[i], xs[i + 1])
                  for i in range(0, len(xs) - 1, 2)] + (
                [xs[-1]] if len(xs) % 2 else [])
        return xs[0]

    bright_score = tree_max(slide9(d))  # max over arc starts
    dark_score = tree_max(slide9([-x for x in d]))
    score = (jnp.maximum(bright_score, dark_score) - 1).astype(jnp.int32)

    thr = jnp.asarray(threshold, jnp.bfloat16)
    corner = (bright_score > thr) | (dark_score > thr)

    ay = jnp.arange(H, dtype=jnp.int32)
    ax = jnp.arange(W, dtype=jnp.int32)
    border = (((ay >= 3) & (ay < H - 3))[:, None]
              & ((ax >= 3) & (ax < W - 3))[None, :])
    corner = corner & border
    score = jnp.where(corner, score, 0)
    return corner, score


def nonmax_3x3(score):
    """Keep pixels whose score strictly exceeds all 8 neighbors."""
    H, W = score.shape
    best = score
    keep = jnp.ones_like(score, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            keep = keep & (score > _shifted(score, dy, dx))
    return keep & (score > 0)


def detect_fast(img, threshold: int, mask=None):
    """Full FAST detection: returns (corner_mask, score) after NMS and an
    optional exclusion mask (True = allowed), mirroring cv2's detect(mask=)."""
    corner, score = fast_score_map(img, threshold)
    if mask is not None:
        score = jnp.where(mask, score, 0)
        corner = corner & mask
    keep = nonmax_3x3(score) & corner
    return keep, jnp.where(keep, score, 0)
