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

    ring = jnp.stack([_shifted(f, int(dy), int(dx)) for dy, dx in _CIRCLE])  # (16,H,W)
    d = ring - f[None, :, :]  # x_i - p

    # rolling min over 9 consecutive circle positions (wrap-around), as a
    # log-depth sliding-window min (4 elementwise passes instead of 16
    # stacked 9-way reductions)
    d2 = jnp.concatenate([d, d[: ARC - 1]], axis=0)  # (24,H,W)

    def slide_min9(x):
        m2 = jnp.minimum(x[:-1], x[1:])  # width 2
        m4 = jnp.minimum(m2[:-2], m2[2:])  # width 4
        m8 = jnp.minimum(m4[:-4], m4[4:])  # width 8
        return jnp.minimum(m8[:16], x[8:])  # width 9, starts 0..15

    bright_min = slide_min9(d2)
    dark_min = slide_min9(-d2)

    bright_score = jnp.max(bright_min, axis=0)  # max over arc starts
    dark_score = jnp.max(dark_min, axis=0)
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
