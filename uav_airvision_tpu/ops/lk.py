"""Batched pyramidal Lucas-Kanade optical flow, TPU-native.

Replaces the reference's three per-frame ``cv2.calcOpticalFlowPyrLK`` calls
(reference src/image_processing/feature_tracker.py:102-108 and
stereo_matcher.py:64-74) with one vectorized implementation: all features
advance together through the Gauss-Newton iterations of each pyramid level,
with per-feature convergence masks.  Semantics follow OpenCV's LKTrackerInvoker:

* window 15x15, Scharr derivatives (1/32), bilinear patch interpolation,
* the spatial gradient matrix G is computed once per level at the *previous*
  point, only the "J" patch is resampled per iteration,
* termination on |delta|^2 <= eps^2 plus OpenCV's flip-flop damping check,
* status=0 at level 0 when the window corner leaves the image or
  min-eigenvalue(G)/area < minEigThreshold,
* OPTFLOW_USE_INITIAL_FLOW: the caller provides the starting guess.

This is the reference's hot loop; a Pallas kernel specialization lives in
ops/pallas/lk_kernel.py (same interface) for the TPU fast path.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.lax_helpers import dyn_slice
from .pyramid import LK_PAD


def _bilinear_patch(img, corner_xy, size):
    """Extract a (size, size) patch at fractional corner (x, y) via a
    (size+1, size+1) integer slice + 4-tap blend.  Starts are clamped by
    dynamic_slice at the borders (approximates OpenCV's padded border)."""
    cx, cy = corner_xy[0], corner_xy[1]
    ix = jnp.floor(cx)
    iy = jnp.floor(cy)
    ax = (cx - ix).astype(img.dtype)
    ay = (cy - iy).astype(img.dtype)
    raw = dyn_slice(img, (size + 1, size + 1), iy.astype(jnp.int32), ix.astype(jnp.int32))
    w00 = (1 - ax) * (1 - ay)
    w01 = ax * (1 - ay)
    w10 = (1 - ax) * ay
    w11 = ax * ay
    return (
        w00 * raw[:size, :size]
        + w01 * raw[:size, 1 : size + 1]
        + w10 * raw[1 : size + 1, :size]
        + w11 * raw[1 : size + 1, 1 : size + 1]
    )


def _track_level(
    prev_img, prev_ix, prev_iy, curr_img,
    prev_pts_l, next_pts_l, valid,
    win, max_iter, eps2, min_eig_thresh, is_level0,
):
    """One pyramid level for all features.  Points are in level coordinates.
    Returns (next_pts_l, status_ok_level0)."""
    dtype = prev_img.dtype
    half = (win - 1) * 0.5
    # arrays are padded by LK_PAD on each side (ops/pyramid.py); logical size:
    H = prev_img.shape[0] - 2 * LK_PAD
    W = prev_img.shape[1] - 2 * LK_PAD

    corner_prev = prev_pts_l - half + LK_PAD  # (F,2) padded-array coords

    patch_I = jax.vmap(lambda c: _bilinear_patch(prev_img, c, win))(corner_prev)
    patch_ix = jax.vmap(lambda c: _bilinear_patch(prev_ix, c, win))(corner_prev)
    patch_iy = jax.vmap(lambda c: _bilinear_patch(prev_iy, c, win))(corner_prev)

    a11 = jnp.sum(patch_ix * patch_ix, axis=(1, 2))
    a12 = jnp.sum(patch_ix * patch_iy, axis=(1, 2))
    a22 = jnp.sum(patch_iy * patch_iy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    min_eig = (a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
        2.0 * win * win
    )

    # OpenCV's out-of-window check on the integer corner of the prev point.
    ipx = jnp.floor(corner_prev[:, 0]) - LK_PAD
    ipy = jnp.floor(corner_prev[:, 1]) - LK_PAD
    in_prev = (ipx >= -win) & (ipx < W) & (ipy >= -win) & (ipy < H)

    good = valid & in_prev & (det > 1e-12)
    if is_level0:
        status = valid & in_prev & (min_eig >= min_eig_thresh) & (det > 1e-12)
    else:
        status = valid

    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

    def sample_diff_b(pts):
        corner = pts - half + LK_PAD

        def one(c, pI, pix, piy):
            J = _bilinear_patch(curr_img, c, win)
            diff = J - pI
            b1 = jnp.sum(diff * pix)
            b2 = jnp.sum(diff * piy)
            return b1, b2

        return jax.vmap(one)(corner, patch_I, patch_ix, patch_iy)

    def cond(carry):
        pts, prev_delta, conv, it = carry
        return (it < max_iter) & jnp.any(~conv)

    def body(carry):
        pts, prev_delta, conv, it = carry
        b1, b2 = sample_diff_b(pts)
        # OpenCV: delta = [(A12 b2 - A22 b1), (A12 b1 - A11 b2)] / det
        dx = (a12 * b2 - a22 * b1) * inv_det
        dy = (a12 * b1 - a11 * b2) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)

        # next-point in-bounds check (status drop at level 0)
        new_pts = pts + delta
        inb = (
            (jnp.floor(new_pts[:, 0] - half) >= -win)
            & (jnp.floor(new_pts[:, 0] - half) < W)
            & (jnp.floor(new_pts[:, 1] - half) >= -win)
            & (jnp.floor(new_pts[:, 1] - half) < H)
        )

        step_mask = (~conv) & good
        pts = jnp.where(step_mask[:, None], new_pts, pts)

        d2 = jnp.sum(delta * delta, axis=-1)
        small = d2 <= eps2
        flip = (
            (it > 0)
            & (jnp.abs(delta[:, 0] + prev_delta[:, 0]) < 0.01)
            & (jnp.abs(delta[:, 1] + prev_delta[:, 1]) < 0.01)
        )
        pts = jnp.where((step_mask & flip)[:, None], pts - delta * 0.5, pts)
        conv = conv | small | flip | ~good | ~inb
        return (pts, delta, conv, it + 1)

    conv0 = ~good
    init = (
        next_pts_l,
        jnp.zeros_like(next_pts_l),
        conv0,
        jnp.zeros((), jnp.int32),
    )
    pts, _, _, _ = lax.while_loop(cond, body, init)

    if is_level0:
        # final in-bounds gate mirrors OpenCV's per-iteration status drop
        inb = (
            (jnp.floor(pts[:, 0] - half) >= -win)
            & (jnp.floor(pts[:, 0] - half) < W)
            & (jnp.floor(pts[:, 1] - half) >= -win)
            & (jnp.floor(pts[:, 1] - half) < H)
        )
        status = status & inb
    return pts, status


def pyramidal_lk(
    prev_levels: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    curr_levels: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    prev_pts: jnp.ndarray,  # (F,2) full-res pixel coords
    init_next_pts: jnp.ndarray,  # (F,2) initial guess (USE_INITIAL_FLOW)
    valid: jnp.ndarray,  # (F,) bool
    win: int = 15,
    max_iter: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
):
    """Track prev_pts into the current pyramid.  Returns (next_pts, status)."""
    eps2 = eps * eps
    n_levels = len(prev_levels)
    next_pts = init_next_pts
    status = valid
    for L in reversed(range(n_levels)):
        scale = 1.0 / (1 << L)
        p_img, p_ix, p_iy = prev_levels[L]
        c_img, _, _ = curr_levels[L]
        pts_l, st = _track_level(
            p_img, p_ix, p_iy, c_img,
            prev_pts * scale, next_pts * scale, valid,
            win, max_iter, eps2, min_eig_threshold, is_level0=(L == 0),
        )
        next_pts = pts_l * (1 << L)
        if L == 0:
            status = st
    return next_pts, status
