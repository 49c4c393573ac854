"""Pinhole camera model with radtan/equidistant distortion — pure jnp,
batched over points (replaces the reference's cv2-backed CameraModel,
reference src/image_processing/camera_model.py:24-108).

* ``distort_radtan`` is the closed-form forward model (cv2.projectPoints).
* ``undistort_radtan`` inverts it with the same fixed-point iteration
  cv2.undistortPoints uses (5 iterations by default); we run a configurable
  fixed count so the op is jit-friendly.
* ``equidistant`` (fisheye) variants are provided for the config's other
  supported model.

All functions operate on (..., 2) arrays of points.
"""

from __future__ import annotations

import jax.numpy as jnp

UNDISTORT_ITERS = 5  # cv2.undistortPoints' fixed-point iteration count


def _k_matrix(intrinsics, dtype):
    fx, fy, cx, cy = intrinsics
    return jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype)


def pixel_to_normalized(pts, intrinsics):
    fx, fy, cx, cy = intrinsics
    x = (pts[..., 0] - cx) / fx
    y = (pts[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def normalized_to_pixel(pts, intrinsics):
    fx, fy, cx, cy = intrinsics
    return jnp.stack([pts[..., 0] * fx + cx, pts[..., 1] * fy + cy], axis=-1)


def _radtan_delta(x, y, k1, k2, p1, p2):
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return radial, dx, dy


def distort_normalized_radtan(pts, coeffs):
    """Apply radtan distortion to normalized points."""
    k1, k2, p1, p2 = coeffs
    x, y = pts[..., 0], pts[..., 1]
    radial, dx, dy = _radtan_delta(x, y, k1, k2, p1, p2)
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort_normalized_radtan(pts, coeffs, iters=UNDISTORT_ITERS):
    """Invert radtan distortion on normalized points (cv2-style fixed point:
    x <- (x0 - delta(x)) / radial(x))."""
    k1, k2, p1, p2 = coeffs
    x0, y0 = pts[..., 0], pts[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        radial, dx, dy = _radtan_delta(x, y, k1, k2, p1, p2)
        inv = 1.0 / radial
        x = (x0 - dx) * inv
        y = (y0 - dy) * inv
    return jnp.stack([x, y], axis=-1)


def distort_normalized_equidistant(pts, coeffs):
    k1, k2, k3, k4 = coeffs
    x, y = pts[..., 0], pts[..., 1]
    r = jnp.sqrt(x * x + y * y)
    r_safe = jnp.where(r > 1e-12, r, 1.0)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = jnp.where(r > 1e-12, theta_d / r_safe, 1.0)
    return jnp.stack([x * scale, y * scale], axis=-1)


def undistort_normalized_equidistant(pts, coeffs, iters=UNDISTORT_ITERS):
    k1, k2, k3, k4 = coeffs
    x, y = pts[..., 0], pts[..., 1]
    theta_d = jnp.sqrt(x * x + y * y)
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        theta = theta_d / (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = jnp.where(theta_d > 1e-12, jnp.tan(theta) / jnp.maximum(theta_d, 1e-12), 1.0)
    return jnp.stack([x * scale, y * scale], axis=-1)


def _dispatch(model):
    if model == "equidistant":
        return distort_normalized_equidistant, undistort_normalized_equidistant
    return distort_normalized_radtan, undistort_normalized_radtan


def undistort_points(pts_px, intrinsics, model, coeffs,
                     rectification=None, new_intrinsics=(1.0, 1.0, 0.0, 0.0)):
    """Pixel points -> undistorted points under ``new_intrinsics`` after an
    optional rectification rotation (mirrors cv2.undistortPoints semantics,
    reference camera_model.py:24-47)."""
    _, undo = _dispatch(model)
    n = pixel_to_normalized(pts_px, intrinsics)
    u = undo(n, coeffs)
    if rectification is not None:
        h = jnp.concatenate([u, jnp.ones((*u.shape[:-1], 1), u.dtype)], axis=-1)
        h = jnp.einsum("ij,...j->...i", rectification, h)
        u = h[..., :2] / h[..., 2:3]
    return normalized_to_pixel(u, new_intrinsics)


def distort_points(pts_norm_px, intrinsics, model, coeffs):
    """Normalized-as-pixel points -> distorted pixel points (mirrors the
    reference's projectPoints-based distort_points, camera_model.py:49-75:
    input interpreted as normalized coordinates)."""
    do, _ = _dispatch(model)
    d = do(pts_norm_px, coeffs)
    return normalized_to_pixel(d, intrinsics)


def homography_warp_points(pts_px, R_p_c, intrinsics):
    """Rotation-compensated point prediction: warp by K R K^-1 (reference
    predict_feature_tracking, camera_model.py:77-93)."""
    fx, fy, cx, cy = intrinsics
    dtype = pts_px.dtype
    K = _k_matrix(intrinsics, dtype)
    Kinv = jnp.asarray(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]], dtype
    )
    H = K @ R_p_c @ Kinv
    h = jnp.concatenate([pts_px, jnp.ones((*pts_px.shape[:-1], 1), dtype)], axis=-1)
    w = jnp.einsum("ij,...j->...i", H, h)
    return w[..., :2] / w[..., 2:3]
