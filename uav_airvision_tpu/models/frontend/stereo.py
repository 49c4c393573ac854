"""Stereo matching: cam0 -> cam1 correspondence by seeded LK + geometric cuts.

Reproduces the reference StereoMatcher (src/image_processing/stereo_matcher.py:33-115)
with all of its quirks, vectorized over a fixed-size point batch:

* seed cam1 points by rotating undistorted cam0 points through
  R0to1 = R_cam1_imu^T @ R_cam0_imu, then re-distorting **with the cam0
  model** (reference :49-61),
* forward LK cam0->cam1 and backward LK cam1->cam0; the backward LK's own
  status flag is *ignored*, only the fwd/bwd position error is used
  (reference :64-77 — rev_mask is unused there),
* inliers: fwd status & fwd/bwd error < 3 px & vertical disparity < 20 px
  (hard-coded, reference :75-80) & inside image (x<0 or x>=w culls, :82-88),
* epipolar residual exactly as written in the reference (:90-113) including
  the elementwise-product-then-[0] expression — NOT a point-line distance —
  and undistorting the cam1 points with the cam0 intrinsics (:98-102).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...config import Config
from ...ops import camera, lk
from ...ops.pyramid import LK_PAD
from ...utils import quaternion as quat
from .params import FrontendParams


def stereo_match(
    bp0, bp1,  # ops.extract.BandedPyramid per camera
    cam0_pts, valid,  # (B,2), (B,)
    params: FrontendParams,
    config: Config,
    init_cam1=None,  # (B,2) optional better cam1 seed (disparity-propagated)
    init_ok=None,  # (B,) which rows of init_cam1 are usable
    n_fwd_levels=None,  # static override of the forward-LK pyramid depth
):
    """Returns (cam1_pts (B,2), inlier (B,)).

    When ``init_cam1``/``init_ok`` are given, rows with a usable seed start
    the forward LK there instead of at the rotation-projected point; the
    vertical-disparity gate still measures against the rotation projection
    (reference semantics, stereo_matcher.py:75-80).  ``n_fwd_levels``
    statically truncates the forward pyramid — callers pass 1 when every
    seed is already within the level-0 search span (see pipeline.py's
    disparity-seeded fast path)."""
    fe = config.frontend
    # logical image size: pyramid level 0 carries LK_PAD of border padding
    # (the reference culls at the true image bounds, stereo_matcher.py:82-88)
    h = bp0.levels[0][0] - 2 * LK_PAD
    w = bp0.levels[0][1] - 2 * LK_PAD

    R0to1 = params.R_cam1_imu.T @ params.R_cam0_imu

    und0_rect = camera.undistort_points(
        cam0_pts, params.cam0_intrinsics, config.calib.cam0_distortion_model,
        params.cam0_coeffs, rectification=R0to1,
    )
    proj1 = camera.distort_points(
        und0_rect, params.cam0_intrinsics, config.calib.cam0_distortion_model,
        params.cam0_coeffs,
    )

    if n_fwd_levels is not None:
        n_fwd = n_fwd_levels
    else:
        n_fwd = None if fe.stereo_fwd_levels < 0 else fe.stereo_fwd_levels
    seed = proj1
    if init_cam1 is not None:
        seed = jnp.where(init_ok[:, None], init_cam1, proj1)
    p1, st_fwd = lk.pyramidal_lk_banded(
        bp0, bp1, cam0_pts, seed, valid,
        win=fe.patch_size, max_iter=fe.lk_max_iteration,
        eps=fe.lk_track_precision, min_eig_threshold=fe.lk_min_eig_threshold,
        n_levels=n_fwd,
        static_iters=fe.lk_static_iters,
            compact_windows=fe.lk_compact_windows,
        max_iter_upper=fe.lk_max_iteration_upper or None,
    )
    # Backward pass for the fwd/bwd error gate.  Default: level 0 only — the
    # initial guess (the original cam0 point) is already sub-pixel for true
    # matches, so the coarse pyramid levels add cost without changing which
    # points clear the 3 px gate (config.frontend.stereo_full_backward
    # restores the reference's full-pyramid backward).
    n_bwd = None if fe.stereo_full_backward else 1
    p0r, _ = lk.pyramidal_lk_banded(
        bp1, bp0, p1, cam0_pts, valid,
        win=fe.patch_size,
        max_iter=fe.stereo_bwd_max_iter or fe.lk_max_iteration,
        eps=fe.lk_track_precision, min_eig_threshold=fe.lk_min_eig_threshold,
        n_levels=n_bwd,
        static_iters=fe.lk_static_iters,
            compact_windows=fe.lk_compact_windows,
    )

    err = jnp.linalg.norm(cam0_pts - p0r, axis=-1)
    disp = jnp.abs(proj1[:, 1] - p1[:, 1])
    inlier = (
        valid
        & st_fwd
        & (err < fe.fwd_bwd_error_px)
        & (disp < fe.max_vertical_disparity_px)
    )
    inlier = inlier & (p1[:, 0] >= 0) & (p1[:, 0] < w) & (p1[:, 1] >= 0) & (p1[:, 1] < h)

    # epipolar residual, reference expression preserved verbatim
    t01 = params.R_cam1_imu.T @ (params.t_cam0_imu - params.t_cam1_imu)
    E = quat.skew(t01) @ R0to1
    # both sides use the cam0 model (reference quirk) -> one batched call
    und_both = camera.undistort_points(
        jnp.concatenate([cam0_pts, p1]), params.cam0_intrinsics,
        config.calib.cam0_distortion_model, params.cam0_coeffs,
    )
    und0, und1 = und_both[: cam0_pts.shape[0]], und_both[cam0_pts.shape[0] :]
    fx, fy = params.cam0_intrinsics[0], params.cam0_intrinsics[1]
    norm_unit = 4.0 / (2.0 * fx + 2.0 * fy)
    ones = jnp.ones((und0.shape[0], 1), und0.dtype)
    pt0_h = jnp.concatenate([und0, ones], axis=-1)
    pt1_h = jnp.concatenate([und1, ones], axis=-1)
    line = pt0_h @ E.T  # (B,3)
    err_epi = jnp.abs(pt1_h[:, 0] * line[:, 0]) / jnp.linalg.norm(line[:, :2], axis=-1)
    inlier = inlier & (err_epi <= fe.stereo_threshold * norm_unit)

    return p1, inlier
