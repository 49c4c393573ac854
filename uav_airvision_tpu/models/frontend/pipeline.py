"""The image-processing front-end as one fused, fixed-shape XLA step.

Replaces the reference's per-frame object choreography
(ImageProcessingPipeline.stereo_callback, reference
src/image_processing/pipeline.py:46-150) — pyramid build, first-frame
initialization, temporal tracking, feature replenishment, per-cell pruning,
normalized-coordinate publishing — with masked array ops over flat padded
feature slots.  Feature slots are kept in publish order (cell-major), which
makes the previous frame's flat order available for the reference's
order-sensitive grid bookkeeping.

Reference quirks preserved:
* the RANSAC stage is a no-op (all-ones inliers, feature_tracker.py:135-136),
* temporal-tracker bounds cull uses x > w-1, the stereo matcher uses x >= w,
* the 7x7 detection mask skips features with x<3 or y<3 (numpy negative-slice
  behavior in feature_adder.py:59-62),
* cells that do not overflow keep insertion order; overflowing cells are
  reordered lifetime-descending by the pruner (feature_pruner.py:13-19).

One deliberate deviation: the 7x7 detection mask is built from the
temporally-tracked points BEFORE their stereo re-match (the reference masks
after it, feature_adder.py:59-62) so the tracked-feature and new-candidate
stereo matches can run as one batched LK call; a temporal track that then
fails stereo masks a few extra pixels, which only suppresses a rare nearby
re-detection one frame early.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...config import Config
from ...ops import camera, extract, fast, gridops, lk, pyramid
from .params import FrontendParams
from .stereo import stereo_match

class FrontendState(NamedTuple):
    ids: jnp.ndarray  # (F,) int32
    lifetime: jnp.ndarray  # (F,) int32
    cam0: jnp.ndarray  # (F,2)
    cam1: jnp.ndarray  # (F,2)
    valid: jnp.ndarray  # (F,)
    next_id: jnp.ndarray  # () int32
    # Template block rows of the previous cam0 pyramid at this state's cam0
    # positions ((levels+1)*F, bw*bw; ops/lk.py::template_gather_rows):
    # everything frame t+1's temporal LK needs from frame t, at ~1/5 the
    # scan-carry bytes of the full banded pyramid it replaces.
    prev_rows: jnp.ndarray
    initialized: jnp.ndarray  # () bool


class FrontendOutput(NamedTuple):
    ids: jnp.ndarray  # (F,) int32
    uv: jnp.ndarray  # (F,4) normalized [u0 v0 u1 v1]
    mask: jnp.ndarray  # (F,)
    # stage counters (reference num_features dict, feature_tracker.py:96-157)
    before_tracking: jnp.ndarray
    after_tracking: jnp.ndarray
    after_matching: jnp.ndarray
    after_ransac: jnp.ndarray
    # number of temporal tracks available to seed the stereo match this
    # frame (() int32; 0 on first frames / non-seeded configs).  The fleet
    # path reads it to hoist the stereo-seed-fallback decision to a
    # batch-level cond (models/vio.py::vio_step_fleet).
    n_seed: jnp.ndarray


def temporal_lk_levels(config: Config) -> int:
    """Pyramid depth of the temporal tracker (and of the carried template
    rows): config.frontend.lk_temporal_levels, 0 = full pyramid."""
    return config.frontend.lk_temporal_levels or (
        config.frontend.pyramid_levels + 1)


def init_frontend_state(config: Config, dtype=jnp.float32) -> FrontendState:
    F = config.capacity.max_features
    band_dtype = jnp.bfloat16 if config.frontend.band_bf16 else jnp.float32
    rows = jnp.zeros((temporal_lk_levels(config) * F,
                      extract.BAND_BW * extract.BAND_BW), band_dtype)
    return FrontendState(
        ids=jnp.full((F,), -1, jnp.int32),
        lifetime=jnp.zeros((F,), jnp.int32),
        cam0=jnp.zeros((F, 2), dtype),
        cam1=jnp.zeros((F, 2), dtype),
        valid=jnp.zeros((F,), bool),
        next_id=jnp.zeros((), jnp.int32),
        prev_rows=rows,
        initialized=jnp.zeros((), bool),
    )


def rodrigues(rvec):
    """Axis-angle -> rotation matrix (cv2.Rodrigues closed form)."""
    theta = jnp.linalg.norm(rvec)
    safe = jnp.where(theta > 1e-12, theta, 1.0)
    k = rvec / safe
    kx, ky, kz = k[0], k[1], k[2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky]),
            jnp.stack([kz, zero, -kx]),
            jnp.stack([-ky, kx, zero]),
        ]
    )
    R = (
        jnp.eye(3, dtype=rvec.dtype)
        + jnp.sin(theta) * K
        + (1.0 - jnp.cos(theta)) * (K @ K)
    )
    return jnp.where(theta > 1e-12, R, jnp.eye(3, dtype=rvec.dtype))


def predicted_rotations(mean_ang_vel, dt, params: FrontendParams):
    """Inter-frame rotation prediction from the mean gyro rate (reference
    imu_processor.integrate_imu_data, src/image_processing/imu_processor.py:28-67)."""
    cam0_mean = params.R_cam0_imu.T @ mean_ang_vel
    cam1_mean = params.R_cam1_imu.T @ mean_ang_vel
    return rodrigues(cam0_mean * dt).T, rodrigues(cam1_mean * dt).T


def _detection_candidates(img, mask, config: Config, per_cell: int):
    """FAST + NMS + per-cell top-k extraction.  Returns flat candidate arrays
    (pts (C,2), score (C,), arrival (C,), valid (C,)) with C = cells*per_cell."""
    fe = config.frontend
    keep, score = fast.detect_fast(img, fe.fast_threshold, mask=mask)
    ys, xs, vals = gridops.dense_grid_topk(
        score.astype(jnp.int32), fe.grid_row, fe.grid_col, per_cell
    )
    C = fe.grid_num * per_cell
    ys = ys.reshape(C)
    xs = xs.reshape(C)
    vals = vals.reshape(C)
    W = img.shape[1]
    pts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    arrival = ys * W + xs  # row-major detection order (cv2 tie-break)
    return pts, vals, arrival, vals > 0


def _detection_mask(img_shape, pts, valid):
    """True = detection allowed.  7x7 exclusion window around each feature;
    features with int(x)<3 or int(y)<3 do not mask (reference numpy
    negative-slice quirk).

    Scatter-free MXU formulation: pixel (y, x) is excluded iff some feature f
    has |y - iy_f| <= 3 AND |x - ix_f| <= 3, i.e. the dilated mask is the
    outer product of per-feature row/column indicator strips — ONE
    (H, F) @ (F, W) matmul instead of a point scatter + 7x7 OR window
    (bit-identical, verified in scripts/exp_topk.py lineage; counts <= F < 256
    are exact in bf16-in/f32-accumulate)."""
    H, W = img_shape
    ix = jnp.floor(pts[:, 0]).astype(jnp.int32)
    iy = jnp.floor(pts[:, 1]).astype(jnp.int32)
    ok = valid & (ix >= 3) & (iy >= 3)
    ix = jnp.where(ok, ix, -10)  # strip falls fully outside the image
    iy = jnp.where(ok, iy, -10)
    ay = jnp.arange(H, dtype=jnp.int32)
    ax = jnp.arange(W, dtype=jnp.int32)
    Rm = (jnp.abs(ay[None, :] - iy[:, None]) <= 3).astype(jnp.bfloat16)  # (F,H)
    Cm = (jnp.abs(ax[None, :] - ix[:, None]) <= 3).astype(jnp.bfloat16)  # (F,W)
    d = lax.dot_general(Rm, Cm, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (H,W) counts
    return d == 0.0


def _normalize_publish(state_ids, lifetime, cam0, cam1, valid,
                       params: FrontendParams, config: Config):
    F = cam0.shape[0]
    if config.calib.cam0_distortion_model == config.calib.cam1_distortion_model:
        # one batched undistort with per-point camera parameters: the
        # fixed-point iteration is op-count bound, not size bound
        def pair(a, b):
            return jnp.concatenate(
                [jnp.full((F,), a, cam0.dtype), jnp.full((F,), b, cam0.dtype)]
            )

        intr = tuple(pair(a, b) for a, b in
                     zip(params.cam0_intrinsics, params.cam1_intrinsics))
        coeffs = tuple(pair(a, b) for a, b in
                       zip(params.cam0_coeffs, params.cam1_coeffs))
        und = camera.undistort_points(
            jnp.concatenate([cam0, cam1]), intr,
            config.calib.cam0_distortion_model, coeffs,
        )
        und0, und1 = und[:F], und[F:]
    else:
        und0 = camera.undistort_points(
            cam0, params.cam0_intrinsics, config.calib.cam0_distortion_model,
            params.cam0_coeffs,
        )
        und1 = camera.undistort_points(
            cam1, params.cam1_intrinsics, config.calib.cam1_distortion_model,
            params.cam1_coeffs,
        )
    uv = jnp.concatenate([und0, und1], axis=-1)
    return jnp.where(valid, state_ids, -1), jnp.where(valid[:, None], uv, 0.0), valid


def frontend_step(
    state: FrontendState,
    cam0_img, cam1_img,  # (H,W) uint8/float
    mean_ang_vel, dt,  # IMU window summary for rotation prediction
    params: FrontendParams,
    config: Config,
    assume_initialized: bool = False,
    seed_mode: str = "cond",
):
    """One stereo frame through the front-end.  Returns (state, FrontendOutput).

    ``assume_initialized=True`` statically drops the first-frame branch
    (callers must guarantee ``state.initialized``): the fleet path hoists
    the initialized check to a batch-level cond outside vmap, because under
    vmap the first_frame/track_frame cond lowers to select and BOTH paths
    — including first_frame's full-pyramid stereo match — would run every
    frame.

    ``seed_mode`` controls the stereo-seed starvation fallback
    (config.frontend.stereo_seed_fallback) at trace time:
      * "cond" — the per-instance lax.cond (exact single-instance
        semantics; under vmap it lowers to select and both stereo paths
        execute, which is the correct-but-slow fleet branch);
      * "seeded" — force the disparity-seeded path, no fallback cond (the
        fleet fast pass; ``FrontendOutput.n_seed`` tells the caller whether
        the fallback WOULD have fired so it can recompute in "cond" mode —
        see vio_step_fleet's batch-hoisted two-pass)."""
    fe = config.frontend
    cap = config.capacity
    F = cap.max_features
    n_cells = fe.grid_num
    H, W = cam0_img.shape

    # Build both pyramids, then band every level once (ops/extract.py): all
    # LK passes this frame — temporal, stereo fwd/bwd, for tracked features
    # and adder candidates alike — extract their windows from these shared
    # block tilings with one F-row gather each.
    band_dtype = jnp.bfloat16 if fe.band_bf16 else None
    pyr0 = extract.band_pyramid(
        pyramid.build_pyramid_padded(cam0_img, fe.pyramid_levels),
        dtype=band_dtype)
    pyr1 = extract.band_pyramid(
        pyramid.build_pyramid_padded(cam1_img, fe.pyramid_levels),
        dtype=band_dtype)

    CAND_INIT = 8  # per-cell candidates on the first frame (see docstring)
    CAND_ADD = fe.grid_max_feature_num

    def first_frame(state):
        """Reference FeatureInitializer.initialize_first_frame
        (feature_initializer.py:45-85).  The reference stereo-matches every
        FAST detection; we pre-select the top-8 per cell (>= the 3 kept), a
        shape-bounding approximation."""
        pts, score, arrival, vald = _detection_candidates(
            cam0_img, None, config, CAND_INIT
        )
        cam1_pts, inlier = stereo_match(pyr0, pyr1, pts, vald, params, config)
        cell = gridops.cell_of_points(pts, fe.grid_row, fe.grid_col, H, W)
        rank, perm = gridops.rank_in_cell(cell, score.astype(jnp.float32),
                                          arrival, inlier, n_cells)
        keep = inlier & (rank < fe.grid_min_feature_num)
        # ids in (cell asc, score desc, arrival asc) order over kept entries
        # and the id-ordered compaction both fall out of the ONE sort above
        # (stable sort: the kept subset keeps its relative order).
        grank, _, n_kept = gridops.kept_order_stats(perm, keep, cell, inlier,
                                                    n_cells)
        ids = jnp.where(keep, state.next_id + grank, -1)
        sel, selm = gridops.compact_kept(perm, keep, F)
        new_state = state._replace(
            ids=jnp.where(selm, ids[sel], -1),
            lifetime=jnp.where(selm, 1, 0).astype(jnp.int32),
            cam0=jnp.where(selm[:, None], pts[sel], 0.0),
            cam1=jnp.where(selm[:, None], cam1_pts[sel], 0.0),
            valid=selm,
            next_id=(state.next_id + n_kept).astype(jnp.int32),
            initialized=jnp.ones((), bool),
        )
        zero = jnp.zeros((), jnp.int32)
        counters = (zero, zero, zero, zero, zero)
        return new_state, counters

    def track_frame(state):
        """Reference FeatureTracker.track_features + FeatureAdder +
        FeaturePruner (feature_tracker.py:74-157, feature_adder.py:52-108,
        feature_pruner.py:8-19)."""
        cam0_R_p_c, _ = predicted_rotations(mean_ang_vel, dt, params)

        prev_pts = state.cam0
        prev_valid = state.valid
        before_tracking = jnp.sum(prev_valid.astype(jnp.int32)).astype(jnp.int32)

        pred = camera.homography_warp_points(prev_pts, cam0_R_p_c,
                                             params.cam0_intrinsics)
        curr, st = lk.pyramidal_lk_banded(
            pyr0, pyr0, prev_pts, pred, prev_valid,
            prev_rows=state.prev_rows,
            n_levels=temporal_lk_levels(config),
            win=fe.patch_size, max_iter=fe.lk_max_iteration,
            eps=fe.lk_track_precision, min_eig_threshold=fe.lk_min_eig_threshold,
            static_iters=fe.lk_static_iters,
            compact_windows=fe.lk_compact_windows,
            max_iter_upper=fe.lk_max_iteration_upper or None,
        )
        st = st & (curr[:, 0] >= 0) & (curr[:, 0] <= W - 1) \
                & (curr[:, 1] >= 0) & (curr[:, 1] <= H - 1)
        after_tracking = jnp.sum(st.astype(jnp.int32)).astype(jnp.int32)

        if fe.exact_adder_mask:
            # reference order: stereo-rematch the temporal tracks first, mask
            # around the survivors, then stereo the new candidates separately
            n_seed_out = jnp.zeros((), jnp.int32)
            cam1_curr, match = stereo_match(pyr0, pyr1, curr, st, params, config)
            det_mask = _detection_mask((H, W), curr, st & match)
            apts, ascore, aarrival, avalid = _detection_candidates(
                cam0_img, det_mask, config, CAND_ADD
            )
            acam1, ainlier = stereo_match(pyr0, pyr1, apts, avalid, params, config)
        else:
            # The detection mask needs only the temporally-tracked positions,
            # so the tracked-feature stereo match and the adder-candidate
            # stereo match can run as ONE batched LK call (the reference runs
            # them as two separate cv2 calls; batching them doubles the LK
            # feature axis instead, which is nearly free on the TPU).
            det_mask = _detection_mask((H, W), curr, st)
            apts, ascore, aarrival, avalid = _detection_candidates(
                cam0_img, det_mask, config, CAND_ADD
            )
            both_pts = jnp.concatenate([curr, apts])
            both_valid = jnp.concatenate([st, avalid])
            if fe.stereo_seeded:
                # Disparity-seeded fast path: stereo disparity changes by a
                # few px/frame at most, so each tracked feature's previous
                # disparity (state holds both cams' positions) lands the
                # forward LK within the level-0 search span — and each new
                # candidate inherits its nearest tracked neighbor's
                # disparity.  The full coarse-to-fine forward pyramid then
                # truncates to ``stereo_seeded_levels`` (gates unchanged:
                # the vertical-disparity cut still measures against the
                # rotation projection inside stereo_match).
                d_prev = state.cam1 - state.cam0  # (F,2) previous disparity
                trk_ok = st & state.valid
                n_seed = jnp.sum(trk_ok.astype(jnp.int32))
                dist2 = jnp.sum(
                    (apts[:, None, :] - curr[None, :, :]) ** 2, axis=-1
                )  # (C,F)
                dist2 = jnp.where(trk_ok[None, :], dist2, jnp.inf)
                nn = jnp.argmin(dist2, axis=1)
                seed = jnp.concatenate([curr + d_prev, apts + d_prev[nn]])
                seed_ok = jnp.concatenate(
                    [trk_ok, jnp.broadcast_to(n_seed > 0, (apts.shape[0],))]
                )

                def seeded(_):
                    return stereo_match(
                        pyr0, pyr1, both_pts, both_valid, params, config,
                        init_cam1=seed, init_ok=seed_ok,
                        n_fwd_levels=fe.stereo_seeded_levels,
                    )

                def full(_):
                    return stereo_match(
                        pyr0, pyr1, both_pts, both_valid, params, config
                    )

                n_seed_out = n_seed.astype(jnp.int32)
                if fe.stereo_seed_fallback and seed_mode == "cond":
                    # starvation recovery: too few tracks to trust the seeds
                    both_cam1, both_inlier = lax.cond(
                        n_seed >= fe.stereo_seed_min_tracked, seeded, full, None
                    )
                else:
                    both_cam1, both_inlier = seeded(None)
            else:
                n_seed_out = jnp.zeros((), jnp.int32)
                both_cam1, both_inlier = stereo_match(
                    pyr0, pyr1, both_pts, both_valid, params, config
                )
            cam1_curr, match = both_cam1[:F], both_inlier[:F]
            acam1, ainlier = both_cam1[F:], both_inlier[F:]

        tracked = st & match
        after_matching = jnp.sum(tracked.astype(jnp.int32)).astype(jnp.int32)
        # RANSAC stage: all-ones in the reference -> pass-through
        after_ransac = after_matching

        tr_cell = gridops.cell_of_points(curr, fe.grid_row, fe.grid_col, H, W)
        tr_life = state.lifetime + 1
        acell = gridops.cell_of_points(apts, fe.grid_row, fe.grid_col, H, W)
        arank, aperm = gridops.rank_in_cell(acell, ascore.astype(jnp.float32),
                                            aarrival, ainlier, n_cells)
        akeep = ainlier & (arank < fe.grid_min_feature_num)
        # id assignment and the kept entries' per-cell insertion rank are
        # both derived from the ONE candidate sort (kept_order_stats): a
        # stable sort keeps the kept subset's relative order, so the
        # keep-validity re-sorts the reference implies are redundant.
        a_grank, a_crank, a_kept = gridops.kept_order_stats(
            aperm, akeep, acell, ainlier, n_cells)
        aids = jnp.where(akeep, state.next_id + a_grank, -1)

        # ---- combine tracked + new, prune per cell ----
        C = apts.shape[0]
        all_cell = jnp.concatenate([tr_cell, acell])
        all_life = jnp.concatenate([tr_life, jnp.ones((C,), jnp.int32)])
        all_valid = jnp.concatenate([tracked, akeep])
        all_ids = jnp.concatenate([state.ids, aids])
        all_cam0 = jnp.concatenate([curr, apts])
        all_cam1 = jnp.concatenate([cam1_curr, acam1])
        # insertion order: tracked in prev-flat order, then new by (cell,rank)
        arrival = jnp.concatenate(
            [jnp.arange(F, dtype=jnp.int32), F + a_crank.astype(jnp.int32)]
        )

        # per-cell counts decide pruner reordering (quirk: only overflowing
        # cells get lifetime-sorted)
        onehot = (all_cell[:, None] == jnp.arange(n_cells)[None, :]) & all_valid[:, None]
        cell_count = jnp.sum(onehot.astype(jnp.int32), axis=0)  # (n_cells,)
        overflow = cell_count > fe.grid_max_feature_num
        of_this = jnp.where(all_valid, overflow[jnp.clip(all_cell, 0, n_cells - 1)], False)
        sort_life = jnp.where(of_this, all_life, 0)  # stable: non-overflow keeps order
        prank, pperm = gridops.rank_in_cell(
            all_cell, sort_life.astype(jnp.float32), arrival, all_valid, n_cells
        )
        keep = all_valid & (prank < fe.grid_max_feature_num)

        # ---- compact into state slots in publish order ----
        # the publish-order permutation is the kept subset of the prune sort
        # (same keys, stable) — compact_kept scatters it without a second sort
        sel, selm = gridops.compact_kept(pperm, keep, F)
        new_state = state._replace(
            ids=jnp.where(selm, all_ids[sel], -1),
            lifetime=jnp.where(selm, all_life[sel], 0),
            cam0=jnp.where(selm[:, None], all_cam0[sel], 0.0),
            cam1=jnp.where(selm[:, None], all_cam1[sel], 0.0),
            valid=selm,
            next_id=(state.next_id + a_kept).astype(jnp.int32),
        )
        counters = (before_tracking, after_tracking, after_matching,
                    after_ransac, n_seed_out)
        return new_state, counters

    if assume_initialized:
        state2, counters = track_frame(state)
    else:
        state2, counters = lax.cond(
            state.initialized, track_frame, first_frame, state)
    # Gather next frame's temporal-LK template rows NOW, while this frame's
    # cam0 pyramid is live: the carry shrinks to the rows the next frame
    # actually reads (byte-identical to gathering from a carried pyramid).
    state2 = state2._replace(prev_rows=lk.template_gather_rows(
        pyr0, state2.cam0, win=fe.patch_size,
        n_levels=temporal_lk_levels(config)))

    ids, uv, mask = _normalize_publish(
        state2.ids, state2.lifetime, state2.cam0, state2.cam1, state2.valid,
        params, config,
    )
    out = FrontendOutput(
        ids=ids, uv=uv, mask=mask,
        before_tracking=counters[0], after_tracking=counters[1],
        after_matching=counters[2], after_ransac=counters[3],
        n_seed=counters[4],
    )
    return state2, out
