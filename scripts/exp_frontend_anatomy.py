#!/usr/bin/env python
"""Frontend stage anatomy AS CONFIGURED (scan-amortized): the configured
temporal LK (static 10/5 iterations), the configured seeded stereo
(2 fwd levels + level-0 backward), detection, mask, publish — so the rows
sum against the real frontend_step, unlike scan_profile.py whose LK row
uses the max_iter=30 default.  Usage: python scripts/exp_frontend_anatomy.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def scan_time(make_body, init_carry, reps, label):
    def scanned(carry):
        def body(c, _):
            return make_body(c), None
        out, _ = lax.scan(body, carry, None, length=reps)
        return out

    f = jax.jit(scanned)
    out = jax.block_until_ready(f(init_carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(init_carry))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:44s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import (
        frontend_step, init_frontend_state, _detection_mask,
        _detection_candidates, _normalize_publish)
    from uav_airvision_tpu.models.frontend.stereo import stereo_match
    from uav_airvision_tpu.ops import extract as ex
    from uav_airvision_tpu.ops import lk, pyramid

    cfg = euroc_config()
    fe = cfg.frontend
    fparams = make_frontend_params(cfg)
    cap = cfg.capacity
    rng = np.random.default_rng(0)
    H, W = 480, 752
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    img1 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]}   reps={reps}   "
          f"lk {fe.lk_max_iteration}/{fe.lk_max_iteration_upper} static={fe.lk_static_iters} "
          f"seeded_levels={fe.stereo_seeded_levels}", flush=True)

    pyr_f = jax.jit(lambda im: ex.band_pyramid(
        pyramid.build_pyramid_padded(im, fe.pyramid_levels)))
    pyrA = jax.block_until_ready(pyr_f(img0))
    pyrB = jax.block_until_ready(pyr_f(img1))

    F = cap.max_features
    B2 = F + fe.grid_num * fe.grid_max_feature_num
    pts0 = jnp.asarray(rng.uniform([20, 20], [730, 460], (F, 2)), jnp.float32)
    pts2 = jnp.asarray(rng.uniform([20, 20], [730, 460], (B2, 2)), jnp.float32)
    valid = jnp.ones(F, bool)
    valid2 = jnp.ones(B2, bool)

    # ---- the two pyramid+band builds of a real frame -----------------------
    def band2_body(c):
        a = ex.band_pyramid(pyramid.build_pyramid_padded(c, fe.pyramid_levels))
        b = ex.band_pyramid(pyramid.build_pyramid_padded(c + 1.0, fe.pyramid_levels))
        return c + (jnp.sum(a.bands.reshape(-1)[::997])
                    + jnp.sum(b.bands.reshape(-1)[::997])) * 1e-12

    scan_time(band2_body, img0.astype(jnp.float32), reps, "pyramid+band (2 cams)")

    # ---- temporal LK as configured -----------------------------------------
    def lk_cfg_body(c):
        pts, _ = lk.pyramidal_lk_banded(
            pyrA, pyrB, c, c, valid,
            win=fe.patch_size, max_iter=fe.lk_max_iteration,
            eps=fe.lk_track_precision,
            min_eig_threshold=fe.lk_min_eig_threshold,
            static_iters=fe.lk_static_iters,
            max_iter_upper=fe.lk_max_iteration_upper or None)
        return jnp.clip(pts, 20.0, 460.0)

    scan_time(lk_cfg_body, pts0, reps, f"temporal LK ({F} pts, configured)")

    # ---- seeded stereo as configured (fwd 2 levels + bwd level 0) ----------
    def stereo_seeded_body(c):
        p1, inl = stereo_match(pyrA, pyrB, c, valid2, fparams, cfg,
                               init_cam1=c + 3.0, init_ok=valid2,
                               n_fwd_levels=fe.stereo_seeded_levels)
        return jnp.clip(p1, 20.0, 460.0)

    scan_time(stereo_seeded_body, pts2, reps, f"stereo seeded ({B2} pts, configured)")

    # ---- the remaining stages (same as scan_profile, for the sum) ----------
    def det_body(c):
        pts, vals, arr, vmask = _detection_candidates(c, None, cfg, 5)
        return c + jnp.sum(pts) * 1e-12

    scan_time(det_body, img0.astype(jnp.float32), reps, "detect candidates")

    def mask_body(c):
        m = _detection_mask((H, W), c, jnp.ones(c.shape[0], bool))
        return c + jnp.sum(m.astype(jnp.float32)) * 1e-9

    scan_time(mask_body, pts0, reps, "detection mask")

    def pub_body(c):
        ids, uv, m = _normalize_publish(
            jnp.arange(F, dtype=jnp.int32), jnp.ones(F, jnp.int32), c, c,
            jnp.ones(F, bool), fparams, cfg)
        return jnp.clip(c + uv[:, :2] * 1e-9, 20.0, 460.0)

    scan_time(pub_body, pts0, reps, "normalize+publish")

    # ---- nearest-neighbor disparity seed (pipeline.py stereo_seeded path) --
    def nn_body(c):
        d_prev = c * 0.01
        dist2 = jnp.sum((pts2[F:, None, :] - c[None, :, :]) ** 2, axis=-1)
        nn = jnp.argmin(dist2, axis=1)
        seed = jnp.concatenate([c + d_prev, pts2[F:] + d_prev[nn]])
        return jnp.clip(c + seed[:F] * 1e-9, 20.0, 460.0)

    scan_time(nn_body, pts0, reps, "disparity-seed NN assembly")

    # ---- whole frontend step ------------------------------------------------
    fe0 = init_frontend_state(cfg)
    fe_f = jax.jit(lambda st: frontend_step(st, img0, img1, jnp.zeros(3),
                                            jnp.asarray(0.05), fparams, cfg)[0])
    fe1 = jax.block_until_ready(fe_f(fe0))

    def fe_body(c):
        c2, _ = frontend_step(c, img0, img1, jnp.zeros(3), jnp.asarray(0.05),
                              fparams, cfg)
        return c2

    scan_time(fe_body, fe1, reps, "frontend_step (full)")
