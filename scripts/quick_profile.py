#!/usr/bin/env python
"""Focused scan-amortized profile: the few stages that matter for the fps
budget (frontend_step, backend_step, and the three LK passes), with far
fewer compiles than scan_profile.py.  Usage: quick_profile.py [reps] [stages]
where stages is a comma set from {fe,be,lk,stereo,detect,vio,pyr,mask,publish}.

Image-consuming stages roll the image by a carried offset each iteration:
with a CONSTANT captured image XLA constant-folds every image-pure
computation (pyramid build, banding, the FAST score map) out of the scan
body and the stage under-reports (discovered in round 4: the fe stage read
0.57 ms below the real bench cost).  The roll is a ~0.36 MB copy (~1 us)
and makes the content pan like a moving camera.
"""

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


def scan_time(make_body, init_carry, reps, label):
    def scanned(carry):
        def body(c, _):
            return make_body(c), None
        out, _ = lax.scan(body, carry, None, length=reps)
        return out

    f = jax.jit(scanned)
    out = f(init_carry)
    for leaf in jax.tree_util.tree_leaves(out):
        jax.device_get(leaf.ravel()[:1])
    t0 = time.perf_counter()
    out = f(init_carry)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:28s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    stages = set((sys.argv[2] if len(sys.argv) > 2 else
                  "fe,be,lk,stereo,detect").split(","))

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import (
        frontend_step, init_frontend_state, _detection_candidates,
        temporal_lk_levels,
    )
    from uav_airvision_tpu.models.frontend.stereo import stereo_match
    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf import step as bstep
    from uav_airvision_tpu.ops import pyramid, lk, extract as ex

    cfg = euroc_config()
    fparams = make_frontend_params(cfg)
    mparams = make_params(cfg)
    cap = cfg.capacity

    rng = np.random.default_rng(0)
    H, W = 480, 752
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    img1 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]}   reps={reps}", flush=True)

    fe = cfg.frontend
    band_dtype = jnp.bfloat16 if fe.band_bf16 else None
    pyr_f = jax.jit(lambda im: ex.band_pyramid(
        pyramid.build_pyramid_padded(im, fe.pyramid_levels), dtype=band_dtype))
    pyrA = jax.block_until_ready(pyr_f(img0))
    pyrB = jax.block_until_ready(pyr_f(img1))
    F = cap.max_features
    LO = jnp.asarray([20.0, 20.0])
    HI = jnp.asarray([float(W) - 22.0, float(H) - 20.0])
    pts0 = jnp.asarray(rng.uniform([20, 20], [W - 22, H - 20], (F, 2)),
                       jnp.float32)
    valid = jnp.ones(F, bool)

    if "lk" in stages:
        # Mirror the production temporal-LK call (pipeline.py track_frame):
        # carried template rows + configured eps/min_eig/compaction.
        def lk_body(c):
            tl = temporal_lk_levels(cfg)
            rows = lk.template_gather_rows(pyrA, c, win=fe.patch_size,
                                           n_levels=tl)
            pts, _ = lk.pyramidal_lk_banded(
                pyrA, pyrB, c, c, valid,
                prev_rows=rows, n_levels=tl,
                win=fe.patch_size, max_iter=fe.lk_max_iteration,
                eps=fe.lk_track_precision,
                min_eig_threshold=fe.lk_min_eig_threshold,
                static_iters=fe.lk_static_iters,
                compact_windows=fe.lk_compact_windows,
                max_iter_upper=fe.lk_max_iteration_upper or None)
            return jnp.clip(pts, LO, HI)

        scan_time(lk_body, pts0, reps,
                  f"temporal LK ({F} pts, {temporal_lk_levels(cfg)} lvl)")

    B2 = F + fe.grid_num * fe.grid_max_feature_num
    pts2 = jnp.asarray(rng.uniform([20, 20], [W - 22, H - 20], (B2, 2)),
                       jnp.float32)

    if "stereo" in stages:
        def stereo_body(c):
            p1, inl = stereo_match(pyrA, pyrB, c, jnp.ones(B2, bool), fparams,
                                   cfg, init_cam1=c, init_ok=jnp.ones(B2, bool),
                                   n_fwd_levels=fe.stereo_seeded_levels)
            return jnp.clip(p1, LO, HI)

        scan_time(stereo_body, pts2, reps, f"stereo seeded ({B2} pts)")

    if "detect" in stages:
        def det_body(c):
            pts, vals, arr, vmask = _detection_candidates(
                c, None, cfg, fe.grid_max_feature_num)
            return c + jnp.sum(pts) * 1e-12

        scan_time(det_body, img0.astype(jnp.float32), reps, "detect candidates")

    if "pyr" in stages:
        def pyr_body(c):
            im, k = c
            imk = jnp.roll(im, k, axis=1)
            bp = ex.band_pyramid(
                pyramid.build_pyramid_padded(imk, fe.pyramid_levels),
                dtype=band_dtype)
            return (im + jnp.sum(bp.bands[:1, :1]).astype(im.dtype) * 0,
                    k + 1)

        scan_time(pyr_body, (img0, jnp.zeros((), jnp.int32)), reps,
                  "pyramid+banding")

    if "mask" in stages:
        from uav_airvision_tpu.models.frontend.pipeline import _detection_mask

        def mask_body(c):
            m = _detection_mask((H, W), pts0 + c * 1e-6, valid)
            return c + jnp.sum(m.astype(jnp.float32)) * 1e-12

        scan_time(mask_body, jnp.zeros(()), reps, "detection mask")

    if "publish" in stages:
        from uav_airvision_tpu.models.frontend.pipeline import _normalize_publish

        ids0 = jnp.arange(F, dtype=jnp.int32)
        life0 = jnp.ones(F, jnp.int32)

        def pub_body(c):
            ids, uv, m = _normalize_publish(ids0, life0, pts0 + c * 1e-6,
                                            pts0 + 3.0 + c * 1e-6, valid,
                                            fparams, cfg)
            return c + jnp.sum(uv) * 1e-12

        scan_time(pub_body, jnp.zeros(()), reps, "normalize+publish")

    if "fe" in stages:
        fe0 = init_frontend_state(cfg)
        fe_f = jax.jit(lambda st: frontend_step(
            st, img0, img1, jnp.zeros(3), jnp.asarray(0.05), fparams, cfg)[0])
        fe1 = fe_f(fe0)
        jax.device_get(fe1.cam0.ravel()[:1])

        def fe_body(c):
            st, k = c
            # roll the images so image-pure work cannot constant-fold out
            im0 = jnp.roll(img0, k, axis=1)
            im1 = jnp.roll(img1, k, axis=1)
            c2, _ = frontend_step(st, im0, im1, jnp.zeros(3),
                                  jnp.asarray(0.05), fparams, cfg)
            return (c2, k + 1)

        scan_time(fe_body, (fe1, jnp.zeros((), jnp.int32)), reps,
                  "frontend_step")

    if "be" in stages:
        state = init_state(cfg, mparams, np.zeros(3), np.array([0.05, 0.02, 9.8]))
        K, I = cap.max_features, cap.max_imu_per_frame

        def mkframe(t, nf=100, nimu=10):
            imu_t = np.zeros(I)
            imu_t[:nimu] = t - 0.05 + np.arange(1, nimu + 1) * 0.005
            ids = np.full(K, -1, np.int32)
            ids[:nf] = np.arange(nf) + int(t * 20) % 7
            uv = np.zeros((K, 4))
            uv[:nf] = rng.normal(0, 0.2, (nf, 4))
            return bstep.FrameInput(
                timestamp=jnp.asarray(t, jnp.float32),
                imu_t=jnp.asarray(imu_t, jnp.float32),
                imu_w=jnp.asarray(rng.normal(0, 0.01, (I, 3)), jnp.float32),
                imu_a=jnp.asarray(rng.normal(0, 0.01, (I, 3)) + [0, 0, 9.8],
                                  jnp.float32),
                imu_mask=jnp.asarray(np.arange(I) < nimu),
                feat_ids=jnp.asarray(ids),
                feat_uv=jnp.asarray(uv, jnp.float32),
                feat_mask=jnp.asarray(np.arange(K) < nf),
                active=jnp.asarray(True),
            )

        be_f = jax.jit(lambda st, fr: bstep.backend_step(st, fr, mparams, cfg)[0])
        t = 0.0
        for k in range(25):
            t += 0.05
            state = be_f(state, mkframe(t))
        jax.device_get(state.imu.p.ravel()[:1])
        frame = mkframe(t + 0.05)

        def be_body(c):
            st, ts = c
            # Rotate the id window 5 ids/frame so ~5 tracks drop and ~5 new
            # ones appear each step — exercises the lost-track measurement
            # update every frame instead of only via cam-state pruning.
            step_i = jnp.round(ts / 0.05).astype(jnp.int32)
            ids = jnp.where(frame.feat_mask,
                            jnp.arange(K, dtype=jnp.int32) + step_i * 5, -1)
            fr = frame._replace(
                timestamp=ts + 0.05,
                imu_t=jnp.where(frame.imu_mask,
                                frame.imu_t - frame.timestamp + ts + 0.05, 0.0),
                feat_ids=ids,
            )
            st2, _ = bstep.backend_step(st, fr, mparams, cfg)
            return (st2, ts + 0.05)

        scan_time(be_body, (state, frame.timestamp), reps, "backend_step")

    if "vio" in stages:
        from uav_airvision_tpu.models.vio import (VioFrame, init_vio_state,
                                                  vio_step)

        I = cap.max_imu_per_frame
        nimu = 10
        imu_t0 = np.zeros(I)
        imu_t0[:nimu] = np.arange(1, nimu + 1) * 0.005
        vframe = VioFrame(
            timestamp=jnp.asarray(0.05, jnp.float32),
            cam0=img0, cam1=img1,
            imu_t=jnp.asarray(imu_t0, jnp.float32),
            imu_w=jnp.asarray(rng.normal(0, 0.01, (I, 3)), jnp.float32),
            imu_a=jnp.asarray(rng.normal(0, 0.01, (I, 3)) + [0, 0, 9.8],
                              jnp.float32),
            imu_mask=jnp.asarray(np.arange(I) < nimu),
            fe_mean_w=jnp.zeros(3, jnp.float32),
            fe_dt=jnp.asarray(0.05, jnp.float32),
            active=jnp.asarray(True),
        )
        vstate = init_vio_state(cfg, np.zeros(3), np.array([0.05, 0.02, 9.8]),
                                mparams)
        v_f = jax.jit(lambda st, fr: vio_step(st, fr, fparams, mparams, cfg)[0])
        t = 0.0
        for k in range(25):
            t += 0.05
            nt = jnp.where(vframe.imu_mask,
                           vframe.imu_t - 0.005 * nimu + t, 0.0)
            vstate = v_f(vstate, vframe._replace(
                timestamp=jnp.asarray(t, jnp.float32), imu_t=nt))
        jax.device_get(vstate.filter.imu.p.ravel()[:1])

        def vio_body(c):
            st, ts, k = c
            fr = vframe._replace(
                timestamp=ts + 0.05,
                cam0=jnp.roll(vframe.cam0, k, axis=1),  # defeat const-folding
                cam1=jnp.roll(vframe.cam1, k, axis=1),
                imu_t=jnp.where(vframe.imu_mask,
                                vframe.imu_t - 0.005 * nimu + ts + 0.05, 0.0),
            )
            st2, _ = vio_step(st, fr, fparams, mparams, cfg)
            return (st2, ts + 0.05, k + 1)

        scan_time(vio_body, (vstate, jnp.asarray(t, jnp.float32),
                             jnp.zeros((), jnp.int32)), reps,
                  "vio_step (fused)")
