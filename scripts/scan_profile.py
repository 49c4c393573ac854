#!/usr/bin/env python
"""Scan-amortized per-frame timings: the only reliable numbers on a tunneled
TPU.  Each stage runs R times inside one jitted lax.scan; per-iteration time
= total / R.  Usage: python scripts/scan_profile.py [reps]
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
    """make_body() -> fn(carry) -> carry; times reps iterations in one scan."""

    def scanned(carry):
        def body(c, _):
            return make_body(c), None

        out, _ = lax.scan(body, carry, None, length=reps)
        return out

    f = jax.jit(scanned)
    out = f(init_carry)
    # HARD sync: a cold call's block_until_ready returns early on axon —
    # fetch one element of every leaf so the warmup cannot leak into the
    # timed window (warm-call blocks below are reliable).
    for leaf in jax.tree_util.tree_leaves(out):
        jax.device_get(leaf.ravel()[:1])
    t0 = time.perf_counter()
    out = f(init_carry)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:28s} {ms:8.3f} ms/iter")
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import (
        frontend_step, init_frontend_state, _detection_mask, _detection_candidates,
    )
    from uav_airvision_tpu.models.frontend.stereo import stereo_match
    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf import step as bstep
    from uav_airvision_tpu.models.msckf.propagation import propagate, propagate_tiered
    from uav_airvision_tpu.ops import pyramid, lk, fast
    from uav_airvision_tpu.utils.precision import with_highest_precision

    cfg = euroc_config()
    fparams = make_frontend_params(cfg)
    mparams = make_params(cfg)
    cap = cfg.capacity

    rng = np.random.default_rng(0)
    H, W = 480, 752
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    img1 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]}   reps={reps}")

    # ---- pyramid ----
    def pyr_body(c):
        p = pyramid.build_pyramid_padded(c + 1.0, 3)
        return p[0][:H, :W]  # keep a dependency

    scan_time(pyr_body, img0.astype(jnp.float32), reps, "pyramid+derivs")

    # ---- FAST ----
    def fast_body(c):
        keep, score = fast.detect_fast(c, 15)
        return c + score.astype(jnp.float32) * 1e-9

    scan_time(fast_body, img0.astype(jnp.float32), reps, "FAST+NMS")

    from uav_airvision_tpu.ops import extract as ex

    pyr_f = jax.jit(lambda im: tuple(pyramid.build_pyramid_padded(im, 3)))
    band_f = jax.jit(lambda pyr: ex.band_pyramid(pyr))
    pyrA_raw = jax.block_until_ready(pyr_f(img0))
    pyrB_raw = jax.block_until_ready(pyr_f(img1))
    pyrA = jax.block_until_ready(band_f(pyrA_raw))
    pyrB = jax.block_until_ready(band_f(pyrB_raw))
    F = cap.max_features
    pts0 = jnp.asarray(rng.uniform([20, 20], [730, 460], (F, 2)), jnp.float32)
    valid = jnp.ones(F, bool)

    def band_body(c):
        b = ex.band_pyramid(pyramid.build_pyramid_padded(c, 3))
        return c + jnp.sum(b.bands.reshape(-1)[::997]) * 1e-12

    scan_time(band_body, img0.astype(jnp.float32), reps, "pyramid+band (1 cam)")

    def extract_body(c):
        w, ry, rx = ex.extract_pyr(pyrA, 0, c, c + 7, ex.BAND_BW - ex.BAND_STRIDE)
        return jnp.clip(c + jnp.sum(w, axis=(1, 2)).astype(jnp.int32) % 5 - 2,
                        0, 400)

    scan_time(extract_body, jnp.ones((F,), jnp.int32), reps,
              f"banded extract ({F} wins)")

    def lk_body(c):
        pts, _ = lk.pyramidal_lk_banded(pyrA, pyrB, c, c, valid)
        return jnp.clip(pts, 20.0, 460.0)

    scan_time(lk_body, pts0, reps, f"LK ({F} pts)")

    def lk0_body(c):
        pts, _ = lk.pyramidal_lk_banded(pyrA, pyrB, c, c, valid, max_iter=0)
        return jnp.clip(pts + 0.01, 20.0, 460.0)

    scan_time(lk0_body, pts0, reps, f"LK ({F} pts, 0 iters)")

    def lk5_body(c):
        pts, _ = lk.pyramidal_lk_banded(pyrA, pyrB, c, c, valid, max_iter=5)
        return jnp.clip(pts, 20.0, 460.0)

    scan_time(lk5_body, pts0, reps, f"LK ({F} pts, 5 iters)")

    B2 = F + cfg.frontend.grid_num * cfg.frontend.grid_max_feature_num
    pts2 = jnp.asarray(rng.uniform([20, 20], [730, 460], (B2, 2)), jnp.float32)

    def stereo_body(c):
        p1, inl = stereo_match(pyrA, pyrB, c, jnp.ones(B2, bool), fparams, cfg)
        return jnp.clip(p1, 20.0, 460.0)

    scan_time(stereo_body, pts2, reps, f"stereo_match ({B2} pts)")

    # ---- frontend misc stages ----
    def det_body(c):
        pts, vals, arr, vmask = _detection_candidates(c, None, cfg, 5)
        return c + jnp.sum(pts) * 1e-12

    scan_time(det_body, img0.astype(jnp.float32), reps, "detect candidates")

    def mask_body(c):
        m = _detection_mask((H, W), c, jnp.ones(c.shape[0], bool))
        return c + jnp.sum(m.astype(jnp.float32)) * 1e-9

    scan_time(mask_body, pts0, reps, "detection mask")

    from uav_airvision_tpu.models.frontend.pipeline import _normalize_publish

    def pub_body(c):
        ids, uv, m = _normalize_publish(
            jnp.arange(F, dtype=jnp.int32), jnp.ones(F, jnp.int32), c, c,
            jnp.ones(F, bool), fparams, cfg)
        return jnp.clip(c + uv[:, :2] * 1e-9, 20.0, 460.0)

    scan_time(pub_body, pts0, reps, "normalize+publish")

    # ---- full frontend ----
    fe0 = init_frontend_state(cfg)
    fe_f = jax.jit(lambda st: frontend_step(st, img0, img1, jnp.zeros(3),
                                            jnp.asarray(0.05), fparams, cfg)[0])
    fe1 = jax.block_until_ready(fe_f(fe0))  # into tracking branch

    def fe_body(c):
        c2, _ = frontend_step(c, img0, img1, jnp.zeros(3), jnp.asarray(0.05),
                              fparams, cfg)
        return c2

    scan_time(fe_body, fe1, reps, "frontend_step")

    # ---- backend ----
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
            imu_a=jnp.asarray(rng.normal(0, 0.01, (I, 3)) + [0, 0, 9.8], jnp.float32),
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
    state = jax.block_until_ready(state)
    frame = mkframe(t + 0.05)

    # scan the same frame but advance the timestamp so dt stays sane
    def be_body(c):
        st, ts = c
        fr = frame._replace(
            timestamp=ts + 0.05,
            imu_t=jnp.where(frame.imu_mask, frame.imu_t - frame.timestamp + ts + 0.05, 0.0),
        )
        st2, _ = bstep.backend_step(st, fr, mparams, cfg)
        return (st2, ts + 0.05)

    scan_time(be_body, (state, frame.timestamp), reps, "backend_step")

    def prop_body(c):
        st, ts = c
        it = jnp.where(frame.imu_mask, frame.imu_t - frame.timestamp + ts + 0.05, 0.0)
        st2 = propagate(st, mparams, it, frame.imu_w, frame.imu_a, frame.imu_mask)
        return (st2, ts + 0.05)

    scan_time(prop_body, (state, frame.timestamp), reps, "  propagate")

    def propt_body(c):
        st, ts = c
        it = jnp.where(frame.imu_mask, frame.imu_t - frame.timestamp + ts + 0.05, 0.0)
        st2 = propagate_tiered(st, mparams, it, frame.imu_w, frame.imu_a,
                               frame.imu_mask)
        return (st2, ts + 0.05)

    scan_time(propt_body, (state, frame.timestamp), reps, "  propagate (tiered)")

    def rl_body(c):
        st, _, _, _ = bstep.remove_lost_features(c[0], mparams, cfg)
        return (st, c[1])

    scan_time(rl_body, (state, frame.timestamp), min(reps, 20), "  remove_lost")

    def pr_body(c):
        st, _ = bstep.prune_cam_states(c[0], mparams, cfg)
        return (st, c[1])

    scan_time(pr_body, (state, frame.timestamp), min(reps, 20), "  prune_cams")
