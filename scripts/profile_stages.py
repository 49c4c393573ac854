#!/usr/bin/env python
"""Per-stage device timing: frontend vs backend vs sub-stages.

Run on the target device (TPU or CPU) to find the per-frame hot spots:

    python scripts/profile_stages.py [n_reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000  # ms


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import (
        frontend_step, init_frontend_state,
    )
    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf import step as bstep
    from uav_airvision_tpu.models.msckf.propagation import propagate
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

    print(f"device: {jax.devices()[0]}")

    # ---- front-end pieces ----
    pyr_f = with_highest_precision(
        jax.jit(lambda im: tuple(pyramid.build_pyramid_padded(im, 3)))
    )
    print(f"pyramid+derivs      {timeit(pyr_f, img0, reps=reps):8.3f} ms")

    pyrA = pyr_f(img0)
    pyrB = pyr_f(img1)
    pts = jnp.asarray(rng.uniform([20, 20], [730, 460], (cap.max_features, 2)),
                      jnp.float32)
    valid = jnp.ones(cap.max_features, bool)
    lk_f = with_highest_precision(jax.jit(
        lambda a, b, p, v: lk.pyramidal_lk(a, b, p, p, v)
    ))
    print(f"LK (128 pts, 4 lvl) {timeit(lk_f, pyrA, pyrB, pts, valid, reps=reps):8.3f} ms")

    fast_f = with_highest_precision(jax.jit(lambda im: fast.detect_fast(im, 15)))
    print(f"FAST + NMS          {timeit(fast_f, img0, reps=reps):8.3f} ms")

    fe_state = init_frontend_state(cfg)
    fe_f = with_highest_precision(jax.jit(
        lambda st, a, b: frontend_step(st, a, b, jnp.zeros(3), jnp.asarray(0.05),
                                       fparams, cfg)
    ))
    fe_state, _ = fe_f(fe_state, img0, img1)  # initialize -> tracking branch
    print(f"frontend_step       {timeit(fe_f, fe_state, img0, img1, reps=reps):8.3f} ms")

    # ---- back-end ----
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

    be_f = with_highest_precision(jax.jit(
        lambda st, fr: bstep.backend_step(st, fr, mparams, cfg)
    ))
    # warm the window to steady state (prune active)
    t = 0.0
    for k in range(25):
        t += 0.05
        state, _ = be_f(state, mkframe(t))
    frame = mkframe(t + 0.05)
    print(f"backend_step        {timeit(be_f, state, frame, reps=reps):8.3f} ms")

    prop_f = with_highest_precision(jax.jit(
        lambda st, fr: propagate(st, mparams, fr.imu_t, fr.imu_w, fr.imu_a,
                                 fr.imu_mask)
    ))
    print(f"  propagate         {timeit(prop_f, state, frame, reps=reps):8.3f} ms")

    rl_f = with_highest_precision(jax.jit(
        lambda st: bstep.remove_lost_features(st, mparams, cfg)
    ))
    print(f"  remove_lost       {timeit(rl_f, state, reps=reps):8.3f} ms")

    pr_f = with_highest_precision(jax.jit(
        lambda st: bstep.prune_cam_states(st, mparams, cfg)
    ))
    print(f"  prune_cams        {timeit(pr_f, state, reps=reps):8.3f} ms")
