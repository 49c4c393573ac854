#!/usr/bin/env python
"""Micro-profile LK internals + backend update internals on the device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


if __name__ == "__main__":
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.ops import pyramid, lk
    from uav_airvision_tpu.utils.precision import with_highest_precision

    cfg = euroc_config()
    cap = cfg.capacity
    rng = np.random.default_rng(0)
    H, W = 480, 752
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    img1 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]}")

    pyr_f = with_highest_precision(
        jax.jit(lambda im: tuple(pyramid.build_pyramid_with_derivs(im, 3)))
    )
    pyrA = jax.block_until_ready(pyr_f(img0))
    pyrB = jax.block_until_ready(pyr_f(img1))
    F = cap.max_features
    pts = jnp.asarray(rng.uniform([20, 20], [730, 460], (F, 2)), jnp.float32)
    valid = jnp.ones(F, bool)

    for iters in (0, 1, 5, 30):
        f = with_highest_precision(jax.jit(
            lambda a, b, p, v, n=iters: lk.pyramidal_lk(a, b, p, p, v, max_iter=n)
        ))
        print(f"LK max_iter={iters:2d}     {timeit(f, pyrA, pyrB, pts, valid):8.3f} ms")

    # template extraction alone (one level)
    def templates(pyr, p):
        img, ix, iy = pyr[0]
        corner = p - 7.0 + pyramid.LK_PAD
        f = jax.vmap(lambda c: lk._bilinear_patch(img, c, 15))
        return f(corner), f(corner), f(corner)

    tf = with_highest_precision(jax.jit(templates))
    print(f"templates x3 (1 lvl) {timeit(tf, pyrA, pts):8.3f} ms")

    def windows_only(pyr, p):
        img = pyr[0][0]
        WIN = 36
        HP, WP = img.shape
        oy = jnp.clip(p[:, 1].astype(jnp.int32), 0, HP - WIN)
        ox = jnp.clip(p[:, 0].astype(jnp.int32), 0, WP - WIN)
        return jax.vmap(lambda y, x: jax.lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy, ox)

    wf = with_highest_precision(jax.jit(windows_only))
    print(f"windows (1 lvl)      {timeit(wf, pyrA, pts):8.3f} ms")

    # backend: apply_update QR profile
    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf.update import apply_update, feature_block
    from uav_airvision_tpu.models.msckf import triangulation as tri

    mparams = make_params(cfg)
    state = init_state(cfg, mparams, np.zeros(3), np.array([0.05, 0.02, 9.8]))
    D = cap.state_dim
    Hbuf = jnp.asarray(rng.normal(0, 1, (cap.max_update_rows, D)), jnp.float32)
    rbuf = jnp.asarray(rng.normal(0, 1, (cap.max_update_rows,)), jnp.float32)
    au = with_highest_precision(jax.jit(
        lambda s, h, r: apply_update(s, mparams, h, r)))
    print(f"apply_update (1680)  {timeit(au, state, Hbuf, rbuf):8.3f} ms")

    qr_f = with_highest_precision(jax.jit(lambda h: jnp.linalg.qr(h, mode="reduced")))
    print(f"  thin QR 1680x141   {timeit(qr_f, Hbuf):8.3f} ms")
    Hs = Hbuf[:424]
    print(f"  thin QR 424x141    {timeit(qr_f, Hs):8.3f} ms")

    # feature_block vmapped (as remove_lost does)
    N = cap.max_cam_states
    L = cap.max_lost_per_frame
    cams_q = jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (N, 1))
    cams_p = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
    obs = jnp.asarray(rng.normal(0, 0.2, (L, N, 4)), jnp.float32)
    obs_mask = jnp.ones((L, N), bool)
    p_w = jnp.asarray(rng.normal(0, 1, (L, 3)) + np.array([0, 0, 5.0]), jnp.float32)
    grav = jnp.array([0, 0, -9.81], jnp.float32)

    fb = with_highest_precision(jax.jit(jax.vmap(
        lambda o, om, pw: feature_block(
            cams_q, cams_p, cams_q, cams_p, o, om, pw,
            grav, mparams.R_cam0_cam1, mparams.t_cam0_cam1, D,
        ))))
    print(f"feature_block x{L}   {timeit(fb, obs, obs_mask, p_w):8.3f} ms")

    # triangulation vmapped
    def tri_one(o, om):
        views = tri.build_views(cams_q, cams_p, o, om,
                                mparams.R_cam0_cam1, mparams.t_cam0_cam1)
        return tri.triangulate(views, cfg.triangulation)

    tf2 = with_highest_precision(jax.jit(jax.vmap(tri_one)))
    print(f"triangulate x{L}     {timeit(tf2, obs, obs_mask):8.3f} ms")
