#!/usr/bin/env python
"""Where does the fleet vmap overhead come from?  Measures frontend_step and
backend_step plain vs vmap(B=1) vs vmap(B=8), scan-amortized."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def scan_time(fn, carry, reps, label):
    def scanned(c):
        def body(c, _):
            return fn(c), None
        out, _ = lax.scan(body, c, None, length=reps)
        return out
    f = jax.jit(scanned)
    out = jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    jax.block_until_ready(f(carry))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:36s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import (
        frontend_step, init_frontend_state)
    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf import step as bstep

    cfg = euroc_config()
    fparams = make_frontend_params(cfg)
    mparams = make_params(cfg)
    cap = cfg.capacity
    rng = np.random.default_rng(0)
    H, W = 480, 752
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    img1 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    print(f"device: {jax.devices()[0]} reps={reps}")

    fe0 = init_frontend_state(cfg)
    fe_f = jax.jit(lambda st: frontend_step(st, img0, img1, jnp.zeros(3),
                                            jnp.asarray(0.05), fparams, cfg)[0])
    fe1 = jax.block_until_ready(fe_f(fe0))

    def fe_body(c):
        c2, _ = frontend_step(c, img0, img1, jnp.zeros(3), jnp.asarray(0.05),
                              fparams, cfg)
        return c2

    scan_time(fe_body, fe1, reps, "frontend plain")

    for B in (1, 8):
        feB = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), fe1)
        imgs0 = jnp.broadcast_to(img0[None], (B, H, W)).copy()
        imgs1 = jnp.broadcast_to(img1[None], (B, H, W)).copy()

        def fe_bodyB(c):
            c2, _ = jax.vmap(
                lambda st, a, b: frontend_step(st, a, b, jnp.zeros(3),
                                               jnp.asarray(0.05), fparams, cfg)
            )(c, imgs0, imgs1)
            return c2

        scan_time(fe_bodyB, feB, reps, f"frontend vmap B={B}")

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

    def be_body(c):
        st, ts = c
        fr = frame._replace(
            timestamp=ts + 0.05,
            imu_t=jnp.where(frame.imu_mask, frame.imu_t - frame.timestamp + ts + 0.05, 0.0),
        )
        st2, _ = bstep.backend_step(st, fr, mparams, cfg)
        return (st2, ts + 0.05)

    scan_time(be_body, (state, frame.timestamp), reps, "backend plain")

    for B in (1, 8):
        stB = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), state)
        frB = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), frame)

        def be_bodyB(c):
            st, ts = c
            fr = jax.tree.map(lambda x: x, frB)._replace(
                timestamp=frB.timestamp + ts + 0.05 - frame.timestamp,
                imu_t=jnp.where(frB.imu_mask,
                                frB.imu_t - frame.timestamp + ts + 0.05, 0.0),
            )
            st2, _ = jax.vmap(
                lambda s, f: bstep.backend_step(s, f, mparams, cfg)
            )(st, fr)
            return (st2, ts + 0.05)

        scan_time(be_bodyB, (stB, frame.timestamp), reps, f"backend vmap B={B}")
