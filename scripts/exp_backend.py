#!/usr/bin/env python
"""Backend stage cost anatomy (scan-amortized): where backend_step's
~1 ms/frame goes in steady state — propagation (padded vs tiered), the
augment/add bookkeeping, the small-tier gating test, the T1 update's
(144,144) Cholesky, and LM triangulation.  Usage:
    python scripts/exp_backend.py [reps]
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
    print(f"{label:36s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.msckf import step as bstep
    from uav_airvision_tpu.models.msckf import triangulation as tri
    from uav_airvision_tpu.models.msckf.propagation import (
        PROP_TIER, propagate, propagate_tiered)
    from uav_airvision_tpu.models.msckf.state import init_state, make_params
    from uav_airvision_tpu.models.msckf.update import (
        apply_update, gating_test_batch, update_tiers)

    cfg = euroc_config()
    mparams = make_params(cfg)
    cap = cfg.capacity
    D = cap.state_dim
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}   reps={reps}   D={D}", flush=True)

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
    state = jax.block_until_ready(state)
    frame = mkframe(t + 0.05)

    # ---- propagation: padded-64 vs tiered-16 ------------------------------
    def prop_body(c):
        st, ts = c
        it = jnp.where(frame.imu_mask, frame.imu_t - frame.timestamp + ts + 0.05, 0.0)
        st2 = propagate(st, mparams, it, frame.imu_w, frame.imu_a, frame.imu_mask)
        return (st2, ts + 0.05)

    def propt_body(c):
        st, ts = c
        it = jnp.where(frame.imu_mask, frame.imu_t - frame.timestamp + ts + 0.05, 0.0)
        st2 = propagate_tiered(st, mparams, it, frame.imu_w, frame.imu_a,
                               frame.imu_mask)
        return (st2, ts + 0.05)

    scan_time(prop_body, (state, frame.timestamp), reps, "propagate (full 64)")
    scan_time(propt_body, (state, frame.timestamp), reps,
              f"propagate (tiered {PROP_TIER})")

    # ---- augmentation + observation upsert --------------------------------
    def aug_body(c):
        st = bstep.augment_state(c, frame.timestamp)
        # keep window bounded: drop the newest cam again
        return st._replace(cams=st.cams._replace(count=c.cams.count),
                           cov=st.cov)

    scan_time(aug_body, state, reps, "augment_state")

    def obs_body(c):
        st = bstep.add_observations(c, frame.feat_ids, frame.feat_uv,
                                    frame.feat_mask)
        return st._replace(features=c.features)  # don't accumulate

    scan_time(obs_body, state, reps, "add_observations")

    # ---- update tiers ------------------------------------------------------
    T1, T2 = update_tiers(D)
    H1 = jnp.asarray(rng.normal(0, 0.1, (cap.max_update_rows, D)), jnp.float32)
    r1 = jnp.asarray(rng.normal(0, 0.01, (cap.max_update_rows,)), jnp.float32)

    def upd_body(tier):
        def body(c):
            st, x = c
            st2, _ = apply_update(st, mparams, H1 * x, r1 * x,
                                  rows_true=jnp.asarray(40, jnp.int32),
                                  static_tier=tier)
            return (st2._replace(cov=st.cov, imu=st.imu, cams=st.cams),
                    x * 1.0000001)
        return body

    scan_time(upd_body("t1"), (state, jnp.float32(1.0)), reps,
              f"apply_update tier1 ({T1} rows)")
    scan_time(upd_body("t2"), (state, jnp.float32(1.0)), min(reps, 50),
              f"apply_update tier2 ({T2} rows)")

    # ---- gating ------------------------------------------------------------
    B = 16
    Hg = jnp.asarray(rng.normal(0, 0.1, (B, 77, D)), jnp.float32)
    rg = jnp.asarray(rng.normal(0, 0.01, (B, 77)), jnp.float32)
    rows = jnp.full((B,), 13, jnp.int32)
    dof = jnp.full((B,), 16, jnp.int32)

    def gate_body(c):
        ok = gating_test_batch(Hg * c, rg, rows, state.cov, mparams.obs_noise,
                               mparams.chi2_table, dof, static_tier="small")
        return c + jnp.sum(ok.astype(jnp.float32)) * 1e-9

    scan_time(gate_body, jnp.float32(1.0), reps, f"gating small tier (B={B})")

    # ---- triangulation (batch of 16 like the small remove_lost tier) ------
    cams = state.cams
    obs = state.features.obs[:16]
    obs_mask = state.features.obs_mask[:16]

    def tri_body(c):
        views = jax.vmap(lambda o, m: tri.build_views(
            cams.q, cams.p, o, m, mparams.R_cam0_cam1, mparams.t_cam0_cam1)
        )(obs * (1.0 + c * 1e-9), obs_mask)
        pos, ok = jax.vmap(lambda v: tri.triangulate(
            v, cfg.triangulation, active=jnp.asarray(True)))(views)
        return c + jnp.sum(pos) * 1e-12

    scan_time(tri_body, jnp.float32(1.0), reps, "triangulate batch 16")

    # ---- whole backend step ------------------------------------------------
    def be_body(c):
        st, ts = c
        fr = frame._replace(
            timestamp=ts + 0.05,
            imu_t=jnp.where(frame.imu_mask,
                            frame.imu_t - frame.timestamp + ts + 0.05, 0.0),
        )
        st2, _ = bstep.backend_step(st, fr, mparams, cfg)
        return (st2, ts + 0.05)

    scan_time(be_body, (state, frame.timestamp), reps, "backend_step")
