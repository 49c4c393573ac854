#!/usr/bin/env python
"""Backend sub-stage profile: where backend_step's per-frame time goes.

Each sub-stage runs in its own lax.scan over a CONSTANT steady-state filter
state (captured after a realistic warmup with rotating track ids), with a
carry-dependent perturbation threaded through one input leaf so XLA cannot
hoist the loop-invariant stage out of the scan.  Usage: be_profile.py [reps]
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


def scan_time(body, reps, label):
    def scanned(c):
        out, _ = lax.scan(lambda c, _: (body(c), None), c, None, length=reps)
        return out

    f = jax.jit(scanned)
    c0 = jnp.zeros((), jnp.float32)
    out = f(c0)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    out = f(c0)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:28s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf import step as bstep
    from uav_airvision_tpu.models.msckf.propagation import propagate_tiered

    cfg = euroc_config()
    mparams = make_params(cfg)
    cap = cfg.capacity
    K, I = cap.max_features, cap.max_imu_per_frame
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}   reps={reps}", flush=True)

    nf, nimu = 100, 10

    def mkframe(t, step_i):
        imu_t = np.zeros(I)
        imu_t[:nimu] = t - 0.05 + np.arange(1, nimu + 1) * 0.005
        ids = np.full(K, -1, np.int32)
        ids[:nf] = np.arange(nf) + step_i * 5  # 5 tracks lost/new per frame
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

    # warmup to steady state: full window, prune active, tracks rotating
    state = init_state(cfg, mparams, np.zeros(3), np.array([0.05, 0.02, 9.8]))
    be_f = jax.jit(lambda st, fr: bstep.backend_step(st, fr, mparams, cfg)[0])
    t = 0.0
    for k in range(30):
        t += 0.05
        state = be_f(state, mkframe(t, k))
    jax.device_get(state.imu.p.ravel()[:1])
    frame = mkframe(t + 0.05, 30)

    # frozen intermediate states for each stage's input
    @jax.jit
    def intermediates(state, frame):
        imu = state.imu._replace(timestamp=jnp.where(
            state.started, state.imu.timestamp, frame.timestamp))
        s0 = state._replace(imu=imu, started=jnp.ones((), bool))
        s1 = propagate_tiered(s0, mparams, frame.imu_t, frame.imu_w,
                              frame.imu_a, frame.imu_mask)
        s2 = bstep.augment_state(s1, frame.timestamp)
        s3 = bstep.add_observations(s2, frame.feat_ids, frame.feat_uv,
                                    frame.feat_mask)
        s4, _, _, _ = bstep.remove_lost_features(s3, mparams, cfg)
        return s0, s1, s2, s3, s4

    s0, s1, s2, s3, s4 = jax.block_until_ready(intermediates(state, frame))
    n_lost = int(jax.device_get(bstep._count_lost_candidates(s3)))
    print(f"steady state: cams={int(s3.cams.count)} "
          f"feats={int(np.asarray(jnp.sum(s3.features.valid)))} "
          f"lost_cand={n_lost}", flush=True)

    def token(s):
        return jnp.sum(s.imu.p) * 1e-20

    scan_time(lambda c: token(propagate_tiered(
        s0, mparams, frame.imu_t + c * 1e-30, frame.imu_w, frame.imu_a,
        frame.imu_mask)) + c, reps, "propagate_tiered")

    scan_time(lambda c: token(bstep.augment_state(
        s1, frame.timestamp + c * 1e-30)) + c, reps, "augment_state")

    scan_time(lambda c: token(bstep.add_observations(
        s2, frame.feat_ids, frame.feat_uv + c * 1e-30, frame.feat_mask)) + c,
        reps, "add_observations")

    scan_time(lambda c: token(bstep.remove_lost_features(
        s3._replace(cov=s3.cov + c * 1e-30), mparams, cfg)[0]) + c,
        reps, "remove_lost_features")

    # time the prune on whichever frozen state actually triggers it
    for cand, nm in ((s4, "s4"), (s3, "s3"), (s2, "s2")):
        trig, n_two = jax.device_get(bstep._prune_trigger_count(cand, cfg))
        if trig:
            print(f"prune stage input: {nm} (n_two={int(n_two)})", flush=True)
            scan_time(lambda c: token(bstep.prune_cam_states(
                cand._replace(cov=cand.cov + c * 1e-30), mparams, cfg)[0]) + c,
                reps, "prune_cam_states (fires)")
            break
    else:
        print("prune: no frozen state triggers (count < 20)", flush=True)

    scan_time(lambda c: token(bstep.prune_cam_states(
        s4._replace(cov=s4.cov + c * 1e-30), mparams, cfg)[0]) + c,
        reps, "prune_cam_states")

    scan_time(lambda c: token(bstep.online_reset(
        s4._replace(cov=s4.cov + c * 1e-30), mparams, cfg)[0]) + c,
        reps, "online_reset")

    # ---- remove_lost sub-stages (small tier shapes, L=16) -----------------
    from uav_airvision_tpu.models.msckf.update import (apply_update,
                                                       feature_block,
                                                       gating_test_batch)
    from uav_airvision_tpu.ops.gridops import smallest_k_indices

    L = 16
    table = s3.features
    cams = s3.cams
    M = table.fid.shape[0]
    N = table.obs_mask.shape[1]
    D = cap.state_dim
    cslot = cams.count - 1
    seen_now = np.asarray(table.obs_mask)[:, int(cslot)]
    obs_count = np.asarray(jnp.sum(table.obs_mask.astype(jnp.int32), axis=1))
    cand = np.asarray(table.valid) & ~seen_now & (obs_count >= 3)
    sel = jnp.asarray(np.argsort(np.where(cand, np.asarray(table.seq),
                                          2**31 - 1))[:L])
    sel_mask = jnp.asarray(cand)[sel]

    def tri_body(c):
        mo, pos, ok = jax.vmap(
            lambda slot, act: bstep._triangulate_one(
                s3._replace(cov=s3.cov + c * 1e-30), mparams, cfg, slot,
                table.obs_mask[slot], act)
        )(sel, sel_mask)
        return c + jnp.sum(pos) * 1e-20

    scan_time(tri_body, reps, f"  triangulate x{L}")

    def blocks_body(c):
        H_blk, r_blk, rows_f = jax.vmap(
            lambda slot: feature_block(
                cams.q, cams.p, cams.q_null, cams.p_null,
                table.obs[slot], table.obs_mask[slot],
                table.position[slot] + c * 1e-30,
                s3.gravity, mparams.R_cam0_cam1, mparams.t_cam0_cam1, D)
        )(sel)
        return c + jnp.sum(r_blk) * 1e-20

    scan_time(blocks_body, reps, f"  feature_block x{L}")

    H_blk, r_blk, rows_f = jax.vmap(
        lambda slot: feature_block(
            cams.q, cams.p, cams.q_null, cams.p_null,
            table.obs[slot], table.obs_mask[slot], table.position[slot],
            s3.gravity, mparams.R_cam0_cam1, mparams.t_cam0_cam1, D)
    )(sel)
    H_blk = jax.block_until_ready(H_blk)
    dof = jnp.sum(table.obs_mask[sel].astype(jnp.int32), axis=1) - 1

    def gate_body(c):
        ok = gating_test_batch(H_blk + c * 1e-30, r_blk, rows_f, s3.cov,
                               mparams.obs_noise, mparams.chi2_table, dof)
        return c + jnp.sum(ok.astype(jnp.float32)) * 1e-20

    scan_time(gate_body, reps, f"  gating x{L}")

    R_BUF = cap.max_update_rows
    H_buf = jnp.zeros((R_BUF, D), s3.cov.dtype).at[:77].set(H_blk[0])
    r_buf = jnp.zeros((R_BUF,), s3.cov.dtype).at[:77].set(r_blk[0])

    def gain_body(c):
        st, warn = apply_update(s3._replace(cov=s3.cov + c * 1e-30), mparams,
                                H_buf, r_buf, jnp.asarray(77, jnp.int32))
        return c + jnp.sum(st.imu.p) * 1e-20

    scan_time(gain_body, reps, "  apply_update (77 rows, t1)")
