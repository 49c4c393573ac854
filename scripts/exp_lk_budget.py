#!/usr/bin/env python
"""LK iteration-budget / stereo-seeding experiments: fps + ATE per variant
on the bench synthetic world.

Variants: reference-semantics stereo (unseeded full pyramid), the
disparity-seeded fast path (1 and 2 forward levels), and reduced
lk_max_iteration caps.  Usage: python scripts/exp_lk_budget.py [frames]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.evaluation.metrics import ate
from uav_airvision_tpu.models.vio import VioFrame, run_sequence
from uav_airvision_tpu.simulation.world import StereoWorld
from uav_airvision_tpu.streaming.prebatch import prebatch_imu


def build(base_cfg, n_frames):
    import jax.numpy as jnp

    world = StereoWorld(base_cfg)
    dur = n_frames / 20.0
    imu_t, imu_w, imu_a = world.imu_stream(dur)
    fts = world.frame_times(dur)
    rng = np.random.default_rng(5)
    imgs = [world.render_frame(t, rng) for t in fts]
    pb = prebatch_imu(fts, imu_t, imu_w, imu_a,
                      base_cfg.capacity.max_imu_per_frame,
                      base_cfg.capacity.imu_init_msgs)
    frames = VioFrame(
        timestamp=jnp.asarray(pb.timestamps, jnp.float32),
        cam0=jnp.asarray(np.stack([i[0] for i in imgs])),
        cam1=jnp.asarray(np.stack([i[1] for i in imgs])),
        imu_t=jnp.asarray(pb.imu_t, jnp.float32),
        imu_w=jnp.asarray(pb.imu_w, jnp.float32),
        imu_a=jnp.asarray(pb.imu_a, jnp.float32),
        imu_mask=jnp.asarray(pb.imu_mask),
        fe_mean_w=jnp.asarray(pb.fe_mean_w, jnp.float32),
        fe_dt=jnp.asarray(pb.fe_dt, jnp.float32),
        active=jnp.asarray(pb.active),
    )
    return world, frames, pb, fts


def run_variant(label, cfg, frames, pb, fts, world):
    t0 = time.time()
    state, outs = run_sequence(cfg, frames, pb.gyro_bias, pb.acc_mean)
    # HARD sync: cold block_until_ready returns early on axon; fetch
    np.asarray(outs.p[-1])
    compile_s = time.time() - t0
    t0 = time.time()
    state, outs = run_sequence(cfg, frames, pb.gyro_bias, pb.acc_mean)
    jax.block_until_ready(outs.p)
    run_s = time.time() - t0
    act = np.asarray(outs.active)
    ts = pb.time_base + np.asarray(outs.timestamp, np.float64)[act]
    p = np.asarray(outs.p)[act]
    a = ate(ts, p, fts, world.groundtruth(fts))
    print(f"{label:34s} ATE rmse={a['rmse']:.5f}m "
          f"fps={act.sum() / run_s:7.1f} (run {run_s:.2f}s, compile {compile_s:.0f}s)",
          flush=True)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    base = euroc_config()
    world, frames, pb, fts = build(base, n_frames)
    print(f"frames={n_frames} device={jax.devices()[0]}", flush=True)

    def fe(cfg, **kw):
        return dataclasses.replace(cfg, frontend=dataclasses.replace(cfg.frontend, **kw))

    variants = [
        ("baseline (r4 defaults)", base),
        ("temporal 3 levels", fe(base, lk_temporal_levels=3)),
        ("temporal 2 levels", fe(base, lk_temporal_levels=2)),
        ("lk_max_iteration 8", fe(base, lk_max_iteration=8)),
        ("upper iters 4", fe(base, lk_max_iteration_upper=4)),
        ("t2 + iter8 + up4", fe(base, lk_temporal_levels=2,
                                lk_max_iteration=8,
                                lk_max_iteration_upper=4)),
    ]
    for label, cfg in variants:
        run_variant(label, cfg, frames, pb, fts, world)


if __name__ == "__main__":
    main()
