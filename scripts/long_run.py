#!/usr/bin/env python
"""Long-horizon stability run: a 10-minute (default) easy-preset world in
one continuous filter session, processed in chunks so neither host RAM nor
HBM ever holds more than ``--chunk`` seconds of images (12k+ frames of
752x480 stereo would be ~10 GB monolithic).

Float32 filters show their cracks late: this watches, per chunk,
  * online reset count (StepOutput.did_reset),
  * max position std (sqrt of cov[12:15] diagonal) at chunk boundaries,
  * covariance symmetry error + finiteness,
and reports final ATE/RTE over the whole trajectory (VERDICT r4 #7).

State carries across chunks exactly (same compiled scan, same carry), so
the result is bit-identical to a monolithic run — chunking only moves the
host->device image upload boundary.

    python scripts/long_run.py [duration_s] [--preset easy] [--chunk 30]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    args = sys.argv[1:]
    duration = float(args[0]) if args and not args[0].startswith("-") else 600.0
    preset = args[args.index("--preset") + 1] if "--preset" in args else "easy"
    chunk_s = float(args[args.index("--chunk") + 1]) if "--chunk" in args else 30.0
    seed = 7

    import jax
    import jax.numpy as jnp

    from uav_airvision_tpu.config import long_horizon_config
    from uav_airvision_tpu.evaluation.metrics import ate, rte
    from uav_airvision_tpu.models.vio import VioFrame, run_sequence
    from uav_airvision_tpu.simulation.world import (
        EUROC_MOTION_PRESETS, StereoWorld, Trajectory6DoF)
    from uav_airvision_tpu.streaming.prebatch import prebatch_imu

    config = long_horizon_config()
    world = StereoWorld(config, seed=seed,
                        trajectory=Trajectory6DoF(**EUROC_MOTION_PRESETS[preset]),
                        scene="layered", photometric=True)
    imu_t, imu_w, imu_a = world.imu_stream(duration, seed=seed)
    fts = world.frame_times(duration)
    T = len(fts)
    pb = prebatch_imu(fts, imu_t, imu_w, imu_a,
                      config.capacity.max_imu_per_frame,
                      config.capacity.imu_init_msgs)
    per = int(round(chunk_s * 20))  # 20 fps frame clock
    print(f"[long_run] {preset} {duration:.0f}s = {T} frames, "
          f"chunks of {per} frames", flush=True)

    rng = np.random.default_rng(seed)
    state = None
    all_p, all_q, all_t, all_act = [], [], [], []
    n_resets = 0
    max_pos_std = 0.0
    t0 = time.time()
    for k0 in range(0, T, per):
        k1 = min(k0 + per, T)
        imgs = [world.render_frame(t, rng) for t in fts[k0:k1]]
        frames = VioFrame(
            timestamp=jnp.asarray(pb.timestamps[k0:k1], jnp.float32),
            cam0=jnp.asarray(np.stack([i[0] for i in imgs])),
            cam1=jnp.asarray(np.stack([i[1] for i in imgs])),
            imu_t=jnp.asarray(pb.imu_t[k0:k1], jnp.float32),
            imu_w=jnp.asarray(pb.imu_w[k0:k1], jnp.float32),
            imu_a=jnp.asarray(pb.imu_a[k0:k1], jnp.float32),
            imu_mask=jnp.asarray(pb.imu_mask[k0:k1]),
            fe_mean_w=jnp.asarray(pb.fe_mean_w[k0:k1], jnp.float32),
            fe_dt=jnp.asarray(pb.fe_dt[k0:k1], jnp.float32),
            active=jnp.asarray(pb.active[k0:k1]),
        )
        del imgs
        state, outs = run_sequence(config, frames, pb.gyro_bias, pb.acc_mean,
                                   state=state)
        act = np.asarray(outs.active)
        all_p.append(np.asarray(outs.p))
        all_q.append(np.asarray(outs.q))
        all_t.append(np.asarray(outs.timestamp, np.float64))
        all_act.append(act)
        n_resets += int(np.asarray(outs.did_reset)[act].sum())

        cov = np.asarray(state.filter.cov)
        assert np.isfinite(cov).all(), f"cov non-finite at frame {k1}"
        pos_std = float(np.sqrt(np.max(np.diag(cov)[12:15])))
        max_pos_std = max(max_pos_std, pos_std)
        sym_err = float(np.max(np.abs(cov - cov.T)))
        el = time.time() - t0
        print(f"  [{k1:6d}/{T}] t={fts[k1-1]-fts[0]:6.1f}s "
              f"pos_std={pos_std:.4f}m max={max_pos_std:.4f} "
              f"resets={n_resets} sym_err={sym_err:.2e} "
              f"({(k1)/el:.0f} fps incl. render)", flush=True)

    p = np.concatenate(all_p)
    act = np.concatenate(all_act)
    ts_abs = pb.time_base + np.concatenate(all_t)
    gt_p = world.groundtruth(fts)
    a = ate(ts_abs[act], p[act], fts, gt_p)
    r = rte(ts_abs[act], p[act], fts, gt_p)
    path_len = float(np.sum(np.linalg.norm(np.diff(gt_p, axis=0), axis=1)))
    result = {
        "preset": preset, "duration_s": duration, "frames": T,
        "poses": int(act.sum()),
        "ate_rmse_m": round(a["rmse"], 5), "rte_rmse_m": round(r["rmse"], 5),
        "path_len_m": round(path_len, 1),
        "online_resets": n_resets,
        "max_pos_std_m": round(max_pos_std, 5),
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs("reports", exist_ok=True)
    out = f"reports/long_run_{preset}_{int(duration)}s.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
