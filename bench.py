"""Benchmark driver: stereo VIO frames/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Baseline context: the reference is paced at 0.4x real time on a 20 fps
dataset (~8 effective fps, BASELINE.md).  The driver target is >=500
stereo frames/sec/chip on EuRoC MH_01-like input.

Uses EuRoC data when available (EUROC_PATH env or ./datasets/MH_01_easy),
otherwise the built-in calibrated simulator renders an equivalent 20 fps /
200 Hz stereo+IMU sequence at the real 752x480 resolution.
"""

import json
import os
import sys
import time

import numpy as np


def build_frames(config, n_frames):
    import jax.numpy as jnp

    from uav_airvision_tpu.models.vio import VioFrame
    from uav_airvision_tpu.streaming.prebatch import prebatch_imu

    euroc = os.environ.get("EUROC_PATH")
    if not euroc:
        for cand in ("datasets/MH_01_easy", "/data/euroc/MH_01_easy"):
            if os.path.isdir(cand):
                euroc = cand
                break

    if euroc and os.path.isdir(euroc):
        from uav_airvision_tpu.streaming.dataset import EuRoCDataset
        from uav_airvision_tpu.streaming.prebatch import load_euroc_arrays

        ds = EuRoCDataset(euroc)
        ds.set_starttime(offset=10.0)
        fts, cam0, cam1, imu_t, imu_w, imu_a = load_euroc_arrays(ds)
        fts, cam0, cam1 = fts[:n_frames], cam0[:n_frames], cam1[:n_frames]
        source = os.path.basename(euroc)
    else:
        from uav_airvision_tpu.simulation.world import StereoWorld

        dur = n_frames / 20.0
        world = StereoWorld(config)
        imu_t, imu_w, imu_a = world.imu_stream(dur)
        fts = world.frame_times(dur)
        rng = np.random.default_rng(5)
        cam0, cam1 = [], []
        for t in fts:
            i0, i1 = world.render_frame(t, rng)
            cam0.append(i0)
            cam1.append(i1)
        cam0, cam1 = np.stack(cam0), np.stack(cam1)
        source = "synthetic(MH_01-like)"

    pb = prebatch_imu(fts, imu_t, imu_w, imu_a, config.capacity.max_imu_per_frame,
                      config.capacity.imu_init_msgs)
    frames = VioFrame(
        timestamp=jnp.asarray(pb.timestamps, jnp.float32),
        cam0=jnp.asarray(cam0),
        cam1=jnp.asarray(cam1),
        imu_t=jnp.asarray(pb.imu_t, jnp.float32),
        imu_w=jnp.asarray(pb.imu_w, jnp.float32),
        imu_a=jnp.asarray(pb.imu_a, jnp.float32),
        imu_mask=jnp.asarray(pb.imu_mask),
        fe_mean_w=jnp.asarray(pb.fe_mean_w, jnp.float32),
        fe_dt=jnp.asarray(pb.fe_dt, jnp.float32),
        active=jnp.asarray(pb.active),
    )
    return frames, pb, source


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "200"))
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    import jax

    # persistent compilation cache: the fused step is a large program and the
    # axon remote-compile path is slow; cache across bench invocations
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_uav"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.vio import init_vio_state, run_sequence
    from uav_airvision_tpu.models.msckf.state import make_params

    config = euroc_config()
    # experiment hook: BENCH_FRONTEND='{"lk_temporal_levels": 0}' overrides
    # frontend fields for A/B fps runs without editing config defaults
    if os.environ.get("BENCH_FRONTEND"):
        import dataclasses
        import json as _json
        over = _json.loads(os.environ["BENCH_FRONTEND"])
        config = dataclasses.replace(
            config, frontend=dataclasses.replace(config.frontend, **over))
    frames, pb, source = build_frames(config, n_frames)
    n = int(frames.timestamp.shape[0])

    mparams = make_params(config)
    state0 = init_vio_state(config, pb.gyro_bias, pb.acc_mean, mparams)

    # warmup / compile.  HARD sync via a value fetch: on the axon tunnel a
    # cold (compiling) call's block_until_ready returns immediately — only a
    # device_get actually waits — so blocking here would let the warmup leak
    # into the timed window (measured: block 0.003s vs fetch 251s cold;
    # warm blocks are fine).
    state, outs = run_sequence(config, frames, pb.gyro_bias, pb.acc_mean,
                               mparams=mparams, state=state0, unroll=unroll)
    np.asarray(outs.p[-1])

    # timed run (warm: block_until_ready is reliable here)
    t0 = time.time()
    state, outs = run_sequence(config, frames, pb.gyro_bias, pb.acc_mean,
                               mparams=mparams, state=state0, unroll=unroll)
    outs.p.block_until_ready()
    wall = time.time() - t0
    fps = n / wall

    # Fastest measured flat-out rate of the NumPy/OpenCV reference on this
    # machine's CPU (reports/parity_report.json, small-frame case) — NOT the
    # 8 fps paced-playback rate, which would flatter the ratio.
    baseline_fps = 21.5
    print(json.dumps({
        "metric": f"stereo VIO frames/sec/chip ({source}, {n} frames, "
                  f"{jax.devices()[0].platform})",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
