#!/usr/bin/env python
"""Close the gap between stage-profile sums and the real bench frame time.

Measures, at high reps to dilute the ~30 ms per-call tunnel overhead
(scripts/exp_op_floor.py):
  1. vio_step scanned on ONE fixed real frame (no per-frame array feed)
  2. vio_step scanned over the real stacked frame arrays (bench shape)
  3. frontend_step alone on the fixed real frame
  4. backend_step alone, fed the recorded frontend output
Usage: python scripts/exp_step_gap.py [n_frames] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timecall(f, *args, n=3):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n


if __name__ == "__main__":
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 600

    from bench import build_frames
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.vio import (init_vio_state, vio_step,
                                              run_sequence)
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import frontend_step
    from uav_airvision_tpu.models.msckf.state import make_params
    from uav_airvision_tpu.models.msckf import step as bstep
    from uav_airvision_tpu.utils.precision import with_highest_precision

    cfg = euroc_config()
    frames, pb, source = build_frames(cfg, n_frames)
    fparams = make_frontend_params(cfg)
    mparams = make_params(cfg)
    state0 = init_vio_state(cfg, pb.gyro_bias, pb.acc_mean, mparams)
    print(f"device: {jax.devices()[0]} frames={n_frames} reps={reps}", flush=True)

    # settle into steady state: run the first 60 frames once
    pre = jax.tree.map(lambda x: x[:60], frames)
    state, outs = run_sequence(cfg, pre, pb.gyro_bias, pb.acc_mean,
                               mparams=mparams, state=state0)
    jax.block_until_ready(state)
    frame1 = jax.tree.map(lambda x: x[60], frames)

    # 1. fixed-frame scan of the full step (timestamp advanced per iter so
    #    backend dt stays sane)
    @with_highest_precision
    @jax.jit
    def fixed_scan(st, fr):
        def body(c, k):
            s, ts = c
            f2 = fr._replace(
                timestamp=ts + 0.05,
                imu_t=jnp.where(fr.imu_mask, fr.imu_t - fr.timestamp + ts + 0.05, 0.0),
            )
            s2, _ = vio_step(s, f2, fparams, mparams, cfg)
            return (s2, ts + 0.05), None
        (s2, _), _ = lax.scan(body, (st, fr.timestamp), None, length=reps)
        return s2

    dt = timecall(fixed_scan, state, frame1)
    print(f"vio_step fixed-frame scan        {dt / reps * 1000:8.3f} ms/iter", flush=True)

    # 2. the real bench scan over stacked arrays (tail segment, steady state)
    seg = jax.tree.map(lambda x: x[60:], frames)
    nseg = int(seg.timestamp.shape[0])

    @with_highest_precision
    @jax.jit
    def bench_scan(st, fs):
        def body(c, fr):
            s2, out = vio_step(c, fr, fparams, mparams, cfg)
            return s2, out
        return lax.scan(body, st, fs)

    dt = timecall(lambda: bench_scan(state, seg))
    print(f"vio_step real scan ({nseg} frames)  {dt / nseg * 1000:8.3f} ms/iter", flush=True)

    # 2b. real scan WITHOUT stacked outputs (state only)
    @with_highest_precision
    @jax.jit
    def bench_scan_noout(st, fs):
        def body(c, fr):
            s2, out = vio_step(c, fr, fparams, mparams, cfg)
            return s2, None
        return lax.scan(body, st, fs)

    dt = timecall(lambda: bench_scan_noout(state, seg))
    print(f"vio_step real scan, no outputs   {dt / nseg * 1000:8.3f} ms/iter", flush=True)

    # 3. frontend only, fixed frame
    @with_highest_precision
    @jax.jit
    def fe_scan(st):
        def body(c, _):
            s2, out = frontend_step(c, frame1.cam0, frame1.cam1,
                                    frame1.fe_mean_w, frame1.fe_dt, fparams, cfg)
            return s2, None
        s2, _ = lax.scan(body, st, None, length=reps)
        return s2

    dt = timecall(fe_scan, state.frontend)
    print(f"frontend_step fixed-frame scan   {dt / reps * 1000:8.3f} ms/iter", flush=True)

    # 4. backend only, fed the frame-60 frontend output
    fe_state, fe_out = jax.jit(
        lambda s: frontend_step(s, frame1.cam0, frame1.cam1, frame1.fe_mean_w,
                                frame1.fe_dt, fparams, cfg))(state.frontend)
    bframe = bstep.FrameInput(
        timestamp=frame1.timestamp, imu_t=frame1.imu_t, imu_w=frame1.imu_w,
        imu_a=frame1.imu_a, imu_mask=frame1.imu_mask, feat_ids=fe_out.ids,
        feat_uv=fe_out.uv, feat_mask=fe_out.mask, active=frame1.active)

    @with_highest_precision
    @jax.jit
    def be_scan(st, fr):
        def body(c, _):
            s, ts = c
            f2 = fr._replace(
                timestamp=ts + 0.05,
                imu_t=jnp.where(fr.imu_mask, fr.imu_t - fr.timestamp + ts + 0.05, 0.0),
            )
            s2, _ = bstep.backend_step(s, f2, mparams, cfg)
            return (s2, ts + 0.05), None
        (s2, _), _ = lax.scan(body, (st, fr.timestamp), None, length=reps)
        return s2

    dt = timecall(be_scan, state.filter, bframe)
    print(f"backend_step fixed-frame scan    {dt / reps * 1000:8.3f} ms/iter", flush=True)
