#!/usr/bin/env python
"""Attribute the streaming (real-time API) throughput ceiling.

The batch scan does ~470 frames/s on-device, but the threaded streaming path
tops out near ~55 poses/s.  This measures the three candidate costs of the
per-frame streaming round trip on the SAME fused step the streaming path
uses (donated state, packed two-transfer inputs, packed (24,) output):

  1. submit-only rate: host keeps one step in flight, never fetches —
     bounds the dispatch+transfer cost of host->device per frame.
  2. fetch-every-frame rate: device_get of the packed output each frame —
     the publisher's drain pattern; adds one device->host round trip.
  3. pure round-trip: device_get of a tiny ready buffer in a tight loop —
     the tunnel's floor latency, no compute.

If (3) ~= (2) ~= the measured streaming ceiling, the ceiling is tunnel
round-trip latency, not the step.  Usage: exp_stream_latency.py [frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_uav"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.models.frontend.params import make_frontend_params
from uav_airvision_tpu.models.msckf.state import make_params
from uav_airvision_tpu.models.vio import init_vio_state, unpack_frame, vio_step
from uav_airvision_tpu.utils.precision import with_highest_precision
from uav_airvision_tpu.vio import _pack_frame, _pack_out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    cfg = euroc_config()
    fparams = make_frontend_params(cfg)
    mparams = make_params(cfg)
    I = cfg.capacity.max_imu_per_frame
    h, w = cfg.calib.cam0_resolution[1], cfg.calib.cam0_resolution[0]
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  frames={n}", flush=True)

    def _packed_step(st, imgs, packed):
        frame = unpack_frame(imgs, packed, I)
        st, out = vio_step(st, frame, fparams, mparams, cfg)
        return st, _pack_out(out)

    step = with_highest_precision(jax.jit(_packed_step, donate_argnums=(0,)))

    def host_frame(k):
        t = 0.05 * (k + 1)
        imu_t = t - 0.05 + np.arange(1, 11) * 0.005
        imu = np.zeros(I)
        imu[:10] = imu_t
        m = np.zeros(I)
        m[:10] = 1
        return _pack_frame(
            t, rng.integers(0, 255, (h, w), np.uint8),
            rng.integers(0, 255, (h, w), np.uint8),
            imu, rng.normal(0, 0.01, (I, 3)),
            rng.normal(0, 0.01, (I, 3)) + [0, 0, 9.8], m,
            np.zeros(3), 0.05, True, I)

    frames = [host_frame(k) for k in range(n)]

    st = jax.tree.map(jnp.copy, init_vio_state(
        cfg, np.zeros(3), np.array([0.05, 0.02, 9.8]), mparams))
    st, out = step(st, *frames[0])
    np.asarray(out)  # hard sync through the compile

    # 1. submit-only: pipeline the puts, fetch once at the end
    t0 = time.perf_counter()
    for k in range(1, n):
        st, out = step(st, *frames[k])
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"submit-only       {1000 * dt / (n - 1):7.2f} ms/frame "
          f"({(n - 1) / dt:6.1f} fps)", flush=True)

    # 2. fetch-every-frame (publisher drain pattern)
    t0 = time.perf_counter()
    for k in range(1, n):
        st, out = step(st, *frames[k])
        np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"fetch-every-frame {1000 * dt / (n - 1):7.2f} ms/frame "
          f"({(n - 1) / dt:6.1f} fps)", flush=True)

    # 3. pure round trip: tiny fetch in a tight loop
    tiny = jnp.zeros(24, jnp.float32) + 1.0
    jax.block_until_ready(tiny)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(tiny)
    dt = time.perf_counter() - t0
    print(f"tiny device_get   {1000 * dt / n:7.2f} ms/round trip", flush=True)

    # 4. host->device image put in isolation
    img = np.ascontiguousarray(frames[0][0])
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jax.device_put(img))
    dt = time.perf_counter() - t0
    print(f"image device_put  {1000 * dt / n:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
