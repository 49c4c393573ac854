#!/usr/bin/env python
"""Fleet-mode throughput: B vmapped VIO instances on one chip.

Measures aggregate stereo frames/sec/chip for instance batches (offset
sweeps / multi-UAV, BASELINE.json configs 4-5).  Usage:

    python scripts/fleet_bench.py [B1 B2 ...]    # default 1 4 8 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_uav"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import bench
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.msckf.state import make_params
    from uav_airvision_tpu.models.vio import init_vio_state, vio_step

    cfg = euroc_config()
    frames, pb, source = bench.build_frames(cfg, n_frames)
    T = int(frames.timestamp.shape[0])
    fparams = make_frontend_params(cfg)
    mparams = make_params(cfg)
    print(f"source={source} T={T}")

    for B in sizes:
        bframes = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], B) + x.shape[1:]),
            frames,
        )
        state = jax.vmap(
            lambda i: init_vio_state(cfg, pb.gyro_bias, pb.acc_mean, mparams)
        )(jnp.arange(B))

        def run(state, bf):
            def body(s, f):
                s2, out = jax.vmap(
                    lambda ss, ff: vio_step(ss, ff, fparams, mparams, cfg)
                )(s, f)
                return s2, out.p
            return lax.scan(body, state, bf)

        f = jax.jit(run)
        out = f(state, bframes)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(state, bframes)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"B={B:3d}: {dt / T * 1000:8.2f} ms/step  "
              f"{T * B / dt:8.1f} frames/sec/chip", flush=True)


if __name__ == "__main__":
    main()
