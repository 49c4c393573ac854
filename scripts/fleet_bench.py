#!/usr/bin/env python
"""Fleet-mode throughput: B VIO instances on one chip.

Measures aggregate stereo frames/sec/chip for instance batches (offset
sweeps / multi-UAV, BASELINE.json configs 4-5) using the batch-hoisted-tier
fleet step (parallel.fleet.make_fleet_step tiered=True).  Pass --plain to
also run the round-2 plain-vmap baseline for comparison.

By default instances are IDENTICAL broadcast copies (best case for the
batch-max tier hoisting).  --decorrelated instead starts each instance at a
different time offset into the same stream (stride 7 frames), so track
lifecycles, lost-feature counts, and tier predicates diverge across the
batch — the honest fleet number.  Usage:

    python scripts/fleet_bench.py [B1 B2 ...] [--plain] [--decorrelated]
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
    args = [a for a in sys.argv[1:]]
    plain = "--plain" in args
    decorrelated = "--decorrelated" in args
    sizes = [int(a) for a in args if not a.startswith("-")] or [1, 4, 8]
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    stride = int(os.environ.get("FLEET_STRIDE", "7"))

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_uav"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import bench
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.msckf.state import make_params
    from uav_airvision_tpu.models.vio import init_vio_state
    from uav_airvision_tpu.parallel.fleet import make_fleet_step
    from uav_airvision_tpu.utils.precision import with_highest_precision

    cfg = euroc_config()
    # decorrelated mode: render enough extra stream so instance b can start
    # stride*b frames in while every instance still scans n_frames steps
    extra = stride * (max(sizes) - 1) if decorrelated else 0
    frames, pb, source = bench.build_frames(cfg, n_frames + extra)
    T_total = int(frames.timestamp.shape[0])
    T = T_total - extra
    mparams = make_params(cfg)
    mode = f"decorrelated(stride={stride})" if decorrelated else "broadcast"
    print(f"source={source} T={T} mode={mode}")

    bucket = "--no-bucket" not in args
    variants = [("tiered" + ("+bkt" if bucket else ""), True, bucket)]
    if plain:
        variants.append(("plain-vmap", False, False))
    for label, tiered, bkt in variants:
        step = make_fleet_step(cfg, tiered=tiered, bucket=bkt)
        for B in sizes:
            if decorrelated:
                # instance b sees frames [stride*b, stride*b + T): divergent
                # track lifecycles => divergent tier predicates
                idx = np.arange(T)[:, None] + stride * np.arange(B)[None, :]
                bframes = jax.tree.map(lambda x: jnp.asarray(x)[idx], frames)
            else:
                bframes = jax.tree.map(
                    lambda x: jnp.broadcast_to(
                        x[:, None], (x.shape[0], B) + x.shape[1:]),
                    frames,
                )
            state = jax.vmap(
                lambda i: init_vio_state(cfg, pb.gyro_bias, pb.acc_mean, mparams)
            )(jnp.arange(B))

            @with_highest_precision
            @jax.jit
            def run(state, bf):
                def body(s, f):
                    s2, out = step(s, f)
                    return s2, out.p
                return lax.scan(body, state, bf)

            out = run(state, bframes)
            # HARD sync (cold block_until_ready returns early on axon)
            for leaf in jax.tree_util.tree_leaves(out):
                jax.device_get(leaf.ravel()[:1])
            t0 = time.perf_counter()
            out = run(state, bframes)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            print(f"{label:10s} B={B:3d}: {dt / T * 1000:8.2f} ms/step  "
                  f"{T * B / dt:8.1f} frames/sec/chip aggregate", flush=True)


if __name__ == "__main__":
    main()
