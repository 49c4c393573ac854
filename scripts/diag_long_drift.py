#!/usr/bin/env python
"""Long-horizon drift diagnosis: run OUR stack on a cached EuRoC-format
dataset under config variants that walk the fast defaults back toward exact
reference semantics, and report ATE per variant.

Isolates which deviation (LK iteration budget, truncated temporal pyramid,
seeded stereo, level-0 backward check, adder-mask order) accounts for a gap
against the reference on 180 s worlds (VERDICT r4 #2 / round-5 medium-180s
ratio 1.29).

    python scripts/diag_long_drift.py datasets/SYN_PROXY_medium_180s [variant ...]

Variants: default, lk_budget, temporal_full, stereo_exact, adder_exact, exact
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "default": {},
    # reference LK iteration cap + full temporal pyramid
    "lk_budget": {"lk_max_iteration": 30, "lk_max_iteration_upper": 0},
    "temporal_full": {"lk_temporal_levels": 0},
    "temporal_3": {"lk_temporal_levels": 3},
    # reference stereo: rotation-projected seeds, full fwd pyramid,
    # full-pyramid backward check
    "stereo_exact": {"stereo_seeded": False, "stereo_full_backward": True},
    "adder_exact": {"exact_adder_mask": True},
    "exact": {"lk_max_iteration": 30, "lk_max_iteration_upper": 0,
              "lk_temporal_levels": 0, "stereo_seeded": False,
              "stereo_full_backward": True, "exact_adder_mask": True},
}


def main():
    args = [a for a in sys.argv[1:]]
    path = args[0]
    names = args[1:] or list(VARIANTS)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_uav"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.evaluation.metrics import ate, rte
    from uav_airvision_tpu.main import build_frames_from_euroc
    from uav_airvision_tpu.models.vio import run_sequence

    base = euroc_config()
    t0 = time.time()
    frames, pb, gt = build_frames_from_euroc(base, path, 0.0)
    print(f"[load] {len(pb.timestamps)} frames in {time.time()-t0:.1f}s",
          flush=True)

    results = {}
    for name in names:
        over = VARIANTS[name]
        cfg = dataclasses.replace(
            base, frontend=dataclasses.replace(base.frontend, **over))
        t0 = time.time()
        state, outs = run_sequence(cfg, frames, pb.gyro_bias, pb.acc_mean)
        act = np.asarray(outs.active)
        ts_abs = pb.time_base + np.asarray(outs.timestamp, np.float64)
        a = ate(ts_abs[act], np.asarray(outs.p)[act],
                gt["timestamp"], gt["p"])
        r = rte(ts_abs[act], np.asarray(outs.p)[act],
                gt["timestamp"], gt["p"])
        n_resets = int(np.asarray(outs.did_reset)[act].sum())
        results[name] = {"ate_rmse_m": round(float(a["rmse"]), 5),
                         "rte_rmse_m": round(float(r["rmse"]), 5),
                         "resets": n_resets,
                         "wall_s": round(time.time() - t0, 1)}
        print(f"[{name}] {json.dumps(results[name])}", flush=True)

    out = f"reports/diag_long_drift_{os.path.basename(path)}.json"
    os.makedirs("reports", exist_ok=True)
    if os.path.exists(out):  # merge: successive invocations add variants
        with open(out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
