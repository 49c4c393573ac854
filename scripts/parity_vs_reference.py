#!/usr/bin/env python
"""Head-to-head parity run: this framework vs the original NumPy/OpenCV
reference stack, on identical synthetic EuRoC-format datasets.

1. Renders calibrated synthetic sequences as EuRoC MAV directories (cached
   under datasets/) unless they already exist.
2. Runs the reference (imported from REFERENCE_SRC, deterministic message
   feed) on each.
3. Runs this framework's batch pipeline on the same files.
4. Computes ATE/RTE for both against the shared ground truth and writes
   reports/parity_report.json (mild world) or
   reports/parity_report_presets.json (--presets).

Usage:
    python scripts/parity_vs_reference.py [duration_s] [--force]
    python scripts/parity_vs_reference.py [duration_s] --presets [easy medium difficult]

--presets runs the hardened EuRoC-proxy worlds (6-DoF motion presets x
layered scene x photometric degradation — the same generator as
``run_sweep.py --synthetic-suite``) head-to-head through BOTH stacks, which
isolates implementation quality on hard motion from scene difficulty.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_SRC = os.environ.get("REFERENCE_SRC", "/root/reference/src")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OFFSET = 0.0


def build_dataset(name, duration, preset=None, seed=7):
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.simulation.world import (
        EUROC_MOTION_PRESETS, StereoWorld, Trajectory6DoF)
    from uav_airvision_tpu.simulation.euroc_writer import write_euroc_dataset

    cfg = euroc_config()
    if preset is None:
        world = StereoWorld(cfg)
    else:
        world = StereoWorld(cfg, seed=seed,
                            trajectory=Trajectory6DoF(**EUROC_MOTION_PRESETS[preset]),
                            scene="layered", photometric=True)
    out = os.path.join(REPO, "datasets", name)
    print(f"[gen] rendering {duration}s to {out} ...", flush=True)
    write_euroc_dataset(world, out, duration, seed=seed)
    return out


def run_reference(dataset, name):
    """Drive the reference stack deterministically: messages interleaved by
    timestamp through its ImageProcessor + MSCKF (its threaded orchestrator
    makes gravity-init timing depend on thread scheduling, which changes the
    processed frame set between runs)."""
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    from streaming.dataset import EuRoCDataset
    from image_processing import ImageProcessor
    from msckf import MSCKF
    from config import ConfigEuRoC

    os.environ["DATASET_NAME"] = f"{name}_ref"
    os.environ["TIME_OFFSET"] = str(int(OFFSET))
    out_path = os.path.join("results", "txts",
                            f"output_{name}_ref_offset{int(OFFSET)}.txt")
    if os.path.exists(out_path):
        os.remove(out_path)

    dataset_r = EuRoCDataset(dataset)
    dataset_r.set_starttime(offset=OFFSET)
    imu = list(dataset_r.imu)
    stereo = list(dataset_r.stereo)

    import contextlib
    import io

    ip = ImageProcessor(ConfigEuRoC())
    filt = MSCKF(ConfigEuRoC())
    k = 0
    n = 0
    t0 = time.time()
    sink = io.StringIO()
    with contextlib.redirect_stdout(sink):  # the reference prints per frame
        for msg in stereo:
            while k < len(imu) and imu[k].timestamp <= msg.timestamp:
                ip.imu_callback(imu[k])
                filt.imu_callback(imu[k])
                k += 1
            fmsg = ip.stereo_callback(msg)
            if fmsg is not None and filt.feature_callback(fmsg) is not None:
                n += 1
    wall = time.time() - t0
    print(f"[ref] {n} poses in {wall:.1f}s ({n / max(wall, 1e-9):.1f} fps)",
          flush=True)
    return out_path, wall, n


def run_ours(dataset, name):
    from uav_airvision_tpu import main as cli

    out_path = os.path.join("results", "txts",
                            f"output_{name}_offset{int(OFFSET)}.txt")
    if os.path.exists(out_path):
        os.remove(out_path)
    t0 = time.time()
    cli.main(["--path", dataset, "--offset", str(OFFSET)])
    wall = time.time() - t0
    n = sum(1 for _ in open(out_path)) if os.path.exists(out_path) else 0
    print(f"[ours] {n} poses in {wall:.1f}s wall (incl. compile)", flush=True)
    return out_path, wall, n


def evaluate(traj_path, dataset):
    from uav_airvision_tpu.evaluation.metrics import (
        ate, rte, load_trajectory_txt,
    )
    from uav_airvision_tpu.streaming.dataset import GroundTruthReader

    t_est, p_est, _ = load_trajectory_txt(traj_path)
    gt = GroundTruthReader(os.path.join(dataset, "mav0",
                                        "state_groundtruth_estimate0", "data.csv")).load()
    a = ate(t_est, p_est, gt["timestamp"], gt["p"])
    r = rte(t_est, p_est, gt["timestamp"], gt["p"])
    return a, r


def head_to_head(name, duration, preset=None, force=False):
    dataset = os.path.join(REPO, "datasets", name)
    if force or not os.path.isdir(os.path.join(dataset, "mav0")):
        build_dataset(name, duration, preset=preset)

    ref_path, ref_wall, ref_n = run_reference(dataset, name)
    ours_path, ours_wall, ours_n = run_ours(dataset, name)

    ref_ate, ref_rte = evaluate(ref_path, dataset)
    our_ate, our_rte = evaluate(ours_path, dataset)

    return {
        "dataset": {"path": dataset, "duration_s": duration,
                    "preset": preset or "mild"},
        "reference": {
            "ate_rmse_m": round(float(ref_ate["rmse"]), 5),
            "rte_rmse_m": round(float(ref_rte["rmse"]), 5),
            "poses": ref_n,
            "wall_s": round(ref_wall, 2),
            "fps": round(ref_n / max(ref_wall, 1e-9), 2),
        },
        "ours": {
            "ate_rmse_m": round(float(our_ate["rmse"]), 5),
            "rte_rmse_m": round(float(our_rte["rmse"]), 5),
            "poses": ours_n,
            "wall_s_incl_compile": round(ours_wall, 2),
        },
        "ate_ratio_ours_over_ref": round(
            float(our_ate["rmse"] / max(ref_ate["rmse"], 1e-12)), 3),
    }


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 20.0
    force = "--force" in sys.argv
    os.makedirs("reports", exist_ok=True)

    if "--presets" in sys.argv:
        i = sys.argv.index("--presets")
        presets = [a for a in sys.argv[i + 1:] if not a.startswith("-")]
        presets = presets or ["easy", "medium", "difficult"]
        report = {}
        # 20 s keeps the historical cache names; other durations get their
        # own suffixed datasets (the 180 s long-horizon head-to-head,
        # VERDICT r4 #2) so caches never clobber each other.
        suffix = "" if duration == 20.0 else f"_{int(duration)}s"
        for preset in presets:
            print(f"=== preset {preset} ({duration:.0f}s) ===", flush=True)
            report[preset] = head_to_head(
                f"SYN_PROXY_{preset}{suffix}", duration, preset=preset,
                force=force)
            print(json.dumps(report[preset], indent=2), flush=True)
        out = f"reports/parity_report_presets{suffix}.json"
    else:
        report = head_to_head("SYN_PARITY", duration, force=force)
        out = "reports/parity_report.json"

    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
