#!/usr/bin/env python
"""Head-to-head parity run: this framework vs the original NumPy/OpenCV
reference stack, on an identical synthetic EuRoC-format dataset.

1. Renders a calibrated synthetic sequence to datasets/SYN_PARITY (EuRoC
   MAV layout) unless it already exists.
2. Runs the reference (threads + queues, imported from REFERENCE_SRC) on it.
3. Runs this framework's batch pipeline on it.
4. Computes ATE/RTE for both against the shared ground truth and writes
   results/parity_report.json.

Usage: python scripts/parity_vs_reference.py [duration_s] [--force]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_SRC = os.environ.get("REFERENCE_SRC", "/root/reference/src")
DATASET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "datasets", "SYN_PARITY")
OFFSET = 0.0


def build_dataset(duration):
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.simulation.world import StereoWorld
    from uav_airvision_tpu.simulation.euroc_writer import write_euroc_dataset

    cfg = euroc_config()
    world = StereoWorld(cfg)
    print(f"[gen] rendering {duration}s to {DATASET} ...", flush=True)
    write_euroc_dataset(world, DATASET, duration)
    return world


def run_reference():
    """Drive the reference stack deterministically: messages interleaved by
    timestamp through its ImageProcessor + MSCKF (its threaded orchestrator
    makes gravity-init timing depend on thread scheduling, which changes the
    processed frame set between runs)."""
    sys.path.insert(0, REFERENCE_SRC)
    from streaming.dataset import EuRoCDataset
    from image_processing import ImageProcessor
    from msckf import MSCKF
    from config import ConfigEuRoC

    os.environ["DATASET_NAME"] = "SYN_PARITY_ref"
    os.environ["TIME_OFFSET"] = str(int(OFFSET))
    out_path = os.path.join("results", "txts",
                            f"output_SYN_PARITY_ref_offset{int(OFFSET)}.txt")
    if os.path.exists(out_path):
        os.remove(out_path)

    dataset = EuRoCDataset(DATASET)
    dataset.set_starttime(offset=OFFSET)
    imu = list(dataset.imu)
    stereo = list(dataset.stereo)

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


def run_ours():
    import jax
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu import main as cli

    out_path = os.path.join("results", "txts",
                            f"output_SYN_PARITY_offset{int(OFFSET)}.txt")
    if os.path.exists(out_path):
        os.remove(out_path)
    t0 = time.time()
    cli.main(["--path", DATASET, "--offset", str(OFFSET)])
    wall = time.time() - t0
    n = sum(1 for _ in open(out_path)) if os.path.exists(out_path) else 0
    print(f"[ours] {n} poses in {wall:.1f}s wall (incl. compile)", flush=True)
    return out_path, wall, n


def evaluate(traj_path):
    from uav_airvision_tpu.evaluation.metrics import (
        ate, rte, load_trajectory_txt,
    )
    from uav_airvision_tpu.streaming.dataset import GroundTruthReader

    t_est, p_est, _ = load_trajectory_txt(traj_path)
    gt = GroundTruthReader(os.path.join(DATASET, "mav0",
                                        "state_groundtruth_estimate0", "data.csv")).load()
    a = ate(t_est, p_est, gt["timestamp"], gt["p"])
    r = rte(t_est, p_est, gt["timestamp"], gt["p"])
    return a, r


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 20.0
    force = "--force" in sys.argv
    if force or not os.path.isdir(os.path.join(DATASET, "mav0")):
        build_dataset(duration)

    ref_path, ref_wall, ref_n = run_reference()
    ours_path, ours_wall, ours_n = run_ours()

    ref_ate, ref_rte = evaluate(ref_path)
    our_ate, our_rte = evaluate(ours_path)

    report = {
        "dataset": {"path": DATASET, "duration_s": duration},
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
    os.makedirs("results", exist_ok=True)
    with open("results/parity_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
