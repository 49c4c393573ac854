#!/usr/bin/env python
"""Experiment sweep driver (replaces the reference run.bat grid:
9 EuRoC sequences x offsets {1,5,10,15,20,30,40}, reference run.bat:4-10).

Runs every (sequence, offset) combination in batch mode, writes trajectories
to results/txts/ and a metrics_summary.csv matching the reference schema.

    python run_sweep.py --root /data/euroc [--sequences MH_01_easy ...]
                        [--offsets 1 5 10 ...]
"""

import argparse
import os
import sys

SEQUENCES = [
    "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult",
    "MH_05_difficult", "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]
OFFSETS = [1, 5, 10, 15, 20, 30, 40]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="directory containing EuRoC sequences")
    ap.add_argument("--sequences", nargs="*", default=SEQUENCES)
    ap.add_argument("--offsets", nargs="*", type=float, default=OFFSETS)
    ap.add_argument("--csv", default="results/metrics_summary.csv")
    args = ap.parse_args()

    import numpy as np

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.evaluation.metrics import ate, rte, write_metrics_summary
    from uav_airvision_tpu.main import build_frames_from_euroc
    from uav_airvision_tpu.models.vio import run_sequence
    from uav_airvision_tpu.utils.trajectory import TrajectoryWriter

    config = euroc_config()
    rows = []
    for seq in args.sequences:
        path = os.path.join(args.root, seq)
        if not os.path.isdir(path):
            print(f"[skip] {seq}: not found under {args.root}")
            continue
        for off in args.offsets:
            try:
                frames, pb, gt = build_frames_from_euroc(config, path, off)
            except Exception as e:
                print(f"[skip] {seq} offset {off}: {e}")
                continue
            state, outs = run_sequence(config, frames, pb.gyro_bias, pb.acc_mean)
            act = np.asarray(outs.active)
            writer = TrajectoryWriter(dataset_name=seq, offset=str(int(off)))
            ts_abs = pb.time_base + np.asarray(outs.timestamp, np.float64)
            writer.write_batch(ts_abs, np.asarray(outs.p),
                               np.asarray(outs.q), act)
            if gt is not None:
                a = ate(ts_abs[act], np.asarray(outs.p)[act],
                        gt["timestamp"], gt["p"])
                r = rte(ts_abs[act], np.asarray(outs.p)[act],
                        gt["timestamp"], gt["p"])
                # ate_perc: ATE RMSE as a percentage of the ground-truth path
                # length over the evaluated span.  (The reference publishes an
                # 'ate_perc' column but its computing script is absent from
                # the repo, so the definition here is ours and documented.)
                gl = np.asarray(gt["p"], np.float64)
                path_len = float(np.sum(np.linalg.norm(np.diff(gl, axis=0), axis=1)))
                perc = 100.0 * a["rmse"] / path_len if path_len > 0 else ""
                print(f"[{seq} offset {off}] ATE {a['rmse']:.4f} RTE {r['rmse']:.4f}")
                # one row per (sequence, offset): the full grid, no best-of
                rows.append(dict(
                    dataset=f"{seq}_offset{int(off)}",
                    ate_rmse=a["rmse"], ate_mean=a["mean"], ate_std=a["std"],
                    rte_rmse=r["rmse"], rte_mean=r["mean"], rte_std=r["std"],
                    ate_perc=perc,
                ))

    if rows:
        os.makedirs(os.path.dirname(args.csv), exist_ok=True)
        write_metrics_summary(args.csv, rows)
        print(f"[csv] {args.csv}")


if __name__ == "__main__":
    main()
