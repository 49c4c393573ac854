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


def run_synthetic_suite(duration, csv_path, seeds=(7, 13), name_suffix="",
                        strict_easy_resets=False, long_horizon=None):
    """EuRoC-proxy evaluation grid: no real EuRoC data reaches this machine
    (zero egress), so the accuracy evidence comes from the hardened
    simulator — 6-DoF EuRoC-matched motion presets x layered multi-depth
    scene x photometric degradation (simulation/world.py).  One row per
    (preset, seed) in the reference metrics_summary.csv schema."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from uav_airvision_tpu.config import euroc_config, long_horizon_config
    from uav_airvision_tpu.evaluation.metrics import ate, rte, write_metrics_summary
    from uav_airvision_tpu.evaluation.plots import (
        per_sequence_artifacts, plot_summary)
    from uav_airvision_tpu.models.vio import VioFrame, run_sequence
    from uav_airvision_tpu.simulation.world import (
        EUROC_MOTION_PRESETS, StereoWorld, Trajectory6DoF)
    from uav_airvision_tpu.streaming.prebatch import prebatch_imu
    from uav_airvision_tpu.utils.trajectory import TrajectoryWriter

    # >60 s missions default to the long-horizon preset (3-level temporal
    # LK; see config.long_horizon_config docstring for the measured trade)
    if long_horizon is None:
        long_horizon = duration > 60.0
    config = long_horizon_config() if long_horizon else euroc_config()
    rows = []
    summary = []  # (name, ate_pct, rte_pct) for the repo-level bar charts
    for preset, kw in EUROC_MOTION_PRESETS.items():
        for seed in seeds:
            name = f"SYN_{preset}_s{seed}{name_suffix}"
            world = StereoWorld(config, seed=seed,
                                trajectory=Trajectory6DoF(**kw),
                                scene="layered", photometric=True)
            imu_t, imu_w, imu_a = world.imu_stream(duration, seed=seed)
            fts = world.frame_times(duration)
            rng = np.random.default_rng(seed)
            imgs = [world.render_frame(t, rng) for t in fts]
            pb = prebatch_imu(fts, imu_t, imu_w, imu_a,
                              config.capacity.max_imu_per_frame,
                              config.capacity.imu_init_msgs)
            frames = VioFrame(
                timestamp=jnp.asarray(pb.timestamps, jnp.float32),
                cam0=jnp.asarray(np.stack([i[0] for i in imgs])),
                cam1=jnp.asarray(np.stack([i[1] for i in imgs])),
                imu_t=jnp.asarray(pb.imu_t, jnp.float32),
                imu_w=jnp.asarray(pb.imu_w, jnp.float32),
                imu_a=jnp.asarray(pb.imu_a, jnp.float32),
                imu_mask=jnp.asarray(pb.imu_mask),
                fe_mean_w=jnp.asarray(pb.fe_mean_w, jnp.float32),
                fe_dt=jnp.asarray(pb.fe_dt, jnp.float32),
                active=jnp.asarray(pb.active),
            )
            state, outs = run_sequence(config, frames, pb.gyro_bias, pb.acc_mean)
            act = np.asarray(outs.active)
            ts_abs = pb.time_base + np.asarray(outs.timestamp, np.float64)
            writer = TrajectoryWriter(dataset_name=name, offset="0")
            writer.write_batch(ts_abs, np.asarray(outs.p), np.asarray(outs.q), act)
            gt_p = world.groundtruth(fts)
            a = ate(ts_abs[act], np.asarray(outs.p)[act], fts, gt_p)
            r = rte(ts_abs[act], np.asarray(outs.p)[act], fts, gt_p)
            path_len = float(np.sum(np.linalg.norm(np.diff(gt_p, axis=0), axis=1)))
            perc = 100.0 * a["rmse"] / path_len if path_len > 0 else ""
            # peak body rates/accels so rows are comparable to EuRoC specs
            wmax = float(np.max(np.linalg.norm(imu_w, axis=1)))
            # long-run stability diagnostics: online resets fired + final cov
            n_resets = int(np.asarray(outs.did_reset)[act].sum())
            cov_ok = bool(np.isfinite(np.asarray(state.filter.cov)).all())
            print(f"[{name}] ATE {a['rmse']:.4f}m RTE {r['rmse']:.4f}m "
                  f"path {path_len:.1f}m peak|w| {wmax:.2f} rad/s "
                  f"({int(act.sum())} poses, {n_resets} resets, "
                  f"cov_finite={cov_ok})", flush=True)
            assert cov_ok, f"{name}: covariance went non-finite"
            if strict_easy_resets and preset == "easy":
                assert n_resets == 0, (
                    f"{name}: {n_resets} online resets on the easy preset "
                    f"over {duration:.0f}s — long-run stability regression")
            rows.append(dict(
                dataset=name,
                ate_rmse=a["rmse"], ate_mean=a["mean"], ate_std=a["std"],
                rte_rmse=r["rmse"], rte_mean=r["mean"], rte_std=r["std"],
                ate_perc=perc,
            ))
            # per-sequence plot artifacts (reference results/<seq>/ set)
            seq_dir = os.path.join("results", name)
            per_sequence_artifacts(seq_dir, ts_abs[act],
                                   np.asarray(outs.p)[act], fts, gt_p)
            print(f"[plots] {seq_dir}/", flush=True)
            if path_len > 0:
                summary.append((name, 100.0 * a["rmse"] / path_len,
                                100.0 * r["rmse"] / path_len))
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    write_metrics_summary(csv_path, rows)
    print(f"[csv] {csv_path}")
    if summary:
        names = [s[0] for s in summary]
        a_png = f"results/ate_summary{name_suffix}.png"
        r_png = f"results/rte_summary{name_suffix}.png"
        plot_summary(a_png, names, [s[1] for s in summary], "ATE")
        plot_summary(r_png, names, [s[2] for s in summary], "RTE")
        print(f"[plots] {a_png} {r_png}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", help="directory containing EuRoC sequences")
    ap.add_argument("--sequences", nargs="*", default=SEQUENCES)
    ap.add_argument("--offsets", nargs="*", type=float, default=OFFSETS)
    ap.add_argument("--csv", default="results/metrics_summary.csv")
    ap.add_argument("--synthetic-suite", action="store_true",
                    help="run the EuRoC-proxy grid (hardened simulator) "
                         "instead of real sequences")
    ap.add_argument("--duration", type=float, default=20.0,
                    help="synthetic-suite sequence length in seconds")
    ap.add_argument("--long-stability", action="store_true",
                    help="EuRoC-length (180 s = MH_01 length) stability rows: "
                         "one seed per preset, asserts finite covariance and "
                         "zero online resets on easy")
    args = ap.parse_args(argv)

    if args.long_stability:
        run_synthetic_suite(180.0,
                            args.csv.replace(".csv", "_synthetic_180s.csv"),
                            seeds=(7,), name_suffix="_180s",
                            strict_easy_resets=True)
        return
    if args.synthetic_suite:
        run_synthetic_suite(args.duration,
                            args.csv.replace(".csv", "_synthetic.csv"))
        return
    if not args.root:
        ap.error("--root is required unless --synthetic-suite")

    import numpy as np

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.evaluation.metrics import ate, rte, write_metrics_summary
    from uav_airvision_tpu.main import build_frames_from_euroc
    from uav_airvision_tpu.models.vio import run_sequence
    from uav_airvision_tpu.utils.trajectory import TrajectoryWriter

    # >60 s missions default to the long-horizon preset (3-level temporal
    # LK; see config.long_horizon_config docstring for the measured trade)
    if long_horizon is None:
        long_horizon = duration > 60.0
    config = long_horizon_config() if long_horizon else euroc_config()
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
                # reference-style per-sequence plots (first offset only —
                # the reference publishes one artifact set per sequence)
                if off == args.offsets[0]:
                    from uav_airvision_tpu.evaluation.plots import (
                        per_sequence_artifacts)

                    per_sequence_artifacts(
                        os.path.join("results", seq), ts_abs[act],
                        np.asarray(outs.p)[act], gt["timestamp"], gt["p"])

    if rows:
        os.makedirs(os.path.dirname(args.csv), exist_ok=True)
        write_metrics_summary(args.csv, rows)
        print(f"[csv] {args.csv}")
        pr = [(r["dataset"], r["ate_perc"],
               100.0 * r["rte_rmse"] * r["ate_perc"] / r["ate_rmse"]
               if r["ate_perc"] != "" else "")
              for r in rows if r["ate_perc"] != ""]
        if pr:
            from uav_airvision_tpu.evaluation.plots import plot_summary

            plot_summary("results/ate_summary.png", [p[0] for p in pr],
                         [p[1] for p in pr], "ATE")
            plot_summary("results/rte_summary.png", [p[0] for p in pr],
                         [p[2] for p in pr], "RTE")


if __name__ == "__main__":
    main()
