"""CLI experiment driver.

Flag-compatible with the reference entry point
(``python main.py --path <euroc_dir> --offset <sec> [--view]``, reference
src/main.py:10-34) and writes the same trajectory file format.  Two modes:

* ``--mode batch`` (default): prebatch the whole sequence and `lax.scan` the
  fused step over it on device — the fast TPU path.
* ``--mode realtime``: reference-style threaded playback through queues at
  ``--ratio`` x real time (reference uses 0.4).

Extra conveniences the reference lacks: ``--synthetic SECONDS`` runs the
built-in simulator when no dataset is on disk, and ``--eval`` computes
ATE/RTE against ground truth after the run.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_frames_from_euroc(config, path, offset):
    import numpy as np
    import jax.numpy as jnp

    from .streaming.dataset import EuRoCDataset
    from .streaming.prebatch import load_euroc_arrays, prebatch_imu
    from .models.vio import VioFrame

    dataset = EuRoCDataset(path)
    dataset.set_starttime(offset=offset)
    fts, cam0, cam1, imu_t, imu_w, imu_a = load_euroc_arrays(dataset)
    pb = prebatch_imu(fts, imu_t, imu_w, imu_a, config.capacity.max_imu_per_frame,
                      config.capacity.imu_init_msgs)
    frames = VioFrame(
        timestamp=jnp.asarray(pb.timestamps, jnp.float32),  # rebased, f32-safe
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
    gt = None
    try:
        gt = dataset.groundtruth.load()
    except Exception:
        pass
    return frames, pb, gt


def build_frames_synthetic(config, duration):
    import numpy as np
    import jax.numpy as jnp

    from .simulation.world import StereoWorld
    from .streaming.prebatch import prebatch_imu
    from .models.vio import VioFrame

    world = StereoWorld(config)
    imu_t, imu_w, imu_a = world.imu_stream(duration)
    fts = world.frame_times(duration)
    rng = np.random.default_rng(5)
    cam0, cam1 = [], []
    for t in fts:
        i0, i1 = world.render_frame(t, rng)
        cam0.append(i0)
        cam1.append(i1)
    pb = prebatch_imu(fts, imu_t, imu_w, imu_a, config.capacity.max_imu_per_frame,
                      config.capacity.imu_init_msgs)
    frames = VioFrame(
        timestamp=jnp.asarray(pb.timestamps, jnp.float32),
        cam0=jnp.asarray(np.stack(cam0)),
        cam1=jnp.asarray(np.stack(cam1)),
        imu_t=jnp.asarray(pb.imu_t, jnp.float32),
        imu_w=jnp.asarray(pb.imu_w, jnp.float32),
        imu_a=jnp.asarray(pb.imu_a, jnp.float32),
        imu_mask=jnp.asarray(pb.imu_mask),
        fe_mean_w=jnp.asarray(pb.fe_mean_w, jnp.float32),
        fe_dt=jnp.asarray(pb.fe_dt, jnp.float32),
        active=jnp.asarray(pb.active),
    )
    gt = dict(timestamp=fts, p=world.groundtruth(fts))
    return frames, pb, gt


def run_batch(args):
    import numpy as np

    from .config import euroc_config, long_horizon_config
    from .models.vio import run_sequence
    from .utils.trajectory import TrajectoryWriter

    config = long_horizon_config() if args.long_horizon else euroc_config()
    name = os.path.basename(os.path.normpath(args.path)) if args.path else "synthetic"

    timer = None
    if args.profile:
        from .utils.profiling import StageTimer

        timer = StageTimer()

    def staged(stage_name):
        import contextlib

        return timer.stage(stage_name) if timer else contextlib.nullcontext()

    with staged("load"):
        t_load = time.time()
        if args.synthetic:
            frames, pb, gt = build_frames_synthetic(config, args.synthetic)
        else:
            frames, pb, gt = build_frames_from_euroc(config, args.path, args.offset)
        print(f"[load] {len(pb.timestamps)} frames in {time.time()-t_load:.1f}s")

    start_frame = 0

    def _run():
        nonlocal start_frame
        if args.checkpoint_dir:
            from .models.vio import run_sequence_checkpointed

            state, outs, start_frame = run_sequence_checkpointed(
                config, frames, pb.gyro_bias, pb.acc_mean,
                checkpoint_dir=args.checkpoint_dir,
                every=args.checkpoint_every,
            )
            if start_frame:
                print(f"[resume] from checkpointed frame {start_frame}")
            return state, outs
        return run_sequence(config, frames, pb.gyro_bias, pb.acc_mean)

    if timer:
        from .utils.profiling import device_trace

        trace_dir = os.path.join("reports", "xprof")
        with staged("run"), device_trace(trace_dir):
            state, outs = _run()
            outs.p.block_until_ready()
        wall = timer.totals["run"]
        print(f"[profile] device trace -> {trace_dir}")
    else:
        t_run = time.time()
        state, outs = _run()
        outs.p.block_until_ready()
        wall = time.time() - t_run
    n = len(pb.timestamps) - start_frame
    print(f"[run] {n} frames in {wall:.2f}s ({n / wall:.1f} fps incl. compile)")

    act = np.asarray(outs.active)
    # device times are rebased (float32-safe); restore absolute stamps here
    ts_abs = pb.time_base + np.asarray(outs.timestamp, np.float64)
    writer = TrajectoryWriter(dataset_name=name, offset=str(int(args.offset)))
    writer.write_batch(ts_abs, np.asarray(outs.p), np.asarray(outs.q), act)
    print(f"[out] trajectory -> {writer.path} ({act.sum()} poses)")

    if args.eval and gt is not None:
        from .evaluation.metrics import ate, rte

        gts = gt["timestamp"] if isinstance(gt, dict) else gt[0]
        gtp = gt["p"] if isinstance(gt, dict) else gt[1]
        a = ate(ts_abs[act], np.asarray(outs.p)[act], gts, gtp)
        r = rte(ts_abs[act], np.asarray(outs.p)[act], gts, gtp)
        print(f"[eval] ATE rmse={a['rmse']:.4f}m mean={a['mean']:.4f}m | "
              f"RTE rmse={r['rmse']:.4f}m")

    if args.view:
        try:
            from .viewer import SimpleViewer

            viewer = SimpleViewer()
            viewer.replay(np.asarray(outs.timestamp)[act], np.asarray(outs.p)[act])
        except Exception as e:  # viewer is optional (needs Qt)
            print(f"[view] viewer unavailable: {e}")

    if timer:
        os.makedirs("reports", exist_ok=True)
        path = os.path.join("reports", "profile_stages.json")
        timer.dump(path)
        print(f"[profile] stage timings -> {path}\n{timer.dump()}")


class _ListStream:
    """In-memory dataset-shaped iterable for DataPublisher."""

    def __init__(self, msgs, starttime=0.0):
        self.msgs = msgs
        self.starttime = starttime

    def __iter__(self):
        return iter(self.msgs)


def _synthetic_streams(config, duration):
    import numpy as np

    from .simulation.world import StereoWorld
    from .streaming.dataset import imu_msg, stereo_msg

    world = StereoWorld(config)
    ts_imu, ws, accs = world.imu_stream(duration)
    imu_msgs = [imu_msg(t, w, a) for t, w, a in zip(ts_imu, ws, accs)]
    fts = world.frame_times(duration)
    rng = np.random.default_rng(5)
    img_msgs = []
    for t in fts:
        i0, i1 = world.render_frame(t, rng)
        img_msgs.append(stereo_msg(t, i0, i1, None, None))
    return _ListStream(imu_msgs), _ListStream(img_msgs)


def run_realtime(args):
    from queue import Queue

    from .config import euroc_config, long_horizon_config
    from .streaming.publisher import DataPublisher
    from .vio import VIO
    from .utils.trajectory import TrajectoryWriter

    config = long_horizon_config() if args.long_horizon else euroc_config()
    if args.synthetic:
        imu_src, img_src = _synthetic_streams(config, args.synthetic)
        name = "synthetic"
    else:
        from .streaming.dataset import EuRoCDataset

        dataset = EuRoCDataset(args.path)
        dataset.set_starttime(offset=args.offset)
        imu_src, img_src = dataset.imu, dataset.stereo
        name = os.path.basename(os.path.normpath(args.path))
    os.environ["DATASET_NAME"] = name
    os.environ["TIME_OFFSET"] = str(int(args.offset))

    img_q, imu_q = Queue(), Queue()
    viewer = None
    if args.view:
        try:
            from .viewer import SimpleViewer

            viewer = SimpleViewer()
        except Exception as e:
            print(f"[view] viewer unavailable: {e}")

    writer = TrajectoryWriter(dataset_name=name, offset=str(int(args.offset)))
    vio = VIO(config, img_q, imu_q, viewer, trajectory_writer=writer)
    vio.start()

    if args.warmup:
        # compile the fused step before the clock starts so the paced run
        # measures steady-state throughput, not XLA compile time
        t0 = time.time()
        vio.warmup()
        print(f"[realtime] warmup compile {time.time()-t0:.1f}s")

    now = time.time()
    dur = getattr(args, "duration", float("inf"))
    imu_pub = DataPublisher(imu_src, imu_q, duration=dur, ratio=args.ratio)
    img_pub = DataPublisher(img_src, img_q, duration=dur, ratio=args.ratio)
    imu_pub.start(now)
    img_pub.start(now)
    vio.join()
    wall = time.time() - now
    n = len(vio.results)
    print(f"[realtime] {n} poses in {wall:.1f}s wall "
          f"({n / wall:.1f} poses/s end-to-end) -> {writer.path}")


def _enable_compile_cache():
    """Persistent XLA compilation cache (shared with bench.py): the fused
    step is a large program and the remote axon compile path is slow."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_uav"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    parser = argparse.ArgumentParser(description="TPU-native stereo VIO")
    parser.add_argument("--path", default="./datasets/V2_03_difficult")
    parser.add_argument("--offset", type=float, default=10.0)
    parser.add_argument("--view", action="store_true")
    parser.add_argument("--mode", choices=["batch", "realtime"], default="batch")
    parser.add_argument("--ratio", type=float, default=0.4,
                        help="realtime playback speed (reference: 0.4)")
    parser.add_argument("--duration", type=float, default=float("inf"),
                        help="realtime mode: stop publishing after this many "
                             "dataset seconds")
    parser.add_argument("--synthetic", type=float, default=0.0,
                        help="run the built-in simulator for N seconds instead "
                             "of a dataset")
    parser.add_argument("--eval", action="store_true",
                        help="compute ATE/RTE against ground truth")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="batch mode: snapshot the VIO state pytree every "
                             "--checkpoint-every frames (orbax); if the "
                             "directory already holds snapshots, resume from "
                             "the latest one")
    parser.add_argument("--checkpoint-every", type=int, default=200)
    parser.add_argument("--long-horizon", action="store_true",
                        help="use long_horizon_config(): 3-level temporal LK "
                             "for missions beyond ~60 s (measured: fixes the "
                             "EuRoC-length medium-motion drift at ~8%% fps)")
    parser.add_argument("--warmup", action="store_true",
                        help="realtime mode: compile the fused step on a dummy "
                             "frame before starting the publishers")
    parser.add_argument("--profile", action="store_true",
                        help="batch mode: wrap stages in StageTimer + a "
                             "jax.profiler device trace; dumps "
                             "reports/profile_stages.json and reports/xprof/")
    args = parser.parse_args(argv)

    if args.mode == "realtime":
        run_realtime(args)
    else:
        run_batch(args)


if __name__ == "__main__":
    main()
