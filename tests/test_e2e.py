"""End-to-end: rendered stereo images + IMU -> full fused pipeline -> ATE."""

import numpy as np
import jax.numpy as jnp
import pytest

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.models.vio import VioFrame, run_sequence
from uav_airvision_tpu.simulation.world import StereoWorld
from uav_airvision_tpu.streaming.prebatch import prebatch_imu


def _build(duration=3.5, seed=5):
    cfg = euroc_config()
    world = StereoWorld(cfg)
    imu_t, imu_w, imu_a = world.imu_stream(duration)
    fts = world.frame_times(duration)
    rng = np.random.default_rng(seed)
    cam0, cam1 = [], []
    for t in fts:
        i0, i1 = world.render_frame(t, rng)
        cam0.append(i0)
        cam1.append(i1)
    pb = prebatch_imu(fts, imu_t, imu_w, imu_a, cfg.capacity.max_imu_per_frame,
                      cfg.capacity.imu_init_msgs)
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
    return cfg, world, frames, pb


@pytest.mark.slow
def test_full_pipeline_tracks_ground_truth():
    cfg, world, frames, pb = _build()
    state, outs = run_sequence(cfg, frames, pb.gyro_bias, pb.acc_mean)
    act = np.asarray(outs.active)
    assert act.sum() > 30
    p = np.asarray(outs.p)[act]
    t_act = np.asarray(outs.timestamp)[act]
    gt = world.groundtruth(t_act)
    ate = np.linalg.norm(p - gt, axis=1)
    assert np.isfinite(ate).all()
    assert ate.max() < 0.08, f"e2e ATE too large: {ate.max():.3f} m"
    # the filter keeps its invariants
    assert int(state.filter.cams.count) <= cfg.filter.max_cam_state_size
    assert bool(jnp.all(jnp.isfinite(state.filter.cov)))


@pytest.mark.slow
def test_euroc_dataset_to_cli(tmp_path, monkeypatch, capsys):
    """Dataset -> CLI path end-to-end (reference entry src/main.py:10-34):
    write a EuRoC-format directory with euroc_writer, run
    ``main.main(["--path", ..., "--eval"])``, assert the trajectory file
    exists and the evaluated ATE is finite and small."""
    from uav_airvision_tpu import main as cli
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.simulation.euroc_writer import write_euroc_dataset
    from uav_airvision_tpu.simulation.world import StereoWorld

    ds = tmp_path / "SYN_CLI"
    write_euroc_dataset(StereoWorld(euroc_config()), str(ds), duration=2.0)
    monkeypatch.chdir(tmp_path)  # trajectory lands in ./results/txts
    cli.main(["--path", str(ds), "--offset", "0", "--eval"])
    stdout = capsys.readouterr().out
    traj = tmp_path / "results" / "txts" / "output_SYN_CLI_offset0.txt"
    assert traj.exists()
    lines = traj.read_text().splitlines()
    assert len(lines) >= 15  # ~40 frames minus init/gravity settling
    assert "[eval] ATE rmse=" in stdout
    rmse = float(stdout.split("[eval] ATE rmse=")[1].split("m")[0])
    assert np.isfinite(rmse) and rmse < 0.1


@pytest.mark.slow
def test_trajectory_writer_format(tmp_path):
    from uav_airvision_tpu.utils.trajectory import TrajectoryWriter
    from uav_airvision_tpu.evaluation.metrics import load_trajectory_txt

    w = TrajectoryWriter(path=str(tmp_path / "out.txt"))
    w.write_batch(
        np.array([1.5, 2.0]),
        np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]),
        np.array([[0, 0, 0, 1.0], [0, 0, 0, 1.0]]),
    )
    with open(w.path) as f:
        lines = f.read().splitlines()
    assert lines[0] == "1.500000 0.100000000 0.200000000 0.300000000 0.000000000 0.000000000 0.000000000 1.000000000"
    t, p, q = load_trajectory_txt(w.path)
    assert len(t) == 2 and p.shape == (2, 3) and q.shape == (2, 4)


@pytest.mark.slow
def test_equidistant_calib_full_pipeline():
    """Fisheye (equidistant) calibration through the FULL pipeline — the
    _dispatch plumbing (pipeline.py publish path + ops/camera.py:93-96) is
    otherwise only unit-tested.  The simulator renders with the equidistant
    model too, so geometry is self-consistent and the filter should track."""
    import dataclasses

    cfg0 = euroc_config()
    fisheye = (-0.0113, 0.0052, -0.0021, 0.0005)
    calib = dataclasses.replace(
        cfg0.calib,
        cam0_distortion_model="equidistant",
        cam0_distortion_coeffs=fisheye,
        cam1_distortion_model="equidistant",
        cam1_distortion_coeffs=(-0.0098, 0.0049, -0.0018, 0.0004),
    )
    cfg = dataclasses.replace(cfg0, calib=calib)

    world = StereoWorld(cfg)
    duration, seed = 3.0, 3
    imu_t, imu_w, imu_a = world.imu_stream(duration)
    fts = world.frame_times(duration)
    rng = np.random.default_rng(seed)
    cam0, cam1 = [], []
    for t in fts:
        i0, i1 = world.render_frame(t, rng)
        cam0.append(i0)
        cam1.append(i1)
    pb = prebatch_imu(fts, imu_t, imu_w, imu_a, cfg.capacity.max_imu_per_frame,
                      cfg.capacity.imu_init_msgs)
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
    state, outs = run_sequence(cfg, frames, pb.gyro_bias, pb.acc_mean)
    act = np.asarray(outs.active)
    assert act.sum() > 25, f"too few poses under equidistant calib: {act.sum()}"
    p = np.asarray(outs.p)[act]
    assert np.isfinite(p).all()
    t_act = np.asarray(outs.timestamp)[act]
    gt = world.groundtruth(t_act)
    ate = np.linalg.norm(p - gt, axis=1)
    assert ate.max() < 0.15, f"equidistant e2e ATE too large: {ate.max():.3f} m"
    assert bool(jnp.all(jnp.isfinite(state.filter.cov)))
