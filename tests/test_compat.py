"""Reference-shaped facade API (compat.ImageProcessor / compat.MSCKF) and
fault-injection scenarios on the synthetic world."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.compat import ImageProcessor, MSCKF, FeatureMeasurement
from uav_airvision_tpu.simulation.world import StereoWorld
from uav_airvision_tpu.streaming.dataset import imu_msg, stereo_msg


@pytest.fixture(scope="module")
def small_cfg():
    cfg = euroc_config()
    sx, sy = 188.0 / 752.0, 120.0 / 480.0
    c = cfg.calib
    fx, fy, cx, cy = c.cam0_intrinsics
    cam0 = (fx * sx, fy * sy, cx * sx, cy * sy)
    fx, fy, cx, cy = c.cam1_intrinsics
    cam1 = (fx * sx, fy * sy, cx * sx, cy * sy)
    calib = dataclasses.replace(
        c, cam0_intrinsics=cam0, cam1_intrinsics=cam1,
        cam0_resolution=(188, 120), cam1_resolution=(188, 120),
    )
    cap = dataclasses.replace(
        cfg.capacity, max_features=64, max_map_features=128,
        max_lost_per_frame=32, max_prune_feats=48,
        max_update_rows=512, max_prune_rows=512, max_imu_per_frame=32,
        imu_init_msgs=40,
    )
    return dataclasses.replace(cfg, calib=calib, capacity=cap)


def test_reference_facade_end_to_end(small_cfg):
    """Drive the reference-style callback API: IMU msgs + stereo msgs in,
    vio_results out, including the stareo_callback typo alias."""
    world = StereoWorld(small_cfg)
    imu_t, imu_w, imu_a = world.imu_stream(2.0, seed=1)
    fts = world.frame_times(2.0)

    ip = ImageProcessor(small_cfg)
    filt = MSCKF(small_cfg)
    assert ip.stareo_callback is not None  # legacy alias exists

    results = []
    k = 0
    rng = np.random.default_rng(0)
    for t in fts:
        while k < len(imu_t) and imu_t[k] <= t:
            m = imu_msg(imu_t[k], imu_w[k], imu_a[k])
            ip.imu_callback(m)
            filt.imu_callback(m)
            k += 1
        c0, c1 = world.render_frame(t, rng)
        fmsg = ip.stereo_callback(stereo_msg(t, c0, c1, None, None))
        assert all(isinstance(f, FeatureMeasurement) for f in fmsg.features)
        out = filt.feature_callback(fmsg)
        if out is not None:
            results.append(out)

    assert filt.is_gravity_set
    assert len(results) > 10
    # trajectory should roughly follow the ground truth
    errs = [
        np.linalg.norm(r.position - world.traj.pos(r.timestamp))
        for r in results[5:]
    ]
    assert max(errs) < 0.5
    assert ip.num_features["after_ransac"] == ip.num_features["after_matching"]

    # full reset clears everything (reference reset API, msckf.py:800-819)
    filt.reset()
    assert filt.state is None and not filt.is_gravity_set


def test_feature_starvation_recovery(small_cfg):
    """Textureless interval starves the tracker; the filter must stay finite
    and keep producing output afterwards."""
    world = StereoWorld(small_cfg)
    imu_t, imu_w, imu_a = world.imu_stream(3.0, seed=2)
    fts = world.frame_times(3.0)

    ip = ImageProcessor(small_cfg)
    filt = MSCKF(small_cfg)
    k = 0
    results = []
    rng = np.random.default_rng(1)
    for t in fts:
        while k < len(imu_t) and imu_t[k] <= t:
            m = imu_msg(imu_t[k], imu_w[k], imu_a[k])
            ip.imu_callback(m)
            filt.imu_callback(m)
            k += 1
        c0, c1 = world.render_frame(t, rng, starve_window=(1.4, 1.8))
        out = filt.feature_callback(ip.stereo_callback(stereo_msg(t, c0, c1, None, None)))
        if out is not None:
            results.append(out)

    assert len(results) > 10
    assert np.isfinite(np.asarray(filt.state.cov)).all()
    assert all(np.isfinite(r.position).all() for r in results)


def test_imu_dropout_stays_finite(small_cfg):
    """A 0.3 s IMU outage: frames in the gap propagate with whatever samples
    exist; the filter must not produce NaNs."""
    world = StereoWorld(small_cfg)
    imu_t, imu_w, imu_a = world.imu_stream(2.5, seed=3, dropout_window=(1.5, 1.8))
    fts = world.frame_times(2.5)

    ip = ImageProcessor(small_cfg)
    filt = MSCKF(small_cfg)
    k = 0
    rng = np.random.default_rng(2)
    for t in fts:
        while k < len(imu_t) and imu_t[k] <= t:
            m = imu_msg(imu_t[k], imu_w[k], imu_a[k])
            ip.imu_callback(m)
            filt.imu_callback(m)
            k += 1
        c0, c1 = world.render_frame(t, rng)
        filt.feature_callback(ip.stereo_callback(stereo_msg(t, c0, c1, None, None)))
    assert np.isfinite(np.asarray(filt.state.cov)).all()


def test_msckf_reset_preserves_learned_extrinsics(small_cfg):
    """Reference reset() keeps the learned IMU-cam0 extrinsics and the state
    id across the re-initialization (msckf.py:800-819)."""
    filt = MSCKF(small_cfg)
    for i in range(small_cfg.capacity.imu_init_msgs):
        filt.imu_callback(imu_msg(i * 0.005, np.zeros(3), np.array([0, 0, 9.81])))
    assert filt.is_gravity_set

    # simulate learned extrinsics (updates touch them in real runs)
    R_learned = np.asarray(filt.state.imu.R_imu_cam0) @ np.array(
        [[0.9998, -0.02, 0], [0.02, 0.9998, 0], [0, 0, 1.0]])
    t_learned = np.asarray(filt.state.imu.t_cam0_imu) + 0.003
    filt.state = filt.state._replace(imu=filt.state.imu._replace(
        R_imu_cam0=jnp.asarray(R_learned, filt.state.cov.dtype),
        t_cam0_imu=jnp.asarray(t_learned, filt.state.cov.dtype),
        sid=jnp.asarray(7, jnp.int32),
    ))

    filt.reset()
    assert not filt.is_gravity_set
    for i in range(small_cfg.capacity.imu_init_msgs):
        filt.imu_callback(imu_msg(10 + i * 0.005, np.zeros(3), np.array([0, 0, 9.81])))
    assert filt.is_gravity_set
    np.testing.assert_allclose(np.asarray(filt.state.imu.R_imu_cam0),
                               R_learned, atol=1e-6)
    np.testing.assert_allclose(np.asarray(filt.state.imu.t_cam0_imu),
                               t_learned, atol=1e-6)
    assert int(filt.state.imu.sid) == 7
    assert int(filt.state.cams.count) == 0
