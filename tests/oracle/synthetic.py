"""Synthetic VIO scenario generator (test-only).

Produces a consistent stream of IMU measurements and stereo feature
observations from an analytic trajectory + random landmarks, in the exact
conventions of the estimator (JPL world->IMU quaternion, normalized stereo
measurements, EuRoC extrinsics).
"""

from dataclasses import dataclass

import numpy as np

from .quat_oracle import o_to_rotation, o_to_quaternion


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


@dataclass
class Scenario:
    imu: list  # [(t, w(3), a(3))]
    frames: list  # [(t, [(fid, u0, v0, u1, v1)])]
    gt: list  # [(t, p(3), q_wi(4))]
    gyro_bias: np.ndarray
    acc_mean: np.ndarray


def make_scenario(
    config,
    duration=6.0,
    imu_rate=200,
    cam_rate=20,
    n_landmarks=120,
    track_len=12,
    noise_imu=1e-3,
    noise_px=5e-4,
    seed=0,
):
    rng = np.random.default_rng(seed)
    g_w = np.array([0.0, 0.0, -9.81])

    # analytic trajectory: static for t < t0 (so the gravity/bias init sees a
    # resting IMU, like a drone on the ground), then smooth 1-cos motion with
    # zero initial velocity.
    t0 = 1.5
    amp = np.array([1.0, 0.6, 0.3])
    om = np.array([0.5, 0.4, 0.3])

    def _tau(t):
        return max(t - t0, 0.0)

    def pos(t):
        tau = _tau(t)
        return amp * (1.0 - np.cos(om * tau))

    def vel(t):
        tau = _tau(t)
        return amp * om * np.sin(om * tau)

    def acc_w(t):
        tau = _tau(t)
        return (amp * om * om * np.cos(om * tau)) if t >= t0 else np.zeros(3)

    yaw_amp, yaw_om = 0.4, 0.25

    def _yaw(t):
        return yaw_amp * (1.0 - np.cos(yaw_om * _tau(t)))

    def _yaw_rate(t):
        return yaw_amp * yaw_om * np.sin(yaw_om * _tau(t))

    def R_i_w(t):  # imu -> world
        return _rz(_yaw(t))

    def q_w_i(t):  # world -> imu quaternion (JPL)
        return o_to_quaternion(R_i_w(t).T)

    def omega_body(t):
        return R_i_w(t).T @ np.array([0.0, 0.0, _yaw_rate(t)])

    gyro_bias = np.array([2e-3, -1e-3, 5e-4])
    acc_bias = np.zeros(3)

    # IMU stream (includes a 1s static-ish pre-roll used for gravity init)
    imu = []
    n_imu = int(duration * imu_rate)
    for i in range(n_imu):
        t = i / imu_rate
        w = omega_body(t) + gyro_bias + rng.normal(0, noise_imu, 3)
        a = R_i_w(t).T @ (acc_w(t) - g_w) + acc_bias + rng.normal(0, noise_imu, 3)
        imu.append((t, w, a))

    # initialization constants (mean of the first config.capacity.imu_init_msgs)
    n_init = config.capacity.imu_init_msgs
    ws = np.stack([m[1] for m in imu[:n_init]])
    accs = np.stack([m[2] for m in imu[:n_init]])
    gyro_bias_est = ws.mean(axis=0)
    acc_mean = accs.mean(axis=0)

    # landmarks along the camera boresight: EuRoC's cam0 z-axis is the IMU
    # +z axis, which this synthetic world keeps pointing at world +z, so the
    # "scene" is a ceiling of points a few meters above the trajectory.
    landmarks = np.stack(
        [
            rng.uniform(-2.5, 3.5, n_landmarks),
            rng.uniform(-2.0, 3.2, n_landmarks),
            rng.uniform(3.0, 9.0, n_landmarks),
        ],
        axis=1,
    )

    T_i_c0 = config.np_T_imu_cam0()
    T_i_c1 = config.np_T_imu_cam1()

    def project(T_imu_cam, p_w, t):
        R_wi = R_i_w(t).T
        p_i = R_wi @ (p_w - pos(t))
        p_c = T_imu_cam[:3, :3] @ p_i + T_imu_cam[:3, 3]
        if p_c[2] < 0.3:
            return None
        return p_c[:2] / p_c[2]

    frames = []
    gt = []
    n_frames = int(duration * cam_rate)
    for k in range(n_frames):
        t = k / cam_rate
        meas = []
        for fid in range(n_landmarks):
            # deterministic tracker churn: landmark fid visible in a window
            start = (fid * 7) % max(n_frames - track_len, 1)
            if not (start <= k < start + track_len):
                continue
            z0 = project(T_i_c0, landmarks[fid], t)
            z1 = project(T_i_c1, landmarks[fid], t)
            if z0 is None or z1 is None:
                continue
            if np.abs(z0).max() > 0.9 or np.abs(z1).max() > 0.9:
                continue
            n0 = rng.normal(0, noise_px, 2)
            n1 = rng.normal(0, noise_px, 2)
            meas.append((fid, z0[0] + n0[0], z0[1] + n0[1], z1[0] + n1[0], z1[1] + n1[1]))
        frames.append((t, meas))
        gt.append((t, pos(t), q_w_i(t)))

    return Scenario(imu, frames, gt, gyro_bias_est, acc_mean)


def window_imu(scenario, frames_active):
    """Split the IMU stream into per-frame windows (prev_t, t] exactly like
    the estimator's buffer consumption.  Returns list aligned with frames:
    (t, [(t,w,a)...]) for active frames."""
    out = []
    ptr = 0
    imu = scenario.imu
    prev_t = None
    for (t, _meas), active in zip(scenario.frames, frames_active):
        if not active:
            out.append((t, []))
            continue
        if prev_t is None:
            # first processed frame: consume (and discard) everything < t
            while ptr < len(imu) and imu[ptr][0] < t:
                ptr += 1
            window = []
            while ptr < len(imu) and imu[ptr][0] <= t:
                window.append(imu[ptr])
                ptr += 1
            out.append((t, window))
        else:
            window = []
            while ptr < len(imu) and imu[ptr][0] <= t:
                window.append(imu[ptr])
                ptr += 1
            out.append((t, window))
        prev_t = t
    return out
