"""Synthetic stereo-VIO world: analytic trajectory + textured-plane renderer.

Generates a fully consistent sensor stream (stereo images with the real EuRoC
calibration incl. radtan distortion, 200 Hz IMU with biases and noise, ground
truth) so the complete pipeline can be exercised, benchmarked, and
fault-injected without the EuRoC dataset on disk.  The reference has no
equivalent; its only data path is dataset playback.

Conventions match the estimator: JPL world->IMU quaternion, gravity -z,
camera extrinsics from the config.  The scene is a textured plane placed
along the cameras' boresight (EuRoC's cam0 z-axis ~ IMU +z, which this world
keeps pointed at world +z).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@dataclass
class Trajectory:
    """Smooth 1-cos trajectory, static for t < t0 (IMU init window)."""

    t0: float = 1.5
    amp: np.ndarray = None
    om: np.ndarray = None
    yaw_amp: float = 0.4
    yaw_om: float = 0.25

    def __post_init__(self):
        if self.amp is None:
            self.amp = np.array([1.0, 0.6, 0.3])
        if self.om is None:
            self.om = np.array([0.5, 0.4, 0.3])

    def _tau(self, t):
        return max(t - self.t0, 0.0)

    def pos(self, t):
        tau = self._tau(t)
        return self.amp * (1.0 - np.cos(self.om * tau))

    def vel(self, t):
        tau = self._tau(t)
        return self.amp * self.om * np.sin(self.om * tau)

    def acc(self, t):
        if t < self.t0:
            return np.zeros(3)
        tau = self._tau(t)
        return self.amp * self.om**2 * np.cos(self.om * tau)

    def yaw(self, t):
        return self.yaw_amp * (1.0 - np.cos(self.yaw_om * self._tau(t)))

    def yaw_rate(self, t):
        return self.yaw_amp * self.yaw_om * np.sin(self.yaw_om * self._tau(t))

    def R_i_w(self, t):
        """IMU -> world rotation."""
        return _rz(self.yaw(t))

    def omega_body(self, t):
        return self.R_i_w(t).T @ np.array([0.0, 0.0, self.yaw_rate(t)])


def make_texture(size=1536, seed=7, octaves=4):
    """Multi-octave smooth random texture, uint8."""
    try:
        import cv2
    except Exception:
        cv2 = None
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size))
    for o in range(octaves):
        n = size >> (octaves + 1 - o)
        layer = rng.uniform(-1, 1, (max(n, 4), max(n, 4)))
        if cv2 is not None:
            layer = cv2.resize(layer, (size, size), interpolation=cv2.INTER_CUBIC)
        else:
            reps = int(np.ceil(size / layer.shape[0]))
            layer = np.kron(layer, np.ones((reps, reps)))[:size, :size]
        tex += layer / (o + 1)
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9)
    return (tex * 255).astype(np.uint8)


class StereoWorld:
    """Textured plane at z=plane_z rendered through the calibrated stereo rig."""

    def __init__(self, config, plane_z=6.0, tex_scale=12.0, seed=7,
                 trajectory: Trajectory = None):
        self.config = config
        self.plane_z = plane_z
        self.tex = make_texture(seed=seed).astype(np.float32)
        self.tex_scale = tex_scale  # meters covered by the full texture
        self.traj = trajectory or Trajectory()

        w, h = config.calib.cam0_resolution
        self.W, self.H = w, h
        self._rays = {}
        for name, intr, coeffs in (
            ("cam0", config.calib.cam0_intrinsics, config.calib.cam0_distortion_coeffs),
            ("cam1", config.calib.cam1_intrinsics, config.calib.cam1_distortion_coeffs),
        ):
            self._rays[name] = self._pixel_rays(intr, coeffs)

        T0 = np.linalg.inv(config.np_T_imu_cam0())  # cam0 -> imu
        T1 = np.linalg.inv(config.np_T_imu_cam1())
        self.R_c0_i, self.t_c0_i = T0[:3, :3], T0[:3, 3]
        self.R_c1_i, self.t_c1_i = T1[:3, :3], T1[:3, 3]

    def _pixel_rays(self, intr, coeffs):
        """Undistorted normalized ray (x, y, 1) per pixel — computed once."""
        fx, fy, cx, cy = intr
        u, v = np.meshgrid(np.arange(self.W), np.arange(self.H))
        x = (u - cx) / fx
        y = (v - cy) / fy
        k1, k2, p1, p2 = coeffs
        x0, y0 = x.copy(), y.copy()
        for _ in range(8):
            r2 = x * x + y * y
            icdist = 1.0 / (1.0 + k1 * r2 + k2 * r2 * r2)
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            x = (x0 - dx) * icdist
            y = (y0 - dy) * icdist
        return np.stack([x, y, np.ones_like(x)], axis=-1).astype(np.float32)

    def _render_cam(self, rays, R_c_w, t_c_w, rng):
        ray_w = rays @ R_c_w.T  # (H,W,3)
        rz = ray_w[..., 2]
        s = (self.plane_z - t_c_w[2]) / np.where(np.abs(rz) > 1e-6, rz, 1e-6)
        wx = t_c_w[0] + s * ray_w[..., 0]
        wy = t_c_w[1] + s * ray_w[..., 1]
        n = self.tex.shape[0]
        fx = (wx / self.tex_scale) * n
        fy = (wy / self.tex_scale) * n
        ix = np.floor(fx).astype(np.int64)
        iy = np.floor(fy).astype(np.int64)
        ax = (fx - ix).astype(np.float32)
        ay = (fy - iy).astype(np.float32)
        ix %= n
        iy %= n
        ix1 = (ix + 1) % n
        iy1 = (iy + 1) % n
        tex = self.tex
        val = (
            tex[iy, ix] * (1 - ax) * (1 - ay)
            + tex[iy, ix1] * ax * (1 - ay)
            + tex[iy1, ix] * (1 - ax) * ay
            + tex[iy1, ix1] * ax * ay
        )
        val = val + rng.normal(0, 1.0, val.shape)
        return np.clip(val, 0, 255).astype(np.uint8)

    def render_frame(self, t, rng=None, starve_window=None):
        """Render the stereo pair at trajectory time t.

        starve_window: optional (t0, t1) fault-injection interval during
        which the scene is textureless (uniform gray + sensor noise) —
        starves FAST of corners to exercise feature-loss recovery paths
        (gap called out in SURVEY.md section 5: the reference has no fault
        injection)."""
        rng = rng or np.random.default_rng(int(t * 1e6) & 0xFFFFFF)
        if starve_window is not None and starve_window[0] <= t < starve_window[1]:
            flat0 = np.clip(128.0 + rng.normal(0, 1.0, (self.H, self.W)), 0, 255)
            flat1 = np.clip(128.0 + rng.normal(0, 1.0, (self.H, self.W)), 0, 255)
            return flat0.astype(np.uint8), flat1.astype(np.uint8)
        R_i_w = self.traj.R_i_w(t)
        p = self.traj.pos(t)
        # cam -> world pose
        R0 = R_i_w @ self.R_c0_i
        t0 = R_i_w @ self.t_c0_i + p
        R1 = R_i_w @ self.R_c1_i
        t1 = R_i_w @ self.t_c1_i + p
        img0 = self._render_cam(self._rays["cam0"], R0, t0, rng)
        img1 = self._render_cam(self._rays["cam1"], R1, t1, rng)
        return img0, img1

    def imu_stream(self, duration, rate=200, gyro_bias=(2e-3, -1e-3, 5e-4),
                   noise=1e-3, seed=0, g=9.81, dropout_window=None):
        """IMU samples; dropout_window=(t0, t1) optionally removes every
        sample in that interval (sensor-outage fault injection)."""
        rng = np.random.default_rng(seed)
        g_w = np.array([0.0, 0.0, -g])
        bg = np.asarray(gyro_bias)
        n = int(duration * rate)
        ts = np.arange(n) / rate
        w = np.zeros((n, 3))
        a = np.zeros((n, 3))
        for i, t in enumerate(ts):
            R_wi = self.traj.R_i_w(t).T
            w[i] = self.traj.omega_body(t) + bg + rng.normal(0, noise, 3)
            a[i] = R_wi @ (self.traj.acc(t) - g_w) + rng.normal(0, noise, 3)
        if dropout_window is not None:
            keep = (ts < dropout_window[0]) | (ts >= dropout_window[1])
            ts, w, a = ts[keep], w[keep], a[keep]
        return ts, w, a

    def frame_times(self, duration, fps=20):
        n = int(duration * fps)
        return np.arange(n) / fps

    def groundtruth(self, ts):
        return np.stack([self.traj.pos(t) for t in ts])
