"""Streaming VIO orchestrator — the real-time API.

API-compatible with the reference orchestrator
(``VIO(config, img_queue, imu_queue, viewer).start()``, reference
src/modules/vio.py:6-53), but instead of three Python threads handing
messages between Python objects, the consumer threads assemble fixed-shape
frames on the host and launch ONE compiled device step per stereo frame
(front-end + estimator fused).  IMU messages are only buffered host-side;
gravity/bias initialization happens after ``imu_init_msgs`` messages exactly
like the reference (msckf.py:162-174).
"""

from __future__ import annotations

from collections import namedtuple
from queue import Queue
from threading import Thread

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .utils.precision import with_highest_precision
from .models.frontend.params import make_frontend_params
from .models.frontend.pipeline import frontend_step, init_frontend_state
from .models.msckf.state import init_state, make_params
from .models.msckf.step import FrameInput, backend_step
from .utils.trajectory import TrajectoryWriter
from .utils import quaternion as quat
from .utils.transforms import Isometry

vio_result = namedtuple("vio_result", ["timestamp", "pose", "velocity", "cam0_pose"])


class VIO:
    def __init__(self, config: Config, img_queue: Queue, imu_queue: Queue,
                 viewer=None, trajectory_writer: TrajectoryWriter = None):
        self.config = config
        self.viewer = viewer
        self.img_queue = img_queue
        self.imu_queue = imu_queue
        self.writer = trajectory_writer or TrajectoryWriter()

        self.fparams = make_frontend_params(config)
        self.mparams = make_params(config)
        self._fe_step = with_highest_precision(jax.jit(
            lambda st, c0, c1, w, dt: frontend_step(st, c0, c1, w, dt,
                                                    self.fparams, self.config)
        ))
        self._be_step = with_highest_precision(jax.jit(
            lambda st, fr: backend_step(st, fr, self.mparams, self.config)
        ))

        self.fe_state = init_frontend_state(config)
        self.filter_state = None  # created after gravity init
        self.time_base = None  # float32-device time rebase (see prebatch.py)
        self.imu_buffer = []  # (t, w, a)
        self.fe_ptr_t = -np.inf  # front-end window truncation point
        self.prev_img_t = None
        self.is_gravity_set = False
        self.gyro_bias = None
        self.acc_mean = None
        self.results = []

        self.img_thread = Thread(target=self._process_img, daemon=True)
        self.imu_thread = Thread(target=self._process_imu, daemon=True)

    def start(self):
        self.imu_thread.start()
        self.img_thread.start()

    def join(self):
        self.img_thread.join()

    # ------------------------------------------------------------------
    def _process_imu(self):
        while True:
            msg = self.imu_queue.get()
            if msg is None:
                break
            self.imu_buffer.append(
                (msg.timestamp, np.asarray(msg.angular_velocity),
                 np.asarray(msg.linear_acceleration))
            )
            if not self.is_gravity_set and len(self.imu_buffer) >= self.config.capacity.imu_init_msgs:
                n = self.config.capacity.imu_init_msgs
                ws = np.stack([m[1] for m in self.imu_buffer[:n]])
                accs = np.stack([m[2] for m in self.imu_buffer[:n]])
                self.gyro_bias = ws.mean(axis=0)
                self.acc_mean = accs.mean(axis=0)
                self.filter_state = init_state(self.config, self.mparams,
                                               self.gyro_bias, self.acc_mean)
                self.is_gravity_set = True

    def _frontend_window(self, curr_t):
        """Mean angular velocity over [prev_t - 0.01, curr_t - 0.004) with the
        reference's buffer-truncation semantics."""
        if self.prev_img_t is None:
            return np.zeros(3), 0.0
        lo = self.prev_img_t - 0.01
        hi = curr_t - 0.004
        window = [m for m in self.imu_buffer if self.fe_ptr_t <= m[0] and lo <= m[0] < hi]
        if not any(m[0] >= hi for m in self.imu_buffer if m[0] >= self.fe_ptr_t):
            return np.zeros(3), curr_t - self.prev_img_t
        mean = (
            np.mean(np.stack([m[1] for m in window]), axis=0)
            if window else np.zeros(3)
        )
        self.fe_ptr_t = hi
        # NOTE: unlike compat.ImageProcessor, this buffer IS truncated every
        # frame by _backend_imu_slice once the filter starts, so no extra
        # truncation here (and trimming earlier would race the 200-message
        # gravity-init read in _process_imu).
        return mean, curr_t - self.prev_img_t

    def _backend_imu_slice(self, frame_t):
        cap = self.config.capacity
        I = cap.max_imu_per_frame
        out_t = np.zeros(I)
        out_w = np.zeros((I, 3))
        out_a = np.zeros((I, 3))
        out_m = np.zeros(I, bool)
        consumed = 0
        j = 0
        for (t, w, a) in self.imu_buffer:
            if t > frame_t:
                break
            consumed += 1
            if j < I:
                out_t[j], out_w[j], out_a[j], out_m[j] = t, w, a, True
                j += 1
        self.imu_buffer = self.imu_buffer[consumed:]
        return out_t, out_w, out_a, out_m

    def _process_img(self):
        while True:
            msg = self.img_queue.get()
            if msg is None:
                break
            if self.viewer is not None:
                self.viewer.update_image(msg.cam0_image)
            t = msg.timestamp
            mean_w, dt = self._frontend_window(t)
            self.fe_state, fe_out = self._fe_step(
                self.fe_state,
                jnp.asarray(msg.cam0_image), jnp.asarray(msg.cam1_image),
                jnp.asarray(mean_w, jnp.float32), jnp.asarray(dt, jnp.float32),
            )
            self.prev_img_t = t

            if not self.is_gravity_set:
                continue
            if self.filter_state.started:
                imu_t, imu_w, imu_a, imu_m = self._backend_imu_slice(t)
            else:
                # first processed frame: discard everything before its stamp
                self.imu_buffer = [m for m in self.imu_buffer if m[0] >= t]
                imu_t, imu_w, imu_a, imu_m = self._backend_imu_slice(t)
            if self.time_base is None:
                self.time_base = t
            base = self.time_base
            dtype = self.filter_state.cov.dtype
            frame = FrameInput(
                timestamp=jnp.asarray(t - base, dtype),
                imu_t=jnp.asarray(np.where(imu_m, imu_t - base, 0.0), dtype),
                imu_w=jnp.asarray(imu_w, dtype),
                imu_a=jnp.asarray(imu_a, dtype),
                imu_mask=jnp.asarray(imu_m),
                feat_ids=fe_out.ids,
                feat_uv=fe_out.uv.astype(dtype),
                feat_mask=fe_out.mask,
                active=jnp.asarray(True),
            )
            self.filter_state, out = self._be_step(self.filter_state, frame)
            result = self._publish(out)
            if result is not None and self.viewer is not None:
                self.viewer.update_pose(result.cam0_pose)

    def _publish(self, out):
        if not bool(out.active):
            return None
        q = np.asarray(out.q)
        p = np.asarray(out.p)
        v = np.asarray(out.v)
        t_abs = (self.time_base or 0.0) + float(out.timestamp)
        self.writer.append(t_abs, p, q)

        R_w_i = np.asarray(quat.to_rotation(jnp.asarray(q)))
        Tib = self.config.np_T_imu_body()
        T_i_w = (R_w_i.T, p)
        # body pose: T_imu_body * T_i_w * T_imu_body^-1 (reference publish)
        Rb, tb = Tib[:3, :3], Tib[:3, 3]
        R_b_w = Rb @ T_i_w[0] @ Rb.T
        t_b_w = Rb @ (T_i_w[1] - T_i_w[0] @ Rb.T @ tb) + tb
        body_pose = Isometry(jnp.asarray(R_b_w), jnp.asarray(t_b_w))
        body_velocity = Rb @ v

        imu = self.filter_state.imu
        R_w_c = np.asarray(imu.R_imu_cam0) @ R_w_i
        t_c_w = p + R_w_i.T @ np.asarray(imu.t_cam0_imu)
        cam0_pose = Isometry(jnp.asarray(R_w_c.T), jnp.asarray(t_c_w))
        result = vio_result(t_abs, body_pose, body_velocity, cam0_pose)
        self.results.append(result)
        return result
