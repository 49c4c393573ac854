"""Streaming VIO orchestrator — the real-time API.

API-compatible with the reference orchestrator
(``VIO(config, img_queue, imu_queue, viewer).start()``, reference
src/modules/vio.py:6-53), but instead of three Python threads handing
messages between Python objects, the consumer thread assembles a fixed-shape
frame on the host and launches ONE fused compiled device step per stereo
frame (front-end + estimator, the same ``vio_step`` the batch scan runs),
with the state buffers donated so no copy of the covariance/feature tables/
banded pyramid happens per frame.  Publishing (trajectory write, viewer
feed) runs on a separate thread consuming device outputs asynchronously —
the device->host sync of frame k overlaps the dispatch of frame k+1.  IMU
messages are only buffered host-side; gravity/bias initialization happens
after ``imu_init_msgs`` messages exactly like the reference
(msckf.py:162-174).
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
from .models.frontend.pipeline import init_frontend_state
from .models.msckf.state import init_state, make_params
from .models.vio import VioFrame, VioState, unpack_frame, vio_step
from .utils.trajectory import TrajectoryWriter
from .utils import quaternion as quat
from .utils.transforms import Isometry

vio_result = namedtuple("vio_result", ["timestamp", "pose", "velocity", "cam0_pose"])


def _pack_frame(t, cam0, cam1, imu_t, imu_w, imu_a, imu_m, mean_w, dt,
                active, I):
    """Host side of the two-transfer frame layout (see VIO.__init__)."""
    packed = np.empty(6 + 8 * I, np.float32)
    packed[0] = t
    packed[1] = dt
    packed[2] = float(active)
    packed[3:6] = mean_w
    packed[6:6 + I] = imu_t
    packed[6 + I:6 + 4 * I] = np.asarray(imu_w, np.float32).reshape(-1)
    packed[6 + 4 * I:6 + 7 * I] = np.asarray(imu_a, np.float32).reshape(-1)
    packed[6 + 7 * I:] = imu_m
    imgs = np.stack([cam0, cam1])
    return imgs, packed


# Device-side unpack lives in models.vio (shared with the packed batch scan).
_unpack_frame = unpack_frame


def _pack_out(out):
    """Device side (traced): StepOutput publish fields -> ONE (24,) f32
    vector.  Layout: [timestamp, active, q(4), p(3), v(3), R_imu_cam0(9),
    t_cam0_imu(3)]."""
    f32 = jnp.float32
    return jnp.concatenate([
        out.timestamp.reshape(1).astype(f32),
        out.active.reshape(1).astype(f32),
        out.q.astype(f32), out.p.astype(f32), out.v.astype(f32),
        out.R_imu_cam0.reshape(9).astype(f32),
        out.t_cam0_imu.astype(f32),
    ])


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
        # The per-frame inputs cross the (high-latency) axon tunnel as TWO
        # transfers — one (2,H,W) uint8 image stack and one packed float32
        # vector holding every scalar/IMU field — instead of one transfer
        # per VioFrame leaf: each host->device put is its own round trip,
        # and at ~10 leaves the latency (not the bytes) was the streaming
        # bottleneck.  The frame is unpacked on-device inside the jit.
        I = config.capacity.max_imu_per_frame

        def _packed_step(st, imgs, packed):
            frame = _unpack_frame(imgs, packed, I)
            st, out = vio_step(st, frame, self.fparams, self.mparams,
                               self.config)
            # publish fields flattened to ONE device buffer: a device_get
            # over the axon tunnel pays per-leaf latency, and the publisher
            # fetches every frame (see _publish_loop)
            return st, _pack_out(out)

        self._step = with_highest_precision(jax.jit(
            _packed_step, donate_argnums=(0,),
        ))

        # jnp.copy normalizes the freshly-initialized buffers: donation of
        # eagerly-created arrays trips an InvalidArgument in the axon TPU
        # backend (copies produced by a jit execute donate fine)
        self.vio_state = jax.tree.map(jnp.copy, VioState(
            frontend=init_frontend_state(config),
            filter=init_state(config, self.mparams, np.zeros(3),
                              np.asarray([0.0, 0.0, 9.81])),
        ))
        self.time_base = None  # float32-device time rebase (see prebatch.py)
        self.imu_buffer = []  # (t, w, a)
        self.fe_ptr_t = -np.inf  # front-end window truncation point
        self._be_ptr_t = -np.inf  # backend consumption pointer
        self._started = False  # first active frame processed
        self.prev_img_t = None
        self.is_gravity_set = False
        self.gyro_bias = None
        self.acc_mean = None
        self.results = []

        self.img_thread = Thread(target=self._process_img, daemon=True)
        self.imu_thread = Thread(target=self._process_imu, daemon=True)
        self._publish_queue = Queue(maxsize=64)
        self.publish_thread = Thread(target=self._publish_loop, daemon=True)

    def start(self):
        self.imu_thread.start()
        self.img_thread.start()
        self.publish_thread.start()

    def join(self):
        self.img_thread.join()
        self.publish_thread.join()

    def warmup(self):
        """Compile the fused step on a dummy inactive frame (throwaway state
        copy — the real one is never donated here)."""
        cap = self.config.capacity
        h, w = self.config.calib.cam0_resolution[1], self.config.calib.cam0_resolution[0]
        I = cap.max_imu_per_frame
        imgs = np.zeros((2, h, w), np.uint8)
        packed = np.zeros(6 + 8 * I, np.float32)
        st = jax.tree.map(jnp.copy, self.vio_state)
        st, out = self._step(st, imgs, packed)
        jax.block_until_ready(out)

    # ------------------------------------------------------------------
    def process_imu_msg(self, msg):
        """Buffer one IMU message (thread-agnostic; the imu thread calls
        this, and tests may call it synchronously)."""
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
            # the img thread owns vio_state; it swaps the filter in
            # before the first active frame
            self.is_gravity_set = True

    def _process_imu(self):
        while True:
            msg = self.imu_queue.get()
            if msg is None:
                break
            self.process_imu_msg(msg)

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
        """Messages in (last consumed, frame_t] for the propagation window.

        Consumption is tracked by pointer (``_be_ptr_t``) and the buffer
        retains an 11 ms tail past the consumed point: the NEXT frame's
        front-end rotation window starts at frame_t - 0.01 and must still
        see those messages (the reference keeps separate buffers per
        consumer, imu_processor.py:66 vs msckf.py:251-273)."""
        cap = self.config.capacity
        I = cap.max_imu_per_frame
        out_t = np.zeros(I)
        out_w = np.zeros((I, 3))
        out_a = np.zeros((I, 3))
        out_m = np.zeros(I, bool)
        j = 0
        for (t, w, a) in self.imu_buffer:
            if t > frame_t:
                break
            if t > self._be_ptr_t and j < I:
                out_t[j], out_w[j], out_a[j], out_m[j] = t, w, a, True
                j += 1
        self._be_ptr_t = frame_t
        # Prefix deletion, not list rebuild: the imu thread appends to the
        # END of this list concurrently, and `del buf[:k]` only touches the
        # prefix (a rebuild-and-rebind would silently drop any message
        # appended between the comprehension and the rebind).
        k = 0
        for (t, _, _) in self.imu_buffer:
            if t > frame_t - 0.011:
                break
            k += 1
        if k:
            del self.imu_buffer[:k]
        return out_t, out_w, out_a, out_m

    def _process_img(self):
        try:
            self._process_img_loop()
        finally:
            # unblock join()/the publisher even if the device step raised
            self._publish_queue.put(None)

    def process_stereo_msg(self, msg):
        """One stereo frame through the fused device step (thread-agnostic;
        the img thread calls this, tests may call it synchronously)."""
        if self.viewer is not None:
            self.viewer.update_image(msg.cam0_image)
        t = msg.timestamp
        mean_w, dt = self._frontend_window(t)

        active = self.is_gravity_set
        if active and not self._started:
            # gravity just initialized: swap in the measured-bias filter
            # state and discard IMU messages before the first frame
            # (reference msckf.py:188-190 clock anchoring)
            self.vio_state = VioState(
                frontend=self.vio_state.frontend,
                filter=jax.tree.map(jnp.copy, init_state(
                    self.config, self.mparams,
                    self.gyro_bias, self.acc_mean)),
            )
            # prefix deletion: safe against the imu thread's concurrent
            # appends (see _backend_imu_slice)
            k = 0
            for (mt, _, _) in self.imu_buffer:
                if mt >= t:
                    break
                k += 1
            if k:
                del self.imu_buffer[:k]
            self._started = True
        if active:
            imu_t, imu_w, imu_a, imu_m = self._backend_imu_slice(t)
        else:
            I = self.config.capacity.max_imu_per_frame
            imu_t, imu_w, imu_a, imu_m = (
                np.zeros(I), np.zeros((I, 3)), np.zeros((I, 3)),
                np.zeros(I, bool))
        if self.time_base is None:
            self.time_base = t
        base = self.time_base
        imgs, packed = _pack_frame(
            t - base, msg.cam0_image, msg.cam1_image,
            np.where(imu_m, imu_t - base, 0.0), imu_w, imu_a, imu_m,
            mean_w, dt, active,
            self.config.capacity.max_imu_per_frame,
        )
        # ONE fused async dispatch, TWO host->device transfers; state
        # buffers are donated.  The publisher thread syncs the output while
        # we assemble the next frame.
        self.vio_state, out = self._step(self.vio_state, imgs, packed)
        self.prev_img_t = t
        if active:
            self._publish_queue.put(out)

    def _process_img_loop(self):
        while True:
            msg = self.img_queue.get()
            if msg is None:
                break
            self.process_stereo_msg(msg)

    def _publish_loop(self):
        """Drain device outputs asynchronously: trajectory write + viewer.

        Outputs are fetched in BATCHES: a device_get over the axon tunnel
        pays a fixed per-call sync latency much larger than the transfer,
        so whenever the device step outpaces the fetch, every output queued
        meanwhile is fetched with the next one in a single call (one flat
        (24,) buffer per frame — see _pack_out) and the publisher catches
        up instead of capping throughput at 1/latency."""
        from queue import Empty

        done = False
        while not done:
            batch = [self._publish_queue.get()]
            while True:
                try:
                    batch.append(self._publish_queue.get_nowait())
                except Empty:
                    break
            if batch[-1] is None:
                done = True
                batch.pop()
            if not batch:
                break
            for o in jax.device_get(batch):
                result = self._publish(o)
                if result is not None and self.viewer is not None:
                    self.viewer.update_pose(result.cam0_pose)

    def _publish(self, o):
        # o: host copy of the packed (24,) output vector; pure NumPy from
        # here — no device dispatches on the publish path.
        o = np.asarray(o, np.float64)
        if o[1] < 0.5:  # active flag
            return None
        q = o[2:6]
        p = o[6:9]
        v = o[9:12]
        t_abs = (self.time_base or 0.0) + float(o[0])
        self.writer.append(t_abs, p, q)

        R_w_i = _np_quat_to_rotation(q)
        Tib = self.config.np_T_imu_body()
        T_i_w = (R_w_i.T, p)
        # body pose: T_imu_body * T_i_w * T_imu_body^-1 (reference publish)
        Rb, tb = Tib[:3, :3], Tib[:3, 3]
        R_b_w = Rb @ T_i_w[0] @ Rb.T
        t_b_w = Rb @ (T_i_w[1] - T_i_w[0] @ Rb.T @ tb) + tb
        body_pose = Isometry(R_b_w, t_b_w)
        body_velocity = Rb @ v

        R_w_c = o[12:21].reshape(3, 3) @ R_w_i
        t_c_w = p + R_w_i.T @ o[21:24]
        cam0_pose = Isometry(R_w_c.T, t_c_w)
        result = vio_result(t_abs, body_pose, body_velocity, cam0_pose)
        self.results.append(result)
        return result


def _np_quat_to_rotation(q):
    """JPL quaternion [x y z w] -> rotation matrix, NumPy (publish path must
    not dispatch device ops; mirrors utils.quaternion.to_rotation, including
    its normalization — a filter quaternion can drift off unit norm)."""
    q = q / np.linalg.norm(q)
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)],
        [2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)],
        [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)],
    ])
