"""Reference-shaped facade classes (drop-in public API).

The reference exposes ``ImageProcessor`` (reference
src/image_processing/__init__.py:14-27, including the ``stareo_callback``
typo alias) and ``MSCKF`` (reference src/msckf.py:96-228,788-819) as
callback-style classes.  This module provides the same surface on top of the
fused TPU steps so code written against the reference runs unchanged:

    ip = ImageProcessor(config)
    ip.imu_callback(imu_msg)
    feature_msg = ip.stereo_callback(stereo_msg)

    filt = MSCKF(config)
    filt.imu_callback(imu_msg)
    result = filt.feature_callback(feature_msg)

Each callback launches one compiled device step; host-side state mirrors the
reference's buffering semantics (gravity init after 200 IMU messages,
msckf.py:162-174; front-end IMU window, imu_processor.py:28-67).
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .models.frontend.params import make_frontend_params
from .models.frontend.pipeline import frontend_step, init_frontend_state
from .models.msckf.state import init_state, make_params
from .models.msckf.step import FrameInput, backend_step
from .utils.precision import with_highest_precision

# message structs (reference feature_measurment.py / feature_publisher.py)
FeatureMeasurement = namedtuple("FeatureMeasurement", ["id", "u0", "v0", "u1", "v1"])
feature_msg = namedtuple("feature_msg", ["timestamp", "features"])
vio_result = namedtuple("vio_result", ["timestamp", "position", "orientation",
                                       "velocity"])


class ImageProcessor:
    """Front-end facade (reference ImageProcessingPipeline/ImageProcessor)."""

    def __init__(self, config: Config):
        self.config = config
        self.params = make_frontend_params(config)
        self.state = init_frontend_state(config)
        self._step = with_highest_precision(jax.jit(
            lambda st, c0, c1, w, dt: frontend_step(st, c0, c1, w, dt,
                                                    self.params, self.config)
        ))
        self.imu_buffer = []
        self._ptr_t = -np.inf
        self.prev_t = None
        self.num_features = {}
        self._last_stereo = None  # (cam0_img, cam1_img) for draw_features_stereo

    def imu_callback(self, msg):
        self.imu_buffer.append(
            (msg.timestamp, np.asarray(msg.angular_velocity))
        )

    def _mean_angular_velocity(self, curr_t):
        """Reference integrate_imu_data window [prev-0.01, curr-0.004)
        (imu_processor.py:28-67) with its buffer truncation."""
        if self.prev_t is None:
            return np.zeros(3), 0.0
        lo, hi = self.prev_t - 0.01, curr_t - 0.004
        window = [m for m in self.imu_buffer if self._ptr_t <= m[0] and lo <= m[0] < hi]
        if not any(m[0] >= hi for m in self.imu_buffer if m[0] >= self._ptr_t):
            return np.zeros(3), curr_t - self.prev_t
        mean = (np.mean(np.stack([m[1] for m in window]), axis=0)
                if window else np.zeros(3))
        self._ptr_t = hi
        # reference truncates its buffer at the consumed pointer
        # (imu_processor.py:66); without this the buffer grows without bound
        # and the window scan above goes O(T^2) over a long stream.  Prefix
        # deletion (not a rebuild-and-rebind): an imu thread appending
        # concurrently only touches the END of the list.
        k = 0
        for m in self.imu_buffer:
            if m[0] >= hi:
                break
            k += 1
        if k:
            del self.imu_buffer[:k]
        return mean, curr_t - self.prev_t

    def stereo_callback(self, stereo_msg):
        t = stereo_msg.timestamp
        self._last_stereo = (np.asarray(stereo_msg.cam0_image),
                             np.asarray(stereo_msg.cam1_image))
        mean_w, dt = self._mean_angular_velocity(t)
        self.state, out = self._step(
            self.state,
            jnp.asarray(stereo_msg.cam0_image), jnp.asarray(stereo_msg.cam1_image),
            jnp.asarray(mean_w, jnp.float32), jnp.asarray(dt, jnp.float32),
        )
        self.prev_t = t
        self.num_features = {
            "before_tracking": int(out.before_tracking),
            "after_tracking": int(out.after_tracking),
            "after_matching": int(out.after_matching),
            "after_ransac": int(out.after_ransac),
        }
        ids = np.asarray(out.ids)
        uv = np.asarray(out.uv)
        mask = np.asarray(out.mask)
        feats = [
            FeatureMeasurement(int(ids[i]), float(uv[i, 0]), float(uv[i, 1]),
                               float(uv[i, 2]), float(uv[i, 3]))
            for i in np.nonzero(mask)[0]
        ]
        return feature_msg(t, feats)

    # the reference's legacy typo alias (reference __init__.py:27)
    stareo_callback = stereo_callback

    def draw_features_stereo(self, show=True):
        """Debug overlay: current features drawn as matches on the stereo
        pair (reference FeaturePublisher.draw_features_stereo,
        feature_publisher.py:123-137).  Returns the composed image; ``show``
        additionally pops the reference's cv2.imshow window (skipped
        gracefully on headless boxes)."""
        import cv2

        if self._last_stereo is None:
            return None
        img0, img1 = self._last_stereo
        cam0 = np.asarray(self.state.cam0)
        cam1 = np.asarray(self.state.cam1)
        vmask = np.asarray(self.state.valid)
        kps0, kps1, matches = [], [], []
        for i in np.nonzero(vmask)[0]:
            matches.append(cv2.DMatch(len(kps0), len(kps0), 0))
            kps0.append(cv2.KeyPoint(float(cam0[i, 0]), float(cam0[i, 1]), 1))
            kps1.append(cv2.KeyPoint(float(cam1[i, 0]), float(cam1[i, 1]), 1))
        img = cv2.drawMatches(img0, kps0, img1, kps1, matches, None, flags=2)
        if show:
            try:
                cv2.imshow("stereo features", img)
                cv2.waitKey(1)
            except cv2.error:
                pass  # headless build / no display
        return img


class MSCKF:
    """Estimator facade (reference MSCKF, src/msckf.py:96-228)."""

    def __init__(self, config: Config):
        self.config = config
        self.params = make_params(config)
        self._step = with_highest_precision(jax.jit(
            lambda st, fr: backend_step(st, fr, self.params, self.config)
        ))
        self.state = None
        self.imu_buffer = []
        self.is_gravity_set = False
        self.time_base = None  # float32-device time rebase (see prebatch.py)
        self._kept_extrinsics = None  # (R_imu_cam0, t_cam0_imu, sid) after reset()

    def imu_callback(self, msg):
        """Buffer; initialize gravity/bias after imu_init_msgs messages
        (reference msckf.py:162-174, initialize_gravity_and_bias :230-249)."""
        self.imu_buffer.append(
            (msg.timestamp, np.asarray(msg.angular_velocity),
             np.asarray(msg.linear_acceleration))
        )
        if not self.is_gravity_set and \
                len(self.imu_buffer) >= self.config.capacity.imu_init_msgs:
            n = self.config.capacity.imu_init_msgs
            gyro_bias = np.mean(np.stack([m[1] for m in self.imu_buffer[:n]]), axis=0)
            acc_mean = np.mean(np.stack([m[2] for m in self.imu_buffer[:n]]), axis=0)
            self.state = init_state(self.config, self.params, gyro_bias, acc_mean)
            if self._kept_extrinsics is not None:
                # reference reset() preserves the learned extrinsics and the
                # state id across the re-initialization (msckf.py:803-807)
                R, t, sid = self._kept_extrinsics
                imu = self.state.imu._replace(
                    R_imu_cam0=jnp.asarray(R, self.state.cov.dtype),
                    t_cam0_imu=jnp.asarray(t, self.state.cov.dtype),
                    sid=jnp.asarray(sid, jnp.int32),
                )
                self.state = self.state._replace(imu=imu)
            self.is_gravity_set = True

    def _imu_slice(self, frame_t, first):
        cap = self.config.capacity
        I = cap.max_imu_per_frame
        if first:
            self.imu_buffer = [m for m in self.imu_buffer if m[0] >= frame_t]
        out = (np.zeros(I), np.zeros((I, 3)), np.zeros((I, 3)), np.zeros(I, bool))
        consumed = j = 0
        for (t, w, a) in self.imu_buffer:
            if t > frame_t:
                break
            consumed += 1
            if j < I:
                out[0][j], out[1][j], out[2][j], out[3][j] = t, w, a, True
                j += 1
        self.imu_buffer = self.imu_buffer[consumed:]
        return out

    def feature_callback(self, msg):
        """One frame of features -> state update -> vio_result (reference
        feature_callback, msckf.py:177-228)."""
        if not self.is_gravity_set:
            return None
        t = msg.timestamp
        if self.time_base is None:
            self.time_base = t
        first = not bool(self.state.started)
        imu_t, imu_w, imu_a, imu_m = self._imu_slice(t, first)
        imu_t = np.where(imu_m, imu_t - self.time_base, 0.0)
        t = t - self.time_base
        cap = self.config.capacity
        K = cap.max_features
        ids = np.full(K, -1, np.int32)
        uv = np.zeros((K, 4))
        fm = np.zeros(K, bool)
        for j, f in enumerate(msg.features[:K]):
            ids[j] = f.id
            uv[j] = (f.u0, f.v0, f.u1, f.v1)
            fm[j] = True
        dtype = self.state.cov.dtype
        frame = FrameInput(
            timestamp=jnp.asarray(t, dtype),
            imu_t=jnp.asarray(imu_t, dtype),
            imu_w=jnp.asarray(imu_w, dtype),
            imu_a=jnp.asarray(imu_a, dtype),
            imu_mask=jnp.asarray(imu_m),
            feat_ids=jnp.asarray(ids),
            feat_uv=jnp.asarray(uv, dtype),
            feat_mask=jnp.asarray(fm),
            active=jnp.asarray(True),
        )
        self.state, out = self._step(self.state, frame)
        return vio_result(self.time_base + float(out.timestamp),
                          np.asarray(out.p), np.asarray(out.q),
                          np.asarray(out.v))

    def reset(self):
        """Full reset (reference reset, msckf.py:800-819 — present in the
        reference API, uncalled): keeps the LEARNED IMU-cam0 extrinsics and
        the state id, clears camera window / map / IMU buffer, re-arms
        gravity initialization."""
        if self.state is not None:
            self._kept_extrinsics = (
                np.asarray(self.state.imu.R_imu_cam0),
                np.asarray(self.state.imu.t_cam0_imu),
                int(self.state.imu.sid),
            )
        self.state = None
        self.imu_buffer = []
        self.is_gravity_set = False
        self.time_base = None

    def reset_state_cov(self):
        """Re-initialize only the covariance (reference reset_state_cov,
        msckf.py:788-798)."""
        from .models.msckf.state import reset_cov
        if self.state is not None:
            self.state = self.state._replace(
                cov=reset_cov(self.config, self.params, self.state.cov.dtype)
            )
