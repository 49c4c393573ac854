"""Filter-state pytrees for the TPU-native MSCKF estimator.

Design: the reference keeps Python objects that grow and shrink
(``StateServer`` with a dict of camera states and a resizable covariance,
``map_server`` dict of features — reference src/msckf.py:18-91,107).  Under
XLA every shape must be static, so this module re-designs those structures as
fixed-capacity arrays with validity masks:

* camera states   -> ordered slot buffer ``CamWindow`` (slot 0 = oldest),
* map server      -> ``FeatureTable`` with per-slot insertion sequence numbers
                     (replicating dict insertion order for deterministic
                     stacking of measurement Jacobians),
* covariance      -> one fixed ``(141, 141)`` array; rows/cols of inactive
                     camera slots are kept identically zero.

Everything is a NamedTuple so it flows through jit/scan/vmap as a pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from scipy.stats import chi2 as _chi2

from ...config import Config
from ...utils import quaternion as quat

IMU_DIM = 21  # error-state: dtheta, bg, v, ba, p, ext_theta, ext_t


class ImuState(NamedTuple):
    """IMU (body) state — reference src/msckf.py:18-58."""

    q: jnp.ndarray  # (4,)  world->IMU JPL quaternion
    p: jnp.ndarray  # (3,)  position in world
    v: jnp.ndarray  # (3,)  velocity in world
    bg: jnp.ndarray  # (3,) gyro bias
    ba: jnp.ndarray  # (3,) accel bias
    q_null: jnp.ndarray  # (4,) observability anchors (OC-EKF)
    p_null: jnp.ndarray  # (3,)
    v_null: jnp.ndarray  # (3,)
    R_imu_cam0: jnp.ndarray  # (3,3) IMU->cam0 rotation (estimated extrinsic)
    t_cam0_imu: jnp.ndarray  # (3,)  cam0 origin in IMU frame
    timestamp: jnp.ndarray  # ()   time of the state estimate
    sid: jnp.ndarray  # ()   int32 monotonically increasing state id


class CamWindow(NamedTuple):
    """Sliding window of camera poses (reference CAMState dict, src/msckf.py:61-77).

    Slots are kept chronologically compact: slot 0 is the oldest live camera
    state, slots >= count are inert (identity quaternion, zero elsewhere).
    """

    sid: jnp.ndarray  # (N,) int32
    q: jnp.ndarray  # (N,4) world->cam0 JPL quaternion
    p: jnp.ndarray  # (N,3) cam0 position in world
    q_null: jnp.ndarray  # (N,4)
    p_null: jnp.ndarray  # (N,3)
    timestamp: jnp.ndarray  # (N,)
    count: jnp.ndarray  # () int32 number of live slots


class FeatureTable(NamedTuple):
    """Map server (reference ``map_server`` dict + Feature class,
    src/msckf.py:107 / src/feature/base_feature.py).

    Observations are aligned to camera-window slots; when the window shifts
    (camera pruning) the observation columns shift with it.
    """

    fid: jnp.ndarray  # (M,) int32 external feature id (-1 = free)
    seq: jnp.ndarray  # (M,) int32 insertion order (map-dict order)
    obs: jnp.ndarray  # (M, N, 4) normalized [u0 v0 u1 v1] per cam slot
    obs_mask: jnp.ndarray  # (M, N) bool
    position: jnp.ndarray  # (M, 3) world position (after triangulation)
    initialized: jnp.ndarray  # (M,) bool
    valid: jnp.ndarray  # (M,) bool slot in use


class FilterState(NamedTuple):
    imu: ImuState
    cams: CamWindow
    cov: jnp.ndarray  # (D, D), D = 21 + 6 * max_cam_states
    features: FeatureTable
    gravity: jnp.ndarray  # (3,) world gravity (set by init, ref msckf.py:246)
    tracking_rate: jnp.ndarray  # ()
    next_seq: jnp.ndarray  # () int32
    started: jnp.ndarray  # () bool -- first processed frame seen


class MsckfParams(NamedTuple):
    """Constant device-side parameters derived from Config."""

    R_cam0_cam1: jnp.ndarray  # (3,3)
    t_cam0_cam1: jnp.ndarray  # (3,)
    R_imu_cam0_init: jnp.ndarray  # (3,3)
    t_cam0_imu_init: jnp.ndarray  # (3,)
    T_imu_body_R: jnp.ndarray  # (3,3)
    T_imu_body_t: jnp.ndarray  # (3,)
    noise_qc_diag: jnp.ndarray  # (12,) continuous noise cov diagonal
    chi2_table: jnp.ndarray  # (100,) chi2.ppf(0.05, dof), index = dof
    obs_noise: jnp.ndarray  # ()
    init_cov_diag: jnp.ndarray  # (21,)
    position_std_threshold: jnp.ndarray  # ()


def make_params(config: Config, dtype=None) -> MsckfParams:
    dtype = dtype or jnp.dtype(config.dtype)
    fc = config.filter
    T_c0c1 = config.np_T_cn_cnm1()
    T_cam0_imu = np.linalg.inv(config.np_T_imu_cam0())

    qc = np.concatenate(
        [
            np.full(3, fc.gyro_noise),
            np.full(3, fc.gyro_bias_noise),
            np.full(3, fc.acc_noise),
            np.full(3, fc.acc_bias_noise),
        ]
    )

    # chi-square 0.05 critical values, dof 1..99 (reference src/msckf.py:109-113).
    table = np.zeros(100)
    table[1:] = _chi2.ppf(0.05, np.arange(1, 100))

    init_diag = np.zeros(IMU_DIM)
    init_diag[3:6] = fc.gyro_bias_cov
    init_diag[6:9] = fc.velocity_cov
    init_diag[9:12] = fc.acc_bias_cov
    init_diag[15:18] = fc.extrinsic_rotation_cov
    init_diag[18:21] = fc.extrinsic_translation_cov

    Tib = config.np_T_imu_body()
    return MsckfParams(
        R_cam0_cam1=jnp.asarray(T_c0c1[:3, :3], dtype),
        t_cam0_cam1=jnp.asarray(T_c0c1[:3, 3], dtype),
        R_imu_cam0_init=jnp.asarray(T_cam0_imu[:3, :3].T, dtype),
        t_cam0_imu_init=jnp.asarray(T_cam0_imu[:3, 3], dtype),
        T_imu_body_R=jnp.asarray(Tib[:3, :3], dtype),
        T_imu_body_t=jnp.asarray(Tib[:3, 3], dtype),
        noise_qc_diag=jnp.asarray(qc, dtype),
        chi2_table=jnp.asarray(table, dtype),
        obs_noise=jnp.asarray(fc.observation_noise, dtype),
        init_cov_diag=jnp.asarray(init_diag, dtype),
        position_std_threshold=jnp.asarray(fc.position_std_threshold, dtype),
    )


def reset_cov(config: Config, params: MsckfParams, dtype) -> jnp.ndarray:
    """Initial / reset covariance (reference src/msckf.py:788-798)."""
    D = config.capacity.state_dim
    cov = jnp.zeros((D, D), dtype)
    return cov.at[jnp.arange(IMU_DIM), jnp.arange(IMU_DIM)].set(params.init_cov_diag)


def init_state(
    config: Config,
    params: MsckfParams,
    gyro_bias=None,
    acc_mean=None,
    dtype=None,
) -> FilterState:
    """Build the initial filter state.

    ``gyro_bias`` / ``acc_mean`` are the means of the first
    ``imu_init_msgs`` IMU messages; they reproduce
    ``initialize_gravity_and_bias`` (reference src/msckf.py:230-249): gravity
    magnitude from the accel mean, initial orientation aligning the measured
    gravity with the world -z axis.
    """
    dtype = dtype or jnp.dtype(config.dtype)
    cap = config.capacity
    N, M = cap.max_cam_states, cap.max_map_features

    if acc_mean is None:
        gravity = jnp.asarray([0.0, 0.0, -config.filter.gravity_acc], dtype)
        q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)
    else:
        acc_mean = jnp.asarray(acc_mean, dtype)
        g_norm = jnp.linalg.norm(acc_mean)
        gravity = jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), -g_norm])
        q0 = quat.from_two_vectors(-gravity, acc_mean)
    bg0 = jnp.zeros(3, dtype) if gyro_bias is None else jnp.asarray(gyro_bias, dtype)

    unit_q = jnp.zeros((N, 4), dtype).at[:, 3].set(1.0)
    imu = ImuState(
        q=q0,
        p=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        bg=bg0,
        ba=jnp.zeros(3, dtype),
        q_null=q0,
        p_null=jnp.zeros(3, dtype),
        v_null=jnp.zeros(3, dtype),
        R_imu_cam0=params.R_imu_cam0_init.astype(dtype),
        t_cam0_imu=params.t_cam0_imu_init.astype(dtype),
        timestamp=jnp.zeros((), dtype),
        sid=jnp.zeros((), jnp.int32),
    )
    cams = CamWindow(
        sid=jnp.full((N,), -1, jnp.int32),
        q=unit_q,
        p=jnp.zeros((N, 3), dtype),
        q_null=unit_q,
        p_null=jnp.zeros((N, 3), dtype),
        timestamp=jnp.zeros((N,), dtype),
        count=jnp.zeros((), jnp.int32),
    )
    feats = FeatureTable(
        fid=jnp.full((M,), -1, jnp.int32),
        seq=jnp.full((M,), jnp.iinfo(jnp.int32).max, jnp.int32),
        obs=jnp.zeros((M, N, 4), dtype),
        obs_mask=jnp.zeros((M, N), bool),
        position=jnp.zeros((M, 3), dtype),
        initialized=jnp.zeros((M,), bool),
        valid=jnp.zeros((M,), bool),
    )
    return FilterState(
        imu=imu,
        cams=cams,
        cov=reset_cov(config, params, dtype),
        features=feats,
        gravity=gravity,
        tracking_rate=jnp.zeros((), dtype),
        next_seq=jnp.zeros((), jnp.int32),
        started=jnp.zeros((), bool),
    )
