"""IMU propagation: error-state transition + covariance, OC-EKF constrained.

Reproduces the semantics of the reference's ``process_model`` /
``predict_new_state`` / ``batch_imu_processing`` (reference
src/msckf.py:251-388) as one masked ``lax.scan`` over a fixed-width padded
per-frame IMU slice.  The reference's dynamic "consume buffer until the frame
timestamp" loop becomes a host-side prebatch (streaming/prebatch.py) plus a
per-slot validity mask here, so the whole thing is a single compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...utils import quaternion as quat
from .state import IMU_DIM, FilterState, ImuState, MsckfParams


def _integrate_imu(imu: ImuState, gravity, dt, gyro, acc):
    """Closed-form quaternion integration + RK4 for v/p
    (reference predict_new_state, src/msckf.py:341-388)."""
    dtype = imu.q.dtype
    gyro_norm = jnp.linalg.norm(gyro)
    Omega = jnp.zeros((4, 4), dtype)
    Omega = Omega.at[:3, :3].set(-quat.skew(gyro))
    Omega = Omega.at[:3, 3].set(gyro)
    Omega = Omega.at[3, :3].set(-gyro)

    q, v, p = imu.q, imu.v, imu.p
    eye4 = jnp.eye(4, dtype=dtype)

    big = gyro_norm > 1e-5
    safe_norm = jnp.where(big, gyro_norm, 1.0)

    def rot_q(half_dt):
        # exact form when the rate is large enough, first-order otherwise
        exact = (
            jnp.cos(gyro_norm * half_dt) * eye4
            + jnp.sin(gyro_norm * half_dt) / safe_norm * Omega
        ) @ q
        approx = jnp.cos(gyro_norm * half_dt) * ((eye4 + Omega * half_dt) @ q)
        return jnp.where(big, exact, approx)

    dq_dt = rot_q(dt * 0.5)
    dq_dt2 = rot_q(dt * 0.25)

    dR_dt_T = quat.to_rotation(dq_dt).T
    dR_dt2_T = quat.to_rotation(dq_dt2).T

    k1_v_dot = quat.to_rotation(q).T @ acc + gravity
    k1_p_dot = v

    k1_v = v + k1_v_dot * dt / 2.0
    k2_v_dot = dR_dt2_T @ acc + gravity
    k2_p_dot = k1_v

    k2_v = v + k2_v_dot * dt / 2.0
    k3_v_dot = dR_dt2_T @ acc + gravity
    k3_p_dot = k2_v

    k3_v = v + k3_v_dot * dt
    k4_v_dot = dR_dt_T @ acc + gravity
    k4_p_dot = k3_v

    q_new = dq_dt / jnp.linalg.norm(dq_dt)
    v_new = v + (k1_v_dot + 2 * k2_v_dot + 2 * k3_v_dot + k4_v_dot) * dt / 6.0
    p_new = p + (k1_p_dot + 2 * k2_p_dot + 2 * k3_p_dot + k4_p_dot) * dt / 6.0
    return imu._replace(q=q_new, v=v_new, p=p_new)


def _process_one(imu: ImuState, gravity, qc_diag, t, gyro_m, acc_m):
    """One IMU message: state integration + the per-step transition/noise pair
    (reference process_model, src/msckf.py:275-339).  Returns
    (imu_new, Phi, Q) — covariance application is deferred to the caller,
    which composes all per-step transitions into one (TPU redesign: the scan
    carries only 21x21 matrices; the (D,D) covariance is touched once)."""
    dtype = imu.q.dtype
    dt = t - imu.timestamp
    gyro = gyro_m - imu.bg
    acc = acc_m - imu.ba

    R_w_i = quat.to_rotation(imu.q)

    eye3 = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((IMU_DIM, IMU_DIM), dtype)
    F = F.at[:3, :3].set(-quat.skew(gyro))
    F = F.at[:3, 3:6].set(-eye3)
    F = F.at[6:9, :3].set(-R_w_i.T @ quat.skew(acc))
    F = F.at[6:9, 9:12].set(-R_w_i.T)
    F = F.at[12:15, 6:9].set(eye3)

    G = jnp.zeros((IMU_DIM, 12), dtype)
    G = G.at[:3, :3].set(-eye3)
    G = G.at[3:6, 3:6].set(eye3)
    G = G.at[6:9, 6:9].set(-R_w_i.T)
    G = G.at[9:12, 9:12].set(eye3)

    # 3rd-order expm approximation of Phi = exp(F dt).
    Fdt = F * dt
    Fdt2 = Fdt @ Fdt
    Phi = jnp.eye(IMU_DIM, dtype=dtype) + Fdt + Fdt2 / 2.0 + Fdt2 @ Fdt / 6.0

    imu_new = _integrate_imu(imu, gravity, dt, gyro, acc)

    # Observability constraints (OC-EKF): pin the transition against the
    # null-state anchors so the yaw/position gauge stays unobservable.
    R_kk_1 = quat.to_rotation(imu.q_null)
    Phi = Phi.at[:3, :3].set(quat.to_rotation(imu_new.q) @ R_kk_1.T)

    u = R_kk_1 @ gravity
    s = u / (u @ u)

    A1 = Phi[6:9, :3]
    w1 = quat.skew(imu.v_null - imu_new.v) @ gravity
    Phi = Phi.at[6:9, :3].set(A1 - jnp.outer(A1 @ u - w1, s))

    A2 = Phi[12:15, :3]
    w2 = quat.skew(dt * imu.v_null + imu.p_null - imu_new.p) @ gravity
    Phi = Phi.at[12:15, :3].set(A2 - jnp.outer(A2 @ u - w2, s))

    Q = (Phi @ G) @ (qc_diag[:, None] * (Phi @ G).T) * dt

    imu_new = imu_new._replace(
        q_null=imu_new.q,
        p_null=imu_new.p,
        v_null=imu_new.v,
        timestamp=t,
    )
    return imu_new, Phi, Q


def propagate(state: FilterState, params: MsckfParams, imu_t, imu_w, imu_a, imu_mask):
    """Masked scan over the padded per-frame IMU slice
    (reference batch_imu_processing, src/msckf.py:251-273).

    The scan carries (imu_state, Phi_acc, Q_acc) where Phi_acc/Q_acc compose
    the per-sample covariance transitions: after the scan, exactly
    P11 <- Phi P11 Phi^T + Q and P1c <- Phi P1c in one shot.  This is
    algebraically identical to applying each step to the full covariance
    (linear-Gaussian composition) but touches the (D,D) matrix once instead
    of once per IMU sample.  Per-step symmetrization of the reference is
    replaced by one final symmetrization (exact in exact arithmetic)."""
    dtype = state.cov.dtype
    eyeI = jnp.eye(IMU_DIM, dtype=dtype)
    n_valid = jnp.sum(imu_mask.astype(jnp.int32))  # prebatch packs valid first

    def cond(carry):
        i, _, _, _ = carry
        return i < n_valid

    def body(carry):
        i, imu, Phi_acc, Q_acc = carry
        imu2, Phi, Q = _process_one(
            imu, state.gravity, params.noise_qc_diag, imu_t[i], imu_w[i], imu_a[i]
        )
        return (i + 1, imu2, Phi @ Phi_acc, Phi @ Q_acc @ Phi.T + Q)

    init = (jnp.zeros((), jnp.int32), state.imu, eyeI,
            jnp.zeros((IMU_DIM, IMU_DIM), dtype))
    _, imu, Phi, Q = lax.while_loop(cond, body, init)

    cov = state.cov
    P_ii = Phi @ cov[:IMU_DIM, :IMU_DIM] @ Phi.T + Q
    P_ic = Phi @ cov[:IMU_DIM, IMU_DIM:]
    cov = cov.at[:IMU_DIM, :IMU_DIM].set(P_ii)
    cov = cov.at[:IMU_DIM, IMU_DIM:].set(P_ic)
    cov = cov.at[IMU_DIM:, :IMU_DIM].set(P_ic.T)
    cov = (cov + cov.T) / 2.0

    imu = imu._replace(sid=imu.sid + 1)
    return state._replace(imu=imu, cov=cov)
