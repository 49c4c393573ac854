"""Measurement model: stereo reprojection Jacobians, left-nullspace feature
marginalization, chi-square gating, and the QR-compressed EKF update.

Reference semantics: src/msckf.py:443-612 (measurement_jacobian,
feature_jacobian, measurement_update, gating_test).

TPU-native re-design notes
--------------------------
* The reference deletes rows/columns and stacks variable-size Jacobians.  We
  keep every shape static: a feature contributes a padded ``(4N, ...)`` block
  (N = window size) with zero rows for unobserved cameras.
* The reference computes the left-nullspace of ``H_f`` with SVD and projects.
  We use a *complete QR* of the zero-row-padded ``H_f`` instead: because
  Householder reflections never touch all-zero rows, ``Q[:, 3:]`` is an
  orthonormal basis of the same left-nullspace in which the projected block
  has its informative rows FIRST (positions of valid observations) and exact
  zeros elsewhere.  The EKF update and the gating statistic are invariant
  under any orthonormal basis change of the measurement rows and under
  appended zero rows, so this is mathematically exact, not an approximation —
  while letting us stack compact per-feature blocks at static offsets.
* ``measurement_update`` always runs the thin-QR path: for true row count
  m <= state dim this is provably identical to the reference's no-QR branch
  (S, K, and the posterior are invariant under H = QR factorization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...utils import quaternion as quat
from .state import IMU_DIM, FilterState, MsckfParams
from ...utils.lax_helpers import dyn_slice, dyn_update


def stereo_jacobian_per_cam(cam_q, cam_p, cam_q_null, cam_p_null, p_w, z,
                            gravity, R_c0c1, t_c0c1):
    """Jacobian/residual of one stereo observation wrt one camera state
    (reference measurement_jacobian, src/msckf.py:443-507), including the
    observability-constrained projection and the reference's quirk
    ``H_f = -H_x[:, 3:6]`` applied AFTER the projection.

    Returns H_x (4,6), H_f (4,3), r (4,).
    """
    dtype = p_w.dtype
    R_w_c0 = quat.to_rotation(cam_q)
    t_c0_w = cam_p
    R_w_c1 = R_c0c1 @ R_w_c0
    t_c1_w = t_c0_w - R_w_c1.T @ t_c0c1

    p_c0 = R_w_c0 @ (p_w - t_c0_w)
    p_c1 = R_w_c1 @ (p_w - t_c1_w)

    inv_z0 = 1.0 / p_c0[2]
    inv_z1 = 1.0 / p_c1[2]

    dz_dpc0 = jnp.zeros((4, 3), dtype)
    dz_dpc0 = dz_dpc0.at[0, 0].set(inv_z0)
    dz_dpc0 = dz_dpc0.at[1, 1].set(inv_z0)
    dz_dpc0 = dz_dpc0.at[0, 2].set(-p_c0[0] * inv_z0 * inv_z0)
    dz_dpc0 = dz_dpc0.at[1, 2].set(-p_c0[1] * inv_z0 * inv_z0)

    dz_dpc1 = jnp.zeros((4, 3), dtype)
    dz_dpc1 = dz_dpc1.at[2, 0].set(inv_z1)
    dz_dpc1 = dz_dpc1.at[3, 1].set(inv_z1)
    dz_dpc1 = dz_dpc1.at[2, 2].set(-p_c1[0] * inv_z1 * inv_z1)
    dz_dpc1 = dz_dpc1.at[3, 2].set(-p_c1[1] * inv_z1 * inv_z1)

    dpc0_dxc = jnp.concatenate([quat.skew(p_c0), -R_w_c0], axis=1)  # (3,6)
    dpc1_dxc = jnp.concatenate([R_c0c1 @ quat.skew(p_c0), -R_w_c1], axis=1)

    A = dz_dpc0 @ dpc0_dxc + dz_dpc1 @ dpc1_dxc  # (4,6)

    u = jnp.concatenate(
        [
            quat.to_rotation(cam_q_null) @ gravity,
            quat.skew(p_w - cam_p_null) @ gravity,
        ]
    )
    H_x = A - jnp.outer(A @ u, u) / (u @ u)
    H_f = -H_x[:, 3:6]

    pred = jnp.concatenate([p_c0[:2] * inv_z0, p_c1[:2] * inv_z1])
    r = z - pred
    return H_x, H_f, r


def feature_block(cams_q, cams_p, cams_qn, cams_pn, obs, obs_mask, p_w,
                  gravity, R_c0c1, t_c0c1, state_dim):
    """Stacked, nullspace-projected measurement block of one feature over all
    its (masked) observations (reference feature_jacobian, src/msckf.py:509-546).

    Returns (H_proj (4N-3+pad, D), r_proj, rows_true) where only the first
    ``rows_true = 4 * n_obs - 3`` rows are nonzero.
    """
    N = obs_mask.shape[0]
    dtype = p_w.dtype

    Hx_all, Hf_all, r_all = jax.vmap(
        lambda q, p, qn, pn, z: stereo_jacobian_per_cam(
            q, p, qn, pn, p_w, z, gravity, R_c0c1, t_c0c1
        )
    )(cams_q, cams_p, cams_qn, cams_pn, obs)

    m = obs_mask.astype(dtype)
    Hx_all = Hx_all * m[:, None, None]
    Hf_all = Hf_all * m[:, None, None]
    r_all = r_all * m[:, None]
    # Kill non-finite values on masked rows (inert slots can divide by ~0).
    Hx_all = jnp.where(jnp.isfinite(Hx_all), Hx_all, 0.0)
    Hf_all = jnp.where(jnp.isfinite(Hf_all), Hf_all, 0.0)
    r_all = jnp.where(jnp.isfinite(r_all), r_all, 0.0)

    # Compact row placement: observation i of a valid slot s goes to rows
    # 4*rank(s) .. +4, its H_x block to columns 21 + 6*s.
    rank = jnp.cumsum(obs_mask.astype(jnp.int32)) - 1  # (N,)
    n_obs = jnp.sum(obs_mask.astype(jnp.int32))

    H_xj = jnp.zeros((4 * N, state_dim), dtype)
    H_fj = jnp.zeros((4 * N, 3), dtype)
    r_j = jnp.zeros((4 * N,), dtype)

    def body(carry, s):
        H_xj, H_fj, r_j = carry
        row = 4 * jnp.maximum(rank[s], 0)
        col = IMU_DIM + 6 * s
        blk_x = jnp.where(obs_mask[s], 1.0, 0.0) * Hx_all[s]
        H_xj = dyn_update(
            H_xj,
            dyn_update(jnp.zeros((4, state_dim), dtype), blk_x, 0, col)
            + dyn_slice(H_xj, (4, state_dim), row, 0),
            row, 0,
        )
        H_fj = dyn_update(
            H_fj,
            jnp.where(obs_mask[s], 1.0, 0.0) * Hf_all[s]
            + dyn_slice(H_fj, (4, 3), row, 0),
            row, 0,
        )
        r_j = dyn_update(
            r_j,
            jnp.where(obs_mask[s], 1.0, 0.0) * r_all[s]
            + dyn_slice(r_j, (4,), row),
            row,
        )
        return (H_xj, H_fj, r_j), None

    (H_xj, H_fj, r_j), _ = lax.scan(body, (H_xj, H_fj, r_j), jnp.arange(N))

    # Left-nullspace projection via complete QR (see module docstring).
    Qc, _ = jnp.linalg.qr(H_fj, mode="complete")  # (4N, 4N)
    A_ns = Qc[:, 3:]  # (4N, 4N-3)
    H_proj = A_ns.T @ H_xj  # (4N-3, D)
    r_proj = A_ns.T @ r_j
    rows_true = (4 * n_obs - 3).astype(jnp.int32)
    return H_proj, r_proj, rows_true


def gating_test(H, r, rows_true, cov, obs_noise, chi2_table, dof):
    """Mahalanobis gate (reference gating_test, src/msckf.py:604-612).

    H may contain zero padding rows; they contribute sigma^2 on the diagonal
    of S and 0 in r, which leaves gamma unchanged (block-diagonal argument).
    """
    S = H @ cov @ H.T + obs_noise * jnp.eye(H.shape[0], dtype=H.dtype)
    gamma = r @ jnp.linalg.solve(S, r)
    return gamma < chi2_table[jnp.clip(dof, 0, chi2_table.shape[0] - 1)]


def apply_update(state: FilterState, params: MsckfParams, H_buf, r_buf):
    """EKF update from the stacked (zero-padded) measurement buffer
    (reference measurement_update, src/msckf.py:548-602).

    Always runs the thin-QR compression; see module docstring for why this is
    exactly equivalent to the reference's conditional.
    Non-Joseph covariance update (P <- (I-KH)P) preserved deliberately.
    """
    dtype = H_buf.dtype
    D = H_buf.shape[1]
    Q, R = jnp.linalg.qr(H_buf, mode="reduced")  # (rows, D), (D, D)
    r_thin = Q.T @ r_buf

    P = state.cov
    S = R @ P @ R.T + params.obs_noise * jnp.eye(D, dtype=dtype)
    K = jnp.linalg.solve(S, R @ P).T  # (D, D)
    delta = K @ r_thin

    d_imu = delta[:IMU_DIM]
    imu = state.imu
    dq = quat.small_angle_quaternion(d_imu[:3])
    imu = imu._replace(
        q=quat.multiply(dq, imu.q),
        bg=imu.bg + d_imu[3:6],
        v=imu.v + d_imu[6:9],
        ba=imu.ba + d_imu[9:12],
        p=imu.p + d_imu[12:15],
    )
    dq_ext = quat.small_angle_quaternion(d_imu[15:18])
    imu = imu._replace(
        R_imu_cam0=quat.to_rotation(dq_ext) @ imu.R_imu_cam0,
        t_cam0_imu=imu.t_cam0_imu + d_imu[18:21],
    )

    cams = state.cams
    N = cams.q.shape[0]
    d_cam = delta[IMU_DIM:].reshape(N, 6)
    live = jnp.arange(N) < cams.count
    dq_cam = jax.vmap(quat.small_angle_quaternion)(d_cam[:, :3])
    q_new = jax.vmap(quat.multiply)(dq_cam, cams.q)
    cams = cams._replace(
        q=jnp.where(live[:, None], q_new, cams.q),
        p=jnp.where(live[:, None], cams.p + d_cam[:, 3:], cams.p),
    )

    I_KH = jnp.eye(D, dtype=dtype) - K @ R
    P_new = I_KH @ P
    P_new = (P_new + P_new.T) / 2.0

    # diagnostics matching the reference's update-magnitude warning
    too_large = jnp.logical_or(
        jnp.linalg.norm(d_imu[6:9]) > 0.5, jnp.linalg.norm(d_imu[12:15]) > 1.0
    )
    return state._replace(imu=imu, cams=cams, cov=P_new), too_large
