"""IMU propagation: error-state transition + covariance, OC-EKF constrained.

Reproduces the semantics of the reference's ``process_model`` /
``predict_new_state`` / ``batch_imu_processing`` (reference
src/msckf.py:251-388) with a TPU-native decomposition.  The reference loops
over buffered IMU messages, touching the full covariance each time.  Here the
per-frame IMU slice is processed as four *batched* phases with only two
log-depth associative scans carrying the sequential structure:

1. quaternion chain: each step's closed-form integrator is a 4x4 matrix
   ``M_i(gyro, dt)``; all orientations are prefix products (associative scan).
   Per-step normalization commutes with the linear chain, so normalizing the
   prefixes is exact.
2. RK4 velocity/position: given the orientations, each step's dv/dp are
   independent; v and p are cumulative sums.
3. transition/noise pairs: Phi_i (3rd-order expm + OC-EKF constraints, using
   the null anchors = previous step's state) and Q_i are batched 21x21 work.
4. composition: (Phi, Q) compose associatively as
   (Phi_b Phi_a, Phi_b Q_a Phi_b^T + Q_b); one associative scan yields the
   whole-frame transition, applied to the (D, D) covariance once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...utils import quaternion as quat
from .state import IMU_DIM, FilterState, MsckfParams


PROP_TIER = 16  # small-tier slice height of propagate_tiered


def propagate_tiered(state: FilterState, params: MsckfParams,
                     imu_t, imu_w, imu_a, imu_mask,
                     static_tier: str = "dynamic"):
    """Size-tiered ``propagate``: the padded per-frame IMU slice is
    ``capacity.max_imu_per_frame`` (64) to absorb sensor-dropout gaps, but a
    nominal 200 Hz / 20 fps stream fills ~10-11 slots — so the batched
    per-step work (I,21,21) and the two associative scans run at 4x the
    needed width.  Valid slots are packed first (streaming/prebatch.py) and
    masked slots compose as identity, so slicing the first PROP_TIER slots
    when every valid sample fits is EXACT.

    ``static_tier``: "dynamic" picks with a run-time lax.cond (non-vmapped
    scan/streaming path); "small"/"full" force a tier at trace time for the
    fleet path, which hoists the decision to a batch-level cond OUTSIDE its
    vmap (under vmap a cond lowers to select and both widths would run).
    """
    I = imu_t.shape[0]
    if I <= PROP_TIER or static_tier == "full":
        return propagate(state, params, imu_t, imu_w, imu_a, imu_mask)

    def small(s):
        return propagate(s, params, imu_t[:PROP_TIER], imu_w[:PROP_TIER],
                         imu_a[:PROP_TIER], imu_mask[:PROP_TIER])

    if static_tier == "small":
        return small(state)
    return lax.cond(
        jnp.sum(imu_mask.astype(jnp.int32)) <= PROP_TIER, small,
        lambda s: propagate(s, params, imu_t, imu_w, imu_a, imu_mask), state)


def _omega_mat(gyro, half_dt):
    """Closed-form quaternion integrator matrix (reference predict_new_state,
    src/msckf.py:343-362): q(t+dt) = M q(t), batched over steps."""
    dtype = gyro.dtype
    n = gyro.shape[0]
    gyro_norm = jnp.linalg.norm(gyro, axis=-1)  # (n,)
    Omega = jnp.zeros((n, 4, 4), dtype)
    Omega = Omega.at[:, :3, :3].set(-quat.skew(gyro))
    Omega = Omega.at[:, :3, 3].set(gyro)
    Omega = Omega.at[:, 3, :3].set(-gyro)

    big = gyro_norm > 1e-5
    safe = jnp.where(big, gyro_norm, 1.0)
    eye4 = jnp.eye(4, dtype=dtype)
    c = jnp.cos(gyro_norm * half_dt)[:, None, None]
    s = (jnp.sin(gyro_norm * half_dt) / safe)[:, None, None]
    exact = c * eye4 + s * Omega
    approx = c * (eye4 + Omega * half_dt[:, None, None])
    return jnp.where(big[:, None, None], exact, approx)


def propagate(state: FilterState, params: MsckfParams, imu_t, imu_w, imu_a, imu_mask):
    """Batched propagation over the padded per-frame IMU slice
    (reference batch_imu_processing, src/msckf.py:251-273)."""
    dtype = state.cov.dtype
    imu = state.imu
    gravity = state.gravity
    qc = params.noise_qc_diag
    I = imu_t.shape[0]
    eye3 = jnp.eye(3, dtype=dtype)
    eyeI = jnp.eye(IMU_DIM, dtype=dtype)
    m = imu_mask
    mf = m.astype(dtype)

    # per-step dt against the previous valid timestamp (valid slots packed
    # first by the host prebatch)
    t_prev = jnp.concatenate([imu.timestamp[None], imu_t[:-1]])
    dt = jnp.where(m, imu_t - t_prev, 0.0).astype(dtype)
    gyro = jnp.where(m[:, None], imu_w - imu.bg[None, :], 0.0).astype(dtype)
    acc = jnp.where(m[:, None], imu_a - imu.ba[None, :], 0.0).astype(dtype)

    # ---- phase 1: orientation chain --------------------------------------
    M_full = _omega_mat(gyro, dt * 0.5)  # full-step integrator
    M_half = _omega_mat(gyro, dt * 0.25)  # RK4 midpoint integrator
    M_full = jnp.where(m[:, None, None], M_full, jnp.eye(4, dtype=dtype))

    # prefix products P_i = M_i ... M_0 (f(a, b) = "apply a, then b")
    P = lax.associative_scan(lambda a, b: jnp.einsum("...ij,...jk->...ik", b, a), M_full)
    q_next = quat.normalize(jnp.einsum("nij,j->ni", P, imu.q))  # q after step i
    q_at = jnp.concatenate([imu.q[None], q_next[:-1]])  # q at start of step i

    # ---- phase 2: RK4 velocity / position --------------------------------
    dq_full = jnp.einsum("nij,nj->ni", M_full, q_at)  # unnormalized, as ref
    dq_half = jnp.einsum("nij,nj->ni", M_half, q_at)
    # one batched to_rotation + one batched rotate for all three RK4 stages
    R_all_T = jnp.swapaxes(
        quat.to_rotation(jnp.concatenate([q_at, dq_half, dq_full])), -1, -2)
    k_all = (jnp.einsum("nij,nj->ni", R_all_T, jnp.tile(acc, (3, 1)))
             + gravity[None, :])
    k1vd, k2vd, k4vd = k_all[:I], k_all[I:2 * I], k_all[2 * I:]
    # k3 uses the same midpoint rotation as k2 (ref msckf.py:364-384)
    dv = (k1vd + 4.0 * k2vd + k4vd) * (dt / 6.0)[:, None]
    dv = jnp.where(m[:, None], dv, 0.0)
    v_next = imu.v[None, :] + jnp.cumsum(dv, axis=0)  # v after step i
    v_at = jnp.concatenate([imu.v[None], v_next[:-1]])

    # dp_i = v_i dt + (k1vd + k2vd + k3vd) dt^2 / 6, k3vd == k2vd
    dp = v_at * dt[:, None] + (k1vd + 2.0 * k2vd) * (dt * dt / 6.0)[:, None]
    dp = jnp.where(m[:, None], dp, 0.0)
    p_next = imu.p[None, :] + jnp.cumsum(dp, axis=0)
    p_at = jnp.concatenate([imu.p[None], p_next[:-1]])

    # ---- phase 3: batched transition / noise ------------------------------
    # null anchors: the incoming state's anchors for step 0, then the
    # (anchor == state) post-step values (reference msckf.py:307-339)
    qn_at = jnp.concatenate([imu.q_null[None], q_next[:-1]])
    vn_at = jnp.concatenate([imu.v_null[None], v_next[:-1]])
    pn_at = jnp.concatenate([imu.p_null[None], p_next[:-1]])

    R_at = quat.to_rotation(q_at)  # (I,3,3) world->IMU at step start
    F = jnp.zeros((I, IMU_DIM, IMU_DIM), dtype)
    F = F.at[:, :3, :3].set(-quat.skew(gyro))
    F = F.at[:, :3, 3:6].set(-eye3)
    F = F.at[:, 6:9, :3].set(-jnp.einsum("nji,njk->nik", R_at, quat.skew(acc)))
    F = F.at[:, 6:9, 9:12].set(-jnp.swapaxes(R_at, -1, -2))
    F = F.at[:, 12:15, 6:9].set(eye3)

    G = jnp.zeros((I, IMU_DIM, 12), dtype)
    G = G.at[:, :3, :3].set(-eye3)
    G = G.at[:, 3:6, 3:6].set(eye3)
    G = G.at[:, 6:9, 6:9].set(-jnp.swapaxes(R_at, -1, -2))
    G = G.at[:, 9:12, 9:12].set(eye3)

    Fdt = F * dt[:, None, None]
    Fdt2 = jnp.einsum("nij,njk->nik", Fdt, Fdt)
    Phi = eyeI + Fdt + Fdt2 / 2.0 + jnp.einsum("nij,njk->nik", Fdt2, Fdt) / 6.0

    # OC-EKF constraints (reference process_model, msckf.py:307-322)
    R_null = quat.to_rotation(qn_at)
    Phi = Phi.at[:, :3, :3].set(
        jnp.einsum("nij,nkj->nik", quat.to_rotation(q_next), R_null)
    )
    u = jnp.einsum("nij,j->ni", R_null, gravity)  # (I,3)
    s_vec = u / jnp.sum(u * u, axis=-1, keepdims=True)

    A1 = Phi[:, 6:9, :3]
    w1 = jnp.einsum("nij,j->ni", quat.skew(vn_at - v_next), gravity)
    corr1 = jnp.einsum("nij,nj->ni", A1, u) - w1
    Phi = Phi.at[:, 6:9, :3].set(A1 - corr1[:, :, None] * s_vec[:, None, :])

    A2 = Phi[:, 12:15, :3]
    w2 = jnp.einsum(
        "nij,j->ni", quat.skew(dt[:, None] * vn_at + pn_at - p_next), gravity
    )
    corr2 = jnp.einsum("nij,nj->ni", A2, u) - w2
    Phi = Phi.at[:, 12:15, :3].set(A2 - corr2[:, :, None] * s_vec[:, None, :])

    Phi = jnp.where(m[:, None, None], Phi, eyeI)
    PhiG = jnp.einsum("nij,njk->nik", Phi, G)
    Q = jnp.einsum("nik,k,njk->nij", PhiG, qc, PhiG) * dt[:, None, None]
    Q = jnp.where(m[:, None, None], Q, 0.0)

    # ---- phase 4: compose and apply to the covariance ---------------------
    # Only the TOTAL composition is needed (unlike the orientation chain,
    # which needs every prefix), so fold pairwise to one (Phi, Q) in log2(I)
    # layers instead of running a full associative scan's up+down sweeps —
    # about half the batched matmuls.  Masked slots are identity/zero, so
    # padding to a power of two composes as a no-op.
    def compose(a, b):
        # a happened first: (Phi_b Phi_a, Phi_b Q_a Phi_b^T + Q_b)
        Pa, Qa = a
        Pb, Qb = b
        Pc = jnp.einsum("...ij,...jk->...ik", Pb, Pa)
        Qc = jnp.einsum("...ij,...jk,...lk->...il", Pb, Qa, Pb) + Qb
        return Pc, Qc

    n = I
    if n & (n - 1):  # pad to a power of two with identity elements
        n2 = 1 << (n - 1).bit_length()
        pad = n2 - n
        Phi_f = jnp.concatenate([Phi, jnp.tile(eyeI[None], (pad, 1, 1))])
        Q_f = jnp.concatenate([Q, jnp.zeros((pad, IMU_DIM, IMU_DIM), dtype)])
        n = n2
    else:
        Phi_f, Q_f = Phi, Q
    while n > 1:
        Phi_f, Q_f = compose((Phi_f[0::2], Q_f[0::2]), (Phi_f[1::2], Q_f[1::2]))
        n //= 2
    Phi_tot, Q_tot = Phi_f[0], Q_f[0]

    cov = state.cov
    P_ii = Phi_tot @ cov[:IMU_DIM, :IMU_DIM] @ Phi_tot.T + Q_tot
    P_ic = Phi_tot @ cov[:IMU_DIM, IMU_DIM:]
    cov = cov.at[:IMU_DIM, :IMU_DIM].set(P_ii)
    cov = cov.at[:IMU_DIM, IMU_DIM:].set(P_ic)
    cov = cov.at[IMU_DIM:, :IMU_DIM].set(P_ic.T)
    cov = (cov + cov.T) / 2.0

    n_valid = jnp.sum(m.astype(jnp.int32))
    any_valid = n_valid > 0
    last = jnp.maximum(n_valid - 1, 0)

    def pick(new_arr, old):
        return jnp.where(any_valid, new_arr[last], old)

    q_new = pick(q_next, imu.q)
    v_new = pick(v_next, imu.v)
    p_new = pick(p_next, imu.p)
    imu = imu._replace(
        q=q_new, v=v_new, p=p_new,
        # anchors move only when at least one step actually ran
        q_null=jnp.where(any_valid, q_new, imu.q_null),
        v_null=jnp.where(any_valid, v_new, imu.v_null),
        p_null=jnp.where(any_valid, p_new, imu.p_null),
        timestamp=jnp.where(any_valid, imu_t[last], imu.timestamp),
        sid=imu.sid + 1,
    )
    return state._replace(imu=imu, cov=cov)