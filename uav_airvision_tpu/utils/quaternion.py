"""JPL-convention quaternion toolkit, TPU-native (pure jnp, branchless).

Semantics match the reference VIO math utilities (reference: src/utils.py:2-141),
which follow Trawny & Roumeliotis, "Indirect Kalman Filter for 3D Attitude
Estimation", eq. (78).  Quaternion layout is ``[qx, qy, qz, qw]`` with the JPL
(world -> body, left-handed composition) convention.

All functions are written branch-free (``jnp.where`` instead of Python ``if``)
so they trace cleanly under ``jit``/``vmap``/``scan`` and map onto the TPU VPU.
They accept an optional leading batch dimension where noted.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """Skew-symmetric cross-product matrix of a 3-vector (ref src/utils.py:2-10)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def normalize(q, eps=0.0):
    """Unit-normalize along the last axis."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return q / n


def to_rotation(q):
    """JPL quaternion -> rotation matrix, eq. (78) (ref src/utils.py:12-23).

    R = (2 w^2 - 1) I - 2 w [v]_x + 2 v v^T, with q normalized first.
    """
    q = normalize(q)
    vec = q[..., :3]
    w = q[..., 3]
    eye = jnp.eye(3, dtype=q.dtype)
    w_ = w[..., None, None]
    return (
        (2.0 * w_ * w_ - 1.0) * eye
        - 2.0 * w_ * skew(vec)
        + 2.0 * vec[..., :, None] * vec[..., None, :]
    )


def to_quaternion(R):
    """Rotation matrix -> JPL quaternion (ref src/utils.py:25-47).

    Branchless form of the reference's four-case Shepperd selection; the
    selected unnormalized candidate is identical to the reference's, and the
    result is unit-normalized (the reference drops the 0.5/sqrt(t) scale and
    renormalizes, which is equivalent).
    """
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Candidate quaternions for the four Shepperd cases.
    c0 = jnp.stack([1.0 + R00 - R11 - R22, R01 + R10, R20 + R02, R12 - R21], axis=-1)
    c1 = jnp.stack([R01 + R10, 1.0 - R00 + R11 - R22, R21 + R12, R20 - R02], axis=-1)
    c2 = jnp.stack([R02 + R20, R21 + R12, 1.0 - R00 - R11 + R22, R01 - R10], axis=-1)
    c3 = jnp.stack([R12 - R21, R20 - R02, R01 - R10, 1.0 + R00 + R11 + R22], axis=-1)

    cond_neg = (R22 < 0)[..., None]
    cond_a = (R00 > R11)[..., None]
    cond_b = (R00 < -R11)[..., None]

    q = jnp.where(
        cond_neg,
        jnp.where(cond_a, c0, c1),
        jnp.where(cond_b, c2, c3),
    )
    return normalize(q)


def conjugate(q):
    """Quaternion conjugate (ref src/utils.py:55-59)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def multiply(q1, q2):
    """JPL quaternion product q1 * q2, normalizing inputs and output
    (ref src/utils.py:61-76)."""
    q1 = normalize(q1)
    q2 = normalize(q2)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    # L(q1) @ q2 with the reference's left-multiplication matrix.
    x = w1 * q2[..., 0] + z1 * q2[..., 1] - y1 * q2[..., 2] + x1 * q2[..., 3]
    y = -z1 * q2[..., 0] + w1 * q2[..., 1] + x1 * q2[..., 2] + y1 * q2[..., 3]
    z = y1 * q2[..., 0] - x1 * q2[..., 1] + w1 * q2[..., 2] + z1 * q2[..., 3]
    w = -x1 * q2[..., 0] - y1 * q2[..., 1] - z1 * q2[..., 2] + w1 * q2[..., 3]
    return normalize(jnp.stack([x, y, z, w], axis=-1))


def small_angle_quaternion(dtheta):
    """Small-angle 3-vector -> unit quaternion (ref src/utils.py:79-93)."""
    dq = dtheta / 2.0
    nsq = jnp.sum(dq * dq, axis=-1, keepdims=True)
    inside = nsq <= 1.0
    w_in = jnp.sqrt(jnp.maximum(1.0 - nsq, 0.0))
    q_in = jnp.concatenate([dq, w_in], axis=-1)
    scale = 1.0 / jnp.sqrt(1.0 + nsq)
    q_out = jnp.concatenate([dq, jnp.ones_like(nsq)], axis=-1) * scale
    return jnp.where(inside, q_in, q_out)


def from_two_vectors(v0, v1):
    """Quaternion rotating v0 into v1, Hamilton->JPL conjugated
    (ref src/utils.py:96-120).  Branchless handling of the (anti)parallel cases.
    """
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    d = jnp.sum(v0 * v1, axis=-1)

    # Generic case.
    s = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, 1e-24))
    axis = jnp.cross(v0, v1)
    q_gen = jnp.concatenate([axis / s[..., None], 0.5 * s[..., None]], axis=-1)

    # Nearly identical vectors.
    q_id = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=v0.dtype), q_gen.shape
    )

    # Nearly opposite vectors: any axis orthogonal to v0, zero scalar part.
    ex = jnp.zeros_like(v0).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v0).at[..., 1].set(1.0)
    ax = jnp.cross(ex, v0)
    ax_ok = jnp.linalg.norm(ax, axis=-1) >= 1e-6
    ax = jnp.where(ax_ok[..., None], ax, jnp.cross(ey, v0))
    q_opp = jnp.concatenate([ax, jnp.zeros_like(d)[..., None]], axis=-1)

    q = jnp.where(
        (d < -0.999999)[..., None],
        q_opp,
        jnp.where((d > 0.999999)[..., None], q_id, q_gen),
    )
    q = normalize(q)
    return conjugate(q)
