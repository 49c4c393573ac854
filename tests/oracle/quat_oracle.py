"""Float64 NumPy oracle for JPL quaternion math (test-only).

Independent implementation of the Trawny & Roumeliotis eq.(78) conventions used
by the reference VIO (src/utils.py), written for golden-value comparison with
the jnp implementations.
"""

import numpy as np


def o_skew(v):
    x, y, z = v
    return np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])


def o_to_rotation(q):
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    v, w = q[:3], q[3]
    return (2 * w * w - 1) * np.eye(3) - 2 * w * o_skew(v) + 2 * np.outer(v, v)


def o_to_quaternion(R):
    if R[2, 2] < 0:
        if R[0, 0] > R[1, 1]:
            q = [1 + R[0, 0] - R[1, 1] - R[2, 2], R[0, 1] + R[1, 0], R[2, 0] + R[0, 2], R[1, 2] - R[2, 1]]
        else:
            q = [R[0, 1] + R[1, 0], 1 - R[0, 0] + R[1, 1] - R[2, 2], R[2, 1] + R[1, 2], R[2, 0] - R[0, 2]]
    else:
        if R[0, 0] < -R[1, 1]:
            q = [R[0, 2] + R[2, 0], R[2, 1] + R[1, 2], 1 - R[0, 0] - R[1, 1] + R[2, 2], R[0, 1] - R[1, 0]]
        else:
            q = [R[1, 2] - R[2, 1], R[2, 0] - R[0, 2], R[0, 1] - R[1, 0], 1 + R[0, 0] + R[1, 1] + R[2, 2]]
    q = np.array(q, dtype=np.float64)
    return q / np.linalg.norm(q)


def o_multiply(qa, qb):
    qa = np.asarray(qa, dtype=np.float64)
    qb = np.asarray(qb, dtype=np.float64)
    qa = qa / np.linalg.norm(qa)
    qb = qb / np.linalg.norm(qb)
    L = np.array(
        [
            [qa[3], qa[2], -qa[1], qa[0]],
            [-qa[2], qa[3], qa[0], qa[1]],
            [qa[1], -qa[0], qa[3], qa[2]],
            [-qa[0], -qa[1], -qa[2], qa[3]],
        ]
    )
    q = L @ qb
    return q / np.linalg.norm(q)


def o_small_angle(dtheta):
    dq = np.asarray(dtheta, dtype=np.float64) / 2.0
    n2 = dq @ dq
    if n2 <= 1:
        return np.array([*dq, np.sqrt(1 - n2)])
    q = np.array([*dq, 1.0])
    return q / np.sqrt(1 + n2)


def o_from_two_vectors(v0, v1):
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    v0 = v0 / np.linalg.norm(v0)
    v1 = v1 / np.linalg.norm(v1)
    d = v0 @ v1
    if d < -0.999999:
        axis = np.cross([1.0, 0.0, 0.0], v0)
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross([0.0, 1.0, 0.0], v0)
        q = np.array([*axis, 0.0])
    elif d > 0.999999:
        q = np.array([0.0, 0.0, 0.0, 1.0])
    else:
        s = np.sqrt((1 + d) * 2)
        q = np.array([*(np.cross(v0, v1) / s), 0.5 * s])
    q = q / np.linalg.norm(q)
    return np.array([*-q[:3], q[3]])  # Hamilton -> JPL conjugate
