import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uav_airvision_tpu.utils import quaternion as quat
from uav_airvision_tpu.utils import transforms as tf
from tests.oracle.quat_oracle import (
    o_from_two_vectors,
    o_multiply,
    o_skew,
    o_small_angle,
    o_to_quaternion,
    o_to_rotation,
)

RNG = np.random.default_rng(0)


def rand_quat(n=1):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_skew():
    for _ in range(5):
        v = RNG.normal(size=3)
        np.testing.assert_allclose(np.asarray(quat.skew(jnp.array(v))), o_skew(v), atol=1e-12)


def test_to_rotation_matches_oracle():
    for q in rand_quat(50):
        np.testing.assert_allclose(
            np.asarray(quat.to_rotation(jnp.array(q))), o_to_rotation(q), atol=1e-12
        )


def test_to_quaternion_round_trip_all_branches():
    # Rotations chosen to hit all four Shepperd branches.
    for q in rand_quat(200):
        R = o_to_rotation(q)
        got = np.asarray(quat.to_quaternion(jnp.array(R)))
        want = o_to_quaternion(R)
        np.testing.assert_allclose(got, want, atol=1e-10)
        # Round trip up to sign.
        qq = got if got @ q > 0 else -got
        np.testing.assert_allclose(qq, q, atol=1e-9)


def test_multiply_matches_oracle_and_composes_rotations():
    for _ in range(50):
        q1, q2 = rand_quat(2)
        got = np.asarray(quat.multiply(jnp.array(q1), jnp.array(q2)))
        np.testing.assert_allclose(got, o_multiply(q1, q2), atol=1e-12)
        # JPL: R(q1*q2) = R(q1) @ R(q2)
        np.testing.assert_allclose(
            o_to_rotation(got), o_to_rotation(q1) @ o_to_rotation(q2), atol=1e-10
        )


def test_small_angle_quaternion():
    for scale in (1e-8, 0.1, 1.0, 3.0):  # covers both branches
        for _ in range(10):
            d = RNG.normal(size=3) * scale
            np.testing.assert_allclose(
                np.asarray(quat.small_angle_quaternion(jnp.array(d))),
                o_small_angle(d),
                atol=1e-12,
            )


def test_from_two_vectors():
    for _ in range(50):
        v0, v1 = RNG.normal(size=(2, 3))
        got = np.asarray(quat.from_two_vectors(jnp.array(v0), jnp.array(v1)))
        np.testing.assert_allclose(got, o_from_two_vectors(v0, v1), atol=1e-10)
        # R(q) @ v0_dir == v1_dir for the JPL-conjugated output.
        R = o_to_rotation(got)
        u0 = v0 / np.linalg.norm(v0)
        u1 = v1 / np.linalg.norm(v1)
        np.testing.assert_allclose(R @ u0, u1, atol=1e-9)

    # Degenerate: parallel and antiparallel.
    v = np.array([0.3, -0.2, 0.9])
    q_par = np.asarray(quat.from_two_vectors(jnp.array(v), jnp.array(2.0 * v)))
    np.testing.assert_allclose(q_par, [0, 0, 0, 1], atol=1e-6)
    q_anti = np.asarray(quat.from_two_vectors(jnp.array(v), jnp.array(-v)))
    R = o_to_rotation(q_anti)
    np.testing.assert_allclose(R @ (v / np.linalg.norm(v)), -v / np.linalg.norm(v), atol=1e-6)


def test_isometry_ops():
    for _ in range(20):
        q1, q2 = rand_quat(2)
        t1, t2 = RNG.normal(size=(2, 3))
        A = tf.Isometry(jnp.array(o_to_rotation(q1)), jnp.array(t1))
        B = tf.Isometry(jnp.array(o_to_rotation(q2)), jnp.array(t2))
        C = tf.compose(A, B)
        p = RNG.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(tf.apply(C, jnp.array(p))),
            o_to_rotation(q1) @ (o_to_rotation(q2) @ p + t2) + t1,
            atol=1e-10,
        )
        Ainv = tf.inverse(A)
        np.testing.assert_allclose(
            np.asarray(tf.apply(tf.compose(Ainv, A), jnp.array(p))), p, atol=1e-9
        )


def test_vmap_and_jit():
    qs = jnp.array(rand_quat(16))
    Rs = jax.jit(jax.vmap(quat.to_rotation))(qs)
    back = jax.jit(jax.vmap(quat.to_quaternion))(Rs)
    dots = jnp.abs(jnp.sum(back * qs, axis=-1))
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-9)
