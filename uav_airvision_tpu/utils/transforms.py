"""SE(3) rigid transforms as pytrees (functional analogue of the reference's
``Isometry3d``, src/utils.py:124-141 / src/feature/utils.py:3-23).

An isometry is a NamedTuple ``(R, t)`` so it flows through jit/vmap/scan as a
pytree; operations are free functions rather than methods so they compose with
``jax.vmap`` over leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Isometry(NamedTuple):
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)


def identity(dtype=jnp.float32, batch_shape=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Isometry(R, t)


def inverse(T: Isometry) -> Isometry:
    RT = jnp.swapaxes(T.R, -1, -2)
    return Isometry(RT, -jnp.einsum("...ij,...j->...i", RT, T.t))


def compose(Ta: Isometry, Tb: Isometry) -> Isometry:
    """Ta * Tb (apply Tb first)."""
    R = Ta.R @ Tb.R
    t = jnp.einsum("...ij,...j->...i", Ta.R, Tb.t) + Ta.t
    return Isometry(R, t)


def apply(T: Isometry, p):
    """Transform point(s) p by T."""
    return jnp.einsum("...ij,...j->...i", T.R, p) + T.t


def matrix(T: Isometry):
    bottom = jnp.zeros((*T.t.shape[:-1], 1, 4), dtype=T.R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    top = jnp.concatenate([T.R, T.t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m) -> Isometry:
    return Isometry(m[..., :3, :3], m[..., :3, 3])
