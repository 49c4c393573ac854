"""Small lax wrappers: dtype-safe dynamic slicing (mixed python-int / traced
int32 indices break under x64 mode)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _i32(idx):
    return tuple(jnp.asarray(i, jnp.int32) for i in idx)


def dyn_update(operand, update, *idx):
    return lax.dynamic_update_slice(operand, update, _i32(idx))


def dyn_slice(operand, sizes, *idx):
    return lax.dynamic_slice(operand, _i32(idx), sizes)
