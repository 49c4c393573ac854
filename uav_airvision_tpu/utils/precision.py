"""Matmul-precision control.

On TPU, XLA lowers float32 matmuls to bfloat16 MXU passes by default; the
EKF's covariance algebra (and QR) cannot survive 8-bit mantissas.  All
framework jit entry points trace under ``highest`` matmul precision — the
MXU then runs 3/6-pass f32-accurate matmuls.  The matrices here are tiny
(<=141 wide), so the extra passes are free compared to the gather-bound
front-end.
"""

from __future__ import annotations

import functools

import jax


def with_highest_precision(fn):
    """Wrap a callable so any tracing it triggers uses highest matmul
    precision (trace-time config; safe to nest)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
