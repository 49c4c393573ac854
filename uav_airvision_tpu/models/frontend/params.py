"""Constant device-side parameters of the image-processing front-end."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ...config import Config


class FrontendParams(NamedTuple):
    cam0_intrinsics: jnp.ndarray  # (4,) fx fy cx cy
    cam0_coeffs: jnp.ndarray  # (4,)
    cam1_intrinsics: jnp.ndarray  # (4,)
    cam1_coeffs: jnp.ndarray  # (4,)
    R_cam0_imu: jnp.ndarray  # (3,3) cam0 -> imu
    R_cam1_imu: jnp.ndarray
    t_cam0_imu: jnp.ndarray  # (3,)
    t_cam1_imu: jnp.ndarray


def make_frontend_params(config: Config, dtype=jnp.float32) -> FrontendParams:
    T0 = np.linalg.inv(config.np_T_imu_cam0())
    T1 = np.linalg.inv(config.np_T_imu_cam1())
    return FrontendParams(
        cam0_intrinsics=jnp.asarray(config.calib.cam0_intrinsics, dtype),
        cam0_coeffs=jnp.asarray(config.calib.cam0_distortion_coeffs, dtype),
        cam1_intrinsics=jnp.asarray(config.calib.cam1_intrinsics, dtype),
        cam1_coeffs=jnp.asarray(config.calib.cam1_distortion_coeffs, dtype),
        R_cam0_imu=jnp.asarray(T0[:3, :3], dtype),
        R_cam1_imu=jnp.asarray(T1[:3, :3], dtype),
        t_cam0_imu=jnp.asarray(T0[:3, 3], dtype),
        t_cam1_imu=jnp.asarray(T1[:3, 3], dtype),
    )
