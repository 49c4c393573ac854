"""Static-LM equivalence: the straight-line gated solve (``static_solve``)
must reproduce the reference-shaped nested while-loop LM bit-for-bit on the
same views (same solves in the same order — see triangulation.py docstring).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.models.msckf import triangulation as tri


def _random_views(rng, n_obs, N=20, noise=0.002, degenerate=False):
    """Masked TriangulationViews of one landmark seen from n_obs poses."""
    p_w = rng.normal(0, 1.0, 3) + np.array([0.0, 0.0, 4.0])
    cam_q = np.zeros((N, 4))
    cam_q[:, 3] = 1.0
    cam_p = np.zeros((N, 3))
    for i in range(n_obs):
        # small random rotations, translated along x (stereo-ish baselines)
        ang = rng.normal(0, 0.05, 3) * (0.0 if degenerate else 1.0)
        q = np.concatenate([ang * 0.5, [1.0]])
        cam_q[i] = q / np.linalg.norm(q)
        cam_p[i] = rng.normal(0, 0.3, 3) * (1e-4 if degenerate else 1.0)
    obs = np.zeros((N, 4))
    mask = np.zeros(N, bool)
    from uav_airvision_tpu.utils import quaternion as quat

    R_c0c1 = np.eye(3)
    t_c0c1 = np.array([0.11, 0.0, 0.0])
    for i in range(n_obs):
        R = np.asarray(quat.to_rotation(jnp.asarray(cam_q[i])))
        pc0 = R @ (p_w - cam_p[i])
        pc1 = R @ (p_w - cam_p[i]) - t_c0c1
        obs[i, :2] = pc0[:2] / pc0[2] + rng.normal(0, noise, 2)
        obs[i, 2:] = pc1[:2] / pc1[2] + rng.normal(0, noise, 2)
        mask[i] = True
    views = tri.build_views(
        jnp.asarray(cam_q, jnp.float32), jnp.asarray(cam_p, jnp.float32),
        jnp.asarray(obs, jnp.float32), jnp.asarray(mask),
        jnp.asarray(R_c0c1, jnp.float32), jnp.asarray(t_c0c1, jnp.float32),
    )
    return views, p_w


@pytest.mark.parametrize("noise,degenerate", [(0.0005, False), (0.01, False),
                                              (0.05, False), (0.002, True)])
def test_static_solve_matches_while_loop(noise, degenerate):
    cfg_while = dataclasses.replace(euroc_config().triangulation,
                                    static_solve=False)
    cfg_static = dataclasses.replace(cfg_while, static_solve=True)
    f_while = jax.jit(lambda v: tri.triangulate(v, cfg_while))
    f_static = jax.jit(lambda v: tri.triangulate(v, cfg_static))

    rng = np.random.default_rng(0)
    for k in range(40):
        n_obs = int(rng.integers(2, 20))
        views, p_w = _random_views(rng, n_obs, noise=noise,
                                   degenerate=degenerate)
        pw_a, ok_a = f_while(views)
        pw_b, ok_b = f_static(views)
        assert bool(ok_a) == bool(ok_b), (k, n_obs)
        np.testing.assert_array_equal(np.asarray(pw_a), np.asarray(pw_b),
                                      err_msg=f"trial {k} n_obs={n_obs}")


def test_static_solve_inactive_returns_initial_guess():
    cfg = euroc_config().triangulation
    rng = np.random.default_rng(1)
    views, _ = _random_views(rng, 6)
    pw_act, _ = jax.jit(lambda v: tri.triangulate(v, cfg,
                                                  active=jnp.asarray(True)))(views)
    pw_ina, _ = jax.jit(lambda v: tri.triangulate(v, cfg,
                                                  active=jnp.asarray(False)))(views)
    # inactive must skip every solve (result = closed-form initial guess)
    pw_ref, _ = jax.jit(
        lambda v: tri._finish(v, tri._initial_guess(v)))(views)
    np.testing.assert_allclose(np.asarray(pw_ina), np.asarray(pw_ref),
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(pw_act), np.asarray(pw_ina))
