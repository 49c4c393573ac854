"""Fleet parallelism: vmapped VIO instances sharded over the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uav_airvision_tpu.parallel.fleet import (
    default_mesh, init_fleet_state, make_fleet_step, place_fleet,
)


def _tiny_setup(n_inst):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_config, _frame

    cfg = _tiny_config()
    frame = _frame(cfg, n_batch=n_inst)
    gyro_bias = np.zeros((n_inst, 3))
    acc_mean = np.tile(np.array([0.05, 0.02, 9.8]), (n_inst, 1))
    state = init_fleet_state(cfg, gyro_bias, acc_mean, n_inst)
    return cfg, state, frame


def test_fleet_step_sharded_over_mesh():
    assert len(jax.devices()) >= 8, "conftest should force 8 virtual CPU devices"
    mesh = default_mesh(8)
    n_inst = 64  # BASELINE.md fleet target: 64 instances / 8 devices
    cfg, state, frame = _tiny_setup(n_inst)
    state = place_fleet(state, mesh)
    frame = place_fleet(frame, mesh)
    step = make_fleet_step(cfg)
    new_state, out = step(state, frame)
    jax.block_until_ready(new_state)
    assert out.p.shape == (n_inst, 3)
    # outputs stay sharded over the fleet axis
    assert "fleet" in str(new_state.filter.imu.p.sharding.spec)
    assert bool(jnp.all(jnp.isfinite(new_state.filter.cov)))


def test_fleet_matches_single_instance():
    """Instance 0 of a fleet step == a single-instance step (SPMD purity)."""
    n_inst = 4
    cfg, state, frame = _tiny_setup(n_inst)
    step = make_fleet_step(cfg)
    new_state, out = step(state, frame)

    from uav_airvision_tpu.models.vio import make_jitted_step

    single, _, _ = make_jitted_step(cfg)
    s1 = jax.tree.map(lambda x: x[0], state)
    f1 = jax.tree.map(lambda x: x[0], frame)
    ns1, o1 = single(s1, f1)
    np.testing.assert_allclose(np.asarray(out.p[0]), np.asarray(o1.p), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree.map(lambda x: x[0], new_state).filter.cov),
        np.asarray(ns1.filter.cov), atol=1e-5,
    )
