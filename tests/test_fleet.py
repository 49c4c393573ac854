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


def test_bucketed_stage_exact_dispatch():
    """_bucketed_stage(st, pred, ...) == stage applied to predicated
    instances and suffix_fn to the rest, for every trigger pattern shape
    (0, 1, some, all) — the permute/slice/merge/unpermute bookkeeping."""
    from uav_airvision_tpu.models.msckf.step import _bucketed_stage

    B = 8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

    def stage(st, pred_s):
        # heavy path: per-instance select on its own predicate (like
        # _prune_one's trigger select).  Contract: must agree with suffix_fn
        # on non-predicated instances (identity here).
        out = jnp.where(pred_s[:, None], st * 2.0, st)
        return out, (10 + pred_s.astype(jnp.int32),)

    def suffix(st):
        return st, (jnp.zeros((st.shape[0],), jnp.int32),)

    for pattern in [np.zeros(B, bool),
                    np.eye(B, dtype=bool)[3],
                    rng.random(B) < 0.4,
                    np.ones(B, bool)]:
        pred = jnp.asarray(pattern)
        got, (outs,) = _bucketed_stage(x, pred, (pred,), stage, suffix, B)
        want = np.where(pattern[:, None], np.asarray(x) * 2.0, np.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)
        # outs land back in original instance order: every predicated
        # instance went through the stage (11); others 10 (stage, inside a
        # wider prefix) or 0 (suffix) — never 11.
        outs = np.asarray(outs)
        assert (outs[pattern] == 11).all()
        assert np.isin(outs[~pattern], [0, 10]).all()


def test_fleet_seed_fallback_fires_and_matches_single():
    """When an instance starves (temporal tracking collapses and the
    stereo-seed fallback predicate n_seed < stereo_seed_min_tracked fires),
    the fleet step must still match the single-instance step exactly — the
    batch-hoisted two-pass recompute in vio_step_fleet (round-4 VERDICT #4:
    fleet_config used to silently drop the fallback instead)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_config, _frame

    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import frontend_step
    from uav_airvision_tpu.models.vio import make_jitted_step

    n_inst = 2
    cfg = _tiny_config()
    assert cfg.frontend.stereo_seeded and cfg.frontend.stereo_seed_fallback
    w, h = cfg.calib.cam0_resolution
    rng = np.random.default_rng(11)

    # smoothed texture so FAST + LK have structure to work with
    tex = rng.integers(0, 255, (h, w)).astype(np.float32)
    k5 = np.ones(5) / 5.0
    tex = np.apply_along_axis(lambda r: np.convolve(r, k5, mode="same"), 1, tex)
    tex = np.apply_along_axis(lambda c: np.convolve(c, k5, mode="same"), 0, tex)
    tex = (tex / tex.max() * 255).astype(np.uint8)

    base = _frame(cfg, n_batch=n_inst)

    def frame_at(shifts, t):
        cam0 = np.stack([np.roll(tex, s, axis=1) for s in shifts])
        cam1 = np.stack([np.roll(c, 3, axis=1) for c in cam0])
        return base._replace(
            timestamp=jnp.full((n_inst,), t, jnp.float32),
            cam0=jnp.asarray(cam0), cam1=jnp.asarray(cam1),
        )

    frames = [frame_at([0, 0], 0.05), frame_at([2, 2], 0.10)]
    KEEP = 3  # < stereo_seed_min_tracked

    def starve_one(front, inst):
        """Invalidate all but the first KEEP feature slots of one instance —
        the deterministic track-collapse that makes the fallback predicate
        fire (LK on rolled texture false-converges, so image surgery alone
        cannot reliably starve an instance)."""
        F = front.valid.shape[-1]
        keep = jnp.arange(F) < KEEP
        if front.valid.ndim == 2:  # batched (fleet) state
            sel = jnp.arange(front.valid.shape[0]) == inst
            keep = jnp.where(sel[:, None], keep[None, :], True)
        return front._replace(
            valid=front.valid & keep,
            ids=jnp.where(keep, front.ids, -1),
            lifetime=jnp.where(keep, front.lifetime, 0),
        )

    state_f = init_fleet_state(
        cfg, np.zeros((n_inst, 3)),
        np.tile(np.array([0.05, 0.02, 9.8]), (n_inst, 1)), n_inst)
    fleet_step = make_fleet_step(cfg)
    outs_f = []
    for k, fr in enumerate(frames):
        if k == 1:
            state_f = state_f._replace(
                frontend=starve_one(state_f.frontend, 1))
        state_f, out = fleet_step(state_f, fr)
        outs_f.append(jax.tree.map(np.asarray, out))

    # single-instance replay + proof the predicate actually fires on inst 1
    single, _, _ = make_jitted_step(cfg)
    fparams = make_frontend_params(cfg)
    for i in range(n_inst):
        s = jax.tree.map(lambda x: x[i], init_fleet_state(
            cfg, np.zeros((n_inst, 3)),
            np.tile(np.array([0.05, 0.02, 9.8]), (n_inst, 1)), n_inst))
        for k, fr in enumerate(frames):
            f1 = jax.tree.map(lambda x: x[i], fr)
            if k == 1:
                if i == 1:
                    s = s._replace(frontend=starve_one(s.frontend, i))
                _, fe_out = frontend_step(
                    s.frontend, f1.cam0, f1.cam1, f1.fe_mean_w, f1.fe_dt,
                    fparams, cfg, seed_mode="seeded")
                n_seed = int(fe_out.n_seed)
                if i == 1:
                    assert n_seed < cfg.frontend.stereo_seed_min_tracked, (
                        f"scenario failed to starve instance 1 (n_seed={n_seed})")
                else:
                    assert n_seed >= cfg.frontend.stereo_seed_min_tracked
            s, o1 = single(s, f1)
            np.testing.assert_allclose(
                outs_f[k].p[i], np.asarray(o1.p), rtol=0, atol=1e-5,
                err_msg=f"instance {i} fleet!=single at step {k}")
            np.testing.assert_array_equal(
                outs_f[k].n_features[i], np.asarray(o1.n_features))


@pytest.mark.slow
def test_fleet_matches_vmapped_single_over_many_frames():
    """vio_step_fleet == per-instance single steps over a 20-step scan from
    DIVERGENT states: each instance sees different images/IMU so the
    batch-hoisted tier predicates (step.py backend_step_fleet) disagree
    across the batch — the case the one-step homogeneous test can't cover.
    Runs with bucket=True so the prefix-bucketed lost/prune dispatch
    (_bucketed_stage) is exercised exactly where its permutation logic has
    to be right: instances triggering on different frames."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_config, _frame

    from uav_airvision_tpu.models.vio import make_jitted_step
    from uav_airvision_tpu.parallel.fleet import init_fleet_state, make_fleet_step

    n_inst, n_steps = 3, 20
    cfg = _tiny_config()

    # Divergent per-instance streams: instance i gets its own rng stream and
    # its own angular-velocity bias so feature sets and track lifecycles split.
    rng = np.random.default_rng(42)
    w, h = cfg.calib.cam0_resolution
    I = cfg.capacity.max_imu_per_frame
    base = _frame(cfg, n_batch=n_inst)

    # Per-instance smoothed textures; frame k of instance i is the texture
    # rolled i+1 px/frame horizontally and (i % 2) px/frame vertically, so
    # tracks persist but drop out at different rates per instance.
    tex = rng.integers(0, 255, (n_inst, h, w)).astype(np.float32)
    k5 = np.ones(5) / 5.0
    for i in range(n_inst):
        tex[i] = np.apply_along_axis(
            lambda r: np.convolve(r, k5, mode="same"), 1, tex[i])
        tex[i] = np.apply_along_axis(
            lambda c: np.convolve(c, k5, mode="same"), 0, tex[i])
    tex = (tex / tex.max() * 255).astype(np.uint8)

    def frame_at(k):
        t = 0.05 * (k + 1)
        imu_t = np.tile(np.linspace(t - 0.045, t, I), (n_inst, 1))
        cam0 = np.stack([
            np.roll(np.roll(tex[i], (k + 1) * (i + 1), axis=1),
                    (k + 1) * (i % 2), axis=0)
            for i in range(n_inst)
        ])
        cam1 = np.stack([np.roll(cam0[i], 3, axis=1) for i in range(n_inst)])
        return base._replace(
            timestamp=jnp.full((n_inst,), t, jnp.float32),
            cam0=jnp.asarray(cam0),
            cam1=jnp.asarray(cam1),
            imu_t=jnp.asarray(imu_t, jnp.float32),
            imu_w=jnp.asarray(
                rng.normal(0, 0.01, (n_inst, I, 3))
                + np.linspace(0, 0.2, n_inst)[:, None, None], jnp.float32),
            imu_a=jnp.asarray(
                rng.normal(0, 0.01, (n_inst, I, 3)) + np.array([0, 0, 9.81]),
                jnp.float32),
        )

    frames = [frame_at(k) for k in range(n_steps)]
    gyro_bias = np.zeros((n_inst, 3))
    acc_mean = np.tile(np.array([0.05, 0.02, 9.8]), (n_inst, 1))
    state_f = init_fleet_state(cfg, gyro_bias, acc_mean, n_inst)

    fleet_step = make_fleet_step(cfg, bucket=True)
    ps_fleet = []
    for fr in frames:
        state_f, out = fleet_step(state_f, fr)
        ps_fleet.append(np.asarray(out.p))

    single, _, _ = make_jitted_step(cfg)
    for i in range(n_inst):
        s = jax.tree.map(lambda x: x[i], init_fleet_state(
            cfg, gyro_bias, acc_mean, n_inst))
        for k, fr in enumerate(frames):
            f1 = jax.tree.map(lambda x: x[i], fr)
            s, o1 = single(s, f1)
            np.testing.assert_allclose(
                ps_fleet[k][i], np.asarray(o1.p), rtol=0, atol=1e-4,
                err_msg=f"instance {i} diverged from single path at step {k}",
            )
        del s
