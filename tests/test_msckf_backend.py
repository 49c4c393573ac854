"""Golden-value tests: fixed-shape JAX MSCKF vs the float64 NumPy oracle on a
synthetic scenario, plus float32 stability checks."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.models.msckf.state import make_params, init_state
from uav_airvision_tpu.models.msckf.step import backend_step, FrameInput
from tests.oracle.msckf_oracle import MsckfOracle
from tests.oracle.synthetic import make_scenario, window_imu


def _run_jax(cfg, scenario, n_frames, dtype):
    params = make_params(cfg, dtype=dtype)
    state = init_state(cfg, params, scenario.gyro_bias, scenario.acc_mean, dtype=dtype)
    cap = cfg.capacity
    step = jax.jit(functools.partial(backend_step, params=params, config=cfg))

    # frames become active once 200 IMU msgs (1s) have arrived
    active = [t >= scenario.imu[cfg.capacity.imu_init_msgs - 1][0] for t, _ in scenario.frames]
    windows = window_imu(scenario, active)

    outs = []
    K = cap.max_features
    for k in range(n_frames):
        t, meas = scenario.frames[k]
        _, window = windows[k]
        I = cap.max_imu_per_frame
        imu_t = np.zeros(I)
        imu_w = np.zeros((I, 3))
        imu_a = np.zeros((I, 3))
        imu_mask = np.zeros(I, bool)
        for j, (mt, w, a) in enumerate(window[:I]):
            imu_t[j], imu_w[j], imu_a[j], imu_mask[j] = mt, w, a, True
        ids = np.full(K, -1, np.int32)
        uv = np.zeros((K, 4))
        fm = np.zeros(K, bool)
        for j, (fid, u0, v0, u1, v1) in enumerate(meas[:K]):
            ids[j], uv[j], fm[j] = fid, (u0, v0, u1, v1), True
        frame = FrameInput(
            timestamp=jnp.asarray(t, dtype),
            imu_t=jnp.asarray(imu_t, dtype),
            imu_w=jnp.asarray(imu_w, dtype),
            imu_a=jnp.asarray(imu_a, dtype),
            imu_mask=jnp.asarray(imu_mask),
            feat_ids=jnp.asarray(ids),
            feat_uv=jnp.asarray(uv, dtype),
            feat_mask=jnp.asarray(fm),
            active=jnp.asarray(active[k]),
        )
        state, out = step(state, frame)
        if bool(out.active):
            outs.append((float(out.timestamp), np.asarray(out.q), np.asarray(out.p),
                         np.asarray(out.v)))
    return outs, state


def _run_oracle(cfg, scenario, n_frames):
    oracle = MsckfOracle(cfg, scenario.gyro_bias, scenario.acc_mean)
    active = [t >= scenario.imu[cfg.capacity.imu_init_msgs - 1][0] for t, _ in scenario.frames]
    windows = window_imu(scenario, active)
    outs = []
    for k in range(n_frames):
        t, meas = scenario.frames[k]
        if not active[k]:
            continue
        _, window = windows[k]
        outs.append(oracle.feature_frame(t, window, meas))
    return outs, oracle


@pytest.fixture(scope="module")
def scenario():
    return make_scenario(euroc_config(), duration=6.0, seed=3)


def test_backend_matches_oracle_float64(scenario):
    cfg = euroc_config(dtype="float64")
    n = len(scenario.frames)
    jax_out, _ = _run_jax(cfg, scenario, n, jnp.float64)
    ora_out, _ = _run_oracle(cfg, scenario, n)
    assert len(jax_out) == len(ora_out) > 50

    pos_err = []
    for (tj, qj, pj, vj), (to, qo, po, vo) in zip(jax_out, ora_out):
        assert tj == to
        pos_err.append(np.linalg.norm(pj - po))
    pos_err = np.array(pos_err)
    # same algorithm, both float64 — only fp-ordering noise should remain
    assert pos_err.max() < 5e-4, f"max deviation from oracle {pos_err.max():.2e}"

    # both should also track the ground truth well
    gt = {t: p for t, p, q in scenario.gt}
    ate = np.array([np.linalg.norm(pj - gt[tj]) for tj, _, pj, _ in jax_out])
    assert ate.max() < 0.05, f"ATE too large: {ate.max():.3f} m"


def test_backend_float32_stays_stable(scenario):
    cfg = euroc_config()  # float32
    n = len(scenario.frames)
    jax_out, state = _run_jax(cfg, scenario, n, jnp.float32)
    ora_out, _ = _run_oracle(euroc_config(dtype="float64"), scenario, n)
    # f32 vs f64 oracle: bounded drift
    errs = [np.linalg.norm(pj - po) for (_, _, pj, _), (_, _, po, _) in zip(jax_out, ora_out)]
    assert np.isfinite(np.asarray(state.cov)).all()
    assert max(errs) < 0.02, f"float32 drift too large: {max(errs):.4f} m"


def test_window_prunes_and_features_bounded(scenario):
    cfg = euroc_config()
    n = len(scenario.frames)
    _, state = _run_jax(cfg, scenario, n, jnp.float32)
    assert int(state.cams.count) <= cfg.filter.max_cam_state_size
    assert int(jnp.sum(state.features.valid)) <= cfg.capacity.max_map_features


def test_lost_overflow_second_pass_matches_oracle():
    """Force >64 simultaneous track losses (more than max_lost_per_frame):
    the second marginalization pass must process the overflow within the
    1500-row budget and stay on the oracle (which, like the reference,
    processes ALL lost features in one stacked update)."""
    import dataclasses

    cfg64 = euroc_config(dtype="float64")
    base = make_scenario(euroc_config(), duration=4.0, n_landmarks=120,
                         track_len=80, seed=11)
    n_frames = len(base.frames)
    kcut = n_frames - 8  # all features vanish here
    k0 = kcut - 4        # ...after exactly 4 observations each
    frames2 = [(t, meas if k0 <= k < kcut else [])
               for k, (t, meas) in enumerate(base.frames)]
    sc = dataclasses.replace(base, frames=frames2)

    # jax run, tracking the per-frame feature count to prove the mass loss
    params = make_params(cfg64, dtype=jnp.float64)
    state = init_state(cfg64, params, sc.gyro_bias, sc.acc_mean,
                       dtype=jnp.float64)
    cap = cfg64.capacity
    step = jax.jit(functools.partial(backend_step, params=params, config=cfg64))
    active = [t >= sc.imu[cap.imu_init_msgs - 1][0] for t, _ in sc.frames]
    windows = window_imu(sc, active)
    K, I = cap.max_features, cap.max_imu_per_frame
    jax_out, nfeat = [], []
    for k in range(n_frames):
        t, meas = sc.frames[k]
        _, window = windows[k]
        imu_t = np.zeros(I); imu_w = np.zeros((I, 3)); imu_a = np.zeros((I, 3))
        imu_mask = np.zeros(I, bool)
        for j, (mt, w, a) in enumerate(window[:I]):
            imu_t[j], imu_w[j], imu_a[j], imu_mask[j] = mt, w, a, True
        ids = np.full(K, -1, np.int32); uv = np.zeros((K, 4)); fm = np.zeros(K, bool)
        for j, (fid, u0, v0, u1, v1) in enumerate(meas[:K]):
            ids[j], uv[j], fm[j] = fid, (u0, v0, u1, v1), True
        frame = FrameInput(
            timestamp=jnp.asarray(t, jnp.float64),
            imu_t=jnp.asarray(imu_t, jnp.float64),
            imu_w=jnp.asarray(imu_w, jnp.float64),
            imu_a=jnp.asarray(imu_a, jnp.float64),
            imu_mask=jnp.asarray(imu_mask),
            feat_ids=jnp.asarray(ids), feat_uv=jnp.asarray(uv, jnp.float64),
            feat_mask=jnp.asarray(fm), active=jnp.asarray(active[k]),
        )
        state, out = step(state, frame)
        if bool(out.active):
            jax_out.append((float(out.timestamp), np.asarray(out.p)))
            nfeat.append(int(out.n_features))

    # the cut frame must have marginalized more than one pass worth at once
    drops = np.diff(np.asarray(nfeat))
    assert drops.min() < -cfg64.capacity.max_lost_per_frame, (
        f"test setup failed to force >{cfg64.capacity.max_lost_per_frame} "
        f"simultaneous losses (max drop {-drops.min()})")

    ora_out, _ = _run_oracle(cfg64, sc, n_frames)
    assert len(jax_out) == len(ora_out)
    errs = [np.linalg.norm(pj - po)
            for (tj, pj), (to, qo, po, vo) in zip(jax_out, ora_out)]
    # the overflow pass relinearizes after the first update, so allow a hair
    # more than the single-update fp-noise tolerance
    assert max(errs) < 2e-3, f"overflow-pass deviation {max(errs):.2e} m"


def test_rank12_update_matches_generic():
    """apply_update_rank12 (Woodbury in the 12 prune columns) must equal the
    generic stacked apply_update on the expanded (m, D) buffer."""
    import numpy as np
    import jax.numpy as jnp

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.msckf.state import init_state, make_params
    from uav_airvision_tpu.models.msckf.update import (apply_update,
                                                       apply_update_rank12)

    cfg = euroc_config()
    mp = make_params(cfg)
    state = init_state(cfg, mp, np.zeros(3), np.array([0.05, 0.02, 9.8]))
    D = cfg.capacity.state_dim
    rng = np.random.default_rng(3)

    # a generic PD covariance and a full camera window
    A = rng.normal(0, 0.05, (D, D))
    P = (A @ A.T + 0.01 * np.eye(D)).astype(state.cov.dtype)
    state = state._replace(
        cov=jnp.asarray(P),
        cams=state.cams._replace(count=jnp.asarray(20, jnp.int32)),
    )

    r0, r1 = 4, 11
    m = 60  # 12 features x 5 rows
    B = rng.normal(0, 0.8, (m, 12)).astype(np.float32)
    B[25:35] = 0.0  # masked (gated-out) rows must be exact no-ops
    r = rng.normal(0, 0.02, m).astype(np.float32)
    r[25:35] = 0.0
    cols = np.concatenate([21 + 6 * r0 + np.arange(6), 21 + 6 * r1 + np.arange(6)])

    # expanded generic buffer
    H = np.zeros((m, D), np.float32)
    H[:, cols] = B
    st_gen, warn_gen = apply_update(state, mp, jnp.asarray(H), jnp.asarray(r),
                                    jnp.asarray(m, jnp.int32))
    st_r12, warn_r12 = apply_update_rank12(state, mp, jnp.asarray(B),
                                           jnp.asarray(r), jnp.asarray(cols))

    np.testing.assert_allclose(np.asarray(st_r12.imu.p),
                               np.asarray(st_gen.imu.p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_r12.imu.q),
                               np.asarray(st_gen.imu.q), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_r12.cams.p),
                               np.asarray(st_gen.cams.p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_r12.cov),
                               np.asarray(st_gen.cov), atol=5e-4)
    assert bool(warn_r12) == bool(warn_gen)


def test_rank12_update_singular_p12_stays_finite():
    """Pruning a window that contains DUPLICATE camera clones (an IMU-dropout
    gap makes augment_state append identically-posed, perfectly-correlated
    cameras) makes P12 exactly singular.  The push-through form must stay
    finite and match the generic sigma^2-regularized update — the round-4
    cholesky(P12) form NaN'd here (VERDICT r4 #1)."""
    import numpy as np
    import jax.numpy as jnp

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.msckf.state import init_state, make_params
    from uav_airvision_tpu.models.msckf.update import (apply_update,
                                                       apply_update_rank12)

    cfg = euroc_config()
    mp = make_params(cfg)
    state = init_state(cfg, mp, np.zeros(3), np.array([0.05, 0.02, 9.8]))
    D = cfg.capacity.state_dim
    rng = np.random.default_rng(7)

    r0, r1 = 4, 5
    cols = np.concatenate([21 + 6 * r0 + np.arange(6), 21 + 6 * r1 + np.arange(6)])

    # PD base covariance, then force the two pruned clones to be EXACT copies
    # of each other: rows/cols of clone r1 := rows/cols of clone r0, making
    # the 12x12 joint block rank 6 (singular).
    A = rng.normal(0, 0.05, (D, D))
    P = A @ A.T + 0.01 * np.eye(D)
    b0 = slice(21 + 6 * r0, 21 + 6 * r0 + 6)
    b1 = slice(21 + 6 * r1, 21 + 6 * r1 + 6)
    P[b1, :] = P[b0, :]
    P[:, b1] = P[:, b0]
    P = ((P + P.T) / 2).astype(np.float32)
    assert np.linalg.matrix_rank(P[np.ix_(cols, cols)], tol=1e-6) == 6

    state = state._replace(
        cov=jnp.asarray(P),
        cams=state.cams._replace(count=jnp.asarray(20, jnp.int32)),
    )

    m = 60
    B = rng.normal(0, 0.8, (m, 12)).astype(np.float32)
    r = rng.normal(0, 0.02, m).astype(np.float32)

    st_r12, _ = apply_update_rank12(state, mp, jnp.asarray(B),
                                    jnp.asarray(r), jnp.asarray(cols))
    assert np.isfinite(np.asarray(st_r12.cov)).all()
    assert np.isfinite(np.asarray(st_r12.imu.p)).all()
    assert np.isfinite(np.asarray(st_r12.imu.q)).all()

    H = np.zeros((m, D), np.float32)
    H[:, cols] = B
    st_gen, _ = apply_update(state, mp, jnp.asarray(H), jnp.asarray(r),
                             jnp.asarray(m, jnp.int32))
    np.testing.assert_allclose(np.asarray(st_r12.imu.p),
                               np.asarray(st_gen.imu.p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_r12.cov),
                               np.asarray(st_gen.cov), atol=2e-3)
