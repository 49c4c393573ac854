"""Host data layer: prebatching semantics, native loader, trajectory format,
checkpoint/resume, fault injection."""

import os

import numpy as np
import pytest

from uav_airvision_tpu.config import euroc_config
from uav_airvision_tpu.streaming.prebatch import prebatch_imu


def test_prebatch_windows_cover_stream_exactly_once():
    rng = np.random.default_rng(0)
    imu_t = np.arange(0, 6.0, 0.005)  # 200 Hz
    imu_w = rng.normal(size=(len(imu_t), 3))
    imu_a = rng.normal(size=(len(imu_t), 3))
    frame_ts = np.arange(0, 6.0, 0.05) + 0.012  # 20 fps, offset phase
    pb = prebatch_imu(frame_ts, imu_t, imu_w, imu_a, 64, init_msgs=200)

    # active begins once the 200th message has arrived
    t_ready = imu_t[199]
    np.testing.assert_array_equal(pb.active, frame_ts >= t_ready)

    # device-side times are rebased to the first frame stamp (float32 safety)
    assert pb.time_base == frame_ts[0]

    # every message in (first_active_frame_t, last_frame_t] appears exactly once
    first_active = frame_ts[pb.active][0]
    last = frame_ts[-1]
    expect = imu_t[(imu_t >= first_active) & (imu_t <= last)] - pb.time_base
    got = np.sort(pb.imu_t[pb.imu_mask])
    # the first active frame may include the message exactly at its stamp
    assert len(got) in (len(expect), len(expect) + 1)
    np.testing.assert_allclose(got[-len(expect):], expect)

    # windows are per-frame contiguous and within (prev_t, t]
    act_idx = np.nonzero(pb.active)[0]
    frame_rel = frame_ts - pb.time_base
    for i, k in enumerate(act_idx[1:], 1):
        tmask = pb.imu_mask[k]
        if not tmask.any():
            continue
        tw = pb.imu_t[k][tmask]
        assert tw.max() <= frame_rel[k] + 1e-12
        assert tw.min() > frame_rel[act_idx[i - 1]]

    # init constants are the mean of the first 200 messages
    np.testing.assert_allclose(pb.gyro_bias, imu_w[:200].mean(axis=0))
    np.testing.assert_allclose(pb.acc_mean, imu_a[:200].mean(axis=0))


def test_prebatch_frontend_window_truncation():
    # two frames; messages exist between prev-0.01 and prev-0.004 that the
    # previous frame's truncation consumed -> they must not re-enter
    imu_t = np.array([0.0, 0.039, 0.043, 0.047, 0.051, 0.091, 0.095, 0.099])
    imu_w = np.tile(np.arange(len(imu_t))[:, None], (1, 3)).astype(float)
    imu_a = np.zeros_like(imu_w)
    frame_ts = np.array([0.05, 0.10])
    pb = prebatch_imu(frame_ts, imu_t, imu_w, imu_a, 16, init_msgs=1)
    # frame 1 window: [0.04, 0.096) intersected with not-yet-consumed
    # messages; msgs 0.043..0.095 (0.039 < 0.04 excluded)
    w = pb.fe_mean_w[1]
    expect = imu_w[(imu_t >= 0.04) & (imu_t < 0.096)].mean(axis=0)
    np.testing.assert_allclose(w, expect)


def test_native_csv_matches_numpy(tmp_path):
    native = pytest.importorskip("uav_airvision_tpu.runtime.native")
    p = tmp_path / "data.csv"
    rng = np.random.default_rng(1)
    rows = rng.normal(size=(50, 6))
    ts = (1403636579758555392 + np.arange(50) * 5000000).astype(np.int64)
    with open(p, "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i in range(50):
            f.write(",".join([str(ts[i])] + [f"{v:.9f}" for v in rows[i]]) + "\n")
    try:
        t, vals = native.parse_csv(str(p), 6)
    except native.NativeUnavailable:
        pytest.skip("native loader not buildable here")
    np.testing.assert_allclose(t, ts * 1e-9)
    np.testing.assert_allclose(vals, rows, atol=1e-9)


def test_native_png_decoder(tmp_path):
    cv2 = pytest.importorskip("cv2")
    native = pytest.importorskip("uav_airvision_tpu.runtime.native")
    rng = np.random.default_rng(2)
    paths, imgs = [], []
    for i in range(6):
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(img)
    try:
        out = native.decode_pngs(paths, 48, 64)
    except native.NativeUnavailable:
        pytest.skip("native loader not buildable here")
    for i in range(6):
        np.testing.assert_array_equal(out[i], imgs[i])


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from uav_airvision_tpu.models.vio import init_vio_state
    from uav_airvision_tpu.utils import checkpoint as ckpt

    cfg = euroc_config()
    state = init_vio_state(cfg, np.zeros(3), np.array([0.1, 0.0, 9.8]))
    state = state._replace(
        filter=state.filter._replace(
            imu=state.filter.imu._replace(p=jnp.asarray([1.0, 2.0, 3.0]))
        )
    )
    ckpt.save_state(str(tmp_path), state, step=7)
    restored, step = ckpt.restore_state(str(tmp_path), state)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.filter.imu.p), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(restored.filter.cov), np.asarray(state.filter.cov)
    )


def test_imu_dropout_fault_injection():
    """Feature-starved + IMU-dropout frames must not destabilize the filter
    (dead-reckoning through the gap)."""
    import functools

    import jax
    import jax.numpy as jnp

    from uav_airvision_tpu.models.msckf.state import make_params, init_state
    from uav_airvision_tpu.models.msckf.step import backend_step, FrameInput

    cfg = euroc_config(dtype="float64")
    params = make_params(cfg, dtype=jnp.float64)
    state = init_state(cfg, params, np.zeros(3), np.array([0.0, 0.0, 9.81]),
                       dtype=jnp.float64)
    step = jax.jit(functools.partial(backend_step, params=params, config=cfg))
    cap = cfg.capacity
    K, I = cap.max_features, cap.max_imu_per_frame
    rng = np.random.default_rng(0)
    t = 0.0
    for k in range(12):
        t += 0.05
        dropout = 4 <= k < 7  # IMU + features gone for 3 frames
        nimu = 0 if dropout else 10
        imu_t = np.zeros(I)
        imu_t[:nimu] = t - 0.05 + np.arange(1, nimu + 1) * 0.005
        imu_mask = np.arange(I) < nimu
        imu_a = np.zeros((I, 3))
        imu_a[:nimu] = [0, 0, 9.81]
        nf = 0 if dropout else 30
        ids = np.full(K, -1, np.int32)
        ids[:nf] = np.arange(nf)
        uv = np.zeros((K, 4))
        uv[:nf] = rng.normal(0, 0.2, (nf, 4))
        frame = FrameInput(
            timestamp=jnp.asarray(t, jnp.float64),
            imu_t=jnp.asarray(imu_t), imu_w=jnp.zeros((I, 3)),
            imu_a=jnp.asarray(imu_a), imu_mask=jnp.asarray(imu_mask),
            feat_ids=jnp.asarray(ids), feat_uv=jnp.asarray(uv),
            feat_mask=jnp.asarray(np.arange(K) < nf),
            active=jnp.asarray(True),
        )
        state, out = step(state, frame)
        assert bool(jnp.all(jnp.isfinite(state.cov))), f"cov blew up at frame {k}"
    assert bool(jnp.all(jnp.isfinite(state.imu.p)))


def test_run_sequence_checkpointed_resumes_bit_identical(tmp_path):
    """Kill a checkpointed run at frame k, resume from the snapshot: the
    continuation must be bit-identical to the uninterrupted run."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_config, _frame
    import jax
    import jax.numpy as jnp
    from uav_airvision_tpu.models.vio import (
        run_sequence, run_sequence_checkpointed,
    )

    cfg = _tiny_config()
    n = 12
    frames1 = _frame(cfg, n_batch=n)  # reuse the batched builder as a time axis
    gyro_bias = np.zeros(3)
    acc_mean = np.array([0.05, 0.02, 9.8])
    # give the frames a monotone clock so the filter state evolves
    ts = jnp.asarray(np.arange(1, n + 1) * 0.05, jnp.float32)
    frames1 = frames1._replace(
        timestamp=ts,
        imu_t=frames1.imu_t + ts[:, None] - 0.05,
    )

    _, ref_outs = run_sequence(cfg, frames1, gyro_bias, acc_mean)

    ckdir = str(tmp_path / "ck")
    # "killed" first run: only the first 8 frames are fed
    part = jax.tree.map(lambda x: x[:8], frames1)
    run_sequence_checkpointed(cfg, part, gyro_bias, acc_mean, ckdir, every=4)
    # resume over the full sequence: frames 0-7 must be skipped
    state2, outs2, start = run_sequence_checkpointed(
        cfg, frames1, gyro_bias, acc_mean, ckdir, every=4)
    assert start == 8
    np.testing.assert_array_equal(np.asarray(outs2.p),
                                  np.asarray(ref_outs.p[8:]))
    np.testing.assert_array_equal(np.asarray(outs2.q),
                                  np.asarray(ref_outs.q[8:]))


# ---------------------------------------------------------------------------
# DataPublisher pacing / sentinel semantics (pure host, no jax)
# ---------------------------------------------------------------------------


class _MsgStream:
    def __init__(self, timestamps, starttime=0.0):
        from collections import namedtuple

        msg = namedtuple("msg", ["timestamp"])
        self.msgs = [msg(t) for t in timestamps]
        self.starttime = starttime

    def __iter__(self):
        return iter(self.msgs)


def _drain(q):
    out = []
    while not q.empty():
        out.append(q.get_nowait())
    return out


def test_publisher_paces_orders_and_terminates():
    import time
    from queue import Queue

    from uav_airvision_tpu.streaming.publisher import DataPublisher

    q = Queue()
    # 0.3 s of dataset time at 10x => ~30 ms wall; one pre-start msg dropped.
    pub = DataPublisher(_MsgStream([-0.5, 0.0, 0.1, 0.2, 0.3]), q, ratio=10.0)
    t0 = time.time()
    pub.start(t0)
    pub.publish_thread.join(timeout=5.0)
    wall = time.time() - t0
    out = _drain(q)
    assert [m.timestamp for m in out[:-1]] == [0.0, 0.1, 0.2, 0.3]
    assert out[-1] is None
    # paced: the 0.3 s-relative message may not arrive before 0.3/10 s
    assert wall >= 0.3 / 10.0 - 2e-3
    assert wall < 2.0


def test_publisher_duration_cutoff_and_stop():
    import time
    from queue import Queue

    from uav_airvision_tpu.streaming.publisher import DataPublisher

    q = Queue()
    pub = DataPublisher(_MsgStream([0.0, 0.05, 10.0]), q, duration=0.1, ratio=100.0)
    pub.start(time.time())
    pub.publish_thread.join(timeout=5.0)
    out = _drain(q)
    assert [m.timestamp for m in out[:-1]] == [0.0, 0.05]
    assert out[-1] is None  # duration exceeded => sentinel, stream ends

    # stop() interrupts a far-future deadline promptly and adds a sentinel
    q2 = Queue()
    pub2 = DataPublisher(_MsgStream([0.0, 1000.0]), q2, ratio=1.0)
    pub2.start(time.time())
    time.sleep(0.05)
    t_stop = time.time()
    pub2.stop()
    assert time.time() - t_stop < 1.0
    out2 = _drain(q2)
    assert out2[0].timestamp == 0.0
    assert out2[-1] is None
