"""The fused VIO model: vision front-end + MSCKF back-end as one compiled
per-frame step, plus the sequence runner (`lax.scan` over the sensor stream).

This is the TPU-native equivalent of the reference's thread/queue pipeline
(VIO orchestrator, reference src/modules/vio.py:6-53): instead of three
daemon threads passing messages, the whole frame computation is a single XLA
program `vio_step(state, frame) -> (state, output)`; host I/O happens at the
array boundary (streaming/prebatch.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Config
from ..utils.precision import with_highest_precision
from .frontend.params import FrontendParams, make_frontend_params
from .frontend.pipeline import FrontendState, frontend_step, init_frontend_state
from .msckf.state import FilterState, MsckfParams, init_state, make_params
from .msckf.step import FrameInput, StepOutput, backend_step


class VioState(NamedTuple):
    frontend: FrontendState
    filter: FilterState


class VioFrame(NamedTuple):
    """One prebatched sensor frame (host-assembled)."""

    timestamp: jnp.ndarray  # ()
    cam0: jnp.ndarray  # (H,W) uint8
    cam1: jnp.ndarray  # (H,W) uint8
    imu_t: jnp.ndarray  # (I,)
    imu_w: jnp.ndarray  # (I,3)
    imu_a: jnp.ndarray  # (I,3)
    imu_mask: jnp.ndarray  # (I,)
    fe_mean_w: jnp.ndarray  # (3,) front-end rotation-prediction mean gyro
    fe_dt: jnp.ndarray  # ()
    active: jnp.ndarray  # () bool — backend processes this frame


def init_vio_state(config: Config, gyro_bias=None, acc_mean=None,
                   mparams: MsckfParams = None) -> VioState:
    mparams = mparams or make_params(config)
    return VioState(
        frontend=init_frontend_state(config),
        filter=init_state(config, mparams, gyro_bias, acc_mean),
    )


def vio_step(state: VioState, frame: VioFrame, fparams: FrontendParams,
             mparams: MsckfParams, config: Config):
    """Full frame: images -> features -> filter update -> pose."""
    fe_state, fe_out = frontend_step(
        state.frontend, frame.cam0, frame.cam1, frame.fe_mean_w, frame.fe_dt,
        fparams, config,
    )
    dtype = state.filter.cov.dtype
    backend_frame = FrameInput(
        timestamp=frame.timestamp.astype(dtype),
        imu_t=frame.imu_t.astype(dtype),
        imu_w=frame.imu_w.astype(dtype),
        imu_a=frame.imu_a.astype(dtype),
        imu_mask=frame.imu_mask,
        feat_ids=fe_out.ids,
        feat_uv=fe_out.uv.astype(dtype),
        feat_mask=fe_out.mask,
        active=frame.active,
    )
    filt, out = backend_step(state.filter, backend_frame, mparams, config)
    return VioState(frontend=fe_state, filter=filt), out


def vio_step_fleet(bstate: VioState, bframe: VioFrame, fparams: FrontendParams,
                   mparams: MsckfParams, config: Config,
                   bucket: bool = False):
    """Batched VIO step over a leading instance axis, with every size-tier /
    branch decision hoisted to batch-level lax.conds OUTSIDE the vmap (under
    vmap a cond lowers to select and both branches execute — the round-2
    fleet anti-scaling).  Semantically equivalent to ``vmap(vio_step)``.

    The stereo-seed starvation fallback (frontend.stereo_seed_fallback) is
    hoisted the same way, as a TWO-PASS batch cond: the common pass runs the
    frontend with the fallback cond statically forced to the seeded branch
    (seed_mode="seeded") and reports per-instance ``n_seed``; iff ANY
    instance's fallback predicate would have fired, the whole batch is
    recomputed in seed_mode="cond" — whose vmapped per-instance select IS the
    exact single-instance semantics — and the fast pass is discarded.  In
    steady state no instance is starved and the fast pass is the only one
    that runs; fleet == single holds on every frame either way (round-4
    VERDICT #4: fleet_config used to silently drop the fallback instead).
    """
    from .frontend.pipeline import frontend_step as _fe
    from .msckf.step import backend_step_fleet

    def fe(assume_init, seed_mode="cond"):
        def run(args):
            st, c0, c1, w, dt = args
            return jax.vmap(
                lambda s, a, b, ww, dd: _fe(s, a, b, ww, dd, fparams, config,
                                            assume_initialized=assume_init,
                                            seed_mode=seed_mode)
            )(st, c0, c1, w, dt)
        return run

    fe_args = (bstate.frontend, bframe.cam0, bframe.cam1, bframe.fe_mean_w,
               bframe.fe_dt)
    fef = config.frontend
    hoist_fallback = fef.stereo_seeded and fef.stereo_seed_fallback

    def fe_initialized(args):
        if not hoist_fallback:
            return fe(True)(args)
        fast_state, fast_out = fe(True, seed_mode="seeded")(args)
        need_fb = jnp.any(fast_out.n_seed < fef.stereo_seed_min_tracked)
        return lax.cond(
            need_fb,
            lambda op: fe(True, seed_mode="cond")(op[0]),
            lambda op: op[1],
            (args, (fast_state, fast_out)),
        )

    fe_state, fe_out = lax.cond(
        jnp.all(bstate.frontend.initialized), fe_initialized, fe(False),
        fe_args)

    dtype = bstate.filter.cov.dtype
    backend_frame = FrameInput(
        timestamp=bframe.timestamp.astype(dtype),
        imu_t=bframe.imu_t.astype(dtype),
        imu_w=bframe.imu_w.astype(dtype),
        imu_a=bframe.imu_a.astype(dtype),
        imu_mask=bframe.imu_mask,
        feat_ids=fe_out.ids,
        feat_uv=fe_out.uv.astype(dtype),
        feat_mask=fe_out.mask,
        active=bframe.active,
    )
    filt, out = backend_step_fleet(bstate.filter, backend_frame, mparams,
                                   config, bucket=bucket)
    return VioState(frontend=fe_state, filter=filt), out


def make_jitted_step(config: Config, fparams=None, mparams=None):
    fparams = fparams or make_frontend_params(config)
    mparams = mparams or make_params(config)
    return with_highest_precision(jax.jit(
        functools.partial(vio_step, fparams=fparams, mparams=mparams, config=config)
    )), fparams, mparams


# ---------------------------------------------------------------------------
# packed scan I/O
#
# A lax.scan slices every input leaf and stacks every output leaf ONCE PER
# ITERATION; with VioFrame's ~10 leaves and StepOutput's ~16, those tiny
# dynamic-slice / dynamic-update-slice ops cost more per frame than entire
# pipeline stages (measured: the fused step scans at 1.74 ms/frame with
# constant inputs vs 2.26 through the leaf-wise scan — ~0.5 ms of pure scan
# I/O overhead).  The runner therefore packs each frame's scalar/IMU fields
# into ONE (6+8I,) f32 vector (same layout the streaming path sends over the
# tunnel) and both images into one (2,H,W) stack, and flattens StepOutput to
# ONE (OUT_VEC_DIM=31,) f32 vector per frame — 3 sliced leaves + 1 stacked leaf per
# iteration.  Packing/unpacking is value-exact: every field is f32 already
# or a small int/bool representable exactly in f32.
# ---------------------------------------------------------------------------


def frame_vec_dim(I: int) -> int:
    return 6 + 8 * I


def pack_frames_batch(frames: VioFrame):
    """(T,...)-leaf VioFrame -> ((T,2,H,W) uint8, (T,6+8I) f32).  Traced."""
    T, I = frames.imu_t.shape
    f32 = jnp.float32
    vec = jnp.concatenate([
        frames.timestamp.reshape(T, 1).astype(f32),
        frames.fe_dt.reshape(T, 1).astype(f32),
        frames.active.reshape(T, 1).astype(f32),
        frames.fe_mean_w.reshape(T, 3).astype(f32),
        frames.imu_t.reshape(T, I).astype(f32),
        frames.imu_w.reshape(T, 3 * I).astype(f32),
        frames.imu_a.reshape(T, 3 * I).astype(f32),
        frames.imu_mask.reshape(T, I).astype(f32),
    ], axis=1)
    imgs = jnp.stack([frames.cam0, frames.cam1], axis=1)
    return imgs, vec


def unpack_frame(imgs, packed, I: int) -> VioFrame:
    """Inverse of one row of ``pack_frames_batch`` (also the layout the
    streaming path ships per frame).  Traced, inside jit."""
    return VioFrame(
        timestamp=packed[0],
        cam0=imgs[0],
        cam1=imgs[1],
        imu_t=packed[6:6 + I],
        imu_w=packed[6 + I:6 + 4 * I].reshape(I, 3),
        imu_a=packed[6 + 4 * I:6 + 7 * I].reshape(I, 3),
        imu_mask=packed[6 + 7 * I:6 + 8 * I] > 0.5,
        fe_mean_w=packed[3:6],
        fe_dt=packed[1],
        active=packed[2] > 0.5,
    )


OUT_VEC_DIM = 31


def flatten_step_out(out: StepOutput):
    """StepOutput -> (31,) f32: [timestamp, q(4), p(3), v(3), active, warn,
    did_reset, n_cams, n_features, n_lost_overflow, n_update_rows,
    n_prune_feats, R_imu_cam0(9), t_cam0_imu(3)]."""
    f32 = jnp.float32
    return jnp.concatenate([
        out.timestamp.reshape(1).astype(f32),
        out.q.astype(f32), out.p.astype(f32), out.v.astype(f32),
        out.active.reshape(1).astype(f32),
        out.warn_large_update.reshape(1).astype(f32),
        out.did_reset.reshape(1).astype(f32),
        out.n_cams.reshape(1).astype(f32),
        out.n_features.reshape(1).astype(f32),
        out.n_lost_overflow.reshape(1).astype(f32),
        out.n_update_rows.reshape(1).astype(f32),
        out.n_prune_feats.reshape(1).astype(f32),
        out.R_imu_cam0.reshape(9).astype(f32),
        out.t_cam0_imu.astype(f32),
    ])


def unflatten_step_outs(vs) -> StepOutput:
    """(T,31) f32 -> StepOutput with (T,...) leaves, original dtypes."""
    i32 = jnp.int32
    return StepOutput(
        timestamp=vs[:, 0],
        q=vs[:, 1:5],
        p=vs[:, 5:8],
        v=vs[:, 8:11],
        active=vs[:, 11] > 0.5,
        warn_large_update=vs[:, 12] > 0.5,
        did_reset=vs[:, 13] > 0.5,
        n_cams=vs[:, 14].astype(i32),
        n_features=vs[:, 15].astype(i32),
        n_lost_overflow=vs[:, 16].astype(i32),
        n_update_rows=vs[:, 17].astype(i32),
        n_prune_feats=vs[:, 18].astype(i32),
        R_imu_cam0=vs[:, 19:28].reshape(-1, 3, 3),
        t_cam0_imu=vs[:, 28:31],
    )


@functools.lru_cache(maxsize=8)
def _sequence_runner(config: Config, unroll: int):
    """Compiled scan runner, memoized per config so repeat calls (bench
    warmup/timed, sweeps) reuse the same XLA executable."""
    fparams = make_frontend_params(config)
    mparams = make_params(config)
    I = config.capacity.max_imu_per_frame

    def scan_fn(carry, xs):
        im, v = xs
        frame = unpack_frame(im, v, I)
        new_state, out = vio_step(carry, frame, fparams, mparams, config)
        return new_state, flatten_step_out(out)

    @with_highest_precision
    @jax.jit
    def _run(state, frames):
        state, vs = lax.scan(scan_fn, state, pack_frames_batch(frames),
                             unroll=unroll)
        return state, unflatten_step_outs(vs)

    return _run


def run_sequence(config: Config, frames: VioFrame, gyro_bias, acc_mean,
                 fparams=None, mparams=None, state: VioState = None,
                 unroll: int = 1):
    """Batch mode: scan the compiled step over a whole prebatched sequence
    (frames has a leading time axis on every leaf).  Returns (state, outputs)
    with outputs stacked over time."""
    if state is None:
        mparams = mparams or make_params(config)
        state = init_vio_state(config, gyro_bias, acc_mean, mparams)
    return _sequence_runner(config, unroll)(state, frames)


def run_sequence_checkpointed(config: Config, frames: VioFrame, gyro_bias,
                              acc_mean, checkpoint_dir: str, every: int = 200,
                              state: VioState = None, unroll: int = 1):
    """`run_sequence` with periodic orbax snapshots (the reference has no
    checkpoint/resume at all — SURVEY.md section 5).

    Scans the sequence in chunks of ``every`` frames, snapshotting the whole
    VioState pytree after each chunk.  If ``checkpoint_dir`` already holds a
    snapshot for this run, execution resumes from the latest one and only the
    remaining frames are processed — bit-identically to an uninterrupted run,
    because the state roundtrip is exact and the same compiled scan body
    consumes the same frame arrays.

    Returns (state, outputs, start_frame): ``outputs`` covers frames
    [start_frame, n) — the part actually (re)computed in this call.
    """
    from ..utils import checkpoint as ckpt

    n = int(frames.timestamp.shape[0])
    if state is None:
        state = init_vio_state(config, gyro_bias, acc_mean)
    start = 0
    latest = ckpt.latest_step(checkpoint_dir)
    if latest is not None and 0 < latest <= n:
        state, start = ckpt.restore_state(checkpoint_dir, state)
    run = _sequence_runner(config, unroll)
    outs = []
    for k0 in range(start, n, every):
        k1 = min(k0 + every, n)
        chunk = jax.tree.map(lambda x: x[k0:k1], frames)
        state, out = run(state, chunk)
        jax.block_until_ready(state)
        ckpt.save_state(checkpoint_dir, state, k1)
        outs.append(out)
    outputs = (
        jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs) if outs else None
    )
    return state, outputs, start
