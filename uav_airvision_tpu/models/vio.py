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
                   mparams: MsckfParams, config: Config):
    """Batched VIO step over a leading instance axis, with every size-tier /
    branch decision hoisted to batch-level lax.conds OUTSIDE the vmap (under
    vmap a cond lowers to select and both branches execute — the round-2
    fleet anti-scaling).  Semantically equivalent to ``vmap(vio_step)``.

    Fleet configs should set ``frontend.stereo_seed_fallback=False`` (or
    ``stereo_seeded=False``) so the stereo fast path does not carry its
    per-instance fallback cond into the vmap.
    """
    from .frontend.pipeline import frontend_step as _fe
    from .msckf.step import backend_step_fleet

    def fe(assume_init):
        def run(args):
            st, c0, c1, w, dt = args
            return jax.vmap(
                lambda s, a, b, ww, dd: _fe(s, a, b, ww, dd, fparams, config,
                                            assume_initialized=assume_init)
            )(st, c0, c1, w, dt)
        return run

    fe_args = (bstate.frontend, bframe.cam0, bframe.cam1, bframe.fe_mean_w,
               bframe.fe_dt)
    fe_state, fe_out = lax.cond(
        jnp.all(bstate.frontend.initialized), fe(True), fe(False), fe_args)

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
    filt, out = backend_step_fleet(bstate.filter, backend_frame, mparams, config)
    return VioState(frontend=fe_state, filter=filt), out


def make_jitted_step(config: Config, fparams=None, mparams=None):
    fparams = fparams or make_frontend_params(config)
    mparams = mparams or make_params(config)
    return with_highest_precision(jax.jit(
        functools.partial(vio_step, fparams=fparams, mparams=mparams, config=config)
    )), fparams, mparams


@functools.lru_cache(maxsize=8)
def _sequence_runner(config: Config, unroll: int):
    """Compiled scan runner, memoized per config so repeat calls (bench
    warmup/timed, sweeps) reuse the same XLA executable."""
    fparams = make_frontend_params(config)
    mparams = make_params(config)

    def scan_fn(carry, frame):
        new_state, out = vio_step(carry, frame, fparams, mparams, config)
        return new_state, out

    @with_highest_precision
    @jax.jit
    def _run(state, frames):
        return lax.scan(scan_fn, state, frames, unroll=unroll)

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
