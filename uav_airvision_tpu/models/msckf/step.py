"""The fused per-frame MSCKF step: one compiled XLA program per stereo frame.

This replaces the reference's per-frame Python orchestration
(``MSCKF.feature_callback``, reference src/msckf.py:177-228) — propagation,
state augmentation, feature bookkeeping, lost-feature marginalization, camera
pruning, publish, online reset — with masked fixed-shape array ops suitable
for ``jax.lax.scan`` over the whole sensor stream and ``vmap`` over VIO
instances.

Dynamic structures -> static equivalents:
  map_server dict            -> FeatureTable slots + insertion-seq ordering
  growing covariance         -> fixed (141,141), inactive rows/cols == 0
  variable Jacobian stacking -> static row buffer + prefix-sum offsets,
                                replicating the order-dependent 1500-row cap
                                (reference src/msckf.py:667)
  del-based pruning          -> gather/permutation + mask updates
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ...config import Config
from ...ops.gridops import smallest_k_indices, stable_compact_indices
from ...utils import quaternion as quat
from . import triangulation as tri
from .propagation import PROP_TIER, propagate_tiered
from .state import IMU_DIM, CamWindow, FeatureTable, FilterState, MsckfParams, reset_cov
from .update import (GATE_TIER, apply_update, apply_update_rank12,
                     feature_block, gating_test_batch, update_tiers)
from ...utils.lax_helpers import dyn_update

INT32_MAX = jnp.iinfo(jnp.int32).max


class FrameInput(NamedTuple):
    """One prebatched frame (host-side assembly in streaming/prebatch.py)."""

    timestamp: jnp.ndarray  # ()
    imu_t: jnp.ndarray  # (I,)
    imu_w: jnp.ndarray  # (I,3)
    imu_a: jnp.ndarray  # (I,3)
    imu_mask: jnp.ndarray  # (I,)
    feat_ids: jnp.ndarray  # (K,) int32
    feat_uv: jnp.ndarray  # (K,4) normalized stereo measurement
    feat_mask: jnp.ndarray  # (K,)
    active: jnp.ndarray  # () bool — gravity initialized; process this frame


class StepOutput(NamedTuple):
    timestamp: jnp.ndarray
    q: jnp.ndarray  # (4,) world->IMU orientation
    p: jnp.ndarray  # (3,) position
    v: jnp.ndarray  # (3,) velocity
    active: jnp.ndarray  # () bool — row corresponds to a processed frame
    warn_large_update: jnp.ndarray  # () bool
    did_reset: jnp.ndarray  # () bool
    n_cams: jnp.ndarray  # () int32
    n_features: jnp.ndarray  # () int32
    n_lost_overflow: jnp.ndarray  # () int32 — lost features beyond capacity
    n_update_rows: jnp.ndarray  # () int32 — lost-feature update rows (tier diag)
    n_prune_feats: jnp.ndarray  # () int32 — features in the prune update (tier diag)
    # IMU-cam0 extrinsics snapshot: lets a streaming publisher compute the
    # cam0 pose without touching the (donated) filter state buffers
    R_imu_cam0: jnp.ndarray  # (3,3)
    t_cam0_imu: jnp.ndarray  # (3,)


# ---------------------------------------------------------------------------
# state augmentation (reference src/msckf.py:390-423)
# ---------------------------------------------------------------------------


def augment_state(state: FilterState, t) -> FilterState:
    imu = state.imu
    cams = state.cams
    dtype = state.cov.dtype

    R_w_i = quat.to_rotation(imu.q)
    R_w_c = imu.R_imu_cam0 @ R_w_i
    t_c_w = imu.p + R_w_i.T @ imu.t_cam0_imu
    q_c = quat.to_quaternion(R_w_c)

    c = cams.count
    cams = cams._replace(
        sid=cams.sid.at[c].set(imu.sid),
        q=cams.q.at[c].set(q_c),
        p=cams.p.at[c].set(t_c_w),
        q_null=cams.q_null.at[c].set(q_c),
        p_null=cams.p_null.at[c].set(t_c_w),
        timestamp=cams.timestamp.at[c].set(t),
        count=c + 1,
    )

    eye3 = jnp.eye(3, dtype=dtype)
    J = jnp.zeros((6, IMU_DIM), dtype)
    J = J.at[:3, :3].set(imu.R_imu_cam0)
    J = J.at[:3, 15:18].set(eye3)
    J = J.at[3:6, :3].set(quat.skew(R_w_i.T @ imu.t_cam0_imu))
    J = J.at[3:6, 12:15].set(eye3)
    J = J.at[3:6, 18:21].set(eye3)

    P = state.cov
    row0 = IMU_DIM + 6 * c
    new_rows = J @ P[:IMU_DIM, :]  # (6, D)
    corner = J @ P[:IMU_DIM, :IMU_DIM] @ J.T  # (6, 6)
    P = dyn_update(P, new_rows, row0, 0)
    P = dyn_update(P, new_rows.T, 0, row0)
    P = dyn_update(P, corner, row0, row0)
    P = (P + P.T) / 2.0
    return state._replace(cams=cams, cov=P)


# ---------------------------------------------------------------------------
# feature observation upsert (reference src/msckf.py:425-441)
# ---------------------------------------------------------------------------


def add_observations(state: FilterState, feat_ids, feat_uv, feat_mask) -> FilterState:
    table = state.features
    M = table.fid.shape[0]
    K = feat_ids.shape[0]
    cslot = state.cams.count - 1

    curr_num = jnp.sum(table.valid.astype(jnp.int32))

    match = (
        feat_mask[:, None]
        & table.valid[None, :]
        & (feat_ids[:, None] == table.fid[None, :])
    )  # (K, M)
    matched = jnp.any(match, axis=1)
    m_idx = jnp.argmax(match, axis=1)
    tracked = jnp.sum(matched.astype(jnp.int32))

    # scatter tracked observations into (slot, cslot)
    safe_idx = jnp.where(matched, m_idx, M)  # out-of-range -> dropped
    obs = table.obs.at[safe_idx, cslot, :].set(feat_uv, mode="drop")
    obs_mask = table.obs_mask.at[safe_idx, cslot].set(True, mode="drop")

    # allocate new features in incoming order
    new = feat_mask & ~matched
    new_rank = jnp.cumsum(new.astype(jnp.int32)) - 1  # (K,)
    n_new = jnp.sum(new.astype(jnp.int32))
    free_sorted = stable_compact_indices(~table.valid, M)  # free slots asc
    tgt = jnp.where(new, free_sorted[jnp.clip(new_rank, 0, M - 1)], M)

    fid = table.fid.at[tgt].set(feat_ids, mode="drop")
    seq = table.seq.at[tgt].set(state.next_seq + new_rank, mode="drop")
    obs = obs.at[tgt, cslot, :].set(feat_uv, mode="drop")
    obs_mask = obs_mask.at[tgt, cslot].set(True, mode="drop")
    valid = table.valid.at[tgt].set(True, mode="drop")
    initialized = table.initialized.at[tgt].set(False, mode="drop")
    position = table.position.at[tgt].set(0.0, mode="drop")

    table = table._replace(
        fid=fid, seq=seq, obs=obs, obs_mask=obs_mask, valid=valid,
        initialized=initialized, position=position,
    )
    rate = tracked.astype(state.cov.dtype) / (curr_num.astype(state.cov.dtype) + 1e-5)
    return state._replace(features=table, next_seq=(state.next_seq + n_new).astype(jnp.int32),
                          tracking_rate=rate)


# ---------------------------------------------------------------------------
# lost-feature marginalization (reference remove_lost_features,
# src/msckf.py:614-676)
# ---------------------------------------------------------------------------


def _triangulate_one(state: FilterState, params: MsckfParams, config: Config,
                     slot, obs_sel_mask, active):
    """check_motion + initialize_position for feature at ``slot`` using the
    observations selected by ``obs_sel_mask`` for pose bookkeeping; the
    reference always triangulates over ALL of the feature's observations.

    ``active`` marks batch elements whose result is actually used: inactive
    ones exit the LM loops immediately (under vmap the while trip count is
    the max over the batch — see triangulation.triangulate)."""
    cams = state.cams
    table = state.features
    views = tri.build_views(
        cams.q, cams.p, table.obs[slot], obs_sel_mask,
        params.R_cam0_cam1, params.t_cam0_cam1,
    )
    cfg = config.triangulation
    if cfg.translation_threshold < 0:
        motion_ok = jnp.ones((), bool)
    else:
        first = jnp.argmax(obs_sel_mask)
        first_z = table.obs[slot][first, :2]
        motion_ok = tri.check_motion(views, obs_sel_mask, first_z, cfg, cams.q, cams.p)
    pos, tri_ok = tri.triangulate(views, cfg, active=active)
    return motion_ok, pos, tri_ok


def remove_lost_features(state: FilterState, params: MsckfParams, config: Config):
    """Lost-feature marginalization with overflow fallback: when more than
    ``max_lost_per_frame`` features are lost at once (feature-dense input),
    a second masked pass processes the next batch within the remaining
    1500-row budget — the reference processes ALL lost features in one stack
    subject to the same row cap (src/msckf.py:614-676).

    Size-tiered: in steady state only a handful of features are lost per
    frame, so a small-batch instantiation handles the common case — the
    triangulation / Jacobian / gating work is batched over 16 slots instead
    of 64 (outside vmap, lax.cond really skips the untaken branch)."""
    SMALL = 16
    n_cand = _count_lost_candidates(state)

    def none(st):
        # No >=3-obs lost candidates this frame — the common steady-state
        # case (median 0 on the bench world).  Only the <3-obs drops happen;
        # the whole triangulate/Jacobian/gate/solve chain is skipped.
        zero = jnp.zeros((), jnp.int32)
        return _drop_lost_short(st), jnp.zeros((), bool), zero, zero

    def small(st):
        return _remove_lost_once(st, params, config,
                                 jnp.asarray(1500, jnp.int32), SMALL)

    def big(st):
        return _remove_lost_once(st, params, config,
                                 jnp.asarray(1500, jnp.int32),
                                 config.capacity.max_lost_per_frame)

    state, warn1, n_over1, rows1 = lax.cond(
        n_cand == 0, none,
        lambda st: lax.cond(n_cand <= SMALL, small, big, st), state)

    def second(st):
        st2, w2, n2, _ = _remove_lost_once(
            st, params, config, (1500 - rows1).astype(jnp.int32),
            config.capacity.max_lost_per_frame)
        return st2, w2, n2

    def skip(st):
        return st, jnp.zeros((), bool), jnp.zeros((), jnp.int32)

    state, warn2, n_over2 = lax.cond(n_over1 > 0, second, skip, state)
    return state, warn1 | warn2, n_over2, rows1


def _drop_lost_short(state: FilterState) -> FilterState:
    """Delete lost features with <3 observations (no measurement value) —
    exactly what ``_remove_lost_once`` does when there are zero >=3-obs
    candidates, minus the dead triangulate/gate/update work."""
    table = state.features
    M = table.fid.shape[0]
    cslot = state.cams.count - 1
    seen_now = jnp.take_along_axis(
        table.obs_mask, jnp.full((M, 1), cslot), axis=1)[:, 0]
    obs_count = jnp.sum(table.obs_mask.astype(jnp.int32), axis=1)
    remove = table.valid & ~seen_now & (obs_count < 3)
    table = table._replace(
        valid=table.valid & ~remove,
        fid=jnp.where(remove, -1, table.fid),
        seq=jnp.where(remove, INT32_MAX, table.seq),
        obs_mask=table.obs_mask & ~remove[:, None],
        initialized=table.initialized & ~remove,
    )
    return state._replace(features=table)


def _count_lost_candidates(state: FilterState):
    table = state.features
    M = table.fid.shape[0]
    cslot = state.cams.count - 1
    seen_now = jnp.take_along_axis(
        table.obs_mask, jnp.full((M, 1), cslot), axis=1)[:, 0]
    obs_count = jnp.sum(table.obs_mask.astype(jnp.int32), axis=1)
    cand = table.valid & ~seen_now & (obs_count >= 3)
    return jnp.sum(cand.astype(jnp.int32))


def _remove_lost_once(state: FilterState, params: MsckfParams, config: Config,
                      row_cap, L, update_tier: str = "dynamic",
                      gate_tier: str = "dynamic"):
    cap = config.capacity
    table = state.features
    cams = state.cams
    dtype = state.cov.dtype
    M, N = table.obs_mask.shape
    D = cap.state_dim

    cslot = cams.count - 1
    seen_now = jnp.take_along_axis(table.obs_mask, jnp.full((M, 1), cslot), axis=1)[:, 0]
    obs_count = jnp.sum(table.obs_mask.astype(jnp.int32), axis=1)

    lost = table.valid & ~seen_now
    drop_short = lost & (obs_count < 3)
    cand = lost & (obs_count >= 3)

    # map-order selection of up to L candidates (sort-free top-L)
    sel = smallest_k_indices(jnp.where(cand, table.seq, INT32_MAX), L)
    sel_mask = cand[sel]
    n_overflow = jnp.maximum(jnp.sum(cand.astype(jnp.int32)) - L, 0).astype(jnp.int32)

    # triangulate the not-yet-initialized selected features (inactive batch
    # elements skip the LM loops; their outputs are masked out below)
    motion_ok, new_pos, tri_ok = jax.vmap(
        lambda slot, act: _triangulate_one(
            state, params, config, slot, table.obs_mask[slot], act)
    )(sel, sel_mask & ~table.initialized[sel])

    need_init = sel_mask & ~table.initialized[sel]
    init_fail = need_init & (~motion_ok | ~tri_ok)
    init_done = need_init & motion_ok & tri_ok

    position = table.position.at[sel].set(
        jnp.where(init_done[:, None], new_pos, table.position[sel]), mode="drop"
    )
    initialized = table.initialized.at[sel].set(
        table.initialized[sel] | init_done, mode="drop"
    )
    table = table._replace(position=position, initialized=initialized)
    state = state._replace(features=table)

    proc = sel_mask & ~init_fail  # features contributing measurement blocks

    # per-feature projected blocks over ALL observations
    def block_one(slot, is_proc):
        def run(_):
            return feature_block(
                cams.q, cams.p, cams.q_null, cams.p_null,
                table.obs[slot], table.obs_mask[slot], table.position[slot],
                state.gravity, params.R_cam0_cam1, params.t_cam0_cam1, D,
            )

        def skip(_):
            return (
                jnp.zeros((4 * N - 3, D), dtype),
                jnp.zeros((4 * N - 3,), dtype),
                jnp.zeros((), jnp.int32),
            )

        return lax.cond(is_proc, run, skip, None)

    H_blk, r_blk, rows_f = jax.vmap(block_one)(sel, proc)
    dof = jnp.sum(table.obs_mask[sel].astype(jnp.int32), axis=1) - 1
    gate_ok = gating_test_batch(
        H_blk, r_blk, jnp.where(proc, rows_f, 0), state.cov,
        params.obs_noise, params.chi2_table, dof, static_tier=gate_tier,
    )

    include = proc & gate_ok
    rows_inc = jnp.where(include, rows_f, 0)
    prefix = jnp.cumsum(rows_inc) - rows_inc
    include = include & (prefix <= row_cap)  # order-dependent cap (ref :667)
    rows_inc = jnp.where(include, rows_f, 0)
    rows_total = jnp.sum(rows_inc)

    # One scatter-add places every block: rows past a block's true height are
    # exactly zero (Householder projection preserves zero rows), so adjacent
    # blocks overlapping in the buffer only ever add zeros.
    R_BUF = cap.max_update_rows
    BLK = 4 * N - 3
    row_idx = jnp.where(
        include[:, None], prefix[:, None] + jnp.arange(BLK)[None, :], R_BUF
    ).reshape(-1)
    H_buf = jnp.zeros((R_BUF, D), dtype).at[row_idx].add(
        H_blk.reshape(L * BLK, D), mode="drop"
    )
    r_buf = jnp.zeros((R_BUF,), dtype).at[row_idx].add(
        r_blk.reshape(L * BLK), mode="drop"
    )

    any_update = jnp.any(include)

    def do_update(s):
        return apply_update(s, params, H_buf, r_buf, rows_total,
                            static_tier=update_tier)

    def no_update(s):
        return s, jnp.zeros((), bool)

    state, warn = lax.cond(any_update, do_update, no_update, state)

    # delete: all <3-obs lost features AND the selected candidates.  When
    # there is NO overflow this equals "every candidate" (the reference
    # deletes all of them this frame); overflow candidates survive for the
    # caller's second pass, which deletes whatever remains.
    table = state.features
    selected = jnp.zeros_like(cand).at[sel].set(sel_mask, mode="drop")
    remove = drop_short | selected | jnp.where(n_overflow > 0, False, cand)
    table = table._replace(
        valid=table.valid & ~remove,
        fid=jnp.where(remove, -1, table.fid),
        seq=jnp.where(remove, INT32_MAX, table.seq),
        obs_mask=table.obs_mask & ~remove[:, None],
        initialized=table.initialized & ~remove,
    )
    return (state._replace(features=table), warn, n_overflow,
            rows_total.astype(jnp.int32))  # int32 even under x64 (cond parity)


# ---------------------------------------------------------------------------
# camera-state pruning (reference src/msckf.py:678-786)
# ---------------------------------------------------------------------------


def _find_redundant(state: FilterState):
    """Pick 2 camera positions to remove (reference find_redundant_cam_states,
    src/msckf.py:678-709): either near-keyframe recent states or the oldest."""
    cams = state.cams
    count = cams.count
    key_idx = count - 4
    key_p = cams.p[key_idx]
    key_R = quat.to_rotation(cams.q[key_idx])

    def pick(carry, i):
        first_idx, cam_idx = carry
        p = cams.p[cam_idx]
        R = quat.to_rotation(cams.q[cam_idx])
        distance = jnp.linalg.norm(p - key_p)
        rel_q = quat.to_quaternion(R @ key_R.T)
        angle = 2.0 * jnp.arccos(jnp.clip(rel_q[3], -1.0, 1.0))
        near = (angle < 0.2618) & (distance < 0.4) & (state.tracking_rate > 0.5)
        rm = jnp.where(near, cam_idx, first_idx)
        first_idx = jnp.where(near, first_idx, first_idx + 1)
        return (first_idx, cam_idx + 1), rm

    (_, _), rms = lax.scan(pick, (jnp.zeros((), jnp.int32), key_idx + 1), jnp.arange(2))
    return jnp.sort(rms)


def prune_cam_states(state: FilterState, params: MsckfParams, config: Config):
    cap = config.capacity

    def do_prune(state):
        table = state.features
        M = table.obs_mask.shape[0]

        rm = _find_redundant(state)  # (2,) sorted positions
        inv0 = table.obs_mask[:, :][jnp.arange(M)[:, None], rm[None, :]]  # (M,2)
        k_inv = jnp.sum(inv0.astype(jnp.int32), axis=1) * table.valid.astype(jnp.int32)
        two = table.valid & (k_inv == 2)
        n_two = jnp.sum(two.astype(jnp.int32))

        # size tiers: few features usually see both pruned cams; the small
        # instantiations shrink the triangulation/Jacobian/gating batch
        # (feature-dense scenes routinely land in the 33..64 band, which
        # otherwise pays the full max_prune_feats batch)
        SMALL, MID = 32, 64
        return lax.cond(
            n_two <= SMALL,
            lambda s: _prune_sized(s, params, config, rm, two, n_two, SMALL),
            lambda s: lax.cond(
                n_two <= MID,
                lambda t: _prune_sized(t, params, config, rm, two, n_two,
                                       min(MID, M)),
                lambda t: _prune_sized(t, params, config, rm, two, n_two,
                                       min(cap.max_prune_feats, M)),
                s,
            ),
            state,
        )

    def no_prune(state):
        return state, jnp.zeros((), bool)

    return lax.cond(
        state.cams.count >= config.filter.max_cam_state_size, do_prune, no_prune, state
    )


def _prune_sized(state: FilterState, params: MsckfParams, config: Config,
                 rm, two, n_two, Kp, update_tier: str = "dynamic"):
    cap = config.capacity
    table = state.features
    cams = state.cams
    dtype = state.cov.dtype
    M, N = table.obs_mask.shape
    D = cap.state_dim
    r0, r1 = rm[0], rm[1]
    prune_overflow = n_two > Kp
    sel = smallest_k_indices(jnp.where(two, table.seq, INT32_MAX), Kp)
    sel_two = two[sel]

    # triangulate uninitialized selected features over ALL observations
    # (inactive batch elements skip the LM loops)
    motion_ok, new_pos, tri_ok = jax.vmap(
        lambda slot, act: _triangulate_one(
            state, params, config, slot, table.obs_mask[slot], act)
    )(sel, sel_two & ~table.initialized[sel])
    need_init = sel_two & ~table.initialized[sel]
    init_fail = need_init & (~motion_ok | ~tri_ok)
    init_done = need_init & motion_ok & tri_ok

    table = table._replace(
        position=table.position.at[sel].set(
            jnp.where(init_done[:, None], new_pos, table.position[sel]),
            mode="drop"),
        initialized=table.initialized.at[sel].set(
            table.initialized[sel] | init_done, mode="drop"),
    )
    state = state._replace(features=table)

    proc_sel = sel_two & ~init_fail  # (Kp,) selected features to process

    # Jacobian blocks over the 2 involved cameras only.
    cq = cams.q[rm]
    cp = cams.p[rm]
    cqn = cams.q_null[rm]
    cpn = cams.p_null[rm]

    def block_one(slot):
        obs2 = table.obs[slot][rm]
        mask2 = table.obs_mask[slot][rm]
        H, r, rows = feature_block(
            cq, cp, cqn, cpn, obs2, mask2, table.position[slot],
            state.gravity, params.R_cam0_cam1, params.t_cam0_cam1, D,
        )
        # only the two involved cameras' 6-column blocks are nonzero
        return H[:, IMU_DIM : IMU_DIM + 12], r, rows

    # Under vmap the old per-feature cond lowered to select (both branches
    # ran anyway) and the per-feature column placement lowered to a scatter
    # XLA serializes into a Kp-iteration while loop (measured ~0.75 ms per
    # prune).  Compute compact (5, 12) blocks for ALL slots, mask, and place
    # the columns with TWO whole-batch dynamic-update-slices at the shared
    # (traced) camera offsets.
    H12, r_blk, rows_f = jax.vmap(block_one)(sel)
    H12 = jnp.where(proc_sel[:, None, None], H12, 0.0)
    r_blk = jnp.where(proc_sel[:, None], r_blk, 0.0)
    rows_f = jnp.where(proc_sel, rows_f, 0)
    H_blk = jnp.zeros((Kp, 5, D), dtype)
    H_blk = dyn_update(H_blk, H12[:, :, :6], 0, 0, IMU_DIM + 6 * r0)
    H_blk = dyn_update(H_blk, H12[:, :, 6:], 0, 0, IMU_DIM + 6 * r1)
    gate_ok = gating_test_batch(
        H_blk, r_blk, jnp.where(proc_sel, rows_f, 0), state.cov,
        params.obs_noise, params.chi2_table,
        jnp.full((Kp,), 2, jnp.int32),
    )

    # sel is already in map (insertion-seq) order, so stacking order is
    # the reference's iteration order
    include = proc_sel & gate_ok
    any_update = jnp.any(include)
    if config.filter.prune_rank12:
        # Rank-12 Woodbury update: zeroed rows are exact no-ops in B^T B /
        # B^T r, so no row placement or row cap is needed (the stack order
        # never mattered here — the prune path has no truncation).
        B = jnp.where(include[:, None, None], H12, 0.0).reshape(Kp * 5, 12)
        r_s = jnp.where(include[:, None], r_blk, 0.0).reshape(Kp * 5)
        cols = jnp.concatenate([
            IMU_DIM + 6 * r0 + jnp.arange(6),
            IMU_DIM + 6 * r1 + jnp.arange(6),
        ])
        state, warn = lax.cond(
            any_update,
            lambda s: apply_update_rank12(s, params, B, r_s, cols),
            lambda s: (s, jnp.zeros((), bool)),
            state,
        )
    else:
        rows_inc = jnp.where(include, rows_f, 0)
        prefix = jnp.cumsum(rows_inc) - rows_inc
        rows_total = jnp.sum(rows_inc)

        # single scatter-add (rows past a block's true height are exact zeros)
        R_BUF = cap.max_prune_rows
        row_idx = jnp.where(
            include[:, None], prefix[:, None] + jnp.arange(5)[None, :], R_BUF
        ).reshape(-1)
        H_buf = jnp.zeros((R_BUF, D), dtype).at[row_idx].add(
            H_blk.reshape(Kp * 5, D), mode="drop"
        )
        r_buf = jnp.zeros((R_BUF,), dtype).at[row_idx].add(
            r_blk.reshape(Kp * 5), mode="drop"
        )

        state, warn = lax.cond(
            any_update,
            lambda s: apply_update(s, params, H_buf, r_buf, rows_total,
                                   static_tier=update_tier),
            lambda s: (s, jnp.zeros((), bool)),
            state,
        )
    warn = warn | prune_overflow

    # delete involved observations for every feature (reference deletes
    # them whether or not the update used them)
    table = state.features
    cams = state.cams  # rebind: apply_update corrected the window poses
    obs_mask = table.obs_mask.at[:, r0].set(False).at[:, r1].set(False)

    # compact the camera window + covariance: keep all slots except r0,r1
    keep = stable_compact_indices(
        (jnp.arange(N) != r0) & (jnp.arange(N) != r1), N
    )  # kept positions ascending, pad N at tail
    keep_safe = jnp.clip(keep, 0, N - 1)
    live_new = jnp.arange(N) < (cams.count - 2)

    unit_q = jnp.zeros((4,), dtype).at[3].set(1.0)
    cams = CamWindow(
        sid=jnp.where(live_new, cams.sid[keep_safe], -1),
        q=jnp.where(live_new[:, None], cams.q[keep_safe], unit_q),
        p=jnp.where(live_new[:, None], cams.p[keep_safe], 0.0),
        q_null=jnp.where(live_new[:, None], cams.q_null[keep_safe], unit_q),
        p_null=jnp.where(live_new[:, None], cams.p_null[keep_safe], 0.0),
        timestamp=jnp.where(live_new, cams.timestamp[keep_safe], 0.0),
        count=cams.count - 2,
    )

    # shift observation columns with the window
    obs = jnp.where(
        live_new[None, :, None], table.obs[:, keep_safe, :], 0.0
    )
    obs_mask = jnp.where(live_new[None, :], obs_mask[:, keep_safe], False)
    table = table._replace(obs=obs, obs_mask=obs_mask)

    # covariance permutation: state row index map
    cam_rows = IMU_DIM + 6 * keep_safe[:, None] + jnp.arange(6)[None, :]
    idx = jnp.concatenate([jnp.arange(IMU_DIM), cam_rows.reshape(-1)])
    row_live = jnp.concatenate(
        [jnp.ones(IMU_DIM, bool), jnp.repeat(live_new, 6)]
    )
    P = state.cov[idx][:, idx]
    P = jnp.where(row_live[:, None] & row_live[None, :], P, 0.0)

    return state._replace(cams=cams, features=table, cov=P), warn


# ---------------------------------------------------------------------------
# online reset (reference src/msckf.py:821-843)
# ---------------------------------------------------------------------------


def online_reset(state: FilterState, params: MsckfParams, config: Config):
    diag = jnp.diagonal(state.cov)
    pos_std_max = jnp.sqrt(jnp.max(diag[12:15]))
    trigger = (config.filter.position_std_threshold > 0) & (
        pos_std_max >= config.filter.position_std_threshold
    )

    def do_reset(state):
        dtype = state.cov.dtype
        N = state.cams.q.shape[0]
        M = state.features.fid.shape[0]
        unit_q = jnp.zeros((N, 4), dtype).at[:, 3].set(1.0)
        cams = CamWindow(
            sid=jnp.full((N,), -1, jnp.int32),
            q=unit_q,
            p=jnp.zeros((N, 3), dtype),
            q_null=unit_q,
            p_null=jnp.zeros((N, 3), dtype),
            timestamp=jnp.zeros((N,), dtype),
            count=jnp.zeros((), jnp.int32),
        )
        feats = FeatureTable(
            fid=jnp.full((M,), -1, jnp.int32),
            seq=jnp.full((M,), INT32_MAX, jnp.int32),
            obs=jnp.zeros_like(state.features.obs),
            obs_mask=jnp.zeros_like(state.features.obs_mask),
            position=jnp.zeros_like(state.features.position),
            initialized=jnp.zeros_like(state.features.initialized),
            valid=jnp.zeros_like(state.features.valid),
        )
        return state._replace(
            cams=cams, features=feats, cov=reset_cov(config, params, dtype)
        )

    return lax.cond(trigger, do_reset, lambda s: s, state), trigger


# ---------------------------------------------------------------------------
# the per-frame step
# ---------------------------------------------------------------------------


def backend_step(state: FilterState, frame: FrameInput, params: MsckfParams,
                 config: Config):
    """One stereo frame through the estimator (reference feature_callback,
    src/msckf.py:177-228).  Returns (new_state, StepOutput)."""

    def run(state):
        # first processed frame anchors the clock (ref msckf.py:188-190)
        imu = state.imu._replace(
            timestamp=jnp.where(state.started, state.imu.timestamp, frame.timestamp)
        )
        state = state._replace(imu=imu, started=jnp.ones((), bool))

        state = propagate_tiered(state, params, frame.imu_t, frame.imu_w,
                                 frame.imu_a, frame.imu_mask)
        state = augment_state(state, frame.timestamp)
        state = add_observations(state, frame.feat_ids, frame.feat_uv,
                                 frame.feat_mask)
        state, warn1, n_overflow, urows = remove_lost_features(state, params, config)
        _, prune_n_two = _prune_trigger_count(state, config)
        state, warn2 = prune_cam_states(state, params, config)

        out = StepOutput(
            timestamp=frame.timestamp,
            q=state.imu.q,
            p=state.imu.p,
            v=state.imu.v,
            active=jnp.ones((), bool),
            warn_large_update=warn1 | warn2,
            did_reset=jnp.zeros((), bool),
            n_cams=state.cams.count,
            n_features=jnp.sum(state.features.valid.astype(jnp.int32)).astype(jnp.int32),
            n_lost_overflow=n_overflow,
            n_update_rows=urows.astype(jnp.int32),
            n_prune_feats=prune_n_two,
            R_imu_cam0=state.imu.R_imu_cam0,
            t_cam0_imu=state.imu.t_cam0_imu,
        )
        # publish happens before the online reset (ref msckf.py:225-228)
        state, did_reset = online_reset(state, params, config)
        return state, out._replace(did_reset=did_reset)

    def skip(state):
        dtype = state.cov.dtype
        out = StepOutput(
            timestamp=frame.timestamp,
            q=jnp.zeros(4, dtype).at[3].set(1.0),
            p=jnp.zeros(3, dtype),
            v=jnp.zeros(3, dtype),
            active=jnp.zeros((), bool),
            warn_large_update=jnp.zeros((), bool),
            did_reset=jnp.zeros((), bool),
            n_cams=state.cams.count,
            n_features=jnp.zeros((), jnp.int32),
            n_lost_overflow=jnp.zeros((), jnp.int32),
            n_update_rows=jnp.zeros((), jnp.int32),
            n_prune_feats=jnp.zeros((), jnp.int32),
            R_imu_cam0=state.imu.R_imu_cam0,
            t_cam0_imu=state.imu.t_cam0_imu,
        )
        return state, out

    return lax.cond(frame.active, run, skip, state)


# ---------------------------------------------------------------------------
# fleet-batched step: size tiers hoisted OUTSIDE vmap
# ---------------------------------------------------------------------------
#
# Under vmap every lax.cond lowers to a select, so BOTH branches execute for
# the whole batch — the round-2 fleet bench measured the backend paying its
# rare full-QR tier (1680x141) every frame because of exactly this
# (PARITY.md r2).  The fleet step below therefore computes batch-level
# scalar predicates (max lost-candidate count, row-count upper bounds, any
# prune trigger) and picks ONE statically-tiered vmapped variant with
# lax.conds that live OUTSIDE the vmap, where they really branch.

SMALL_LOST = 16  # small remove_lost tier (matches remove_lost_features)
SMALL_PRUNE = 32  # small prune tier (matches prune_cam_states)


def _lost_rows_bound(state: FilterState):
    """(sum, max) upper bounds of this frame's lost-feature update rows,
    computed without building any measurement block: each lost candidate
    contributes at most 4*n_obs - 3 rows."""
    table = state.features
    M = table.fid.shape[0]
    cslot = state.cams.count - 1
    seen_now = jnp.take_along_axis(
        table.obs_mask, jnp.full((M, 1), cslot), axis=1)[:, 0]
    obs_count = jnp.sum(table.obs_mask.astype(jnp.int32), axis=1)
    cand = table.valid & ~seen_now & (obs_count >= 3)
    rows = jnp.where(cand, 4 * obs_count - 3, 0)
    return jnp.sum(rows), jnp.max(rows)


def _prune_trigger_count(state: FilterState, config: Config):
    """(trigger, n_two): whether this instance prunes this frame, and how
    many features see both doomed camera states (0 when not triggering)."""
    trigger = state.cams.count >= config.filter.max_cam_state_size

    def count(s):
        table = s.features
        M = table.obs_mask.shape[0]
        rm = _find_redundant(s)
        inv0 = table.obs_mask[jnp.arange(M)[:, None], rm[None, :]]
        k_inv = jnp.sum(inv0.astype(jnp.int32), axis=1) * table.valid.astype(jnp.int32)
        return jnp.sum((table.valid & (k_inv == 2)).astype(jnp.int32)).astype(jnp.int32)

    n_two = lax.cond(trigger, count,
                     lambda s: jnp.zeros((), jnp.int32), state)
    return trigger, n_two


def _prune_one(state: FilterState, params: MsckfParams, config: Config,
               trigger, Kp: int, update_tier: str):
    """Per-instance prune with a static tier; instances whose window is not
    full keep their state (select, not branch — this runs under vmap)."""
    table = state.features
    M = table.obs_mask.shape[0]
    rm = _find_redundant(state)
    inv0 = table.obs_mask[jnp.arange(M)[:, None], rm[None, :]]
    k_inv = jnp.sum(inv0.astype(jnp.int32), axis=1) * table.valid.astype(jnp.int32)
    two = table.valid & (k_inv == 2)
    n_two = jnp.sum(two.astype(jnp.int32))
    pruned, warn = _prune_sized(state, params, config, rm, two, n_two, Kp,
                                update_tier=update_tier)
    keep = jax.tree.map(lambda a, b: jnp.where(trigger, a, b), pruned, state)
    return keep, warn & trigger


def _bucket_sizes(B: int):
    """Static prefix widths for bucketed dispatch: powers of two up to B."""
    s, out = 1, []
    while s < B:
        out.append(s)
        s *= 2
    out.append(B)
    return out


def _bucketed_stage(st, pred, aux, stage, suffix_fn, B: int):
    """Run ``stage`` on ONLY the instances where ``pred`` is true, and the
    cheap ``suffix_fn`` on the rest, with static shapes throughout:

      1. stable-permute the batch so predicated instances form a prefix,
      2. pick the smallest static prefix width S >= popcount(pred) from the
         power-of-two ladder (a chain of lax.conds OUTSIDE any vmap, so
         untaken widths truly do not execute),
      3. stage() the S-prefix, suffix_fn() the (B-S)-suffix, concatenate,
      4. invert the permutation.

    Exact: per-instance stages commute with batch permutation, and
    predicated instances always land inside the prefix.  This is the fix for
    the decorrelated-fleet tier tax (VERDICT r4 #5): with B independent
    streams the UNION of per-instance triggers fires almost every frame, so
    batch-max gating made all B instances pay for stages only 1-2 of them
    needed; here the non-triggering instances pay one gather/scatter
    instead.  NOTE: permuting the batch axis is only communication-free on a
    single device — keep ``bucket=False`` for mesh-sharded fleets (the
    permutation would be an all-to-all over ICI every frame).

    ``stage(st_S, *aux_S) -> (st_S, (outs...))`` with (S,)-leading outs;
    ``suffix_fn(st_R) -> (st_R, (outs...))`` shape-polymorphic in R.
    CONTRACT: suffix_fn must agree with stage on NON-predicated instances
    (a non-predicated instance can land inside the prefix when the ladder
    rounds h up, so either path may process it).
    """
    perm = jnp.argsort(jnp.logical_not(pred), stable=True)
    inv = jnp.argsort(perm)
    h = jnp.sum(pred.astype(jnp.int32))
    stp = jax.tree.map(lambda x: x[perm], st)
    auxp = tuple(a[perm] for a in aux)

    def for_size(S):
        def run(stp):
            pre = jax.tree.map(lambda x: x[:S], stp)
            suf = jax.tree.map(lambda x: x[S:], stp)
            pre2, outs_pre = stage(pre, *(a[:S] for a in auxp))
            suf2, outs_suf = suffix_fn(suf)
            merged = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), pre2, suf2)
            outs = tuple(jnp.concatenate([a, b])
                         for a, b in zip(outs_pre, outs_suf))
            return merged, outs
        return run

    sizes = _bucket_sizes(B)

    def pick(i):
        if sizes[i] == B:
            return for_size(B)
        return lambda s: lax.cond(h <= sizes[i], for_size(sizes[i]),
                                  pick(i + 1), s)

    merged, outs = pick(0)(stp)
    merged = jax.tree.map(lambda x: x[inv], merged)
    return merged, tuple(a[inv] for a in outs)


def backend_step_fleet(bstate: FilterState, bframe: FrameInput,
                       params: MsckfParams, config: Config,
                       bucket: bool = False):
    """Batched ``backend_step`` over a leading instance axis with
    batch-hoisted size tiers.  Semantically identical to
    ``vmap(backend_step)`` (same masked math; tier choices only ever widen),
    but the steady-state cost is the SMALL tier once, not every tier
    summed.

    ``bucket=True`` additionally dispatches the lost-feature and prune
    stages on a permuted static prefix of just the instances that need them
    (see _bucketed_stage) — the decorrelated-fleet fast path.  Single-device
    fleets only; keep False under a mesh."""
    cap = config.capacity
    T1, T2 = update_tiers(cap.state_dim)
    B = int(bframe.timestamp.shape[0])

    def seg1(prop_tier):
        def run(state, frame):
            imu = state.imu._replace(
                timestamp=jnp.where(state.started, state.imu.timestamp,
                                    frame.timestamp)
            )
            state = state._replace(imu=imu, started=jnp.ones((), bool))
            state = propagate_tiered(state, params, frame.imu_t, frame.imu_w,
                                     frame.imu_a, frame.imu_mask,
                                     static_tier=prop_tier)
            state = augment_state(state, frame.timestamp)
            state = add_observations(state, frame.feat_ids, frame.feat_uv,
                                     frame.feat_mask)
            return state
        return run

    # propagation tier hoisted to a batch-level cond (PROP_TIER slice is
    # exact when every instance's valid IMU samples fit — the nominal case)
    prop_small = jnp.max(
        jnp.sum(bframe.imu_mask.astype(jnp.int32), axis=-1)) <= PROP_TIER
    rstate = lax.cond(
        prop_small,
        lambda args: jax.vmap(seg1("small"))(*args),
        lambda args: jax.vmap(seg1("full"))(*args),
        (bstate, bframe))

    # ---- remove_lost: one statically-tiered variant for the whole batch ---
    n_cand = jax.vmap(_count_lost_candidates)(rstate)
    rows_sum, rows_max = jax.vmap(_lost_rows_bound)(rstate)
    cap1500 = jnp.asarray(1500, jnp.int32)

    def lost_stage(st, n_cand_s, rows_sum_s, rows_max_s):
        """Tiered remove_lost (incl. the overflow second pass) over a
        (possibly prefix-sized) batch.  Returns (st, (warn, n_over, rows))."""
        S = n_cand_s.shape[0]
        lean_ok = ((jnp.max(n_cand_s) <= SMALL_LOST)
                   & (jnp.max(rows_max_s) <= GATE_TIER)
                   & (jnp.max(rows_sum_s) <= T1))
        mid_ok = ((jnp.max(n_cand_s) <= SMALL_LOST)
                  & (jnp.max(rows_sum_s) <= T2))

        def rl(L, update_tier, gate_tier):
            def run(st):
                return jax.vmap(
                    lambda s: _remove_lost_once(s, params, config, cap1500, L,
                                                update_tier=update_tier,
                                                gate_tier=gate_tier)
                )(st)
            return run

        def rl_none(st):
            zero = jnp.zeros((S,), jnp.int32)
            return (jax.vmap(_drop_lost_short)(st), jnp.zeros((S,), bool),
                    zero, zero)

        st, warn1, n_over1, rows1 = lax.cond(
            jnp.max(n_cand_s) == 0, rl_none,
            lambda st0: lax.cond(
                lean_ok, rl(SMALL_LOST, "t1", "small"),
                lambda st_: lax.cond(
                    mid_ok, rl(SMALL_LOST, "t2", "full"),
                    rl(cap.max_lost_per_frame, "full", "full"), st_),
                st0),
            st,
        )

        def second(st):
            st2, w2, n2, _ = jax.vmap(
                lambda s, r1: _remove_lost_once(
                    s, params, config, (1500 - r1).astype(jnp.int32),
                    cap.max_lost_per_frame, update_tier="full",
                    gate_tier="full")
            )(st, rows1)
            return st2, w2, n2

        def skip2(st):
            return st, jnp.zeros((S,), bool), jnp.zeros((S,), jnp.int32)

        st, warn2, n_over2 = lax.cond(
            jnp.any(n_over1 > 0), second, skip2, st)
        return st, (warn1 | warn2, n_over2, rows1)

    def lost_suffix(st):
        """Instances with zero >=3-obs candidates only drop short tracks."""
        S = st.cov.shape[0]
        zero = jnp.zeros((S,), jnp.int32)
        return (jax.vmap(_drop_lost_short)(st), (jnp.zeros((S,), bool), zero,
                                                 zero))

    if bucket and B > 1:
        rstate, (warn_lost, n_over2, rows1) = _bucketed_stage(
            rstate, n_cand > 0, (n_cand, rows_sum, rows_max),
            lost_stage, lost_suffix, B)
    else:
        rstate, (warn_lost, n_over2, rows1) = lost_stage(
            rstate, n_cand, rows_sum, rows_max)

    # ---- prune: hoisted trigger + tier ------------------------------------
    trigger, n_two = jax.vmap(
        lambda s: _prune_trigger_count(s, config))(rstate)

    def prune_stage(st, trigger_s, n_two_s):
        S = trigger_s.shape[0]
        prune_small = jnp.max(n_two_s) <= SMALL_PRUNE

        def pr(Kp, update_tier):
            def run(st):
                return jax.vmap(
                    lambda s, t: _prune_one(s, params, config, t, Kp,
                                            update_tier)
                )(st, trigger_s)
            return run

        def skip_pr(st):
            return st, jnp.zeros((S,), bool)

        st, warn = lax.cond(
            jnp.any(trigger_s),
            lambda st_: lax.cond(
                prune_small, pr(SMALL_PRUNE, "t2"),
                pr(min(cap.max_prune_feats, cap.max_map_features), "full"),
                st_),
            skip_pr,
            st,
        )
        return st, (warn,)

    def prune_suffix(st):
        return st, (jnp.zeros((st.cov.shape[0],), bool),)

    if bucket and B > 1:
        rstate, (warn3,) = _bucketed_stage(
            rstate, trigger, (trigger, n_two), prune_stage, prune_suffix, B)
    else:
        rstate, (warn3,) = prune_stage(rstate, trigger, n_two)

    # ---- outputs, online reset, per-instance active select ----------------
    def finish(state, frame, w):
        out = StepOutput(
            timestamp=frame.timestamp,
            q=state.imu.q,
            p=state.imu.p,
            v=state.imu.v,
            active=jnp.ones((), bool),
            warn_large_update=w,
            did_reset=jnp.zeros((), bool),
            n_cams=state.cams.count,
            n_features=jnp.sum(
                state.features.valid.astype(jnp.int32)).astype(jnp.int32),
            n_lost_overflow=jnp.zeros((), jnp.int32),
            n_update_rows=jnp.zeros((), jnp.int32),
            n_prune_feats=jnp.zeros((), jnp.int32),
            R_imu_cam0=state.imu.R_imu_cam0,
            t_cam0_imu=state.imu.t_cam0_imu,
        )
        state, did_reset = online_reset(state, params, config)
        return state, out._replace(did_reset=did_reset)

    rstate, rout = jax.vmap(finish)(rstate, bframe, warn_lost | warn3)
    rout = rout._replace(n_lost_overflow=n_over2,
                         n_update_rows=rows1.astype(jnp.int32),
                         n_prune_feats=n_two.astype(jnp.int32))

    # inactive instances keep their previous state and publish the skip row
    def inactive_out(state, frame):
        dtype = state.cov.dtype
        return StepOutput(
            timestamp=frame.timestamp,
            q=jnp.zeros(4, dtype).at[3].set(1.0),
            p=jnp.zeros(3, dtype),
            v=jnp.zeros(3, dtype),
            active=jnp.zeros((), bool),
            warn_large_update=jnp.zeros((), bool),
            did_reset=jnp.zeros((), bool),
            n_cams=state.cams.count,
            n_features=jnp.zeros((), jnp.int32),
            n_lost_overflow=jnp.zeros((), jnp.int32),
            n_update_rows=jnp.zeros((), jnp.int32),
            n_prune_feats=jnp.zeros((), jnp.int32),
            R_imu_cam0=state.imu.R_imu_cam0,
            t_cam0_imu=state.imu.t_cam0_imu,
        )

    iout = jax.vmap(inactive_out)(bstate, bframe)
    act = bframe.active

    def sel(a, b):
        return jnp.where(jnp.reshape(act, act.shape + (1,) * (a.ndim - 1)), a, b)

    state_out = jax.tree.map(sel, rstate, bstate)
    out = jax.tree.map(sel, rout, iout)
    return state_out, out
