#!/usr/bin/env python
"""Cumulative in-context frontend decomposition: rebuild track_frame stage by
stage inside ONE scanned body, adding one stage per row, so each row's delta
is that stage's real marginal cost (including layout/fusion interactions the
isolated-stage anatomy misses).  Rows:

  1. pyramid+band both cams
  2. + temporal LK (configured)
  3. + detection mask + candidates
  4. + NN disparity seed + seeded stereo (204 pts)
  5. + grid combine/prune bookkeeping (rank_in_cell/kept_order_stats/compact)
  6. + normalize+publish
  (vs. the real frontend_step full)

Usage: python scripts/exp_fe_cumulative.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def scan_time(make_body, init_carry, reps, label, prev_ms=None):
    def scanned(carry):
        def body(c, _):
            return make_body(c), None
        out, _ = lax.scan(body, carry, None, length=reps)
        return out

    f = jax.jit(scanned)
    out = jax.block_until_ready(f(init_carry))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(init_carry))
    ms = (time.perf_counter() - t0) / reps * 1000
    delta = "" if prev_ms is None else f"   (+{ms - prev_ms:6.3f})"
    print(f"{label:46s} {ms:8.3f} ms/iter{delta}", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 300

    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    from uav_airvision_tpu.models.frontend.pipeline import (
        frontend_step, init_frontend_state, _detection_mask,
        _detection_candidates, _normalize_publish)
    from uav_airvision_tpu.models.frontend.stereo import stereo_match
    from uav_airvision_tpu.ops import extract as ex
    from uav_airvision_tpu.ops import gridops, lk, pyramid

    cfg = euroc_config()
    fe = cfg.frontend
    fparams = make_frontend_params(cfg)
    cap = cfg.capacity
    rng = np.random.default_rng(0)
    H, W = 480, 752
    F = cap.max_features
    C = fe.grid_num * fe.grid_max_feature_num
    n_cells = fe.grid_num
    img0 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8), jnp.float32)
    img1 = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8), jnp.float32)
    print(f"device: {jax.devices()[0]}   reps={reps}   F={F} C={C}", flush=True)

    pyrP = jax.jit(lambda im: ex.band_pyramid(
        pyramid.build_pyramid_padded(im, fe.pyramid_levels)))(img0)
    pyrP = jax.block_until_ready(pyrP)

    pts0 = jnp.asarray(rng.uniform([20, 20], [730, 460], (F, 2)), jnp.float32)
    state0 = dict(
        pts=pts0, cam1=pts0 + 3.0, ids=jnp.arange(F, dtype=jnp.int32),
        life=jnp.ones((F,), jnp.int32), valid=jnp.ones((F,), bool),
        img=img0,
    )

    def keep_alive(c, *arrs):
        acc = jnp.zeros((), jnp.float32)
        for a in arrs:
            acc = acc + jnp.sum(a.reshape(-1)[::499].astype(jnp.float32)) * 1e-12
        c = dict(c)
        c["pts"] = jnp.clip(c["pts"] + acc, 20.0, 460.0)
        return c

    # stage closures --------------------------------------------------------
    def do_pyr(c):
        im = c["img"] + c["pts"][0, 0] * 1e-9
        p0 = ex.band_pyramid(pyramid.build_pyramid_padded(im, fe.pyramid_levels))
        p1 = ex.band_pyramid(pyramid.build_pyramid_padded(im + 1.0, fe.pyramid_levels))
        return p0, p1

    def do_lk(c, p0, p1):
        curr, st = lk.pyramidal_lk_banded(
            pyrP, p0, c["pts"], c["pts"], c["valid"],
            win=fe.patch_size, max_iter=fe.lk_max_iteration,
            eps=fe.lk_track_precision, min_eig_threshold=fe.lk_min_eig_threshold,
            static_iters=fe.lk_static_iters,
            max_iter_upper=fe.lk_max_iteration_upper or None)
        st = st & (curr[:, 0] >= 0) & (curr[:, 0] <= W - 1) \
                & (curr[:, 1] >= 0) & (curr[:, 1] <= H - 1)
        return jnp.clip(curr, 20.0, 460.0), st

    def do_detect(c, curr, st):
        det_mask = _detection_mask((H, W), curr, st)
        apts, ascore, aarr, avalid = _detection_candidates(
            c["img"] + curr[0, 0] * 1e-9, det_mask, cfg, fe.grid_max_feature_num)
        return apts, ascore, aarr, avalid

    def do_stereo(c, p0, p1, curr, st, apts, avalid):
        d_prev = c["cam1"] - c["pts"]
        trk_ok = st & c["valid"]
        n_seed = jnp.sum(trk_ok.astype(jnp.int32))
        dist2 = jnp.sum((apts[:, None, :] - curr[None, :, :]) ** 2, axis=-1)
        dist2 = jnp.where(trk_ok[None, :], dist2, jnp.inf)
        nn = jnp.argmin(dist2, axis=1)
        both_pts = jnp.concatenate([curr, apts])
        both_valid = jnp.concatenate([st, avalid])
        seed = jnp.concatenate([curr + d_prev, apts + d_prev[nn]])
        seed_ok = jnp.concatenate(
            [trk_ok, jnp.broadcast_to(n_seed > 0, (apts.shape[0],))])
        both_cam1, both_inl = stereo_match(
            p0, p1, both_pts, both_valid, fparams, cfg,
            init_cam1=seed, init_ok=seed_ok,
            n_fwd_levels=fe.stereo_seeded_levels)
        return both_cam1, both_inl

    def do_grid(c, curr, st, apts, ascore, aarr, avalid, both_cam1, both_inl):
        cam1_curr, match = both_cam1[:F], both_inl[:F]
        acam1, ainlier = both_cam1[F:], both_inl[F:] & avalid
        tracked = st & match
        tr_cell = gridops.cell_of_points(curr, fe.grid_row, fe.grid_col, H, W)
        tr_life = c["life"] + 1
        acell = gridops.cell_of_points(apts, fe.grid_row, fe.grid_col, H, W)
        arank, aperm = gridops.rank_in_cell(acell, ascore.astype(jnp.float32),
                                            aarr, ainlier, n_cells)
        akeep = ainlier & (arank < fe.grid_min_feature_num)
        a_grank, a_crank, a_kept = gridops.kept_order_stats(
            aperm, akeep, acell, ainlier, n_cells)
        aids = jnp.where(akeep, 1000 + a_grank, -1)
        all_cell = jnp.concatenate([tr_cell, acell])
        all_life = jnp.concatenate([tr_life, jnp.ones((C,), jnp.int32)])
        all_valid = jnp.concatenate([tracked, akeep])
        all_ids = jnp.concatenate([c["ids"], aids])
        all_cam0 = jnp.concatenate([curr, apts])
        all_cam1 = jnp.concatenate([cam1_curr, acam1])
        arrival = jnp.concatenate(
            [jnp.arange(F, dtype=jnp.int32), F + a_crank.astype(jnp.int32)])
        onehot = (all_cell[:, None] == jnp.arange(n_cells)[None, :]) & all_valid[:, None]
        cell_count = jnp.sum(onehot.astype(jnp.int32), axis=0)
        overflow = cell_count > fe.grid_max_feature_num
        of_this = jnp.where(all_valid, overflow[jnp.clip(all_cell, 0, n_cells - 1)], False)
        sort_life = jnp.where(of_this, all_life, 0)
        prank, pperm = gridops.rank_in_cell(
            all_cell, sort_life.astype(jnp.float32), arrival, all_valid, n_cells)
        keep = all_valid & (prank < fe.grid_max_feature_num)
        sel, selm = gridops.compact_kept(pperm, keep, F)
        return (jnp.where(selm, all_ids[sel], -1),
                jnp.where(selm, all_life[sel], 0),
                jnp.where(selm[:, None], all_cam0[sel], 0.0),
                jnp.where(selm[:, None], all_cam1[sel], 0.0),
                selm)

    # cumulative rows -------------------------------------------------------
    def b1(c):
        p0, p1 = do_pyr(c)
        return keep_alive(c, p0.bands, p1.bands)

    ms = scan_time(b1, state0, reps, "1 pyramid+band (2 cams)")

    def b2(c):
        p0, p1 = do_pyr(c)
        curr, st = do_lk(c, p0, p1)
        c = keep_alive(c, st)
        c["pts"] = curr
        return c

    ms = scan_time(b2, state0, reps, "2 + temporal LK", ms)

    def b3(c):
        p0, p1 = do_pyr(c)
        curr, st = do_lk(c, p0, p1)
        apts, ascore, aarr, avalid = do_detect(c, curr, st)
        c = keep_alive(c, st, apts, ascore, avalid)
        c["pts"] = curr
        return c

    ms = scan_time(b3, state0, reps, "3 + detection mask+candidates", ms)

    def b4(c):
        p0, p1 = do_pyr(c)
        curr, st = do_lk(c, p0, p1)
        apts, ascore, aarr, avalid = do_detect(c, curr, st)
        both_cam1, both_inl = do_stereo(c, p0, p1, curr, st, apts, avalid)
        c = keep_alive(c, st, apts, both_cam1, both_inl)
        c["pts"] = curr
        c["cam1"] = jnp.clip(both_cam1[:F], 20.0, 460.0)
        return c

    ms = scan_time(b4, state0, reps, "4 + NN seed + seeded stereo", ms)

    def b5(c):
        p0, p1 = do_pyr(c)
        curr, st = do_lk(c, p0, p1)
        apts, ascore, aarr, avalid = do_detect(c, curr, st)
        both_cam1, both_inl = do_stereo(c, p0, p1, curr, st, apts, avalid)
        ids, life, cam0n, cam1n, selm = do_grid(
            c, curr, st, apts, ascore, aarr, avalid, both_cam1, both_inl)
        c = keep_alive(c, ids, life, selm)
        c["pts"] = jnp.clip(jnp.where(selm[:, None], cam0n, pts0), 20.0, 460.0)
        c["cam1"] = jnp.clip(jnp.where(selm[:, None], cam1n, pts0 + 3.0), 20.0, 460.0)
        c["ids"] = ids
        c["life"] = life
        return c

    ms = scan_time(b5, state0, reps, "5 + grid combine/prune bookkeeping", ms)

    def b6(c):
        p0, p1 = do_pyr(c)
        curr, st = do_lk(c, p0, p1)
        apts, ascore, aarr, avalid = do_detect(c, curr, st)
        both_cam1, both_inl = do_stereo(c, p0, p1, curr, st, apts, avalid)
        ids, life, cam0n, cam1n, selm = do_grid(
            c, curr, st, apts, ascore, aarr, avalid, both_cam1, both_inl)
        pids, uv, m = _normalize_publish(ids, life, cam0n, cam1n, selm,
                                         fparams, cfg)
        c = keep_alive(c, pids, uv, m)
        c["pts"] = jnp.clip(jnp.where(selm[:, None], cam0n, pts0), 20.0, 460.0)
        c["cam1"] = jnp.clip(jnp.where(selm[:, None], cam1n, pts0 + 3.0), 20.0, 460.0)
        c["ids"] = ids
        c["life"] = life
        return c

    ms = scan_time(b6, state0, reps, "6 + normalize+publish", ms)

    # reference: the real frontend_step
    fe0 = init_frontend_state(cfg)
    img0u = img0.astype(jnp.uint8)
    img1u = img1.astype(jnp.uint8)
    fe1 = jax.block_until_ready(jax.jit(
        lambda st: frontend_step(st, img0u, img1u, jnp.zeros(3),
                                 jnp.asarray(0.05), fparams, cfg)[0])(fe0))

    def b7(c):
        c2, _ = frontend_step(c, img0u, img1u, jnp.zeros(3), jnp.asarray(0.05),
                              fparams, cfg)
        return c2

    scan_time(b7, fe1, reps, "frontend_step (real, full)", ms)
