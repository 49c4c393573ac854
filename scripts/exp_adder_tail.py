#!/usr/bin/env python
"""Measure the un-profiled frontend glue: per-sort latency, and the whole
adder/pruner/compact tail of track_frame (everything after stereo) in
isolation, scan-amortized.  Usage: python scripts/exp_adder_tail.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def scan_time(make_body, init_carry, reps, label):
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
    print(f"{label:44s} {ms:8.4f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}   reps={reps}", flush=True)

    # ---- per-lexsort marginal cost at the real sizes -----------------------
    N = 304
    cell0 = jnp.asarray(rng.integers(0, 21, N), jnp.int32)
    score0 = jnp.asarray(rng.integers(0, 1000, N), jnp.float32)
    arr0 = jnp.asarray(rng.integers(0, 360000, N), jnp.int32)

    def lexsort_chain(K):
        def body(c):
            cell, score, arr = c
            for _ in range(K):
                perm = jnp.lexsort((arr, -score, cell))
                cell = cell[perm]
                score = score[perm] * 1.0001
                arr = (arr + 1) % 360000
            return (cell, score, arr)
        return body

    base = scan_time(lexsort_chain(1), (cell0, score0, arr0), reps,
                     "3-key lexsort(304) chain K=1")
    k6 = scan_time(lexsort_chain(6), (cell0, score0, arr0), reps,
                   "3-key lexsort(304) chain K=6")
    print(f"  -> per lexsort ~ {(k6 - base) / 5 * 1000:.1f} us", flush=True)

    # ---- the real adder/pruner/compact tail --------------------------------
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.models.frontend import pipeline as pl
    from uav_airvision_tpu.ops import gridops

    cfg = euroc_config()
    fe = cfg.frontend
    cap = cfg.capacity
    F = cap.max_features
    C = fe.grid_num * fe.grid_max_feature_num
    H, W = 480, 752
    n_cells = fe.grid_num

    st0 = pl.init_frontend_state(cfg)
    curr0 = jnp.asarray(rng.uniform([0, 0], [W - 1, H - 1], (F, 2)), jnp.float32)
    apts0 = jnp.asarray(rng.uniform([0, 0], [W - 1, H - 1], (C, 2)), jnp.float32)

    def tail_body(c):
        st, curr, apts = c
        stt = jnp.ones((F,), bool)
        match = jnp.ones((F,), bool)
        cam1_curr = curr + 3.0
        ascore = jnp.sum(apts, axis=1)
        aarrival = (apts[:, 1] * W + apts[:, 0]).astype(jnp.int32)
        ainlier = jnp.ones((C,), bool)
        acam1 = apts + 3.0

        tracked = stt & match
        tr_cell = gridops.cell_of_points(curr, fe.grid_row, fe.grid_col, H, W)
        tr_life = st.lifetime + 1
        acell = gridops.cell_of_points(apts, fe.grid_row, fe.grid_col, H, W)
        arank, _ = gridops.rank_in_cell(acell, ascore, aarrival, ainlier, n_cells)
        akeep = ainlier & (arank < fe.grid_min_feature_num)
        aids, a_kept = pl._assign_ids_cell_major(
            acell, ascore, aarrival, akeep, st.next_id, n_cells)

        all_cell = jnp.concatenate([tr_cell, acell])
        all_life = jnp.concatenate([tr_life, jnp.ones((C,), jnp.int32)])
        all_valid = jnp.concatenate([tracked, akeep])
        all_ids = jnp.concatenate([st.ids, aids])
        all_cam0 = jnp.concatenate([curr, apts])
        all_cam1 = jnp.concatenate([cam1_curr, acam1])
        new_arrival, _ = gridops.rank_in_cell(acell, ascore, aarrival, akeep, n_cells)
        arrival = jnp.concatenate(
            [jnp.arange(F, dtype=jnp.int32), F + new_arrival.astype(jnp.int32)])

        onehot = (all_cell[:, None] == jnp.arange(n_cells)[None, :]) & all_valid[:, None]
        cell_count = jnp.sum(onehot.astype(jnp.int32), axis=0)
        overflow = cell_count > fe.grid_max_feature_num
        of_this = jnp.where(all_valid, overflow[jnp.clip(all_cell, 0, n_cells - 1)], False)
        sort_life = jnp.where(of_this, all_life, 0)
        prank, _ = gridops.rank_in_cell(
            all_cell, sort_life.astype(jnp.float32), arrival, all_valid, n_cells)
        keep = all_valid & (prank < fe.grid_max_feature_num)

        big_cell = jnp.where(keep, all_cell, n_cells)
        pkey = jnp.lexsort((arrival, -sort_life, big_cell))
        sel = pkey[:F]
        selm = keep[sel]
        st2 = st._replace(
            ids=jnp.where(selm, all_ids[sel], -1),
            lifetime=jnp.where(selm, all_life[sel], 0),
            cam0=jnp.where(selm[:, None], all_cam0[sel], 0.0),
            cam1=jnp.where(selm[:, None], all_cam1[sel], 0.0),
            valid=selm,
            next_id=(st.next_id + a_kept).astype(jnp.int32),
        )
        return (st2, st2.cam0 + 0.001, apts + 0.001)

    scan_time(tail_body, (st0, curr0, apts0), reps, "adder/pruner/compact tail (real)")

    # ---- counters + homography warp + rodrigues (remaining glue) ----------
    from uav_airvision_tpu.ops import camera
    from uav_airvision_tpu.models.frontend.params import make_frontend_params
    fparams = make_frontend_params(cfg)

    def warp_body(c):
        R, _ = pl.predicted_rotations(jnp.asarray([0.01, 0.02, 0.03]) + c[0, 0] * 1e-9,
                                      jnp.asarray(0.05), fparams)
        pred = camera.homography_warp_points(c, R, fparams.cam0_intrinsics)
        return jnp.clip(pred, 0.0, 751.0)

    scan_time(warp_body, curr0, reps, "predicted_rotations + homography warp")
