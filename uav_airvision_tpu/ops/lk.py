"""Batched pyramidal Lucas-Kanade optical flow, TPU-native.

Replaces the reference's three per-frame ``cv2.calcOpticalFlowPyrLK`` calls
(reference src/image_processing/feature_tracker.py:102-108 and
stereo_matcher.py:64-74) with one vectorized implementation: all features
advance together through the Gauss-Newton iterations of each pyramid level,
with per-feature convergence masks.  Semantics follow OpenCV's LKTrackerInvoker:

* window 15x15, Scharr derivatives (1/32), bilinear patch interpolation,
* the spatial gradient matrix G is computed once per level at the *previous*
  point, only the "J" patch is resampled per iteration,
* termination on |delta|^2 <= eps^2 plus OpenCV's flip-flop damping check,
* status=0 at level 0 when the window corner leaves the image or
  min-eigenvalue(G)/area < minEigThreshold,
* OPTFLOW_USE_INITIAL_FLOW: the caller provides the starting guess.

TPU mapping (the reference's hot loop, redesigned rather than translated):
every image is pre-tiled once per frame into overlapping 64x64 blocks at
16-px stride (ops/extract.py), with ALL pyramid levels' blocks concatenated
in one array — so the whole call's template acquisition (every level, every
feature) is ONE gather of n_levels*F rows, and each level's search windows
are one more F-row gather, instead of F*rows DMA descriptors at the measured
~0.1 us/row gather floor that dominated round 1.  All template processing
(bilinear shift, Scharr gradients, the G matrices) runs level-BATCHED on the
(n_levels*F) axis before the coarse-to-fine loop; the Gauss-Newton
iterations then run entirely on-chip with bilinear patch interpolation as
two small matrix products per feature.  The parallel axis is the feature
batch — fleets of VIO instances vmap over it for near-free.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .extract import BandedPyramid, band_pyramid, block_of, extract_pyr
from .pyramid import LK_PAD

# Search-window margin around the initial guess, in pixels per pyramid level.
# The Gauss-Newton refinement at one level rarely moves a point more than a
# few pixels (coarser levels have already absorbed the large motion); points
# that try to leave the window are frozen at the boundary, which mirrors
# OpenCV's behavior of losing such tracks at level 0 anyway.  Because the
# 48-block snap adds up to one stride of slack, the effective margin is
# 8..23 px depending on the corner's phase (measured at equal ATE vs 16..31
# with 64-blocks, and ~18% faster: iteration matmul traffic scales with
# block area).
LK_MARGIN = 8


_SCHARR_SMOOTH = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)
_SCHARR_DIFF = (-1.0, 0.0, 1.0)

# cv2 zero-pads the derivative planes outside the true image while the image
# itself is REFLECT_101-padded; emulate that by zeroing gradient patch pixels
# whose sample position falls outside the image (border features only).
DERIV_ZERO_OUTSIDE = True


def _shift_extract(w64, ry, rx, n):
    """Per-feature integer shift: w64[f, ry[f]:ry[f]+n, rx[f]:rx[f]+n] as two
    one-hot permutation matmuls.  Bit-exact at HIGHEST precision (verified on
    v5e: 1.0*x plus exact zeros), and ~100x cheaper than the F*n-row gather
    a vmapped dynamic_slice would emit.  bfloat16 inputs (integer-valued
    bands) stay exact: one-hot products are 1.0 * v with v exactly
    representable, accumulated in float32."""
    bw = w64.shape[-1]
    out_dtype = jnp.promote_types(w64.dtype, jnp.float32)
    ar = jnp.arange(n, dtype=jnp.int32)
    ab = jnp.arange(bw, dtype=jnp.int32)
    Pr = (ry[:, None, None] + ar[None, :, None] == ab[None, None, :]).astype(w64.dtype)
    Pc = (rx[:, None, None] + ar[None, :, None] == ab[None, None, :]).astype(w64.dtype)
    t = lax.dot_general(
        Pr, w64, (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST, preferred_element_type=out_dtype,
    )
    return lax.dot_general(
        t.astype(w64.dtype) if w64.dtype != out_dtype else t,
        Pc, (((2,), (2,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST, preferred_element_type=out_dtype,
    )


def _patches_from_raw(raw, corner_xy, hw, win):
    """(I, Ix, Iy) template patches from a pre-gathered (win+3)^2 window.

    4-tap bilinear blend gives a (win+2)^2 shifted window; the Scharr
    derivatives are valid 3x3 convolutions of it (cv2 computes derivatives
    on the full image and samples them bilinearly — convolution and bilinear
    shift are both LTI, so deriving after the shift is identical and avoids
    gathering two extra derivative planes from HBM).  ``hw`` is the (2,)
    padded image shape of this element's level (traced, supports the
    level-batched axis)."""
    cx, cy = corner_xy[0], corner_xy[1]
    ax = (cx - jnp.floor(cx)).astype(raw.dtype)
    ay = (cy - jnp.floor(cy)).astype(raw.dtype)
    n = win + 3
    w00 = (1 - ax) * (1 - ay)
    w01 = ax * (1 - ay)
    w10 = (1 - ax) * ay
    w11 = ax * ay
    T = (
        w00 * raw[: n - 1, : n - 1]
        + w01 * raw[: n - 1, 1:]
        + w10 * raw[1:, : n - 1]
        + w11 * raw[1:, 1:]
    )  # (win+2, win+2) window whose [1:-1, 1:-1] is the image patch

    sm, df = _SCHARR_SMOOTH, _SCHARR_DIFF

    def sep3(ky, kx):
        v = ky[0] * T[:-2, :] + ky[1] * T[1:-1, :] + ky[2] * T[2:, :]
        return kx[0] * v[:, :-2] + kx[1] * v[:, 1:-1] + kx[2] * v[:, 2:]

    patch_i = T[1:-1, 1:-1]
    patch_ix = sep3(sm, df)
    patch_iy = sep3(df, sm)
    if DERIV_ZERO_OUTSIDE:
        HP, WP = hw[0].astype(raw.dtype), hw[1].astype(raw.dtype)
        ys = cy + jnp.arange(win, dtype=raw.dtype)  # patch pixel centers
        xs = cx + jnp.arange(win, dtype=raw.dtype)
        inside = (
            ((ys >= LK_PAD) & (ys <= HP - 1 - LK_PAD))[:, None]
            & ((xs >= LK_PAD) & (xs <= WP - 1 - LK_PAD))[None, :]
        ).astype(raw.dtype)
        patch_ix = patch_ix * inside
        patch_iy = patch_iy * inside
    return patch_i, patch_ix, patch_iy


def _bilinear_axis_weights(frac_pos, n_out, n_in, dtype):
    """(n_out, n_in) separable bilinear sampling matrix W with
    W[i, floor(p)+i] = 1-a, W[i, floor(p)+i+1] = a where p = frac_pos,
    a = p - floor(p).  Sampling a patch row/column becomes a matmul."""
    base = jnp.floor(frac_pos)
    a = (frac_pos - base).astype(dtype)
    tgt = base.astype(jnp.int32) + jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return jnp.where(cols == tgt, 1.0 - a, 0.0) + jnp.where(cols == tgt + 1, a, 0.0)


def _iterate_level(
    tmpl,  # dict of this level's template products, each (F, ...)
    curr_bp: BandedPyramid, level: int,
    next_pts_l, win, max_iter, eps2,
    static_iters: bool = False,
    compact_windows: bool = False,
):
    """Gauss-Newton iterations of one pyramid level for all features.
    Points are in level coordinates.  Returns refined points.

    The while_loop body runs TWO Gauss-Newton steps (each gated on its own
    iteration index, so the math is identical to one-step bodies): the
    per-frame cost here is dispatch-bound, and halving the loop's cond/body
    launches buys measurable wall time at zero numerical change.

    ``static_iters=True`` replaces the while_loop with ``max_iter``
    straight-line gated steps: identical math (every step is masked by the
    same convergence/bounds logic), but no ``any(~conv)`` reduction between
    steps — the while_loop's cond is a cross-feature sync point that blocks
    XLA from pipelining the (tiny) per-step matmuls, and in practice one
    straggler keeps the loop at max trip count anyway."""
    dtype = jnp.promote_types(curr_bp.bands.dtype, jnp.float32)
    half = (win - 1) * 0.5
    HP, WP = curr_bp.levels[level][:2]
    H = HP - 2 * LK_PAD
    W = WP - 2 * LK_PAD
    BW = curr_bp.bw
    need = win + 1 + 2 * LK_MARGIN  # guaranteed-covered search span

    patch_I = tmpl["I"]
    patch_ix = tmpl["ix"]
    patch_iy = tmpl["iy"]
    a11, a12, a22 = tmpl["a11"], tmpl["a12"], tmpl["a22"]
    inv_det = tmpl["inv_det"]
    good = tmpl["good"]
    # both gradient planes as one tensor: the loop body computes b1/b2 with
    # a single contraction instead of two reductions
    grad = jnp.stack([patch_ix, patch_iy], axis=1)  # (F, 2, win, win)
    # loop-invariant template part of b: b = <grad, J> - <grad, I>
    b_tmpl = jnp.einsum("fij,fcij->fc", patch_I, grad)

    # One search window per feature, one F-row gather from the pre-banded
    # image; the iteration loop below never touches HBM again.
    corner0 = next_pts_l - half + LK_PAD  # (F,2) initial window corner
    des_y = jnp.clip(
        jnp.floor(corner0[:, 1]).astype(jnp.int32) - LK_MARGIN, 0, HP - need
    )
    des_x = jnp.clip(
        jnp.floor(corner0[:, 0]).astype(jnp.int32) - LK_MARGIN, 0, WP - need
    )
    windows, ry, rx = extract_pyr(curr_bp, level, des_y, des_x, need)
    oy = des_y - ry  # block origin (absolute padded coords)
    ox = des_x - rx

    if compact_windows:
        # Shift-extract the exact ``need``-sized search span out of the
        # 48-block once (two one-hot matmuls, exact), shrinking every
        # Gauss-Newton iteration's sampling matmuls 48 -> 32 per side.
        # Default OFF: measured slower on v5e (lane tiling pads the minor
        # dim to 128 either way, so the per-step saving is illusory while
        # the shift matmuls are real), and the freeze margin narrows to a
        # uniform LK_MARGIN (see config.frontend.lk_compact_windows).
        w = _shift_extract(windows, ry, rx, need)  # (F, need, need) f32 exact
        windows = w.astype(curr_bp.bands.dtype)  # integer-valued: cast exact
        oy, ox = des_y, des_x
        BW = need

    max_t = BW - (win + 1)
    # Per-feature sample-corner bounds: block rows/cols past the padded image
    # edge hold zero padding (extract.py pads to the block grid), so clamp to
    # the guaranteed-in-image span instead of the full block (keeps the
    # block-snap slack everywhere except the true image edge).
    uby = jnp.minimum(max_t, HP - (win + 1) - oy).astype(dtype)  # (F,)
    ubx = jnp.minimum(max_t, WP - (win + 1) - ox).astype(dtype)
    ub = jnp.concatenate([uby, ubx])  # (2F,) rows first, then cols

    def sample_J(pts):
        """Bilinear 15x15 patches at fractional corners via two batched
        matmuls per feature: J = Wr @ window @ Wc^T (separable bilinear).
        Row and column weight matrices come from ONE fused construction
        over the stacked (2F,) position vector."""
        corner = pts - half + LK_PAD
        pyx = jnp.clip(
            jnp.stack([corner[:, 1] - oy.astype(dtype),
                       corner[:, 0] - ox.astype(dtype)]).reshape(-1),
            0.0, ub,
        )  # (2F,) rows first, then cols
        Wrc = jax.vmap(lambda p: _bilinear_axis_weights(p, win, BW, dtype))(pyx)
        Wr = Wrc[: pts.shape[0]]
        Wc = Wrc[pts.shape[0]:]
        # bands may be stored bfloat16 (exact integers); lift to the compute
        # dtype at the point of use so the convert fuses into the sampling
        # matmul and the HBM read stays narrow
        T1 = jax.lax.dot_general(
            Wr, windows.astype(dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype,
        )  # (F, win, BW)
        J = jax.lax.dot_general(
            T1, Wc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=dtype,
        )  # (F, win, win)
        return J

    def gn_step(pts, prev_delta, conv, it):
        """One OpenCV-semantics Gauss-Newton step, gated on ``it < max_iter``
        (the caller may run it past the loop cond's granularity)."""
        J = sample_J(pts)
        b = jnp.einsum("fij,fcij->fc", J, grad) - b_tmpl
        b1, b2 = b[:, 0], b[:, 1]
        # OpenCV: delta = [(A12 b2 - A22 b1), (A12 b1 - A11 b2)] / det
        dx = (a12 * b2 - a22 * b1) * inv_det
        dy = (a12 * b1 - a11 * b2) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)

        # next-point in-bounds check (status drop at level 0)
        new_pts = pts + delta
        inb = (
            (jnp.floor(new_pts[:, 0] - half) >= -win)
            & (jnp.floor(new_pts[:, 0] - half) < W)
            & (jnp.floor(new_pts[:, 1] - half) >= -win)
            & (jnp.floor(new_pts[:, 1] - half) < H)
        )
        # freeze points whose sample corner would leave the search window
        new_corner = new_pts - half + LK_PAD
        in_win = (
            (new_corner[:, 0] - ox >= 0.0)
            & (new_corner[:, 0] - ox <= ubx)
            & (new_corner[:, 1] - oy >= 0.0)
            & (new_corner[:, 1] - oy <= uby)
        )

        step_mask = (~conv) & good & in_win & (it < max_iter)
        pts = jnp.where(step_mask[:, None], new_pts, pts)

        d2 = jnp.sum(delta * delta, axis=-1)
        small = d2 <= eps2
        flip = (
            (it > 0)
            & (jnp.abs(delta[:, 0] + prev_delta[:, 0]) < 0.01)
            & (jnp.abs(delta[:, 1] + prev_delta[:, 1]) < 0.01)
        )
        pts = jnp.where((step_mask & flip)[:, None], pts - delta * 0.5, pts)
        conv = conv | small | flip | ~good | ~inb | ~in_win
        return pts, delta, conv

    def cond(carry):
        pts, prev_delta, conv, it = carry
        return (it < max_iter) & jnp.any(~conv)

    def body(carry):
        pts, prev_delta, conv, it = carry
        pts, prev_delta, conv = gn_step(pts, prev_delta, conv, it)
        pts, prev_delta, conv = gn_step(pts, prev_delta, conv, it + 1)
        return (pts, prev_delta, conv, it + 2)

    conv0 = ~good
    if static_iters:
        pts, prev_delta, conv = next_pts_l, jnp.zeros_like(next_pts_l), conv0
        for i in range(max_iter):
            pts, prev_delta, conv = gn_step(pts, prev_delta, conv, i)
        return pts
    init = (
        next_pts_l,
        jnp.zeros_like(next_pts_l),
        conv0,
        jnp.zeros((), jnp.int32),
    )
    pts, _, _, _ = lax.while_loop(cond, body, init)
    return pts


def template_gather_rows(bp: BandedPyramid, pts, win: int = 15,
                         n_levels: int | None = None):
    """ONE gather of the n_levels*F block rows covering each point's
    (win+3)^2 template window — the deterministic gather prefix of
    ``pyramidal_lk_banded``'s template prep (same corner math).

    The frontend runs this on frame t's cam0 pyramid for the positions that
    survive frame t and carries the (n_levels*F, bw*bw) result across the
    scan instead of the whole banded pyramid (models/frontend/pipeline.py):
    the temporal LK of frame t+1 then passes it as ``prev_rows``, the gather
    cost moves (not grows), and the scan carry shrinks ~5x."""
    if n_levels is None:
        n_levels = bp.n_levels
    n = win + 3
    half = (win - 1) * 0.5
    idxs = []
    for L in range(n_levels):
        c = pts * (1.0 / (1 << L)) - half + LK_PAD
        fy = jnp.floor(c[:, 1]).astype(jnp.int32) - 1
        fx = jnp.floor(c[:, 0]).astype(jnp.int32) - 1
        idx, _, _ = block_of(bp, L, fy, fx, n)
        idxs.append(idx)
    return bp.bands[jnp.concatenate(idxs)]


def pyramidal_lk_banded(
    prev_bp: BandedPyramid,
    curr_bp: BandedPyramid,
    prev_pts: jnp.ndarray,  # (F,2) full-res pixel coords
    init_next_pts: jnp.ndarray,  # (F,2) initial guess (USE_INITIAL_FLOW)
    valid: jnp.ndarray,  # (F,) bool
    win: int = 15,
    max_iter: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    n_levels: int | None = None,
    static_iters: bool = False,
    max_iter_upper: int | None = None,
    compact_windows: bool = False,
    prev_rows: jnp.ndarray | None = None,
):
    """Track prev_pts into the current (banded) pyramid.
    Returns (next_pts, status).

    ``static_iters`` unrolls each level's Gauss-Newton loop into straight
    line gated steps (see ``_iterate_level``).  ``max_iter_upper`` caps the
    iterations of levels > 0 separately (upper levels only place the level-0
    start within its convergence basin; they don't need level-0 precision).
    ``compact_windows`` shift-extracts each level's exact search span before
    iterating (see ``_iterate_level``).  ``prev_rows`` supplies the template
    block rows pre-gathered by ``template_gather_rows`` on an earlier frame
    (byte-identical to gathering from ``prev_bp`` here); ``prev_bp`` is then
    only read for its static level metadata, so callers may pass the current
    pyramid in its place.
    """
    eps2 = eps * eps
    if n_levels is None:
        n_levels = min(prev_bp.n_levels, curr_bp.n_levels)
    F = prev_pts.shape[0]
    n = win + 3
    half = (win - 1) * 0.5
    dtype = jnp.promote_types(prev_bp.bands.dtype, jnp.float32)

    # ---- template prep: ONE gather + level-batched processing -------------
    corners, idxs, rys, rxs, hws = [], [], [], [], []
    for L in range(n_levels):
        c = prev_pts * (1.0 / (1 << L)) - half + LK_PAD
        corners.append(c)
        fy = jnp.floor(c[:, 1]).astype(jnp.int32) - 1
        fx = jnp.floor(c[:, 0]).astype(jnp.int32) - 1
        idx, ry, rx = block_of(prev_bp, L, fy, fx, n)
        idxs.append(idx)
        rys.append(ry)
        rxs.append(rx)
        hws.append(prev_bp.levels[L][:2])
    c_cat = jnp.concatenate(corners)  # (LF, 2)
    if prev_rows is not None:
        rows = prev_rows  # pre-gathered on the source frame, same order
    else:
        rows = prev_bp.bands[jnp.concatenate(idxs)]  # ONE gather, L*F rows
    raw = _shift_extract(
        rows.reshape(-1, prev_bp.bw, prev_bp.bw),
        jnp.concatenate(rys), jnp.concatenate(rxs), n,
    )  # (LF, n, n), exact
    hw_cat = jnp.repeat(jnp.asarray(hws, jnp.int32), F, axis=0)  # (LF, 2)
    patch_I, patch_ix, patch_iy = jax.vmap(
        lambda r, c, hw: _patches_from_raw(r, c, hw, win)
    )(raw, c_cat, hw_cat)

    a11 = jnp.sum(patch_ix * patch_ix, axis=(1, 2))
    a12 = jnp.sum(patch_ix * patch_iy, axis=(1, 2))
    a22 = jnp.sum(patch_iy * patch_iy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)
    min_eig = (a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
        2.0 * win * win
    )

    # OpenCV's out-of-window check on the integer corner of the prev point.
    ipx = jnp.floor(c_cat[:, 0]) - LK_PAD
    ipy = jnp.floor(c_cat[:, 1]) - LK_PAD
    Wl = (hw_cat[:, 1] - 2 * LK_PAD).astype(c_cat.dtype)
    Hl = (hw_cat[:, 0] - 2 * LK_PAD).astype(c_cat.dtype)
    in_prev = (ipx >= -win) & (ipx < Wl) & (ipy >= -win) & (ipy < Hl)

    valid_cat = jnp.tile(valid, n_levels)
    good = valid_cat & in_prev & (det > 1e-12)

    tmpl_all = dict(
        I=patch_I, ix=patch_ix, iy=patch_iy,
        a11=a11, a12=a12, a22=a22, inv_det=inv_det, good=good,
    )

    # level-0 status gate (OpenCV drops these tracks at level 0 only)
    status = (
        valid & in_prev[:F] & (min_eig[:F] >= min_eig_threshold)
        & (det[:F] > 1e-12)
    )

    # ---- coarse-to-fine refinement ---------------------------------------
    next_pts = init_next_pts
    for L in reversed(range(n_levels)):
        sl = slice(L * F, (L + 1) * F)
        tmpl = {k: v[sl] for k, v in tmpl_all.items()}
        it_l = max_iter if (L == 0 or max_iter_upper is None) else max_iter_upper
        pts_l = _iterate_level(
            tmpl, curr_bp, L, next_pts * (1.0 / (1 << L)), win, it_l, eps2,
            static_iters=static_iters, compact_windows=compact_windows,
        )
        next_pts = pts_l * (1 << L)

    # final in-bounds gate mirrors OpenCV's per-iteration status drop
    H0 = prev_bp.levels[0][0] - 2 * LK_PAD
    W0 = prev_bp.levels[0][1] - 2 * LK_PAD
    inb = (
        (jnp.floor(next_pts[:, 0] - half) >= -win)
        & (jnp.floor(next_pts[:, 0] - half) < W0)
        & (jnp.floor(next_pts[:, 1] - half) >= -win)
        & (jnp.floor(next_pts[:, 1] - half) < H0)
    )
    return next_pts, status & inb


def pyramidal_lk(
    prev_levels: Sequence[jnp.ndarray],  # padded images, level 0 first
    curr_levels: Sequence[jnp.ndarray],
    prev_pts: jnp.ndarray,
    init_next_pts: jnp.ndarray,
    valid: jnp.ndarray,
    win: int = 15,
    max_iter: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
):
    """Raw-pyramid convenience wrapper: bands both pyramids, then tracks.
    Callers that reuse images across LK passes should band once and call
    ``pyramidal_lk_banded`` (models/frontend/pipeline.py does).  Bands at
    bfloat16 like the production pipeline (exact: integer pyramid levels)."""
    return pyramidal_lk_banded(
        band_pyramid(prev_levels, dtype=jnp.bfloat16),
        band_pyramid(curr_levels, dtype=jnp.bfloat16),
        prev_pts, init_next_pts, valid,
        win, max_iter, eps, min_eig_threshold,
    )
