"""Front-end compute ops vs OpenCV oracles (pyramid, FAST, LK, camera model)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from uav_airvision_tpu.ops import camera, fast, lk, pyramid


@pytest.fixture(scope="module")
def textured():
    rng = np.random.default_rng(0)
    H, W = 240, 320
    base = rng.uniform(0, 255, (H // 8, W // 8))
    img = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    return np.clip(img + rng.normal(0, 2, (H, W)), 0, 255).astype(np.uint8)


def test_pyr_down_matches_cv2(textured):
    got = np.asarray(pyramid.pyr_down(jnp.asarray(textured, jnp.float32)))
    want = cv2.pyrDown(textured.astype(np.float32))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_build_pyramid_matches_cv2_uint8(textured):
    """build_pyramid's rounded levels must equal iterated cv2.pyrDown on
    uint8 bit-for-bit (cv2's LK tracks on a uint8 pyramid; pyramid.py rounds
    with the same (k + 128) >> 8 rule).  Integer levels are also what makes
    bfloat16 band storage exact (config.frontend.band_bf16)."""
    import jax

    levels = jax.jit(lambda im: tuple(pyramid.build_pyramid(im, 3)))(
        jnp.asarray(textured))
    want = textured.copy()
    for L in range(4):
        got = np.asarray(levels[L])
        np.testing.assert_array_equal(got, want.astype(np.float32),
                                      err_msg=f"level {L}")
        assert got.min() >= 0 and got.max() <= 255
        want = cv2.pyrDown(want)


def test_fast_matches_cv2(textured):
    det = cv2.FastFeatureDetector_create(15)
    kps = det.detect(textured)
    cvset = {(int(k.pt[0]), int(k.pt[1])): k.response for k in kps}
    keep, score = fast.detect_fast(jnp.asarray(textured), 15)
    keep = np.asarray(keep)
    score = np.asarray(score)
    jset = {(x, y): score[y, x] for y, x in zip(*np.nonzero(keep))}
    common = set(cvset) & set(jset)
    # identical detection sets and identical responses
    assert len(common) >= 0.99 * max(len(cvset), len(jset))
    for p in common:
        assert cvset[p] == jset[p]


def test_lk_matches_cv2(textured):
    H, W = textured.shape
    rng = np.random.default_rng(1)
    dx, dy = 3.3, -2.1
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    img2 = cv2.warpAffine(textured, M, (W, H), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT_101)
    pts = np.concatenate([
        np.array([[60, 60], [150, 100], [200, 180], [100, 200], [250, 50]], np.float32),
        rng.uniform([20, 20], [300, 220], (30, 2)).astype(np.float32),
    ])
    lkp = dict(winSize=(15, 15), maxLevel=3,
               criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
               flags=cv2.OPTFLOW_USE_INITIAL_FLOW)
    nxt_cv, st_cv, _ = cv2.calcOpticalFlowPyrLK(textured, img2, pts, pts.copy(), **lkp)
    pyrA = pyramid.build_pyramid_padded(jnp.asarray(textured), 3)
    pyrB = pyramid.build_pyramid_padded(jnp.asarray(img2), 3)
    nxt_j, st_j = lk.pyramidal_lk(pyrA, pyrB, jnp.asarray(pts), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool))
    nxt_j, st_j = np.asarray(nxt_j), np.asarray(st_j)
    st_cv = st_cv.reshape(-1).astype(bool)
    both = st_cv & st_j
    assert both.sum() >= 0.9 * len(pts)
    d = np.linalg.norm(nxt_cv - nxt_j, axis=1)[both]
    assert d.max() < 0.01, f"LK deviates from cv2 by {d.max():.4f} px"
    # and it actually tracks the truth
    err = np.linalg.norm(nxt_j[both] - (pts[both] + [dx, dy]), axis=1)
    assert err.max() < 0.2


def test_undistort_matches_cv2():
    rng = np.random.default_rng(2)
    intr = (458.654, 457.296, 367.215, 248.375)
    coeffs = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]])
    pp = rng.uniform([50, 50], [700, 430], (50, 2)).astype(np.float32)
    want = cv2.undistortPoints(
        pp.reshape(-1, 1, 2), K, np.array(coeffs), None, np.eye(3), np.eye(3)
    ).reshape(-1, 2)
    got = np.asarray(camera.undistort_points(jnp.asarray(pp), intr, "radtan", coeffs))
    # both run the same 5 fixed-point iterations -> near-identical
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_distort_matches_cv2_projectPoints():
    rng = np.random.default_rng(3)
    intr = (458.654, 457.296, 367.215, 248.375)
    coeffs = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]])
    norm = rng.uniform(-0.5, 0.5, (50, 2)).astype(np.float64)
    want, _ = cv2.projectPoints(
        cv2.convertPointsToHomogeneous(norm), np.zeros(3), np.zeros(3), K,
        np.array(coeffs),
    )
    got = np.asarray(camera.distort_points(jnp.asarray(norm), intr, "radtan", coeffs))
    np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-6)


def test_undistort_distort_roundtrip():
    rng = np.random.default_rng(4)
    intr = (458.654, 457.296, 367.215, 248.375)
    coeffs = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
    pp = rng.uniform([60, 60], [690, 420], (100, 2))
    und = camera.undistort_points(jnp.asarray(pp), intr, "radtan", coeffs)
    back = camera.distort_points(und, intr, "radtan", coeffs)
    # the fixed-point inverse converges slowly at the image corners; we run
    # cv2's exact 5 iterations (parity), which leave ~0.2 px there
    np.testing.assert_allclose(np.asarray(back), pp, atol=0.25)
    # interior points are tight
    inner = (np.abs(pp[:, 0] - 367) < 200) & (np.abs(pp[:, 1] - 248) < 130)
    np.testing.assert_allclose(np.asarray(back)[inner], pp[inner], atol=2e-3)


def test_equidistant_distort_matches_cv2_fisheye():
    """Fisheye forward model vs cv2.fisheye.distortPoints (the reference
    supports 'equidistant' via camera_model.py:24-47's fisheye branch)."""
    rng = np.random.default_rng(5)
    intr = (380.0, 379.5, 365.0, 240.0)
    coeffs = (-0.01, 0.02, -0.005, 0.001)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]])
    norm = rng.uniform(-0.6, 0.6, (80, 2)).astype(np.float64)
    want = cv2.fisheye.distortPoints(
        norm.reshape(-1, 1, 2), K, np.array(coeffs)
    ).reshape(-1, 2)
    got = np.asarray(
        camera.distort_points(jnp.asarray(norm), intr, "equidistant", coeffs)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_equidistant_undistort_matches_cv2_fisheye():
    rng = np.random.default_rng(6)
    intr = (380.0, 379.5, 365.0, 240.0)
    coeffs = (-0.01, 0.02, -0.005, 0.001)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]])
    pp = rng.uniform([80, 80], [650, 400], (80, 2)).astype(np.float64)
    want = cv2.fisheye.undistortPoints(
        pp.reshape(-1, 1, 2), K, np.array(coeffs), None, np.eye(3), np.eye(3)
    ).reshape(-1, 2)
    got = np.asarray(
        camera.undistort_points(jnp.asarray(pp), intr, "equidistant", coeffs,
                                rectification=jnp.eye(3),
                                new_intrinsics=(1.0, 1.0, 0.0, 0.0))
    )
    # rescale: undistort_points returns new_intrinsics=(1,1,0,0) normalized
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_equidistant_roundtrip():
    rng = np.random.default_rng(7)
    intr = (380.0, 379.5, 365.0, 240.0)
    coeffs = (-0.01, 0.02, -0.005, 0.001)
    pp = rng.uniform([80, 80], [650, 400], (80, 2))
    und = camera.undistort_points(jnp.asarray(pp), intr, "equidistant", coeffs)
    back = camera.distort_points(und, intr, "equidistant", coeffs)
    np.testing.assert_allclose(np.asarray(back), pp, atol=1e-3)


def test_banded_extract_exact():
    """ops/extract.py banded windows must reproduce dynamic_slice bit-exactly,
    including corners clamped at the image edges."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from uav_airvision_tpu.ops import extract as ex

    rng = np.random.default_rng(3)
    for (h, w) in [(514, 786), (94, 128)]:
        img = jnp.asarray(rng.normal(0, 1, (h, w)).astype(np.float32))
        b = ex.band_image(img)
        need = ex.BAND_BW - ex.BAND_STRIDE
        oy = jnp.asarray(
            np.concatenate([[0, h - need, h - need - 1], rng.integers(0, h - need, 29)]),
            jnp.int32)
        ox = jnp.asarray(
            np.concatenate([[0, w - need, 1], rng.integers(0, w - need, 29)]),
            jnp.int32)
        wins, ry, rx = jax.jit(lambda o, x: ex.extract(b, o, x, need))(oy, ox)
        got = jax.vmap(lambda W, y, x: lax.dynamic_slice(W, (y, x), (need, need)))(
            wins, ry, rx)
        want = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (need, need)))(
            oy, ox)
        assert bool(jnp.all(got == want))


def test_banded_shift_extract_exact():
    """One-hot permutation matmul shift (ops/lk.py) is bit-exact."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from uav_airvision_tpu.ops.lk import _shift_extract

    rng = np.random.default_rng(4)
    F, n, bw = 37, 18, 64
    w64 = jnp.asarray(rng.normal(0, 1, (F, bw, bw)).astype(np.float32))
    ry = jnp.asarray(rng.integers(0, bw - n, F), jnp.int32)
    rx = jnp.asarray(rng.integers(0, bw - n, F), jnp.int32)
    got = jax.jit(lambda a, b, c: _shift_extract(a, b, c, n))(w64, ry, rx)
    want = jax.vmap(lambda W, y, x: lax.dynamic_slice(W, (y, x), (n, n)))(w64, ry, rx)
    assert bool(jnp.all(got == want))


def test_dense_grid_topk_matches_numpy(textured):
    """The k-argmax-pass per-cell top-k (ops/gridops.py) vs a literal numpy
    sort oracle: descending value, ties toward the lower row-major index
    (what cv2-style per-cell selection over a FAST score map produces)."""
    from uav_airvision_tpu.ops import gridops

    keep, score = fast.detect_fast(jnp.asarray(textured, jnp.float32), 15)
    score = np.asarray(score, np.int64)
    H, W = score.shape
    gr, gc, k = 4, 5, 5
    ys, xs, vals = gridops.dense_grid_topk(jnp.asarray(score, jnp.int32),
                                           gr, gc, k)
    ys, xs, vals = np.asarray(ys), np.asarray(xs), np.asarray(vals)

    ch, cw = int(np.ceil(H / gr)), int(np.ceil(W / gc))
    for r in range(gr):
        for c in range(gc):
            cell = np.full((ch, cw), -1, np.int64)
            sub = score[r * ch:(r + 1) * ch, c * cw:(c + 1) * cw]
            cell[: sub.shape[0], : sub.shape[1]] = sub
            flat = cell.reshape(-1)
            # stable sort on (-value, index): ties -> lower index first
            order = np.lexsort((np.arange(flat.size), -flat))[:k]
            i = r * gc + c
            assert np.array_equal(vals[i], flat[order])
            assert np.array_equal(ys[i], r * ch + order // cw)
            assert np.array_equal(xs[i], c * cw + order % cw)


def test_detection_mask_matches_numpy_dilation():
    """The outer-product MXU mask (models/frontend/pipeline.py) vs a literal
    numpy 7x7 box dilation, including the int(x)<3 / int(y)<3 no-mask quirk
    and invalid-point handling."""
    from uav_airvision_tpu.models.frontend.pipeline import _detection_mask

    rng = np.random.default_rng(3)
    H, W = 120, 160
    pts = rng.uniform([0, 0], [W - 1, H - 1], (40, 2)).astype(np.float32)
    pts[:4] = [[1.2, 50.0], [50.0, 2.9], [0.0, 0.0], [W - 1.01, H - 1.01]]
    valid = rng.uniform(size=40) > 0.25

    got = np.asarray(_detection_mask((H, W), jnp.asarray(pts),
                                     jnp.asarray(valid)))

    exp = np.ones((H, W), bool)
    for (x, y), v in zip(pts, valid):
        ix, iy = int(np.floor(x)), int(np.floor(y))
        if not v or ix < 3 or iy < 3:
            continue
        exp[max(iy - 3, 0): iy + 4, max(ix - 3, 0): ix + 4] = False
    assert np.array_equal(got, exp)


def test_template_rows_carry_equivalence(textured):
    """pyramidal_lk_banded(prev_rows=template_gather_rows(...)) must equal
    the in-place gather from the previous pyramid bit-for-bit (the carried
    rows ARE that gather, done one frame earlier)."""
    import jax
    from uav_airvision_tpu.ops import extract as ex

    H, W = textured.shape
    rng = np.random.default_rng(7)
    M = np.float32([[1, 0, 2.2], [0, 1, -1.7]])
    img2 = cv2.warpAffine(textured, M, (W, H), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT_101)
    pts = jnp.asarray(rng.uniform([20, 20], [300, 220], (40, 2)), jnp.float32)
    valid = jnp.ones(40, bool)
    bpA = ex.band_pyramid(pyramid.build_pyramid_padded(jnp.asarray(textured), 3),
                          dtype=jnp.bfloat16)
    bpB = ex.band_pyramid(pyramid.build_pyramid_padded(jnp.asarray(img2), 3),
                          dtype=jnp.bfloat16)

    ref_pts, ref_st = jax.jit(lambda a, b: lk.pyramidal_lk_banded(
        a, b, pts, pts, valid))(bpA, bpB)
    rows = jax.jit(lambda a: lk.template_gather_rows(a, pts))(bpA)
    got_pts, got_st = jax.jit(lambda b, r: lk.pyramidal_lk_banded(
        b, b, pts, pts, valid, prev_rows=r))(bpB, rows)
    np.testing.assert_array_equal(np.asarray(got_pts), np.asarray(ref_pts))
    np.testing.assert_array_equal(np.asarray(got_st), np.asarray(ref_st))
