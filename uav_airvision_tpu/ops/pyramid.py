"""Image pyramid construction, TPU-native.

The reference stubs this out and lets OpenCV's LK build pyramids internally
(reference src/image_processing/pyramid_builder.py:22-48).  Here we build the
real thing: OpenCV-compatible ``pyrDown`` levels (5-tap Gaussian
[1 4 6 4 1]/16, separable, REFLECT_101 borders, 2x decimation) plus the
Scharr derivative images LK needs, all as XLA convolutions that fuse well on
the TPU VPU.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_GAUSS5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _reflect101_pad(img, py, px):
    return jnp.pad(img, ((py, py), (px, px)), mode="reflect")


def _sep_filter(img, kx, ky):
    """Separable 2D filter with REFLECT_101 borders; img (H, W) float."""
    ry = len(ky) // 2
    rx = len(kx) // 2
    p = _reflect101_pad(img, ry, rx)
    # vertical
    acc = jnp.zeros_like(p[ry:-ry or None, :])
    H = img.shape[0]
    for i, k in enumerate(ky):
        acc = acc + k * lax.dynamic_slice_in_dim(p, i, H, axis=0)
    # horizontal
    W = img.shape[1]
    out = jnp.zeros_like(img)
    for i, k in enumerate(kx):
        out = out + k * lax.dynamic_slice_in_dim(acc, i, W, axis=1)
    return out


import numpy as np
from functools import lru_cache


@lru_cache(maxsize=None)
def _decimation_matrix(n: int):
    """(ceil(n/2), n) matrix applying the 5-tap Gaussian + take-even-rows,
    with REFLECT_101 borders folded in.  Static, built once per size."""
    m = -(-n // 2)
    D = np.zeros((m, n), np.float32)
    taps = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    for o in range(m):
        for t in range(5):
            src = 2 * o + t - 2
            if src < 0:
                src = -src  # REFLECT_101
            if src >= n:
                src = 2 * (n - 1) - src
            D[o, src] += taps[t]
    return D


def pyr_down(img):
    """OpenCV pyrDown: Gaussian blur + decimate by 2 (ceil(n/2) output).

    Decimation is linear, so each axis is one matmul with a static banded
    matrix: out = Dr @ img @ Dc^T.  Runs on the MXU (HIGHEST precision: the
    5 products per output sum exactly like the separable filter) instead of
    the 20-op slice/add chain it replaces — only kept pixels are computed."""
    dtype = img.dtype
    H, W = img.shape
    Dr = jnp.asarray(_decimation_matrix(H), dtype)
    Dc = jnp.asarray(_decimation_matrix(W), dtype)
    v = jax.lax.dot(Dr, img, precision=lax.Precision.HIGHEST,
                    preferred_element_type=dtype)
    return jax.lax.dot_general(
        v, Dc, (((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=dtype,
    )


def build_pyramid(img, levels: int) -> List[jnp.ndarray]:
    """levels = LK maxLevel; returns levels+1 images (level 0 = input).

    Levels are rounded to integers exactly as cv2's 8-bit ``pyrDown`` does
    ((k + 128) >> 8 on the fixed-point sum = round-half-up): cv2's LK tracks
    on a uint8 pyramid, so integer levels both match the reference's actual
    sampling AND make every pyramid value exactly representable in bfloat16
    — which lets the banded block tilings (ops/extract.py) be stored at half
    the HBM traffic with zero quantization error.  pyr_down's HIGHEST-precision
    matmuls produce the exact dyadic rational k/256, so the rounding below is
    the exact cv2 result (tested vs iterated cv2.pyrDown on uint8)."""
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(levels):
        pyr.append(jnp.floor(pyr_down(pyr[-1]) + 0.5))
    return pyr


def scharr_derivs(img) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scharr x/y derivatives scaled by 1/32 (cv2 LK's calcScharrDeriv)."""
    smooth = jnp.array([3.0, 10.0, 3.0], img.dtype) / 32.0
    diff = jnp.array([-1.0, 0.0, 1.0], img.dtype)
    ix = _sep_filter(img, diff, smooth)
    iy = _sep_filter(img, smooth, diff)
    return ix, iy


LK_PAD = 17  # window 15 + bilinear margin; matches cv2's per-level border


def build_pyramid_padded(img, levels: int, pad: int = LK_PAD):
    """[image] per level, each padded by ``pad`` pixels (REFLECT_101) so LK
    can sample windows that partially leave the image (cv2 pads each level
    with the window size).  Coordinates into these arrays are shifted by
    +pad (ops/lk.py handles it).

    Derivative planes are NOT materialized: LK computes Scharr gradients
    directly on each feature's gathered template window — convolution
    commutes with the bilinear shift, so the result is identical to sampling
    pre-computed derivative images (away from the zero-padded border, where
    cv2's zero derivative padding differed anyway only for status-marginal
    edge features).
    """
    return [jnp.pad(p, pad, mode="reflect") for p in build_pyramid(img, levels)]
