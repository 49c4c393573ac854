"""Banded (block-tiled) window extraction — the TPU gather-floor workaround.

XLA gathers on this TPU cost ~0.1 us per gathered *row* (one DMA descriptor
per discontiguous chunk), independent of row width.  Extracting F feature
windows of side n as vmapped ``dynamic_slice`` therefore costs F*n
descriptors — the measured floor of the whole LK front-end (CLAUDE.md).

This module pre-tiles an image into overlapping (bw x bw) blocks on a
``stride``-pixel grid.  The tiling is built from (bw/stride)^2 statically
shifted slices — dense reshapes/copies, no gather — and stored as a
(n_blocks, bw*bw) array in which every block is ONE contiguous row.  Any
window of side <= bw - stride is then fully contained in the block whose
corner is the window corner rounded down to the stride grid, so F window
extractions collapse into a single F-row gather: measured ~8 us marginal for
104 features vs ~130 us for the vmapped dynamic_slice (scripts/
exp_banded_extract.py), and the block array is shared by every extraction
from that image in the frame (temporal LK search, LK templates, stereo
forward/backward passes).

Replaces the per-feature ``cv2.calcOpticalFlowPyrLK`` patch access of the
reference (src/image_processing/feature_tracker.py:102-108,
stereo_matcher.py:64-74) with a layout designed for the TPU's DMA engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Defaults sized for LK: window 15+1 plus 2*LK_MARGIN(8) search span = 32,
# and 32 + stride <= bw.  48-blocks measured ~18% faster end-to-end than
# 64-blocks at equal ATE (9 banding copies instead of 16; Gauss-Newton
# sampling matmuls scale with block area).
BAND_STRIDE = 16
BAND_BW = 48


@jax.tree_util.register_pytree_node_class
class BandedImage:
    """Overlapping (bw x bw) blocks of one image at ``stride`` granularity.

    ``bands`` is (nbr*nbc, bw*bw); block (i, j) holds image rows
    [i*stride, i*stride+bw) x cols [j*stride, j*stride+bw), zero-padded
    past the image edge.  ``h``/``w`` are the source image's true shape.
    """

    def __init__(self, bands, h, w, stride=BAND_STRIDE, bw=BAND_BW):
        self.bands = bands
        self.h = int(h)
        self.w = int(w)
        self.stride = int(stride)
        self.bw = int(bw)
        self.nbr = _n_bands(self.h, self.stride, self.bw)
        self.nbc = _n_bands(self.w, self.stride, self.bw)

    def tree_flatten(self):
        return (self.bands,), (self.h, self.w, self.stride, self.bw)

    @classmethod
    def tree_unflatten(cls, aux, children):
        h, w, stride, bw = aux
        return cls(children[0], h, w, stride, bw)


def _n_bands(n, stride, bw):
    """Blocks needed so every corner in [0, n - (bw - stride)] lands in a
    block: the last block starts at ceil((n - bw) / stride) * stride."""
    return max(1, -((n - bw) // -stride) + 1)


def band_image(img, stride=BAND_STRIDE, bw=BAND_BW, dtype=None) -> BandedImage:
    """Build the block tiling from (bw/stride)^2 static shifted slices.

    ``dtype`` stores the blocks at a narrower type: the production pipeline
    passes bfloat16 — pyramid levels are integer-valued 0..255 (cv2 uint8
    semantics, ops/pyramid.py), which bfloat16 represents exactly, so the
    ~9x-replicated block array costs half the HBM traffic for free."""
    assert bw % stride == 0, "bw must be a multiple of stride"
    if dtype is not None:
        img = img.astype(dtype)
    h, w = img.shape
    nbr = _n_bands(h, stride, bw)
    nbc = _n_bands(w, stride, bw)
    k = bw // stride
    hp = (nbr - 1) * stride + bw
    wp = (nbc - 1) * stride + bw
    p = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    rows = [
        lax.slice(p, (r * stride, 0), (r * stride + nbr * stride, wp)).reshape(
            nbr, stride, wp
        )
        for r in range(k)
    ]
    br = jnp.concatenate(rows, axis=1)  # (nbr, bw, wp)
    cols = [
        lax.slice(br, (0, 0, c * stride),
                  (nbr, bw, c * stride + nbc * stride)).reshape(
            nbr, bw, nbc, stride)
        for c in range(k)
    ]
    bands = jnp.concatenate(cols, axis=3)  # (nbr, bw, nbc, bw)
    bands = bands.transpose(0, 2, 1, 3).reshape(nbr * nbc, bw * bw)
    return BandedImage(bands, h, w, stride, bw)


def zeros_like_banded(h, w, dtype=jnp.float32,
                      stride=BAND_STRIDE, bw=BAND_BW) -> BandedImage:
    nbr = _n_bands(h, stride, bw)
    nbc = _n_bands(w, stride, bw)
    return BandedImage(jnp.zeros((nbr * nbc, bw * bw), dtype), h, w, stride, bw)


@jax.tree_util.register_pytree_node_class
class BandedPyramid:
    """All pyramid levels' block tilings concatenated into ONE (sum_NB,
    bw*bw) array, so a multi-level window request (e.g. every LK level's
    templates) is still a single gather.  ``levels`` holds per-level
    (h, w, nbr, nbc, offset) with offset = first block row of that level."""

    def __init__(self, bands, levels, stride=BAND_STRIDE, bw=BAND_BW):
        self.bands = bands
        self.levels = tuple(tuple(l) for l in levels)
        self.stride = int(stride)
        self.bw = int(bw)
        self.n_levels = len(self.levels)

    def tree_flatten(self):
        return (self.bands,), (self.levels, self.stride, self.bw)

    @classmethod
    def tree_unflatten(cls, aux, children):
        levels, stride, bw = aux
        return cls(children[0], levels, stride, bw)


def band_pyramid(level_imgs, stride=BAND_STRIDE, bw=BAND_BW,
                 dtype=None) -> BandedPyramid:
    """Band every pyramid level and concatenate the block arrays."""
    parts = []
    levels = []
    off = 0
    for img in level_imgs:
        b = band_image(img, stride, bw, dtype=dtype)
        parts.append(b.bands)
        levels.append((b.h, b.w, b.nbr, b.nbc, off))
        off += b.nbr * b.nbc
    return BandedPyramid(jnp.concatenate(parts, axis=0), levels, stride, bw)


def zeros_like_banded_pyramid(shapes, dtype=jnp.float32,
                              stride=BAND_STRIDE, bw=BAND_BW) -> BandedPyramid:
    """shapes: [(h, w)] per level."""
    levels = []
    off = 0
    for h, w in shapes:
        nbr = _n_bands(h, stride, bw)
        nbc = _n_bands(w, stride, bw)
        levels.append((h, w, nbr, nbc, off))
        off += nbr * nbc
    return BandedPyramid(jnp.zeros((off, bw * bw), dtype), levels, stride, bw)


def block_of(bp: BandedPyramid, level: int, oy, ox, need: int):
    """(block_row_index, ry, rx) for level-local corners; the actual window
    is bp.bands[index].reshape(bw, bw)[ry:ry+need, rx:rx+need]."""
    h, w, nbr, nbc, off = bp.levels[level]
    assert need + bp.stride <= bp.bw, (need, bp.stride, bp.bw)
    oy = jnp.clip(oy, 0, h - need)
    ox = jnp.clip(ox, 0, w - need)
    bi = jnp.minimum(oy // bp.stride, nbr - 1)
    bj = jnp.minimum(ox // bp.stride, nbc - 1)
    return off + bi * nbc + bj, oy - bi * bp.stride, ox - bj * bp.stride


def extract_pyr(bp: BandedPyramid, level: int, oy, ox, need: int):
    """Single-level extraction from a BandedPyramid (one F-row gather)."""
    idx, ry, rx = block_of(bp, level, oy, ox, need)
    return bp.bands[idx].reshape(-1, bp.bw, bp.bw), ry, rx


def extract(b: BandedImage, oy, ox, need: int):
    """Windows containing [oy, oy+need) x [ox, ox+need) for each feature.

    Requires need + stride <= bw.  Corners are clamped to [0, dim - need]
    (callers historically clamped the same way before dynamic_slice).
    Returns (windows (F, bw, bw), ry (F,), rx (F,)): the requested window is
    windows[:, ry:ry+need, rx:rx+need], with ry/rx in [0, bw - need].
    """
    assert need + b.stride <= b.bw, (need, b.stride, b.bw)
    oy = jnp.clip(oy, 0, b.h - need)
    ox = jnp.clip(ox, 0, b.w - need)
    bi = jnp.minimum(oy // b.stride, b.nbr - 1)
    bj = jnp.minimum(ox // b.stride, b.nbc - 1)
    rows = b.bands[bi * b.nbc + bj]  # ONE gather, F rows
    return rows.reshape(-1, b.bw, b.bw), oy - bi * b.stride, ox - bj * b.stride
