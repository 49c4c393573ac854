#!/usr/bin/env python
"""Banded (block-tiled) window extraction vs gather/matmul on TPU.

Hypothesis: XLA gather costs ~0.1us per gathered ROW (DMA descriptor per
discontiguous chunk), independent of row width.  If the image is pre-tiled
into overlapping (BW x BW) blocks at stride S (built from S-shifted static
slices = dense copies), each feature window is ONE contiguous row of a
(Nblocks, BW*BW) array -> F windows = one F-row gather.

Per-frame the banding cost is paid once per image and shared by every
extraction from that image (temporal search, templates, stereo fwd/bwd).
"""

import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

F = int(sys.argv[1]) if len(sys.argv) > 1 else 104
WIN = int(sys.argv[2]) if len(sys.argv) > 2 else 40
H, W = 514, 786


def scan_time(fn, carry, reps, label):
    def scanned(c):
        def body(c, _):
            return fn(c), None
        out, _ = lax.scan(body, c, None, length=reps)
        return out
    f = jax.jit(scanned)
    out = jax.block_until_ready(f(carry))
    t0 = time.perf_counter()
    jax.block_until_ready(f(carry))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:52s} {ms:8.4f} ms/iter")
    return out


rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))
oy0 = jnp.asarray(rng.integers(0, H - WIN, F), jnp.int32)
ox0 = jnp.asarray(rng.integers(0, W - WIN, F), jnp.int32)


def consume(w, o):
    s = jnp.sum(w, axis=(1, 2)).astype(jnp.int32) % 7
    return jnp.clip(o + s - 3, 0, H - WIN)


# ---- banding ----
def band_params(stride, bw, h, w):
    nbr = (h - bw) // stride + 1
    nbc = (w - bw) // stride + 1
    return nbr, nbc


def band_image(im, stride, bw):
    """(Nbr*Nbc, bw*bw) overlapping blocks at the given stride, built from
    (bw//stride)^2 static shifted slices (dense copies, no gather)."""
    h, w = im.shape
    nbr, nbc = band_params(stride, bw, h, w)
    k = bw // stride
    # rows: k shifted slabs, each reshaped (nbr, stride, w)
    rows = [
        lax.slice(im, (r * stride, 0), (r * stride + nbr * stride, w)).reshape(
            nbr, stride, w
        )
        for r in range(k)
    ]
    banded_r = jnp.concatenate(rows, axis=1)  # (nbr, bw, w)
    cols = [
        lax.slice(banded_r, (0, 0, c * stride),
                  (nbr, bw, c * stride + nbc * stride)).reshape(
            nbr, bw, nbc, stride)
        for c in range(k)
    ]
    banded = jnp.concatenate(cols, axis=3)  # (nbr, bw, nbc, bw)
    banded = banded.transpose(0, 2, 1, 3).reshape(nbr * nbc, bw * bw)
    return banded


STRIDE = 16
BW = 64
assert WIN + STRIDE <= BW
NBR, NBC = band_params(STRIDE, BW, H, W)


def extract_banded(bands, oy, ox):
    br = jnp.minimum(oy // STRIDE, NBR - 1)
    bc = jnp.minimum(ox // STRIDE, NBC - 1)
    rows = bands[br * NBC + bc]  # (F, BW*BW) one gather, F rows
    return rows.reshape(-1, BW, BW), oy - br * STRIDE, ox - bc * STRIDE


# ---- variants ----
def v_dynslice(c):
    oy, ox = c
    w = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy, ox)
    return (consume(w, oy), ox)


def v_banded_fresh(c):
    """Band the image inside the step (cost NOT amortized)."""
    oy, ox = c
    bands = band_image(img, STRIDE, BW)
    w, _, _ = extract_banded(bands, oy, ox)
    return (consume(w, oy), ox)


bands_pre = jax.jit(lambda: band_image(img, STRIDE, BW))()


def v_banded_pre(c):
    """Bands precomputed (amortized across many extractions)."""
    oy, ox = c
    w, _, _ = extract_banded(bands_pre, oy, ox)
    return (consume(w, oy), ox)


def v_band_only(c):
    oy, ox = c
    bands = band_image(img, STRIDE, BW)
    s = jnp.sum(bands[0]).astype(jnp.int32) % 7
    return (jnp.clip(oy + s - 3, 0, H - WIN), ox)


def v_banded_pre_x6(c):
    """6 extractions from the same bands (one frame's worth of LK passes)."""
    oy, ox = c
    o = oy
    for i in range(6):
        w, _, _ = extract_banded(bands_pre, jnp.clip(o, 0, H - WIN), ox)
        o = consume(w, o)
    return (o, ox)


def v_dynslice_x6(c):
    oy, ox = c
    o = oy
    for i in range(6):
        w = jax.vmap(
            lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN))
        )(jnp.clip(o, 0, H - WIN), ox)
        o = consume(w, o)
    return (o, ox)


reps = 200
print(f"F={F} WIN={WIN} BW={BW} STRIDE={STRIDE} blocks={NBR}x{NBC} "
      f"device={jax.devices()[0].device_kind}")
scan_time(v_dynslice, (oy0, ox0), reps, "vmapped dynamic_slice")
scan_time(v_band_only, (oy0, ox0), reps, "banding alone (per image)")
scan_time(v_banded_fresh, (oy0, ox0), reps, "band + extract (unamortized)")
scan_time(v_banded_pre, (oy0, ox0), reps, "extract from prebuilt bands")
scan_time(v_banded_pre_x6, (oy0, ox0), reps, "6x extract from prebuilt bands")
scan_time(v_dynslice_x6, (oy0, ox0), reps, "6x vmapped dynamic_slice")

# correctness: banded window contains the requested window at the residual offset
wb, ry, rx = jax.jit(lambda oy, ox: extract_banded(bands_pre, oy, ox))(oy0, ox0)
wd = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy0, ox0)
sub = jax.vmap(
    lambda w, y, x: lax.dynamic_slice(w, (y, x), (WIN, WIN))
)(wb, ry, rx)
print("banded contains exact window:", bool(jnp.all(sub == wd)))
