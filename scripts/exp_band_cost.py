#!/usr/bin/env python
"""Where does the in-situ pyramid+banding time go?  Stages measured in-scan
with full data dependencies (strided-slice consume defeats DCE without
adding a full reduce)."""

import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from uav_airvision_tpu.ops import pyramid, extract as ex


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
    print(f"{label:44s} {ms:8.3f} ms/iter")
    return out


rng = np.random.default_rng(0)
H, W = 480, 752
img = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))


def consume(x):
    return jnp.sum(x.reshape(-1)[::997])


def v_pyr(c):
    p = pyramid.build_pyramid_padded(c, 3)
    return c + sum(consume(q) for q in p) * 1e-12


def v_pad_only(c):
    p = jnp.pad(c, 17, mode="reflect")
    return c + consume(p) * 1e-12


def v_band_l0(c):
    p = jnp.pad(c, 17, mode="reflect")
    b = ex.band_image(p)
    return c + consume(b.bands) * 1e-12


def v_rowband_l0(c):
    p = jnp.pad(c, 17, mode="reflect")
    hp, wp = p.shape
    stride, bw = 16, 64
    nbr = ex._n_bands(hp, stride, bw)
    pp = jnp.pad(p, ((0, (nbr - 1) * stride + bw - hp), (0, 0)))
    rows = [
        lax.slice(pp, (r * stride, 0), (r * stride + nbr * stride, wp)).reshape(
            nbr, stride, wp)
        for r in range(bw // stride)
    ]
    rb = jnp.concatenate(rows, axis=1)  # (nbr, bw, wp)
    return c + consume(rb) * 1e-12


def v_band_l0_notranspose(c):
    """Full 2-D banding minus the final transpose (cost attribution)."""
    p = jnp.pad(c, 17, mode="reflect")
    hp, wp = p.shape
    stride, bw = 16, 64
    nbr = ex._n_bands(hp, stride, bw)
    nbc = ex._n_bands(wp, stride, bw)
    pp = jnp.pad(p, ((0, (nbr - 1) * stride + bw - hp),
                     (0, (nbc - 1) * stride + bw - wp)))
    rows = [
        lax.slice(pp, (r * stride, 0), (r * stride + nbr * stride, pp.shape[1])
                  ).reshape(nbr, stride, pp.shape[1])
        for r in range(bw // stride)
    ]
    rb = jnp.concatenate(rows, axis=1)
    cols = [
        lax.slice(rb, (0, 0, cc * stride), (nbr, bw, cc * stride + nbc * stride)
                  ).reshape(nbr, bw, nbc, stride)
        for cc in range(bw // stride)
    ]
    b4 = jnp.concatenate(cols, axis=3)  # (nbr, bw, nbc, bw)
    return c + consume(b4) * 1e-12


def v_transpose_only(c):
    p = jnp.pad(c, 17, mode="reflect")[:448, :704]
    b4 = p.reshape(28, 16, 44, 16)
    bt = b4.transpose(0, 2, 1, 3)
    return c + consume(bt) * 1e-12


def v_pyr_band_all(c):
    b = tuple(ex.band_image(p) for p in pyramid.build_pyramid_padded(c, 3))
    return c + sum(consume(q.bands) for q in b) * 1e-12


reps = 100
print(f"device={jax.devices()[0].device_kind}")
scan_time(v_pad_only, img, reps, "reflect pad only")
scan_time(v_pyr, img, reps, "pyramid build (4 levels, padded)")
scan_time(v_rowband_l0, img, reps, "row-band L0 only")
scan_time(v_band_l0_notranspose, img, reps, "2-D band L0, no transpose")
scan_time(v_band_l0, img, reps, "2-D band L0 (current)")
scan_time(v_transpose_only, img, reps, "bare 16x16 block transpose")
scan_time(v_pyr_band_all, img, reps, "pyramid + band all levels (current)")
