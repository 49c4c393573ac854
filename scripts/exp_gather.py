#!/usr/bin/env python
"""Race window-extraction strategies for LK on TPU (scan-amortized)."""

import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, WIN = 128, 36
HP, WP = 480 + 34, 752 + 34


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
    print(f"{label:30s} {ms:8.3f} ms/iter")
    return out


rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (HP, WP)).astype(np.float32))
oy0 = jnp.asarray(rng.integers(0, HP - WIN, F), jnp.int32)
ox0 = jnp.asarray(rng.integers(0, WP - WIN, F), jnp.int32)


def consume(w, o):
    # fold output back into origins to keep the scan honest
    s = jnp.sum(w, axis=(1, 2)).astype(jnp.int32) % 7
    return jnp.clip(o + s - 3, 0, HP - WIN)


# (a) vmapped dynamic_slice
def v_dynslice(c):
    oy, ox = c
    w = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy, ox)
    return (consume(w, oy), ox)


# (b) two-stage row gather
def rowgather(c):
    oy, ox = c
    rows = img[oy[:, None] + jnp.arange(WIN)[None, :], :]  # (F, WIN, WP)
    rT = jnp.swapaxes(rows, 1, 2).reshape(F * WP, WIN)      # (F*WP, WIN)
    idx = (ox[:, None] + jnp.arange(WIN)[None, :]) + jnp.arange(F)[:, None] * WP
    cols = rT[idx.reshape(-1)]                              # (F*WIN, WIN)
    w = jnp.swapaxes(cols.reshape(F, WIN, WIN), 1, 2)
    return (consume(w, oy), ox)


# (c) pallas DMA kernel
BF = 8


def _kernel(oy_ref, ox_ref, img_ref, out_ref, sems):
    i = pl.program_id(0)

    def mk(k):
        f = i * BF + k
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy_ref[f], WIN), pl.ds(ox_ref[f], WIN)],
            out_ref.at[k],
            sems.at[k],
        )

    for k in range(BF):
        mk(k).start()
    for k in range(BF):
        mk(k).wait()


def pallas_extract(oy, ox):
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(F // BF,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (BF, WIN, WIN), lambda i, oy, ox: (i, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((BF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((F, WIN, WIN), img.dtype),
    )(oy, ox, img)


def v_pallas(c):
    oy, ox = c
    w = pallas_extract(oy, ox)
    return (consume(w, oy), ox)


reps = 100
a = scan_time(v_dynslice, (oy0, ox0), reps, "vmapped dynamic_slice")
b = scan_time(rowgather, (oy0, ox0), reps, "row-gather x2 + transpose")
try:
    cres = scan_time(v_pallas, (oy0, ox0), reps, "pallas DMA kernel")
    # correctness
    w1 = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy0, ox0)
    w2 = pallas_extract(oy0, ox0)
    print("pallas matches dynslice:", bool(jnp.all(w1 == w2)))
except Exception as e:
    print("pallas failed:", repr(e)[:500])
