#!/usr/bin/env python
"""Measure TPU gather cost scaling: slices x height, one call vs many calls,
width dependence.  Informs the LK/stereo gather redesign."""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

HP, WP = 514, 786


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
    return ms


rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (HP, WP)).astype(np.float32))


def make_extract(n_slices, h, w):
    oy = jnp.asarray(rng.integers(0, HP - h, n_slices), jnp.int32)
    ox = jnp.asarray(rng.integers(0, WP - w, n_slices), jnp.int32)

    def fn(c):
        o = c
        win = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (h, w)))(
            jnp.clip(oy + o, 0, HP - h), ox)
        s = jnp.sum(win, axis=(1, 2)).astype(jnp.int32) % 5
        return jnp.sum(s) % 3
    return fn


def make_two_calls(n1, h1, w1, n2, h2, w2):
    oy1 = jnp.asarray(rng.integers(0, HP - h1, n1), jnp.int32)
    ox1 = jnp.asarray(rng.integers(0, WP - w1, n1), jnp.int32)
    oy2 = jnp.asarray(rng.integers(0, HP - h2, n2), jnp.int32)
    ox2 = jnp.asarray(rng.integers(0, WP - w2, n2), jnp.int32)

    def fn(c):
        o = c
        a = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (h1, w1)))(
            jnp.clip(oy1 + o, 0, HP - h1), ox1)
        b = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (h2, w2)))(
            jnp.clip(oy2 + o, 0, HP - h2), ox2)
        s = (jnp.sum(a).astype(jnp.int32) + jnp.sum(b).astype(jnp.int32)) % 3
        return s
    return fn


reps = 200
print("== slices x height scaling (w=32) ==")
for n, h in [(104, 18), (104, 24), (104, 33), (208, 18), (208, 24),
             (416, 18), (416, 24), (832, 18), (104, 36), (104, 72)]:
    scan_time(make_extract(n, h, 32), jnp.zeros((), jnp.int32), reps,
              f"n={n:4d} h={h:3d} w=32  ({n*h} rows)")

print("== width dependence (n=104, h=24) ==")
for w in [16, 32, 64, 144, 256]:
    scan_time(make_extract(104, 24, w), jnp.zeros((), jnp.int32), reps,
              f"n=104 h=24 w={w:3d}")

print("== call merging: 2 calls vs 1 merged (same rows) ==")
scan_time(make_two_calls(104, 18, 32, 104, 24, 32), jnp.zeros((), jnp.int32),
          reps, "two calls: 104x18 + 104x24")
scan_time(make_extract(208, 24, 32), jnp.zeros((), jnp.int32), reps,
          "one call: 208x24 (padded heights)")
scan_time(make_two_calls(312, 18, 32, 312, 25, 144), jnp.zeros((), jnp.int32),
          reps, "two calls: 312x18x32 + 312x25x144")
scan_time(make_extract(624, 25, 144), jnp.zeros((), jnp.int32), reps,
          "one call: 624x25x144")
