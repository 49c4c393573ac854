#!/usr/bin/env python
"""Race one-hot-matmul window extraction against gather strategies on TPU.

The known floor (CLAUDE.md): XLA gathers cost ~0.1 us per gathered ROW, so
vmapped dynamic_slice extraction of F windows of side WIN costs ~F*WIN*0.1us.
One-hot matmul extraction replaces the latency-bound gather with MXU work:
  rows:  R (F*WIN, H) one-hot  @  img (H, W)        -> slab (F, WIN, W)
  cols:  slab (F, WIN, W)      @  C (F, W, WIN)     -> windows (F, WIN, WIN)
Selection by one-hot in f32 is bit-exact (1.0*x summed with zeros).
"""

import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

F = int(sys.argv[1]) if len(sys.argv) > 1 else 128
WIN = int(sys.argv[2]) if len(sys.argv) > 2 else 36
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
    print(f"{label:38s} {ms:8.3f} ms/iter")
    return out


rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (HP, WP)).astype(np.float32))
oy0 = jnp.asarray(rng.integers(0, HP - WIN, F), jnp.int32)
ox0 = jnp.asarray(rng.integers(0, WP - WIN, F), jnp.int32)


def consume(w, o):
    s = jnp.sum(w, axis=(1, 2)).astype(jnp.int32) % 7
    return jnp.clip(o + s - 3, 0, HP - WIN)


def v_dynslice(c):
    oy, ox = c
    w = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy, ox)
    return (consume(w, oy), ox)


def extract_matmul(image, oy, ox, n, dtype=None):
    H, W = image.shape
    dt = dtype or image.dtype
    Fb = oy.shape[0]
    rows = (oy[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]).reshape(-1)
    R = (rows[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]).astype(dt)
    slab = (R @ image.astype(dt)).reshape(Fb, n, W)
    cols = ox[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    C = (jnp.arange(W, dtype=jnp.int32)[None, :, None] == cols[:, None, :]).astype(dt)
    w = lax.dot_general(slab, C, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=dt)
    return w


def v_matmul_f32(c):
    oy, ox = c
    w = extract_matmul(img, oy, ox, WIN)
    return (consume(w, oy), ox)


def v_matmul_bf16(c):
    oy, ox = c
    w = extract_matmul(img, oy, ox, WIN, dtype=jnp.bfloat16).astype(jnp.float32)
    return (consume(w, oy), ox)


# variant: one-hot rows on BOTH axes via transpose (two big GEMMs, no batched-small)
def v_matmul_2big(c):
    oy, ox = c
    n = WIN
    rows = (oy[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]).reshape(-1)
    R = (rows[:, None] == jnp.arange(HP, dtype=jnp.int32)[None, :]).astype(img.dtype)
    slab = (R @ img).reshape(F, n, WP)  # (F, n, WP)
    # col select as one big GEMM: flatten (F*n, WP) @ (WP, ?) won't give per-f cols.
    # Instead: transpose slab to (WP, F*n) and row-select per feature-col-block.
    st = slab.transpose(2, 0, 1).reshape(WP, F * n)  # (WP, F*n)
    colrows = (ox[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]).reshape(-1)
    C = (colrows[:, None] == jnp.arange(WP, dtype=jnp.int32)[None, :]).astype(img.dtype)
    # (F*n, WP) @ (WP, F*n) -> too big; do batched anyway but shaped (F, n, n)
    sel = (C.reshape(F, n, WP))
    w = lax.dot_general(sel, slab, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=img.dtype)  # (F, n_cols, n_rows)
    w = jnp.swapaxes(w, 1, 2)
    return (consume(w, oy), ox)


reps = 100
print(f"F={F} WIN={WIN} device={jax.devices()[0].device_kind}")
a = scan_time(v_dynslice, (oy0, ox0), reps, "vmapped dynamic_slice")
m = scan_time(v_matmul_f32, (oy0, ox0), reps, "one-hot matmul f32")
m2 = scan_time(v_matmul_2big, (oy0, ox0), reps, "one-hot matmul f32 (swapped col)")
mb = scan_time(v_matmul_bf16, (oy0, ox0), reps, "one-hot matmul bf16")

w1 = jax.vmap(lambda y, x: lax.dynamic_slice(img, (y, x), (WIN, WIN)))(oy0, ox0)
w2 = extract_matmul(img, oy0, ox0, WIN)
print("matmul f32 bit-exact vs dynslice:", bool(jnp.all(w1 == w2)))
