#!/usr/bin/env python
"""Per-op latency floor inside one jitted scan: chains of K dependent tiny
ops (matmul / gather / scatter / argmax / elementwise) timed scan-amortized.
If cost scales ~linearly with K, the slope is the per-op floor that stage
costs divide into — the budget for op-count (not FLOP) optimization.
Usage: python scripts/exp_op_floor.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}   reps={reps}", flush=True)

    # dependent chain of K batched tiny matmuls (F=104, 15x48 @ 48x48)
    W0 = jnp.asarray(rng.normal(0, 0.1, (104, 48, 48)), jnp.float32)

    def mm_chain(K):
        def body(c):
            x = c
            for _ in range(K):
                x = lax.dot_general(x, W0, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
                x = x * (1.0 / (1.0 + jnp.max(jnp.abs(x))))
            return x
        return body

    x0 = jnp.asarray(rng.normal(0, 1, (104, 15, 48)), jnp.float32)
    base = scan_time(mm_chain(1), x0, reps, "batched matmul chain K=1")
    k8 = scan_time(mm_chain(8), x0, reps, "batched matmul chain K=8")
    print(f"  -> per (matmul+norm) ~ {(k8 - base) / 7 * 1000:.1f} us", flush=True)

    # dependent chain of K row gathers (104 rows from (1500, 2304))
    tbl = jnp.asarray(rng.normal(0, 1, (1500, 2304)), jnp.float32)

    def gather_chain(K):
        def body(idx):
            x = idx
            for _ in range(K):
                rows = tbl[x]  # (104, 2304)
                x = (x + jnp.sum(rows[:, ::997], axis=1).astype(jnp.int32)) % 1500
            return x
        return body

    i0 = jnp.arange(104, dtype=jnp.int32)
    base = scan_time(gather_chain(1), i0, reps, "104-row gather chain K=1")
    k8 = scan_time(gather_chain(8), i0, reps, "104-row gather chain K=8")
    print(f"  -> per (gather+reduce) ~ {(k8 - base) / 7 * 1000:.1f} us", flush=True)

    # dependent chain of K small scatters into a (256, 4) table
    def scatter_chain(K):
        def body(c):
            t, i = c
            for _ in range(K):
                t = t.at[i].set(t[i] * 1.0001, mode="drop")
                i = (i + 3) % 256
            return (t, i)
        return body

    t0c = (jnp.asarray(rng.normal(0, 1, (256, 4)), jnp.float32),
           jnp.arange(104, dtype=jnp.int32))
    base = scan_time(scatter_chain(1), t0c, reps, "scatter chain K=1")
    k8 = scan_time(scatter_chain(8), t0c, reps, "scatter chain K=8")
    print(f"  -> per (gather+scatter) ~ {(k8 - base) / 7 * 1000:.1f} us", flush=True)

    # dependent chain of K argmax over (20, 22560)
    big = jnp.asarray(rng.normal(0, 1, (20, 22560)), jnp.float32)

    def argmax_chain(K):
        def body(c):
            w = big + c
            acc = c
            for _ in range(K):
                i = jnp.argmax(w, axis=1)
                acc = acc + i.astype(jnp.float32).sum() * 1e-9
                w = w.at[jnp.arange(20), i].set(-jnp.inf)
            return acc
        return body

    base = scan_time(argmax_chain(1), jnp.float32(0.0), reps, "argmax(20,22560) chain K=1")
    k5 = scan_time(argmax_chain(5), jnp.float32(0.0), reps, "argmax(20,22560) chain K=5")
    print(f"  -> per (argmax+suppress) ~ {(k5 - base) / 4 * 1000:.1f} us", flush=True)

    # dependent elementwise chain over a tiny (104, 2) array (fusion check)
    def ew_chain(K):
        def body(c):
            x = c
            for _ in range(K):
                x = jnp.tanh(x * 1.0001 + 0.001)
            return x
        return body

    e0 = jnp.asarray(rng.normal(0, 1, (104, 2)), jnp.float32)
    base = scan_time(ew_chain(1), e0, reps, "tiny elementwise chain K=1")
    k32 = scan_time(ew_chain(32), e0, reps, "tiny elementwise chain K=32")
    print(f"  -> per tanh-mul-add ~ {(k32 - base) / 31 * 1000:.2f} us", flush=True)

    # one fused Gauss-Newton-step-shaped block, as a reference unit
    Wc = jnp.asarray(rng.normal(0, 0.1, (104, 15, 48)), jnp.float32)
    grad = jnp.asarray(rng.normal(0, 0.1, (104, 2, 15, 15)), jnp.float32)

    def gn_like(K):
        def body(c):
            pts = c
            for _ in range(K):
                p = jnp.clip(pts[:, 0] + pts[:, 1], 0.0, 32.0)
                a = p - jnp.floor(p)
                Wr = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (104, 15, 48), 2)
                    == jnp.floor(p).astype(jnp.int32)[:, None, None]
                    + jax.lax.broadcasted_iota(jnp.int32, (104, 15, 48), 1),
                    1.0 - a[:, None, None], 0.0)
                T1 = lax.dot_general(Wr, W0, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
                J = lax.dot_general(T1, Wc, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
                b = jnp.einsum("fij,fcij->fc", J[:, :, :15], grad)
                pts = pts + jnp.clip(b * 1e-3, -0.1, 0.1)
            return pts
        return body

    p0 = jnp.asarray(rng.uniform(4, 20, (104, 2)), jnp.float32)
    base = scan_time(gn_like(1), p0, reps, "GN-shaped step chain K=1")
    k8 = scan_time(gn_like(8), p0, reps, "GN-shaped step chain K=8")
    print(f"  -> per GN-shaped step ~ {(k8 - base) / 7 * 1000:.1f} us", flush=True)
