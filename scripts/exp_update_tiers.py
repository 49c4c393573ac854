#!/usr/bin/env python
"""Measurement-update tier experiment: XLA QR on the padded (1680, 141)
buffer vs the direct Cholesky gain (S = H P H^T + sigma^2 I) at several
prefix heights.  The direct gain is exact for any prefix covering the true
rows (zero padding rows produce zero gain columns), so if it beats QR at
m=1680 the full tier never needs QR at all.  Usage: exp_update_tiers.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_uav"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def scan_time(body, init, reps, label):
    def scanned(c):
        out, _ = lax.scan(lambda c, _: (body(c), None), c, None, length=reps)
        return out

    f = jax.jit(scanned)
    out = f(init)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    out = f(init)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:34s} {ms:8.3f} ms/iter", flush=True)
    return ms


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    D, R = 141, 1680
    sigma2 = 0.035**2
    rng = np.random.default_rng(0)
    rows_true = 400
    H = np.zeros((R, D), np.float32)
    H[:rows_true] = rng.normal(0, 1, (rows_true, D))
    r = np.zeros(R, np.float32)
    r[:rows_true] = rng.normal(0, 0.1, rows_true)
    A = rng.normal(0, 1, (D, D))
    P = (A @ A.T / D + np.eye(D)).astype(np.float32)
    H, r, P = jnp.asarray(H), jnp.asarray(r), jnp.asarray(P)
    print(f"device: {jax.devices()[0]}  reps={reps}  true rows={rows_true}",
          flush=True)

    def gain(Hm, rm, Pm):
        m = Hm.shape[0]
        S = Hm @ Pm @ Hm.T + sigma2 * jnp.eye(m, dtype=jnp.float32)
        Lc = jnp.linalg.cholesky(S)
        K = jax.scipy.linalg.cho_solve((Lc, True), Hm @ Pm).T
        return K @ rm, K @ Hm

    def qr_full(Hm, rm, Pm):
        Q, Rr = jnp.linalg.qr(Hm, mode="reduced")
        return gain(Rr, Q.T @ rm, Pm)

    # value sanity: QR-compressed gain == direct gain (same update)
    d1, KH1 = jax.jit(lambda: gain(H, r, P))()
    d2, KH2 = jax.jit(lambda: qr_full(H, r, P))()
    print("delta agreement (QR vs direct):",
          float(jnp.max(jnp.abs(d1 - d2)) / (jnp.max(jnp.abs(d1)) + 1e-9)),
          flush=True)

    def mk(mfun, m):
        def body(c):
            d, KH = mfun(H[:m], r[:m], P + c * 1e-30)
            return c + jnp.sum(d) * 1e-20
        return body

    z = jnp.zeros((), jnp.float32)
    for m in (148, 282, 424, 512, 768, 1024, 1680):
        scan_time(mk(gain, m), z, reps, f"direct gain m={m}")
    scan_time(mk(qr_full, 1680), z, reps, "QR(1680x141) + gain")


def _decompose(reps):
    """Decompose the m=148 gain: scan floor, matmuls only, cholesky only,
    cho_solve only."""
    z = jnp.zeros((), jnp.float32)
    m = 148
    Hm, rm = H[:m], r[:m]
    S0 = np.asarray(Hm @ P @ Hm.T) + np.eye(m, dtype=np.float32)
    S0 = jnp.asarray(S0)
    L0 = jnp.asarray(np.linalg.cholesky(np.asarray(S0)))

    scan_time(lambda c: c * 1.0000001 + 1e-20, z, reps, "scan floor (noop)")
    scan_time(lambda c: c + jnp.sum((Hm @ (P + c * 1e-30)) @ Hm.T) * 1e-20,
              z, reps, "matmul H P H^T only")
    scan_time(lambda c: c + jnp.sum(jnp.linalg.cholesky(
        S0 + c * 1e-30 * jnp.eye(m))) * 1e-20, z, reps, "cholesky(148) only")
    scan_time(lambda c: c + jnp.sum(jax.scipy.linalg.cho_solve(
        (L0 + c * 1e-30, True), Hm @ P)) * 1e-20, z, reps,
        "cho_solve(148, D) only")
    scan_time(lambda c: c + jnp.sum(jnp.linalg.cholesky(
        (P + c * 1e-30) + jnp.eye(D))) * 1e-20, z, reps, "cholesky(141) only")


if __name__ == "__main__" and os.environ.get("DECOMPOSE"):
    _decompose(reps)
