"""Checkpoint / resume for the VIO state (the reference has none — SURVEY.md
section 5: its only artifact is the append-only trajectory file).

The whole filter + front-end state is one pytree, so snapshot/restore is a
single orbax save/load.  ``models.vio.run_sequence_checkpointed`` snapshots
every N frames and resumes mid-sequence after a failure (kill/resume is
bit-identical to an uninterrupted run); the CLI exposes it as
``--checkpoint-dir`` / ``--checkpoint-every``.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_state(directory, state, step: int):
    ocp = _ocp()
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory):
    if not os.path.isdir(directory):
        return None
    steps = [
        int(n.split("_")[1])
        for n in os.listdir(directory)
        if n.startswith("step_") and n.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_state(directory, template, step: int = None):
    """Restore into the shape/dtype structure of ``template`` (an abstract or
    concrete state pytree)."""
    ocp = _ocp()
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), template
    )
    return ckptr.restore(path, abstract), step
