"""Device mesh + sharding utilities (no counterpart in the reference).

The reference is strictly single-device (SURVEY.md §2.5: no DDP/NCCL/
collectives anywhere); this module adds the first-class data-parallel scaling
the TPU rebuild requires: a 1-D ``data`` mesh (optionally 2-D with a ``model``
axis for future tensor sharding), GSPMD sharded-jit train steps, and batched
DDIM sampling sharded over devices. Gradients are averaged by XLA collectives
riding ICI — there is no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ``(data, model)`` mesh over the first ``n_devices`` devices.

    ``model_parallel=1`` (default) gives the pure data-parallel layout the
    codec needs (the U-Net is ~35M params — far below per-chip HBM); the
    ``model`` axis exists so tensor-sharding rules can be added without
    re-plumbing callers.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with the batch dim sharded over ``data``."""
    sh = batch_sharded(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
