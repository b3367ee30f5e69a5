"""Data-parallel batched DDIM sampling over a device mesh.

BASELINE config #5's shape: shard the reconstruction batch over the ``data``
axis so every chip denoises its slice of the batch; no collectives are needed
in the forward pass (weights replicated), so scaling is embarrassingly
parallel over ICI-connected chips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..diffusion.ddim import ModelFn, ddim_sample
from ..diffusion.schedule import NoiseSchedule
from .mesh import shard_batch


def sample_sharded(
    mesh: Mesh,
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: np.ndarray,
    image_size: int,
    steps: int = 50,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    channels: int = 3,
) -> np.ndarray:
    """Reconstruct a batch of embeddings with the batch sharded over ``data``.

    ``z``'s leading dim must divide by the data-axis size (pad upstream);
    returns host numpy images (B, S, S, C) in [-1, 1]-ish (unclipped).
    """
    n_data = mesh.shape["data"]
    B = z.shape[0]
    if B % n_data != 0:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}; pad the batch")
    z_sharded = shard_batch(mesh, np.asarray(z, np.float32))
    out = ddim_sample(model_fn, sched, z_sharded, (B, image_size, image_size, channels), steps, eta, rng)
    return np.asarray(out)
