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

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..diffusion.ddim import ModelFn, ddim_sample
from ..diffusion.schedule import NoiseSchedule
from .mesh import DATA_AXIS, MODEL_AXIS, shard_batch


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
    model_params=None,
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
    out = ddim_sample(model_fn, sched, z_sharded, (B, image_size, image_size, channels),
                      steps, eta, rng, model_params=model_params)
    return np.asarray(out)


def sample_spatial_sharded(
    mesh: Mesh,
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: np.ndarray,
    image_size: int,
    steps: int = 50,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    channels: int = 3,
    seed: int = 0,
    model_params=None,
) -> np.ndarray:
    """High-resolution sampling with the image **height** sharded over the
    ``model`` axis on top of batch sharding over ``data`` — the
    "long-context" lever for this workload (SURVEY.md §5: the sequence-
    parallel analogue is spatial sharding of the pixel grid). The U-Net is
    fully convolutional, so GSPMD propagates the spatial sharding through
    every conv and inserts halo exchanges over ICI automatically; no model
    code changes.

    Use when per-chip HBM can't hold the batch at 512px+: activations scale
    as B*H*W*C and this splits H.

    NOTE: build the model with ``CLIPCondUNet(fused_pallas=False)`` for this
    path — the fused-Pallas ResBlock kernel has no GSPMD partition rule, so
    under spatial sharding XLA would all-gather its operands per block,
    defeating the memory split (single-chip sampling keeps the kernel win;
    the gate fires on trace-time global shapes and cannot see shardings).
    """
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]
    B = z.shape[0]
    if B % n_data != 0:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}")
    if image_size % n_model != 0:
        raise ValueError(f"image_size {image_size} not divisible by model axis {n_model}")
    if rng is None:
        rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    # Materialize x_T with the target sharding; GSPMD propagates it through
    # the scan (batch over data, H over model).
    x_T = jax.device_put(
        jax.random.normal(init_rng, (B, image_size, image_size, channels), jnp.float32),
        NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None)),
    )
    z_sharded = jax.device_put(
        jnp.asarray(z, jnp.float32), NamedSharding(mesh, P(DATA_AXIS, None))
    )
    out = ddim_sample(
        model_fn, sched, z_sharded, (B, image_size, image_size, channels),
        steps, eta, rng, x_T=x_T, model_params=model_params,
    )
    return np.asarray(out)
