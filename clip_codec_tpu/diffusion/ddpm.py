"""Ancestral DDPM sampler — completes the ``p_mean_variance`` API.

The reference declares ``p_mean_variance`` (``diffusion/scheduler.py:57-68``)
but ships no sampler that calls it (SURVEY.md §2.1 "dead-ish API"). This adds
the standard ancestral loop as one ``lax.scan``: x_{t-1} = mean + sqrt(var)*n
for t = T-1..0, with no noise at the final step. Beyond-reference, clearly
marked; DDIM remains the production sampler.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ddim import ModelFn
from .schedule import NoiseSchedule


@partial(jax.jit, static_argnames=("model_fn", "shape"))
def ddpm_sample(
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: jax.Array,
    shape: Tuple[int, ...],
    rng: Optional[jax.Array] = None,
    x_T: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-schedule ancestral sampling (T model evaluations)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, dtype=jnp.float32) if x_T is None else x_T.astype(jnp.float32)
    T = sched.timesteps

    def step(carry, t):
        x, rng = carry
        t_b = jnp.full((shape[0],), t, jnp.int32)
        mean, var, _ = sched.p_mean_variance(model_fn, x, z, t_b)
        rng, nrng = jax.random.split(rng)
        noise = jax.random.normal(nrng, shape, dtype=jnp.float32)
        x = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return (x, rng), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(step, (x, rng), ts)
    return x
