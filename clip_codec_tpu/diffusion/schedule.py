"""DDPM noise schedule (layer L3) as a frozen pytree of fp32 tables.

Functionally equivalent to the reference ``NoiseScheduler``
(``diffusion/scheduler.py:18-68``) but designed for XLA: the tables are plain
``jnp.float32`` arrays inside a registered dataclass pytree, so a schedule can
be closed over by (or passed into) any jitted function, and all lookups are
gathers — no host syncs, no device strings.

Schedules:

* ``linear``: ``betas = linspace(1e-4, 0.02, T)``  (reference ``scheduler.py:26``)
* ``cosine``: Nichol–Dhariwal with ``s=0.008`` and beta clamp ``[1e-4, 0.9999]``
  (reference ``scheduler.py:28-34``)

Replicated details that matter for parity:

* ``alphas_cumprod_prev`` prepends 1.0 (``scheduler.py:40``);
* ``sqrt_recip_alphas`` exists in the reference but is never used — omitted;
* all tables are computed on host in float32 with the same operation order the
  torch reference uses, so each table matches torch's to ~1 ulp (verified
  against the actual reference in tests/test_schedule.py). fp32 matters: e.g.
  ``sqrt(1 - alphas_cumprod)`` near t=0 has a cancellation whose fp32 result
  differs measurably from a float64 computation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed DDPM schedule tables, all shape ``(T,)`` float32."""

    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_variance: jax.Array

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(cls, timesteps: int = 1000, schedule: str = "cosine") -> "NoiseSchedule":
        if schedule == "linear":
            betas = np.linspace(1e-4, 0.02, timesteps).astype(np.float32)
        elif schedule == "cosine":
            s = np.float32(0.008)
            t = (np.linspace(0, timesteps, timesteps + 1).astype(np.float32) / np.float32(timesteps)).astype(np.float32)
            ac = np.cos((t + s) / (1 + s) * np.float32(math.pi / 2)) ** 2
            ac = (ac / ac[0]).astype(np.float32)
            betas = (1 - ac[1:] / ac[:-1]).astype(np.float32)
            betas = np.clip(betas, 0.0001, 0.9999).astype(np.float32)
        else:
            raise ValueError(f"Unknown schedule {schedule}")
        alphas = (1.0 - betas).astype(np.float32)
        alphas_cumprod = np.cumprod(alphas, dtype=np.float32)
        alphas_cumprod_prev = np.concatenate([np.ones(1, np.float32), alphas_cumprod[:-1]])
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas=f32(alphas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt((1.0 - alphas_cumprod).astype(np.float32))),
            posterior_variance=f32(posterior_variance),
        )

    # ---- pure helpers (all shapes broadcast over trailing image dims) ----

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Diffuse ``x0`` to ``x_t`` (reference ``scheduler.py:46-49``)."""
        shape = (-1,) + (1,) * (x0.ndim - 1)
        a = self.sqrt_alphas_cumprod[t].reshape(shape)
        b = self.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
        return a * x0 + b * noise

    def predict_x0_from_eps(self, x_t: jax.Array, t: jax.Array, eps_hat: jax.Array) -> jax.Array:
        """Invert ``q_sample`` given predicted noise (reference ``scheduler.py:51-55``)."""
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        a = self.sqrt_alphas_cumprod[t].reshape(shape)
        b = self.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
        return (x_t - b * eps_hat) / a

    def p_mean_variance(self, model_fn, x_t: jax.Array, z: jax.Array, t: jax.Array):
        """Posterior mean/variance for ancestral DDPM sampling
        (reference ``scheduler.py:57-68``; declared-API parity — the reference
        ships no sampler that calls it, SURVEY.md §2.1)."""
        eps = model_fn(x_t, z, t)
        x0_pred = jnp.clip(self.predict_x0_from_eps(x_t, t, eps), -1.0, 1.0)
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        al_t = self.alphas[t].reshape(shape)
        al_bar_t = self.alphas_cumprod[t].reshape(shape)
        al_bar_prev = self.alphas_cumprod_prev[t].reshape(shape)
        coef1 = jnp.sqrt(al_bar_prev) * (1 - al_t) / (1 - al_bar_t)
        coef2 = jnp.sqrt(al_t) * (1 - al_bar_prev) / (1 - al_bar_t)
        mean = coef1 * x0_pred + coef2 * x_t
        var = self.posterior_variance[t].reshape(shape)
        return mean, var, x0_pred
