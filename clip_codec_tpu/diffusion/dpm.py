"""DPM-Solver++(2M) sampler — beyond-reference fast serving mode (layer L3).

A deterministic second-order multistep solver for the diffusion
probability-flow ODE (Lu et al. 2022, "DPM-Solver++", arXiv:2211.01095) in
the data-prediction formulation with the "midpoint" second-order term — the
same algorithm the diffusers ``DPMSolverMultistepScheduler`` defaults to.
Measured on a trained model (docs/performance.md "Sampler quality knee"):
dpmpp matches-or-beats textbook ``ddim_std`` at EVERY step count — already
at 5 steps it exceeds ddim_std-50 by +0.9 dB and the reference's own
DDIM-50 by +7.9 dB — and the model evaluations are the entire serving cost,
so ``--sampler dpmpp --steps 10`` serves ~5x faster than DDIM-50 at
strictly better measured quality. Caveat (measured, same doc): on an
UNDERTRAINED model the 2M extrapolation amplifies model error and
first-order ``ddim_std`` at 25-50 steps wins by ~2.5 dB — prefer
``ddim_std`` for mid-training eval, ``dpmpp`` for converged models.

The reference ships only its (nonstandard) DDIM sampler
(``diffusion/ddim.py:14-46``); this module is additional surface. Execution
shape matches ``ddim.py``: the whole trajectory is ONE ``jax.lax.scan`` over
precomputed fp32 per-step coefficients — zero host syncs, and the update is
three fused multiply-adds, so per-step cost equals DDIM's and throughput
scales ~linearly with the step count.

Math (x0-prediction).  With ``alpha = sqrt(abar)``, ``sigma = sqrt(1-abar)``,
``lambda = log(alpha/sigma)`` and per step ``h = lambda_tgt - lambda_src > 0``:

* first order:    ``x <- (sig_t/sig_s) x - alpha_t (e^{-h} - 1) m0``
* 2M (midpoint):  first order  ``- 0.5 alpha_t (e^{-h} - 1) (h/h_prev) (m0 - m_prev)``

where ``m0`` is the current x0-prediction, ``m_prev`` the previous step's, and
``h_prev`` the lambda spacing between the two most recent model evaluations.
The first step has no ``m_prev``, and the FINAL step is always first-order
("lower-order final"): the pixel grid's terminal target is ``abar = 1`` where
``sigma_t = 0`` and ``h = +inf`` — there the first-order update reduces
exactly to ``x = m0`` while the second-order term diverges. diffusers applies
the same switch below 15 steps; we apply it unconditionally (at >=15 steps it
changes one update at the trajectory's smallest h, measured immaterial).

Exactness pins (tests/test_dpm.py): for delta-distributed data the solver
recovers x0 exactly at ANY step count; against an independent numpy stepper
it matches to fp32 roundoff; on an x-dependent synthetic score it converges
at second order (error ~4x down per step doubling).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import ModelFn, ddim_timestep_grid
from .schedule import NoiseSchedule


def dpmpp_coefficients(ab_src: jax.Array, ab_tgt: jax.Array):
    """Per-step 2M update coefficients ``(c_skip, c0, c1)`` from the source /
    target ``alphas_cumprod`` grids (each shape ``(steps,)``, trajectory
    order: decreasing noise, so ``ab_tgt > ab_src`` elementwise).

    Traced jnp math so the schedule can ride as a jit argument (same design
    as ``ddim._step_coefficients``). ``ab_tgt[-1] == 1`` is supported:
    ``lambda_tgt = +inf`` there, handled by the lower-order-final masking
    (``c_skip -> 0``, ``c0 -> alpha_t = 1``, ``c1 -> 0``) so the last update
    is exactly ``x = m0``.
    """
    ab_src = jnp.asarray(ab_src, jnp.float32)
    ab_tgt = jnp.asarray(ab_tgt, jnp.float32)
    a_s, s_s = jnp.sqrt(ab_src), jnp.sqrt(1.0 - ab_src)
    a_t, s_t = jnp.sqrt(ab_tgt), jnp.sqrt(1.0 - ab_tgt)
    lam_s = jnp.log(a_s) - jnp.log(s_s)
    lam_t = jnp.log(a_t) - jnp.log(s_t)  # +inf when ab_tgt == 1
    h = lam_t - lam_s
    c_skip = jnp.where(jnp.isfinite(lam_t), s_t / s_s, 0.0)
    c0 = -a_t * jnp.expm1(-h)  # expm1(-inf) = -1  ->  c0 = a_t
    n = ab_src.shape[0]
    # lambda spacing between consecutive model evaluations; the [0] entry is
    # a placeholder (masked out below — the first step is first-order).
    h_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), lam_s[1:] - lam_s[:-1]])
    second = (jnp.arange(n) != 0) & (jnp.arange(n) != n - 1)
    # where() selects, it does not multiply — an inf in the dead branch (the
    # final step's h) never becomes a NaN in the kept value.
    c1 = jnp.where(second, -0.5 * a_t * jnp.expm1(-h) * (h / h_prev), 0.0)
    return c_skip, c0, c1


@partial(jax.jit, static_argnames=("model_fn", "shape", "steps", "clip_x0"))
def _dpmpp_sample(
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: jax.Array,
    shape: Tuple[int, ...],
    steps: int,
    rng: Optional[jax.Array],
    x_T: Optional[jax.Array],
    model_params,
    clip_x0: bool,
) -> jax.Array:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, dtype=jnp.float32) if x_T is None else x_T.astype(jnp.float32)

    # Same source grid as the DDIM headline (linspace(T-1, 0, steps)) so an
    # N-step DPM++ run makes exactly N model evaluations like N-step DDIM —
    # fair step-for-step comparisons. Targets are the next source; the final
    # target is abar = 1 (x0), mirroring the reference DDIM's terminal step.
    ts = ddim_timestep_grid(sched.timesteps, steps)
    t_stack = jnp.asarray(ts, dtype=jnp.int32)
    ab_src = sched.alphas_cumprod[t_stack]
    ab_tgt = jnp.concatenate([ab_src[1:], jnp.ones((1,), jnp.float32)])
    c_skip, c0, c1 = dpmpp_coefficients(ab_src, ab_tgt)
    sqrt_ab = jnp.sqrt(ab_src)
    sqrt_1mab = jnp.sqrt(1.0 - ab_src)

    def step(carry, per):
        x, m_prev = carry
        t, sa, sb, cs, k0, k1 = per
        t_b = jnp.full((shape[0],), t, dtype=jnp.int32)
        if model_params is None:
            eps = model_fn(x, z, t_b).astype(jnp.float32)
        else:
            eps = model_fn(model_params, x, z, t_b).astype(jnp.float32)
        m0 = (x - sb * eps) / sa
        if clip_x0:
            m0 = jnp.clip(m0, -1.0, 1.0)
        x_new = cs * x + k0 * m0 + k1 * (m0 - m_prev)
        return (x_new, m0), None

    (x, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x)), (t_stack, sqrt_ab, sqrt_1mab, c_skip, c0, c1)
    )
    return x


def dpmpp_sample(
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: jax.Array,
    shape: Tuple[int, ...],
    steps: int = 20,
    rng: Optional[jax.Array] = None,
    x_T: Optional[jax.Array] = None,
    model_params=None,
    clip_x0: bool = True,
) -> jax.Array:
    """Sample images of ``shape`` = (B, H, W, C) conditioned on ``z`` (B, D)
    with DPM-Solver++(2M) — deterministic (the eta=0 regime; for stochastic
    sampling use ``ddim_sample(eta>0)`` / ``ddpm_sample``).

    ``clip_x0`` clips each x0-prediction to [-1, 1] like the reference's DDIM
    does (``ddim.py:39``) — correct for pixel-space models; pass False for
    latent-space models.

    ``model_params``: same contract as ``ddim_sample`` — when given,
    ``model_fn(model_params, x, z, t)`` receives the params as a traced jit
    ARGUMENT (required for large models over remote-compile transports).
    """
    return _dpmpp_sample(
        model_fn, sched, z, tuple(shape), int(steps), rng, x_T, model_params, bool(clip_x0)
    )


@dataclass
class DPMSolverPP:
    """Class wrapper mirroring :class:`DDIMSampler`'s shape (drop-in for
    ``eta=0`` call sites; ``cfg_scale`` accepted-and-ignored likewise)."""

    sched: NoiseSchedule

    def sample(
        self,
        model_fn: ModelFn,
        z: jax.Array,
        shape: Tuple[int, ...],
        steps: int = 20,
        cfg_scale: float = 1.0,
        x_T: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        model_params=None,
    ) -> jax.Array:
        del cfg_scale
        return dpmpp_sample(model_fn, self.sched, z, tuple(shape), steps, rng, x_T, model_params)
