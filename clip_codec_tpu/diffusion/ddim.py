"""DDIM sampler (layer L3) compiled as one ``jax.lax.scan`` — zero host syncs.

Behavior-parity port of the reference sampler (``diffusion/ddim.py:14-46``),
including its three deliberate deviations from textbook strided DDIM
(SURVEY.md §2.1, replicated exactly for output parity):

(a) the "previous" alpha-bar is ``alphas_cumprod_prev[t]`` on the *full*
    schedule — i.e. one fine step re-anchored at the current noise level — not
    alpha-bar at the next coarse timestep (reference ``ddim.py:35``);
(b) the final step forces ``alpha_bar_prev = 1.0`` (``ddim.py:35``);
(c) the direction term is ``sqrt(al_bar_s - sigma_t**2) * eps`` instead of the
    standard ``sqrt(1 - al_bar_s - sigma**2) * eps`` (``ddim.py:42``);
(d) ``cfg_scale`` is accepted and ignored (``ddim.py:22``), kept for API parity.

Known reference flaw, faithfully reproduced: for ``eta`` near 1 the term
``al_bar_s - sigma**2`` in (c) goes negative at high-noise timesteps, so the
output contains NaNs — verified against the actual reference (torch CPU)
which NaNs identically for ``eta=1`` on both schedules. Use ``eta=0``
(the reference's default everywhere) or small eta.

Deviations (a)+(c) are not just cosmetic: because (a) re-anchors every
update at ``alphas_cumprod_prev[t]`` (one FINE step back) and (c) scales the
noise direction by ``sqrt(al_bar_s)`` instead of ``sqrt(1 - al_bar_s)``, the
final update (where (b) forces ``al_bar_s = 1``) emits ``x0_pred + eps`` —
a full unit of predicted noise added onto the image. On trained models this
caps reconstruction around ~4 dB PSNR regardless of step count (measured,
docs/performance.md "sampler quality knee"). ``ddim_sample(standard=True)``
— exposed as sampler name ``"ddim_std"`` — therefore also provides textbook
strided DDIM (Song et al. 2021, eq. 12): target alpha-bar from the NEXT grid
point, direction ``sqrt(1 - al_bar_s - sigma^2) * eps``, terminal target
``al_bar = 1`` so the last update returns exactly ``x0_pred``. Default stays
the reference-parity form.

Where the reference runs a Python loop with two host syncs per step
(``int(t.item())`` and a tensor bool at ``ddim.py:32,41``), here the whole
trajectory is a single scan over precomputed per-step fp32 coefficients: the
update math stays in fp32 while the model may compute in bf16 internally.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import NoiseSchedule

# model_fn(x_t: (B,H,W,C), z: (B,D), t: (B,) int32) -> eps: (B,H,W,C)
ModelFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def ddim_timestep_grid(timesteps: int, steps: int) -> np.ndarray:
    """The reference's timestep grid: ``linspace(T-1, 0, steps)`` truncated to
    int (reference ``ddim.py:25``; torch's ``.long()`` truncates toward zero).
    Computed on host — the grid is static under jit."""
    return np.linspace(timesteps - 1, 0, steps).astype(np.float32).astype(np.int64)


def _step_coefficients(
    sched: NoiseSchedule, steps: int, standard: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-step ``(t, al_bar_t, al_bar_s)`` stacked for the scan (fp32).

    The timestep grid is static (host numpy); the table lookups are traced
    gathers so the schedule can be a jit argument.

    ``standard=False`` (reference parity): ``al_bar_s`` is the full-schedule
    previous alpha-bar at the CURRENT timestep (deviation (a)) with the final
    entry forced to 1 (deviation (b)). ``standard=True``: ``al_bar_s`` is
    alpha-bar at the NEXT coarse grid point — the textbook stride — with the
    terminal target ``al_bar = 1``.
    """
    ts = ddim_timestep_grid(sched.timesteps, steps)
    t_stack = jnp.asarray(ts, dtype=jnp.int32)
    al_bar_t = sched.alphas_cumprod[t_stack]
    if standard:
        al_bar_s = jnp.concatenate([al_bar_t[1:], jnp.ones((1,), jnp.float32)])
    else:
        al_bar_s = sched.alphas_cumprod_prev[t_stack]
        al_bar_s = al_bar_s.at[-1].set(1.0)  # final step forces alpha_bar_prev = 1 (ddim.py:35)
    return t_stack, al_bar_t, al_bar_s


@partial(jax.jit, static_argnames=("model_fn", "shape", "steps", "stochastic", "standard"))
def _ddim_sample(
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: jax.Array,
    shape: Tuple[int, ...],
    steps: int,
    eta: jax.Array,
    rng: Optional[jax.Array],
    x_T: Optional[jax.Array],
    model_params,
    stochastic: bool,
    standard: bool,
) -> jax.Array:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape, dtype=jnp.float32) if x_T is None else x_T.astype(jnp.float32)

    t_stack, abt_stack, abs_stack = _step_coefficients(sched, steps, standard)

    def step(carry, per_step):
        x, rng = carry
        t, abt, ab_s = per_step
        t_b = jnp.full((shape[0],), t, dtype=jnp.int32)
        if model_params is None:
            eps = model_fn(x, z, t_b).astype(jnp.float32)
        else:
            eps = model_fn(model_params, x, z, t_b).astype(jnp.float32)
        x0_pred = (x - jnp.sqrt(1.0 - abt) * eps) / jnp.sqrt(abt)
        x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        sigma = eta * jnp.sqrt((1.0 - ab_s) / (1.0 - abt) * (1.0 - abt / ab_s))
        if standard:
            # Song et al. 2021 eq. 12; the relu guards eta=1 rounding where
            # 1 - ab_s - sigma^2 can land a hair below zero.
            dir_xt = jnp.sqrt(jax.nn.relu(1.0 - ab_s - sigma**2)) * eps
        else:
            dir_xt = jnp.sqrt(ab_s - sigma**2) * eps  # nonstandard, see (c)
        x_new = jnp.sqrt(ab_s) * x0_pred + dir_xt
        if stochastic:
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, shape, dtype=jnp.float32)
            x_new = x_new + jnp.where(sigma > 0, sigma, 0.0) * noise
        return (x_new, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), (t_stack, abt_stack, abs_stack))
    return x


def ddim_sample(
    model_fn: ModelFn,
    sched: NoiseSchedule,
    z: jax.Array,
    shape: Tuple[int, ...],
    steps: int = 50,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    x_T: Optional[jax.Array] = None,
    model_params=None,
    standard: bool = False,
) -> jax.Array:
    """Sample images of ``shape`` = (B, H, W, C) conditioned on ``z`` (B, D).

    ``rng`` seeds both the initial noise (when ``x_T`` is None) and, for
    ``eta > 0``, the per-step stochastic noise injection.

    ``standard=True`` switches to textbook strided DDIM (module docstring);
    the default replicates the reference sampler bit-for-bit in intent.

    ``eta`` is a TRACED argument: only ``eta == 0`` vs ``eta > 0`` selects a
    compiled specialization (the noise-injection branch must be static), so
    an eta-sweep eval reuses one stochastic program instead of recompiling
    the full 50-step trajectory per distinct float.

    ``model_params``: when given, ``model_fn(model_params, x, z, t)`` is
    called with the params as a traced jit ARGUMENT instead of a closure
    constant — required for large models over remote-compile transports
    (closure constants are serialized into the program body; ~600MB fails).
    """
    return _ddim_sample(
        model_fn, sched, z, tuple(shape), steps, jnp.float32(eta), rng, x_T,
        model_params, bool(eta > 0), bool(standard),
    )


@dataclass
class DDIMSampler:
    """Class wrapper mirroring the reference API (``DDIMSampler(sch, eta).sample``).

    ``standard=True`` selects the textbook strided update (sampler name
    ``"ddim_std"`` in :func:`make_sampler`); default is reference parity.
    """

    sched: NoiseSchedule
    eta: float = 0.0
    standard: bool = False

    def sample(
        self,
        model_fn: ModelFn,
        z: jax.Array,
        shape: Tuple[int, ...],
        steps: int = 50,
        cfg_scale: float = 1.0,
        x_T: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        model_params=None,
    ) -> jax.Array:
        del cfg_scale  # accepted and ignored, as in the reference (ddim.py:22)
        return ddim_sample(model_fn, self.sched, z, tuple(shape), steps, self.eta,
                           rng, x_T, model_params, standard=self.standard)
