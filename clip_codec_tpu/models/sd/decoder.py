"""Stable-Diffusion latent decoder with a trainable CLIP adapter (layer L4).

Parity rebuild of the reference's SD path (``models/sd_decoder.py:11-90``):

* :class:`SDClipAdapter` — LayerNorm -> Linear(512->1024) -> SiLU -> Linear
  to ``ctx_dim * n_tokens`` pseudo-tokens for cross-attention
  (``sd_decoder.py:21-30``); instantiated with n_tokens=8 (``:45-50``);
* :class:`StableDiffusionDecoder` — frozen VAE + UNet (converted SD-1.5
  weights), trainable adapter, ``scaling_factor`` 0.18215 (``:43``);
* :meth:`StableDiffusionDecoder.sample` — DDIM with classifier-free guidance
  using ``adapter(0)`` as the null embedding (``:76-90``), compiled as one
  ``lax.scan``. The scheduler replicates diffusers' SD-1.5 DDIMScheduler:
  scaled-linear betas (0.00085 -> 0.012), "leading" timestep spacing with
  steps_offset=1, ``set_alpha_to_one=False``, eps-prediction, no sample clip.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...diffusion.dpm import dpmpp_coefficients
from .unet import SD15_UNET, SDUNet, SDUNetConfig
from .vae import SD15_VAE, AutoencoderKL, VAEConfig

Dtype = Any
SD_SCALING_FACTOR = 0.18215


class SDClipAdapter(nn.Module):
    """CLIP embedding (B, in_dim) -> (B, n_tokens, ctx_dim) pseudo-tokens."""

    in_dim: int = 512
    ctx_dim: int = 768
    hidden: int = 1024
    n_tokens: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype, name="ln")(z.astype(self.dtype))
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.ctx_dim * self.n_tokens, dtype=self.dtype, name="fc2")(h)
        return h.reshape(z.shape[0], self.n_tokens, self.ctx_dim)


# ------------------------------------------------------- SD DDIM scheduler

def sd_alphas_cumprod(timesteps: int = 1000) -> np.ndarray:
    """Scaled-linear schedule: betas = linspace(sqrt(b0), sqrt(b1), T)^2."""
    betas = np.linspace(0.00085**0.5, 0.012**0.5, timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def sd_ddim_timesteps(steps: int, timesteps: int = 1000, steps_offset: int = 1) -> np.ndarray:
    """diffusers "leading" spacing: arange(steps) * (T//steps) + offset,
    descending."""
    ratio = timesteps // steps
    ts = (np.arange(steps) * ratio).round().astype(np.int64) + steps_offset
    return ts[::-1].copy()


@dataclass
class SDSchedulerTables:
    alphas_cumprod: np.ndarray
    final_alpha_cumprod: float  # set_alpha_to_one=False -> alphas_cumprod[0]

    @classmethod
    def create(cls, timesteps: int = 1000) -> "SDSchedulerTables":
        ac = sd_alphas_cumprod(timesteps)
        return cls(alphas_cumprod=ac, final_alpha_cumprod=float(ac[0]))


class StableDiffusionDecoder:
    """Frozen SD-1.5 VAE+UNet with a trainable CLIP adapter.

    ``params`` split: ``vae_params`` / ``unet_params`` are frozen (never in
    any optimizer), ``adapter_params`` train. All apply paths are jitted.
    """

    def __init__(
        self,
        vae_params: Dict,
        unet_params: Dict,
        adapter_params: Optional[Dict] = None,
        clip_dim: int = 512,
        n_tokens: int = 8,
        unet_cfg: SDUNetConfig = SD15_UNET,
        vae_cfg: VAEConfig = SD15_VAE,
        dtype=jnp.bfloat16,
        rng: Optional[jax.Array] = None,
        int8: Optional[bool] = None,
        flash: Optional[bool] = None,
        timesteps: int = 1000,
    ) -> None:
        # int8: UNet interior on the int8 MXU (serving mode; measured +9.4%
        # at B=8, quality trade in docs/performance.md). The VAE stays fp
        # (decode quality, and it is a small share of sampling time).
        # flash: Pallas flash attention (None = auto on TPU).
        self.unet = SDUNet(unet_cfg, dtype=dtype, int8=int8, flash=flash)
        self.vae = AutoencoderKL(vae_cfg, dtype=dtype, flash=flash)
        self.adapter = SDClipAdapter(
            in_dim=clip_dim, ctx_dim=unet_cfg.cross_dim, n_tokens=n_tokens, dtype=jnp.float32
        )
        self.vae_params = vae_params
        self.unet_params = unet_params
        if adapter_params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            adapter_params = self.adapter.init(rng, jnp.zeros((1, clip_dim), jnp.float32))["params"]
        self.adapter_params = adapter_params
        self.scaling_factor = SD_SCALING_FACTOR
        # Schedule LENGTH (1000 for real SD-1.5; short for test-scale
        # models) — sampling grids and int8 calibration both derive from it.
        self.timesteps = int(timesteps)
        self.tables = SDSchedulerTables.create(self.timesteps)
        # Static int8 activation scales for the UNet ('quant' collection,
        # set by calibrate_int8_scales); None = dynamic per-tensor quant.
        self.unet_quant: Optional[Dict] = None

    # ----- VAE
    def encode(self, x_m11: jax.Array, rng: jax.Array) -> jax.Array:
        """[-1,1] images -> scaled latents (reference ``encode``, :53-57)."""
        moments = self.vae.apply({"params": self.vae_params}, x_m11, method=AutoencoderKL.encode_moments)
        lat = self.vae.apply({"params": self.vae_params}, moments, rng, method=AutoencoderKL.sample_latents)
        return lat * self.scaling_factor

    def decode(self, latents: jax.Array) -> jax.Array:
        """Scaled latents -> [-1,1] images (reference ``decode``, :59-63)."""
        return self.vae.apply(
            {"params": self.vae_params}, latents / self.scaling_factor, method=AutoencoderKL.decode
        )

    def calibrate_int8_scales(self, z_clip: jax.Array, shape, timesteps=None) -> None:
        """Record static per-layer activation absmax for the int8 UNet (the
        measured-best serving mode: the dynamic per-layer absmax reductions
        cost 3.6x at B=1, docs/performance.md). One fp pass per calibration
        timestep on noise-scale latents; scales are stored on the decoder
        and ride every subsequent ``sample``/``forward`` call.

        ``timesteps``: None (default) takes the 95%/50%/5% points of the
        decoder's OWN schedule length — same policy as
        :func:`ops.int8.calibrate_unet` — so a short-schedule model
        calibrates inside its real sampling range; or an explicit sequence
        of absolute t values."""
        from ...ops.int8 import calibrate_int8

        if timesteps is None:
            T = self.timesteps
            timesteps = [max(0, min(T - 1, int(round(f * T))))
                         for f in (0.95, 0.5, 0.05)]

        cond = self.adapter.apply({"params": self.adapter_params}, z_clip)
        # CFG evaluates the UNet on BOTH branches every step — calibrate the
        # adapter(0) null context too, or the uncond pass runs on scales it
        # never saw and can clip (review r3b #1).
        uncond = self.adapter.apply({"params": self.adapter_params}, jnp.zeros_like(z_clip))
        rng = jax.random.PRNGKey(0)
        lat = jax.random.normal(rng, shape, jnp.float32)
        batches = [
            (lat, jnp.full((shape[0],), int(t), jnp.int32), ctx)
            for t in timesteps
            for ctx in (cond, uncond)
        ]
        self.unet_quant = calibrate_int8(
            self.unet.apply, {"params": self.unet_params}, *batches
        )

    def _unet_vars(self) -> Dict:
        if self.unet_quant is not None:
            return {"params": self.unet_params, "quant": self.unet_quant}
        return {"params": self.unet_params}

    # ----- eps prediction (adapter differentiable; adapter/UNet/VAE frozen)
    def forward(self, latents_t: jax.Array, z_clip: jax.Array, t: jax.Array,
                adapter_params: Optional[Dict] = None) -> jax.Array:
        cond = self.adapter.apply({"params": adapter_params or self.adapter_params}, z_clip)
        return self.unet.apply(self._unet_vars(), latents_t, t, cond)

    __call__ = forward

    # ----- CFG DDIM sampling as one scan
    def sample(
        self,
        z_clip: jax.Array,
        shape: Tuple[int, int, int, int],
        steps: int = 30,
        eta: float = 0.0,
        guidance_scale: float = 5.0,
        rng: Optional[jax.Array] = None,
        decode_pixels: bool = True,
        cfg_batched: Optional[bool] = None,
        sampler: str = "ddim",
    ) -> jax.Array:
        """shape is (B, H, W, C) latents. Returns decoded [-1,1] images
        (reference ``sample``, :76-90) or raw latents. Plain CFG sampling is
        the ``inv_weight=0`` case of :meth:`sample_with_inversion` — one DDIM
        step implementation, no duplicated update math.

        ``sampler``: ``"ddim"`` (reference parity, any eta) or ``"dpmpp"``
        (DPM-Solver++(2M), deterministic — DDIM-30-class quality at ~half the
        UNet evaluations; the UNet evaluations ARE the serving cost)."""
        return self.sample_with_inversion(
            z_clip, z_clip, None, shape, steps=steps, eta=eta,
            guidance_scale=guidance_scale, inv_weight=0.0, rng=rng,
            decode_pixels=decode_pixels, cfg_batched=cfg_batched,
            sampler=sampler,
        )

    # ----- CFG DDIM with test-time feature-inversion guidance
    def sample_with_inversion(
        self,
        z_clip: jax.Array,
        z_target: jax.Array,
        embed_fn,
        shape: Tuple[int, int, int, int],
        steps: int = 30,
        eta: float = 0.0,
        guidance_scale: float = 5.0,
        inv_weight: float = 1.0,
        inv_every: int = 1,
        rng: Optional[jax.Array] = None,
        decode_pixels: bool = True,
        cfg_batched: Optional[bool] = None,
        sampler: str = "ddim",
    ) -> jax.Array:
        """CFG DDIM plus the reference's gradient-based feature inversion
        (``cli/reconstruct_sd_diffusion.py:161-181``): every ``inv_every``
        steps, Tweedie x̂0 -> VAE decode -> ``embed_fn`` -> cosine loss
        against ``z_target`` -> d(loss)/d(latent), then a global-norm-
        normalized gradient step ``lat -= inv_weight * g/(|g|+1e-8)`` before
        the DDIM update. ``embed_fn`` maps [-1,1] NHWC images to embeddings
        (CLIP or DINOv2 — auto-picked by the CLI from the bitstream dim).

        The whole trajectory is ONE jitted program; the frozen UNet/VAE and
        adapter parameter trees ride it as ARGUMENTS — at SD-1.5 scale a
        closure-captured UNet serializes ~3.4 GB into the program body,
        which breaks remote-compile transports (same rule as the trainer;
        pinned by a no-large-constants regression test).

        ``cfg_batched`` folds the (uncond, cond) CFG pair into ONE UNet
        forward at batch 2B instead of the reference's two sequential
        forwards. Same per-sample math (batch is never a reduction axis);
        measured on v5e it is the latency mode: +16% at B=1 (1.29 -> 1.49
        img/s DDIM-30+CFG 512px e2e) but -3% at B=8 where 2B is past the
        MXU saturation knee. Default (None) auto-picks: batched for B <= 4,
        sequential above."""
        if sampler not in ("ddim", "dpmpp"):
            raise ValueError(f"unknown sampler {sampler!r}; choose 'ddim' or 'dpmpp'")
        if sampler == "dpmpp" and eta != 0.0:
            raise ValueError("DPM-Solver++ is deterministic: eta must be 0.0")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if cfg_batched is None:
            cfg_batched = shape[0] <= 4
        # guidance_scale rides as a TRACED scalar: it is only arithmetic, and
        # a static arg would recompile the whole SD program per CFG value
        # (1-5 min per sweep point over remote transports). eta/inv_weight
        # stay static — they gate trace structure via Python `if`.
        return _cfg_ddim_sample(
            self.unet, self.vae, self.adapter,
            self._unet_vars(), self.vae_params, self.adapter_params,
            z_clip, z_target, rng, jnp.float32(guidance_scale),
            embed_fn=embed_fn, shape=tuple(shape), steps=int(steps),
            eta=float(eta),
            inv_weight=float(inv_weight), inv_every=int(inv_every),
            decode_pixels=bool(decode_pixels), scaling=self.scaling_factor,
            cfg_batched=bool(cfg_batched), sampler=str(sampler),
            timesteps=self.timesteps,
        )


@partial(
    jax.jit,
    static_argnames=(
        "unet", "vae", "adapter", "embed_fn", "shape", "steps", "eta",
        "inv_weight", "inv_every", "decode_pixels", "scaling", "cfg_batched",
        "sampler", "timesteps",
    ),
)
def _cfg_ddim_sample(
    unet, vae, adapter, unet_vars, vae_params, adapter_params,
    z_clip, z_target, rng, guidance_scale, *, embed_fn, shape, steps, eta,
    inv_weight, inv_every, decode_pixels, scaling, cfg_batched=True,
    sampler="ddim", timesteps=1000,
):
    """CFG DDIM (+ optional inversion guidance) as one compiled program.
    Modules and numbers are static (flax modules hash by structure); every
    parameter tree is a traced argument, never a closure constant."""
    rng, init_rng = jax.random.split(rng)
    lat = jax.random.normal(init_rng, shape, dtype=jnp.float32)

    cond = adapter.apply({"params": adapter_params}, z_clip)
    uncond = adapter.apply({"params": adapter_params}, jnp.zeros_like(z_clip))
    # CFG runs the UNet on BOTH contexts every step. The reference issues two
    # sequential forwards (cli/reconstruct_sd_diffusion.py:162-163); with
    # ``cfg_batched`` the (uncond, cond) pair rides ONE forward at batch 2B —
    # per-sample math is unchanged (batch is not a reduction axis anywhere in
    # the UNet) and low-batch MXU utilization moves to the 2B point on the
    # measured scaling curve (12.9 -> 10.4 ms/img from B=1 to B=2,
    # docs/performance.md). Above the saturation knee (~B=8 per forward) the
    # sequential form is marginally better — sample_with_inversion auto-picks.
    ctx2 = jnp.concatenate([uncond, cond], axis=0) if cfg_batched else None
    z_tgt = z_target / jnp.maximum(jnp.linalg.norm(z_target, axis=-1, keepdims=True), 1e-9)

    tables = SDSchedulerTables.create(timesteps)
    ts = sd_ddim_timesteps(steps, timesteps)
    ac = tables.alphas_cumprod
    abt = jnp.asarray(ac[ts], jnp.float32)
    prev_ts = ts - (timesteps // steps)
    ab_prev = jnp.asarray(
        np.where(prev_ts >= 0, ac[np.maximum(prev_ts, 0)], tables.final_alpha_cumprod),
        jnp.float32,
    )
    t_stack = jnp.asarray(ts, jnp.int32)
    inv_gate = jnp.asarray((np.arange(steps) % max(1, inv_every)) == 0)
    if sampler == "dpmpp":
        # DPM-Solver++(2M) over the same "leading" source grid, so an N-step
        # dpmpp run makes exactly N UNet evaluations like N-step DDIM. The
        # target grid is the next source timestep (== DDIM's ab_prev grid);
        # the FINAL target is abar=1 — diffusers' DPMSolverMultistepScheduler
        # ``final_sigmas_type="zero"`` default — where the lower-order-final
        # masking in dpmpp_coefficients makes the last update exactly x = m0
        # (the DDIM surface instead keeps set_alpha_to_one=False parity).
        ab_tgt = jnp.concatenate([abt[1:], jnp.ones((1,), jnp.float32)])
        cs_k, c0_k, c1_k = dpmpp_coefficients(abt, ab_tgt)
        per_stack = (t_stack, abt, cs_k, c0_k, c1_k, inv_gate)
    else:
        per_stack = (t_stack, abt, ab_prev, inv_gate)

    def decode(lat_):
        return vae.apply({"params": vae_params}, lat_ / scaling, method=AutoencoderKL.decode)

    def unet_eps(lat, t_b, ctx):
        # unet_vars carries {'params'} or {'params','quant'} (static int8
        # activation scales) — a pytree argument either way
        return unet.apply(unet_vars, lat, t_b, ctx).astype(jnp.float32)

    def feat_loss(lat, eps, a_t):
        lat_x0 = (lat - jnp.sqrt(1 - a_t) * jax.lax.stop_gradient(eps)) / jnp.sqrt(a_t)
        x0 = jnp.clip(decode(lat_x0).astype(jnp.float32), -1.0, 1.0)
        y = embed_fn(x0)
        y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-9)
        return 1.0 - jnp.mean(jnp.sum(y * z_tgt, axis=-1))

    grad_fn = jax.grad(feat_loss)

    def step(carry, per):
        lat, m_prev, rng = carry
        if sampler == "dpmpp":
            t, a_t, cs, k0, k1, do_inv = per
        else:
            t, a_t, a_prev, do_inv = per
        if cfg_batched:
            t2 = jnp.full((2 * shape[0],), t, jnp.int32)
            eps2 = unet_eps(jnp.concatenate([lat, lat], axis=0), t2, ctx2)
            eps_u, eps_c = eps2[: shape[0]], eps2[shape[0]:]
        else:
            t_b = jnp.full((shape[0],), t, jnp.int32)
            eps_u = unet_eps(lat, t_b, uncond)
            eps_c = unet_eps(lat, t_b, cond)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        if inv_weight > 0:
            def guided(lat):
                g = grad_fn(lat, eps, a_t)
                return lat - inv_weight * g / (jnp.linalg.norm(g) + 1e-8)

            lat = jax.lax.cond(do_inv, guided, lambda l: l, lat)
        x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        if sampler == "dpmpp":
            # x0-prediction 2M update (diffusion/dpm.py math, unclipped —
            # latent space). m_prev is the previous step's x0-prediction.
            lat_new = cs * lat + k0 * x0 + k1 * (x0 - m_prev)
            m_prev = x0
        else:
            sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t)) * jnp.sqrt(1 - a_t / a_prev)
            dir_xt = jnp.sqrt(1 - a_prev - sigma**2) * eps
            lat_new = jnp.sqrt(a_prev) * x0 + dir_xt
            if eta > 0:
                rng, nrng = jax.random.split(rng)
                lat_new = lat_new + sigma * jax.random.normal(nrng, shape, jnp.float32)
        return (lat_new, m_prev, rng), None

    (lat, _, _), _ = jax.lax.scan(step, (lat, jnp.zeros_like(lat), rng), per_stack)
    return decode(lat) if decode_pixels else lat
