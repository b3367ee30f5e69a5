"""Adapter training on the frozen Stable-Diffusion latent path (layer L5).

Rebuild of the reference ``train_sd_diffusion``
(``train/sd_diffusion_train.py:91-341``) implementing its **intended**
behavior — the reference file is visibly WIP/broken (SURVEY.md §2.1:
``epoch_lpips`` used before init at ``:299``, ``v_lpips`` NameErrors at
``:297``, the ``perc_w`` argument shadowed by a hard-coded 0.05 at ``:256``,
double GradScaler at ``:153-155``). Divergences from the reference, chosen
deliberately and kept visible here:

* only the adapter trains (same as reference ``:152``); UNet/VAE params never
  enter the optimizer and get no gradients;
* loss = eps-MSE + recon_w * MSE(x0-decode, gt-latent-decode) — MSE, matching
  the reference's code (``:237``) over its docstring's claimed L1 —
  + tv_w * TV + dino_w * (1 - cos(DINO(x̂), DINO(gt))) when a DINO encoder is
  supplied + perc_w * LPIPS(x̂, gt) every ``perc_every`` steps when LPIPS
  weights are available (``perc_w`` actually honored);
* bookkeeping is correct: epoch means over defined values only.

Per-epoch artifact keeps the reference's adapter-only shape: a msgpack of
just the adapter params, loadable by ``cli/reconstruct_sd_diffusion``.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io.store import Store
from ..models.sd import StableDiffusionDecoder, sd_alphas_cumprod
from ..models.sd.vae import AutoencoderKL
from ..utils.checkpoint import save_params
from ..utils.logging import TrainLogger
from .losses import total_variation, weighted_mean

PathLike = Union[str, Path]


@dataclass
class SDTrainConfig:
    """Mirrors the reference kwargs (``train/sd_diffusion_train.py:91-120``)."""

    epochs: int = 20
    batch_size: int = 4
    lr: float = 1e-4
    timesteps: int = 1000
    recon_w: float = 0.1
    tv_w: float = 1e-4
    dino_w: float = 0.1
    perc_w: float = 0.05
    perc_every: int = 10
    seed: int = 0
    log_every: int = 0


class SDStoreData:
    """Store view over ``manifest_latents.json``: (z, latent, image path)."""

    def __init__(self, store_dir: PathLike, image_size: int = 512) -> None:
        self.store = Store.open(store_dir, manifest_name="manifest_latents.json")
        self.image_size = image_size
        self.z = self.store.decode_all(renormalize=True)

    def __len__(self) -> int:
        return len(self.store)

    @property
    def z_dim(self) -> int:
        return int(self.z.shape[1])

    def batch(self, idx: np.ndarray):
        lats, imgs = [], []
        from .data import load_image_m11

        for i in idx:
            rec = self.store.manifest[int(i)]
            lat = np.load(rec["latent"])["lat"].astype(np.float32)  # (4, h, w) CHW fp16
            lats.append(lat.transpose(1, 2, 0))
            imgs.append(load_image_m11(rec["image"], self.image_size))
        return self.z[idx], np.stack(lats), np.stack(imgs)


def train_sd_diffusion(
    store_dir: PathLike,
    decoder: StableDiffusionDecoder,
    epochs: int = 20,
    batch_size: int = 4,
    lr: float = 1e-4,
    save_dir: Optional[PathLike] = None,
    dino_embed_fn: Optional[Callable] = None,
    lpips_model=None,
    config: Optional[SDTrainConfig] = None,
    image_size: int = 512,
) -> Path:
    """Train the CLIP adapter against precomputed latents. Returns the final
    adapter checkpoint path (per-epoch ``sd_adapter_ep{N}.msgpack`` cadence,
    reference ``:332-338``)."""
    cfg = config or SDTrainConfig(epochs=epochs, batch_size=batch_size, lr=lr)
    save_dir = Path(save_dir or store_dir)
    data = SDStoreData(store_dir, image_size=image_size)
    tx = optax.adamw(cfg.lr)
    adapter_params = decoder.adapter_params
    opt_state = tx.init(adapter_params)
    ac = jnp.asarray(sd_alphas_cumprod(cfg.timesteps))

    unet_apply = decoder.unet.apply
    unet_params = decoder.unet_params
    vae = decoder.vae
    vae_params = decoder.vae_params
    adapter_apply = decoder.adapter.apply
    scaling = decoder.scaling_factor

    def loss_fn(a_params, z, lat0, gt_img, t, noise, weight, perc_on):
        sa = jnp.sqrt(ac[t])[:, None, None, None]
        sb = jnp.sqrt(1.0 - ac[t])[:, None, None, None]
        lat_t = sa * lat0 + sb * noise
        cond = adapter_apply({"params": a_params}, z)
        eps_hat = unet_apply({"params": unet_params}, lat_t, t, cond).astype(jnp.float32)
        per = jnp.mean((eps_hat - noise) ** 2, axis=(1, 2, 3))
        need_decode = cfg.recon_w > 0 or cfg.tv_w > 0 or (dino_embed_fn is not None and cfg.dino_w > 0) or lpips_model is not None
        if need_decode:
            lat0_hat = (lat_t - sb * eps_hat) / sa
            x_hat = vae.apply({"params": vae_params}, lat0_hat / scaling, method=AutoencoderKL.decode).astype(jnp.float32)
            if cfg.recon_w > 0:
                x_gt = vae.apply({"params": vae_params}, lat0 / scaling, method=AutoencoderKL.decode).astype(jnp.float32)
                per = per + cfg.recon_w * jnp.mean((x_hat - x_gt) ** 2, axis=(1, 2, 3))
            if cfg.tv_w > 0:
                per = per + cfg.tv_w * total_variation(x_hat)
            if dino_embed_fn is not None and cfg.dino_w > 0:
                ya = dino_embed_fn(x_hat)
                yb = jax.lax.stop_gradient(dino_embed_fn(gt_img))
                cos = jnp.sum(ya * yb, axis=-1) / (
                    jnp.linalg.norm(ya, axis=-1) * jnp.linalg.norm(yb, axis=-1) + 1e-8
                )
                per = per + cfg.dino_w * (1.0 - cos)
            if perc_on and lpips_model is not None and cfg.perc_w > 0:
                # perc_on is STATIC: the VGG16 forward+VJP is only traced into
                # the every-perc_every-steps specialization instead of running
                # (and being zeroed) on every step.
                from ..eval.lpips import lpips_forward

                gt_small = jax.image.resize(gt_img, x_hat.shape, method="bilinear", antialias=False)
                per = per + cfg.perc_w * lpips_forward(lpips_model.params, x_hat, gt_small)
        return weighted_mean(per, weight)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("perc_on",))
    def step_fn(a_params, opt_state, z, lat0, gt_img, weight, rng, perc_on):
        t_rng, n_rng = jax.random.split(rng)
        b = lat0.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, cfg.timesteps, dtype=jnp.int32)
        noise = jax.random.normal(n_rng, lat0.shape, dtype=jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(a_params, z, lat0, gt_img, t, noise, weight, perc_on)
        updates, opt_state = tx.update(grads, opt_state, a_params)
        return optax.apply_updates(a_params, updates), opt_state, loss

    logger = TrainLogger(log_every=cfg.log_every)
    host_rng = np.random.default_rng(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    n = len(data)
    step = 0
    from ..utils.batching import padded_index_batches

    for ep in range(cfg.epochs):
        order = host_rng.permutation(n)
        losses, wsums = [], []
        t0 = time.time()
        for idx, w in padded_index_batches(n, cfg.batch_size, order):
            z, lat0, img = data.batch(idx)
            rng, srng = jax.random.split(rng)
            perc_on = bool(lpips_model is not None and step % cfg.perc_every == 0)
            adapter_params, opt_state, loss = step_fn(
                adapter_params, opt_state, jnp.asarray(z), jnp.asarray(lat0), jnp.asarray(img),
                jnp.asarray(w), srng, perc_on,
            )
            losses.append(loss)
            wsums.append(w.sum())
            step += 1
            logger.step(step, loss)
        ep_loss = float(np.average([float(l) for l in losses], weights=wsums))
        logger.epoch(ep + 1, cfg.epochs, ep_loss, sum(wsums) / max(time.time() - t0, 1e-9))
        save_params(save_dir / f"sd_adapter_ep{ep + 1}.msgpack", adapter_params)
    final = Path(save_dir) / "sd_adapter_final.msgpack"
    save_params(final, adapter_params)
    decoder.adapter_params = adapter_params
    return final
