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
  + tv_w * TV + clip_w * (1 - cos(DINO(x̂), DINO(gt))) when a DINO encoder is
  supplied + perc_w * LPIPS(x̂, gt) every ``perc_every`` steps when LPIPS
  weights are available (``perc_w`` actually honored);
* ``clip_w`` keeps the reference's (misleading) name: its "CLIP alignment"
  branch actually embeds with DINOv2 (``:168-179,246-254``) and compares
  against the raw store vector ``z`` — a dimension mismatch for 512-d CLIP
  stores. We embed the GROUND-TRUTH image with the same DINO tower instead,
  which is well-defined for every store dim;
* bookkeeping is correct: epoch means over defined values only.

At-scale rules (round-2 review): the frozen UNet/VAE/DINO/LPIPS parameters
enter the jitted step as ARGUMENTS, never closure constants — the 860M SD
UNet (~3.4 GB fp32) serialized into the program body exceeds the remote
compile transport limit (CLAUDE.md), and a regression test pins the lowered
step to carry no multi-MB constants. DP (``mesh=``), orbax full-state
resume (``resume=True``) and adapter EMA mirror the pixel trainer.

Per-epoch artifact keeps the reference's adapter-only shape: a msgpack of
just the adapter params, loadable by ``cli/reconstruct_sd_diffusion``.
Run as a module for the reference's CLI surface
(``python -m clip_codec_tpu.train.sd_diffusion_train --store_dir ...``,
reference ``train/sd_diffusion_train.py:342-373``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io.store import Store
from ..models.sd import StableDiffusionDecoder, sd_alphas_cumprod
from ..models.sd.vae import AutoencoderKL
from ..utils.checkpoint import save_params
from .data import scale_m11_u8
from ..utils.logging import TrainLogger
from .losses import total_variation, weighted_mean

PathLike = Union[str, Path]


@dataclass
class SDTrainConfig:
    """Mirrors the reference kwargs (``train/sd_diffusion_train.py:91-104``):
    ``out_size`` is the GT-image resolution for the pixel-space loss terms,
    ``clip_w`` weights the DINO-alignment term (the reference's name for
    it). TPU-native knobs (seed/log_every/ema_decay) at the end."""

    out_size: int = 256
    epochs: int = 20
    batch_size: int = 4
    lr: float = 1e-4
    timesteps: int = 1000
    recon_w: float = 0.05
    clip_w: float = 0.1
    perc_w: float = 0.1
    tv_w: float = 1e-4
    perc_every: int = 10
    seed: int = 0
    log_every: int = 0
    # EMA of the ADAPTER params (0 = off, reference behavior); also writes
    # sd_adapter_ema_final.msgpack.
    ema_decay: float = 0.0
    # Host decode threads per batch (see train/data.py — at 512px GT images
    # the per-item JPEG decode + latent npz load is the step-time floor on
    # one host core). 0 = synchronous; bit-identical either way.
    data_workers: int = 0


class SDStoreData:
    """Store view over ``manifest_latents.json``: (z, latent, image path)."""

    def __init__(self, store_dir: PathLike, image_size: int = 512, workers: int = 0) -> None:
        from .data import LazyPool

        self.store = Store.open(store_dir, manifest_name="manifest_latents.json")
        self.image_size = image_size
        self.z = self.store.decode_all(renormalize=True)
        self._pool = LazyPool(workers)

    def __len__(self) -> int:
        return len(self.store)

    @property
    def z_dim(self) -> int:
        return int(self.z.shape[1])

    def _load_item(self, i: int):
        from .data import load_image_u8

        rec = self.store.manifest[int(i)]
        lat = np.load(rec["latent"])["lat"].astype(np.float32)  # (4, h, w) CHW fp16
        return lat.transpose(1, 2, 0), load_image_u8(rec["image"], self.image_size)

    def batch(self, idx: np.ndarray, u8: bool = False):
        """``u8=True`` returns GT images as raw uint8 (the jitted step scales
        on device — bit-identical fp32 math, 4x less host->device traffic)."""
        items = self._pool.map(self._load_item, [int(i) for i in idx])
        lats = [lat for lat, _ in items]
        imgs = np.stack([img for _, img in items])
        if not u8:
            imgs = imgs.astype(np.float32) / 127.5 - 1.0
        return self.z[idx], np.stack(lats), imgs


def make_sd_train_step(
    decoder: StableDiffusionDecoder,
    tx: optax.GradientTransformation,
    cfg: SDTrainConfig,
    dino_embed_fn: Optional[Callable] = None,
    use_lpips: bool = False,
):
    """Build the jitted adapter train step.

    Signature: ``step(a_params, opt_state, frozen, z, lat0, gt_img, weight,
    rng, perc_on)`` (plus ``ema_params`` after ``opt_state`` when
    ``cfg.ema_decay > 0``). ``frozen`` is a dict of the NON-trained
    parameter trees — ``{'unet': ..., 'vae': ...}`` plus ``'dino'`` /
    ``'lpips'`` when those losses are on — passed as a jit ARGUMENT every
    step: closure-capturing the 860M UNet would serialize ~3.4 GB into the
    program body (remote-compile limit, CLAUDE.md; the same rule
    ``make_train_step`` follows for CLIP params).

    ``dino_embed_fn(dino_params, images_m11)`` embeds [-1,1] images.
    """
    unet_apply = decoder.unet.apply
    vae_apply = decoder.vae.apply
    adapter_apply = decoder.adapter.apply
    scaling = decoder.scaling_factor
    ac = jnp.asarray(sd_alphas_cumprod(cfg.timesteps))  # (T,) fp32, ~4 KB

    def loss_fn(a_params, frozen, z, lat0, gt_img, t, noise, weight, perc_on):
        sa = jnp.sqrt(ac[t])[:, None, None, None]
        sb = jnp.sqrt(1.0 - ac[t])[:, None, None, None]
        lat_t = sa * lat0 + sb * noise
        cond = adapter_apply({"params": a_params}, z)
        eps_hat = unet_apply({"params": frozen["unet"]}, lat_t, t, cond).astype(jnp.float32)
        per = jnp.mean((eps_hat - noise) ** 2, axis=(1, 2, 3))
        dino_on = "dino" in frozen and dino_embed_fn is not None and cfg.clip_w > 0
        lpips_on = perc_on and "lpips" in frozen and use_lpips and cfg.perc_w > 0
        need_decode = cfg.recon_w > 0 or cfg.tv_w > 0 or dino_on or lpips_on
        if need_decode:
            lat0_hat = (lat_t - sb * eps_hat) / sa
            x_hat = vae_apply(
                {"params": frozen["vae"]}, lat0_hat / scaling, method=AutoencoderKL.decode
            ).astype(jnp.float32)
            if cfg.recon_w > 0:
                x_gt = vae_apply(
                    {"params": frozen["vae"]}, lat0 / scaling, method=AutoencoderKL.decode
                ).astype(jnp.float32)
                per = per + cfg.recon_w * jnp.mean((x_hat - x_gt) ** 2, axis=(1, 2, 3))
            if cfg.tv_w > 0:
                per = per + cfg.tv_w * total_variation(x_hat)
            if dino_on:
                ya = dino_embed_fn(frozen["dino"], x_hat)
                yb = jax.lax.stop_gradient(dino_embed_fn(frozen["dino"], gt_img))
                cos = jnp.sum(ya * yb, axis=-1) / (
                    jnp.linalg.norm(ya, axis=-1) * jnp.linalg.norm(yb, axis=-1) + 1e-8
                )
                per = per + cfg.clip_w * (1.0 - cos)
            if lpips_on:
                # perc_on is STATIC: the VGG16 forward+VJP is only traced into
                # the every-perc_every-steps specialization instead of running
                # (and being zeroed) on every step.
                from ..eval.lpips import lpips_forward

                gt_small = jax.image.resize(gt_img, x_hat.shape, method="bilinear", antialias=False)
                per = per + cfg.perc_w * lpips_forward(frozen["lpips"], x_hat, gt_small)
        return weighted_mean(per, weight)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("perc_on",))
    def step_fn(a_params, opt_state, frozen, z, lat0, gt_img, weight, rng, perc_on):
        t_rng, n_rng = jax.random.split(rng)
        b = lat0.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, cfg.timesteps, dtype=jnp.int32)
        noise = jax.random.normal(n_rng, lat0.shape, dtype=jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            a_params, frozen, z, lat0, gt_img, t, noise, weight, perc_on
        )
        updates, opt_state = tx.update(grads, opt_state, a_params)
        return optax.apply_updates(a_params, updates), opt_state, loss

    if cfg.ema_decay <= 0:
        return step_fn

    d = jnp.float32(cfg.ema_decay)

    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("perc_on",))
    def step_fn_ema(a_params, opt_state, ema_params, frozen, z, lat0, gt_img, weight, rng, perc_on):
        t_rng, n_rng = jax.random.split(rng)
        b = lat0.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, cfg.timesteps, dtype=jnp.int32)
        noise = jax.random.normal(n_rng, lat0.shape, dtype=jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            a_params, frozen, z, lat0, gt_img, t, noise, weight, perc_on
        )
        updates, opt_state = tx.update(grads, opt_state, a_params)
        a_params = optax.apply_updates(a_params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d), ema_params, a_params
        )
        return a_params, opt_state, ema_params, loss

    return step_fn_ema


def train_sd_diffusion(
    store_dir: PathLike,
    decoder: StableDiffusionDecoder,
    epochs: int = 20,
    batch_size: int = 4,
    lr: float = 1e-4,
    save_dir: Optional[PathLike] = None,
    dino_embed_fn: Optional[Callable] = None,
    dino_params=None,
    lpips_model=None,
    config: Optional[SDTrainConfig] = None,
    out_size: Optional[int] = None,
    image_size: Optional[int] = None,
    mesh=None,
    resume: bool = False,
) -> Path:
    """Train the CLIP adapter against precomputed latents. Returns the final
    adapter checkpoint path (per-epoch ``sd_adapter_ep{N}.msgpack`` cadence,
    reference ``:332-338``).

    Kwarg-compatible with the reference entry
    (``train/sd_diffusion_train.py:91-104``) minus torch's ``device`` /
    ``model_name`` (JAX owns placement; the decoder is injected, built from
    converted weights by :mod:`clip_codec_tpu.cli.train_sd`).

    ``dino_embed_fn(dino_params, images_m11)`` + ``dino_params`` enable the
    reference's ``clip_w`` alignment term; ``lpips_model`` (an object with
    ``.params``, e.g. :class:`eval.lpips.LPIPS`) enables the ``perc_w``
    term. Both parameter trees ride the jitted step as arguments.

    ``image_size`` is the deprecated alias of ``out_size``.

    ``mesh``: a :func:`clip_codec_tpu.parallel.make_mesh` mesh replicates
    the adapter/frozen params and shards every batch over the ``data``
    axis (XLA grad psum over ICI) — single- or multi-process, like the
    pixel trainer. ``resume=True`` continues from the latest orbax
    full-state checkpoint (adapter + optimizer + epoch + EMA).
    """
    import dataclasses

    cfg = config or SDTrainConfig(epochs=epochs, batch_size=batch_size, lr=lr)
    size_override = out_size if out_size is not None else image_size
    if size_override is not None:
        # replace, never mutate: the caller may reuse its config object
        cfg = dataclasses.replace(cfg, out_size=int(size_override))
    save_dir = Path(save_dir or store_dir)
    data = SDStoreData(store_dir, image_size=cfg.out_size, workers=cfg.data_workers)
    tx = optax.adamw(cfg.lr)
    adapter_params = decoder.adapter_params
    opt_state = tx.init(adapter_params)

    frozen = {"unet": decoder.unet_params, "vae": decoder.vae_params}
    if dino_embed_fn is not None and dino_params is not None:
        frozen["dino"] = dino_params
    if lpips_model is not None:
        frozen["lpips"] = lpips_model.params
    step_fn = make_sd_train_step(
        decoder, tx, cfg,
        dino_embed_fn=dino_embed_fn, use_lpips=lpips_model is not None,
    )

    place_batch = lambda *arrays: tuple(jnp.asarray(a) for a in arrays)
    local_sl = slice(None)  # multi-process DP narrows this to local rows
    place_state = lambda tree: tree
    if mesh is not None:
        n_data = mesh.shape["data"]
        if cfg.batch_size % n_data:
            raise ValueError(f"batch_size={cfg.batch_size} not divisible by data axis {n_data}")
        if jax.process_count() > 1:
            from ..parallel import replicate_global, shard_host_batch_global

            place_state = lambda tree: replicate_global(mesh, tree)
            per_proc = cfg.batch_size // jax.process_count()
            lo = jax.process_index() * per_proc
            # Decode only this host's rows: the global index order is
            # identical on every process (same seed), so each host does 1/P
            # of the latent-npz + JPEG decode work — the step-time floor.
            local_sl = slice(lo, lo + per_proc)

            def place_batch(*arrays):  # arrays are already this host's slice
                return shard_host_batch_global(mesh, *arrays)
        else:
            from ..parallel import replicate, shard_batch

            place_state = lambda tree: replicate(mesh, tree)
            place_batch = lambda *arrays: shard_batch(mesh, *arrays)

    from ..utils.checkpoint import TrainCheckpointer

    checkpointer = TrainCheckpointer(Path(save_dir) / "orbax_sd")
    use_ema = cfg.ema_decay > 0
    ema_params = (
        jax.tree_util.tree_map(lambda p: jnp.array(p, jnp.float32, copy=True), adapter_params)
        if use_ema
        else None
    )
    start_epoch = 0
    if resume:
        base_tmpl = {"adapter": adapter_params, "opt_state": opt_state, "epoch": 0}
        ema_tmpl = dict(base_tmpl, ema_params=ema_params if use_ema else adapter_params)
        try:
            restored = checkpointer.restore(ema_tmpl if use_ema else base_tmpl)
        except Exception as primary_err:
            try:  # ema on/off shape mismatch — retry the alternate template
                restored = checkpointer.restore(base_tmpl if use_ema else ema_tmpl)
            except Exception:
                raise primary_err
        if restored is not None:
            adapter_params = restored["adapter"]
            opt_state = restored["opt_state"]
            if use_ema:
                ema_params = jax.tree_util.tree_map(
                    lambda p: jnp.array(p, jnp.float32, copy=True),
                    restored.get("ema_params", adapter_params),
                )
            start_epoch = int(restored["epoch"])
            print(f"[train_sd] resumed from epoch {start_epoch}")

    adapter_params = place_state(adapter_params)
    opt_state = place_state(opt_state)
    frozen = place_state(frozen)
    if use_ema:
        ema_params = place_state(ema_params)

    logger = TrainLogger(log_every=cfg.log_every)
    host_rng = np.random.default_rng(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    n = len(data)
    step = 0
    from ..utils.batching import padded_index_batches

    def _epoch_batches(order):
        # npz latent reads + PIL decodes on a host thread, overlapping the
        # ~135ms device step (prefetch_iter; same idiom as StoreData.epoch).
        # Under multi-process DP only the local_sl rows are decoded; the
        # yielded wsum stays the GLOBAL real-row count for bookkeeping.
        def gen():
            for idx, w in padded_index_batches(n, cfg.batch_size, order):
                yield (float(w.sum()), w[local_sl]) + data.batch(idx[local_sl], u8=True)

        from ..utils.batching import prefetch_iter

        return prefetch_iter(gen(), prefetch=2)

    for ep in range(start_epoch, cfg.epochs):
        order = host_rng.permutation(n)
        losses, wsums = [], []
        t0 = time.time()
        for wsum, w, z, lat0, img in _epoch_batches(order):
            rng, srng = jax.random.split(rng)
            perc_on = bool(lpips_model is not None and step % cfg.perc_every == 0)
            z_d, lat_d, img_d, w_d = place_batch(z, lat0, img, np.asarray(w))
            img_d = scale_m11_u8(img_d)  # uint8 over the link, fp32 on device
            if use_ema:
                adapter_params, opt_state, ema_params, loss = step_fn(
                    adapter_params, opt_state, ema_params, frozen,
                    z_d, lat_d, img_d, w_d, srng, perc_on,
                )
            else:
                adapter_params, opt_state, loss = step_fn(
                    adapter_params, opt_state, frozen,
                    z_d, lat_d, img_d, w_d, srng, perc_on,
                )
            losses.append(loss)
            wsums.append(wsum)  # global real-row count (multi-proc safe)
            step += 1
            logger.step(step, loss)
        ep_loss = float(np.average([float(l) for l in losses], weights=wsums))
        if jax.process_index() == 0:  # msgpack write: replicated arrays, host-readable
            save_params(save_dir / f"sd_adapter_ep{ep + 1}.msgpack", adapter_params)
        state = {"adapter": adapter_params, "opt_state": opt_state, "epoch": ep + 1}
        if use_ema:
            state["ema_params"] = ema_params
        # orbax save is a cross-process collective (multihost sync barrier):
        # EVERY process must call it or a --distributed run deadlocks at the
        # first epoch end (review r3 #3).
        checkpointer.save(ep + 1, state)
        logger.epoch(ep + 1, cfg.epochs, ep_loss, sum(wsums) / max(time.time() - t0, 1e-9))
    final = Path(save_dir) / "sd_adapter_final.msgpack"
    if jax.process_index() == 0:
        save_params(final, adapter_params)
        if use_ema:
            save_params(save_dir / "sd_adapter_ema_final.msgpack", ema_params)
    decoder.adapter_params = adapter_params
    return final


if __name__ == "__main__":  # the reference's module-entry surface (:342-373)
    from ..cli.train_sd import main

    main()
