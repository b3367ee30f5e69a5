"""Pixel-space diffusion training (layer L5) — THE main training entry.

Behavior-parity rebuild of the reference ``train_diffusion``
(``train/diffusion_train.py:66-148``), re-designed as **one jitted train
step**: rng-split for t/noise, q_sample, bf16 U-Net forward, fp32 loss and
optimizer (optax AdamW), donated state — where the reference pays a host sync
every step (``float(loss.detach().cpu())``, ``diffusion_train.py:141``), here
the device round-trip happens once per epoch on the aggregated metrics.

Loss surface and quirks mirrored (see :mod:`clip_codec_tpu.train.losses`):
eps-MSE + recon_w*L1 + tv_w*TV + (every other epoch) clip_w*CLIP-align with
the reference's zero-gradient CLIP term reproduced by default.

Reference hyperparameter defaults preserved: out_size=256, epochs=40,
batch_size=8, lr=2e-4, T=1000 cosine, recon_w=0.05, clip_w=0.1, tv_w=1e-4,
and the hard-coded model config base=128, ch_mult=(1,2,2)
(``diffusion_train.py:103``). Checkpoints keep the per-epoch cadence and
filenames (``diffusion_unet_ep{N}``, ``diffusion_unet_final``).

Scaling: pass ``mesh`` (see :mod:`clip_codec_tpu.parallel`) to shard the
batch over the ``data`` axis — gradients are averaged by XLA collectives
riding ICI; the step function itself is unchanged (SPMD via sharded jit).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.schedule import NoiseSchedule
from ..models.unet import CLIPCondUNet
from ..utils.checkpoint import save_params
from ..utils.config import ModelConfig
from ..utils.logging import TrainLogger
from .data import StoreData, scale_m11_u8
from .losses import clip_alignment, eps_mse, l1, total_variation, weighted_mean

PathLike = Union[str, Path]


@dataclass
class DiffusionTrainConfig:
    """Mirrors the reference's ``train_diffusion`` kwargs exactly, plus
    TPU-native knobs at the end."""

    out_size: int = 256
    epochs: int = 40
    batch_size: int = 8
    lr: float = 2e-4
    timesteps: int = 1000
    schedule: str = "cosine"
    recon_w: float = 0.05
    clip_w: float = 0.1
    tv_w: float = 1e-4
    # --- TPU-native additions ---
    base: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2)
    bf16: bool = True
    clip_align_grad: bool = False  # True = fix the reference's zero-grad CLIP term
    seed: int = 0
    log_every: int = 0  # 0 = per-epoch only
    # Exponential moving average of params (0 = off, matching the reference;
    # 0.9999 is the usual diffusion setting). Sampling from the EMA weights
    # is standard practice the reference lacks — kept opt-in for parity.
    ema_decay: float = 0.0
    # Rematerialize ResBlocks in the backward pass (jax.checkpoint): ~1
    # extra forward of FLOPs for a large activation-memory cut — the lever
    # for 512px+ batches that otherwise OOM a single chip.
    remat: bool = False
    # Host input pipeline (see train/data.py): decode threads per batch and
    # an opt-in resized-uint8 RAM cache (~out_size^2*3 bytes per image) that
    # makes epochs after the first decode-free. Both bit-identical to the
    # synchronous path. The chip consumes ~164 img/s at the flagship config;
    # one host core decodes ~100 img/s — real runs want one of these on.
    data_workers: int = 0
    cache_images: bool = False


def make_train_step(
    net: CLIPCondUNet,
    sched: NoiseSchedule,
    tx: optax.GradientTransformation,
    cfg: DiffusionTrainConfig,
    clip_embed_fn: Optional[Callable] = None,
):
    """Build the jitted train step: (params, opt_state, batch, rng, clip_on,
    clip_params) -> (params, opt_state, metrics).

    ``clip_embed_fn(clip_params, images)`` receives the frozen encoder params
    as a jit ARGUMENT (never a closure constant: the ~600MB ViT would be
    serialized into the program body, see CLAUDE.md on remote-compile limits).
    """

    def loss_fn(params, x0, z, weight, t, noise, clip_on, clip_params):
        # clip_on is STATIC (python bool) so the CLIP tower is only traced
        # into the even-epoch specialization — the reference skips the term
        # entirely on odd epochs (diffusion_train.py:130) and so do we.
        x_t = sched.q_sample(x0, t, noise)
        eps_hat = net.apply({"params": params}, x_t, z, t).astype(jnp.float32)
        per = eps_mse(eps_hat, noise)
        x0_pred = jnp.clip(sched.predict_x0_from_eps(x_t, t, eps_hat), -1.0, 1.0)
        if cfg.recon_w > 0:
            per = per + cfg.recon_w * l1(x0_pred, x0)
        if cfg.tv_w > 0:
            per = per + cfg.tv_w * total_variation(x0_pred)
        if clip_on and cfg.clip_w > 0 and clip_embed_fn is not None:
            align = clip_alignment(
                x0_pred, z, lambda imgs: clip_embed_fn(clip_params, imgs),
                stop_grad=not cfg.clip_align_grad,
            )
            per = per + cfg.clip_w * align
        return weighted_mean(per, weight)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("clip_on",))
    def train_step(params, opt_state, x0, z, weight, rng, clip_on, clip_params=None):
        t_rng, n_rng = jax.random.split(rng)
        b = x0.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, sched.timesteps, dtype=jnp.int32)
        noise = jax.random.normal(n_rng, x0.shape, dtype=jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, z, weight, t, noise, clip_on, clip_params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if cfg.ema_decay <= 0:
        return train_step

    # EMA folded into the same program (a separate per-step jit would add a
    # full dispatch round-trip over remote transports).
    d = jnp.float32(cfg.ema_decay)

    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("clip_on",))
    def train_step_ema(params, opt_state, ema_params, x0, z, weight, rng, clip_on, clip_params=None):
        t_rng, n_rng = jax.random.split(rng)
        b = x0.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, sched.timesteps, dtype=jnp.int32)
        noise = jax.random.normal(n_rng, x0.shape, dtype=jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, z, weight, t, noise, clip_on, clip_params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d), ema_params, params
        )
        return params, opt_state, ema_params, loss

    return train_step_ema


def train_diffusion(
    store_dir: PathLike,
    out_size: int = 256,
    epochs: int = 40,
    batch_size: int = 8,
    lr: float = 2e-4,
    timesteps: int = 1000,
    schedule: str = "cosine",
    recon_w: float = 0.05,
    clip_w: float = 0.1,
    tv_w: float = 1e-4,
    save_dir: Optional[PathLike] = None,
    clip_embed_fn: Optional[Callable] = None,
    config: Optional[DiffusionTrainConfig] = None,
    resume: bool = False,
    clip_params=None,
    mesh=None,
    spatial: bool = False,
) -> Path:
    """Train the diffusion decoder on all samples from the store.

    Signature-compatible with the reference entry point
    (``train/diffusion_train.py:66-79``; the torch ``device`` arg is dropped —
    JAX owns placement). Returns the path of the final checkpoint.

    ``clip_embed_fn`` supplies the CLIP-alignment encoder (built from
    :mod:`clip_codec_tpu.encoders.clip` when weights are available); when
    None the CLIP term is skipped — note it contributes zero gradient in the
    reference anyway (see losses.py).

    ``resume=True`` continues from the latest orbax full-state checkpoint in
    ``save_dir/orbax`` (params + optimizer state + epoch) — the restart path
    the reference lacks (it saves params only, SURVEY.md §5).

    ``mesh``: a :func:`clip_codec_tpu.parallel.make_mesh` device mesh for
    data-parallel training — params/optimizer state are replicated, every
    batch is sharded over the ``data`` axis, and XLA inserts the gradient
    psum (ICI within a host, DCN across hosts). Works both single-process
    (all local devices) and multi-process (call
    :func:`clip_codec_tpu.parallel.initialize_distributed` first and pass a
    global mesh; each process feeds its own slice of every batch).
    ``cfg.batch_size`` is the GLOBAL batch and must be divisible by the
    mesh's data-axis size.

    ``spatial=True`` additionally shards the image HEIGHT over the mesh's
    ``model`` axis (build the mesh with ``make_mesh(model_parallel=k)``) —
    the memory lever for 512px+ training: activations scale as B*H*W*C and
    GSPMD inserts the conv halo exchanges; verified equal to the
    single-device step in ``tests/test_parallel.py``. Single-process only.
    """
    cfg = config or DiffusionTrainConfig(
        out_size=out_size, epochs=epochs, batch_size=batch_size, lr=lr,
        timesteps=timesteps, schedule=schedule, recon_w=recon_w, clip_w=clip_w, tv_w=tv_w,
    )
    save_dir = Path(save_dir or store_dir)
    data = StoreData(store_dir, out_size=cfg.out_size,
                     workers=cfg.data_workers, cache_images=cfg.cache_images)

    net = CLIPCondUNet(
        z_dim=data.z_dim, base=cfg.base, ch_mult=cfg.ch_mult, img_ch=3,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32, remat=cfg.remat,
        # Training keeps the spatial-fold form: the fused-Pallas block's
        # custom_vjp backward re-runs the XLA reference, so its forward win
        # does not pay once gradients are needed (docs/performance.md r5).
        fused_pallas=False,
    )
    sched = NoiseSchedule.create(cfg.timesteps, cfg.schedule)
    tx = optax.adamw(cfg.lr)

    init_rng = jax.random.PRNGKey(cfg.seed)
    dummy = jnp.zeros((1, cfg.out_size, cfg.out_size, 3), jnp.float32)
    params = net.init(init_rng, dummy, jnp.zeros((1, data.z_dim), jnp.float32), jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)

    place_batch = lambda *arrays: tuple(jnp.asarray(a) for a in arrays)
    epoch_local = None  # set under multi-process DP: decode only local rows
    place_state = lambda tree: tree
    if spatial and mesh is None:
        raise ValueError("spatial=True requires a mesh (make_mesh(model_parallel=k))")
    if mesh is not None:
        n_data = mesh.shape["data"]
        if cfg.batch_size % n_data:
            raise ValueError(f"batch_size={cfg.batch_size} not divisible by data axis {n_data}")
        if spatial:
            n_model = mesh.shape["model"]
            if jax.process_count() > 1:
                raise NotImplementedError("spatial-sharded training is single-process")
            if n_model <= 1:
                raise ValueError("spatial=True needs make_mesh(model_parallel=k>1)")
            if cfg.out_size % n_model:
                raise ValueError(f"out_size={cfg.out_size} not divisible by model axis {n_model}")
        if jax.process_count() > 1:
            from ..parallel import replicate_global, shard_host_batch_global

            place_state = lambda tree: replicate_global(mesh, tree)
            per_proc = cfg.batch_size // jax.process_count()
            lo = jax.process_index() * per_proc
            # Decode only this host's rows (data.epoch local=): the global
            # index order/padding is identical on every process (same seed),
            # so each host JPEG-decodes 1/P of the batch instead of decoding
            # the global batch and slicing after.
            epoch_local = (lo, lo + per_proc)

            def place_batch(*arrays):  # arrays are already this host's slice
                return shard_host_batch_global(mesh, *arrays)
        elif spatial:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate, shard_batch

            place_state = lambda tree: replicate(mesh, tree)
            img_sh = NamedSharding(mesh, P("data", "model", None, None))

            def place_batch(x0, z, w):  # images: batch over data, H over model
                return (jax.device_put(x0, img_sh),) + shard_batch(mesh, z, w)
        else:
            from ..parallel import replicate, shard_batch

            place_state = lambda tree: replicate(mesh, tree)
            place_batch = lambda *arrays: shard_batch(mesh, *arrays)

    if jax.process_index() == 0:
        ModelConfig(
            z_dim=data.z_dim, base=cfg.base, ch_mult=tuple(cfg.ch_mult),
            timesteps=cfg.timesteps, schedule=cfg.schedule, out_size=cfg.out_size,
        ).save(save_dir)

    from ..utils.checkpoint import TrainCheckpointer

    checkpointer = TrainCheckpointer(Path(save_dir) / "orbax")
    use_ema = cfg.ema_decay > 0
    # copy=True: astype(fp32) on fp32 params would alias the buffers, and the
    # donated step would then see the same buffer twice.
    ema_params = (
        jax.tree_util.tree_map(lambda p: jnp.array(p, jnp.float32, copy=True), params)
        if use_ema
        else None
    )
    start_epoch = 0
    if resume:
        # The saved tree may or may not carry ema_params (the interrupted run
        # could have used a different ema_decay setting); try the template
        # matching THIS run first, then the other shape, and reconcile.
        base_tmpl = {"params": params, "opt_state": opt_state, "epoch": 0}
        ema_tmpl = dict(base_tmpl, ema_params=ema_params if use_ema else params)
        try:
            restored = checkpointer.restore(ema_tmpl if use_ema else base_tmpl)
        except Exception as primary_err:
            # Likely an ema on/off shape mismatch — retry with the alternate
            # template; if that ALSO fails the checkpoint is genuinely
            # incompatible, so surface the ORIGINAL error (the alternate's
            # message would blame the wrong template).
            try:
                restored = checkpointer.restore(base_tmpl if use_ema else ema_tmpl)
            except Exception:
                raise primary_err
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            if use_ema:
                # checkpoint had no EMA -> restart the average from params
                ema_params = jax.tree_util.tree_map(
                    lambda p: jnp.array(p, jnp.float32, copy=True),
                    restored.get("ema_params", params),
                )
            start_epoch = int(restored["epoch"])
            print(f"[train] resumed from epoch {start_epoch}")
    params = place_state(params)
    opt_state = place_state(opt_state)
    if use_ema:
        ema_params = place_state(ema_params)
    step_fn = make_train_step(net, sched, tx, cfg, clip_embed_fn)
    logger = TrainLogger(log_every=cfg.log_every)
    data_rng = np.random.default_rng(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    final_path: Path = save_dir / "diffusion_unet_final.msgpack"
    step = 0
    for ep in range(start_epoch, cfg.epochs):
        clip_on = bool(ep % 2 == 0)  # reference: every other epoch (static -> two specializations)
        losses, weights = [], []
        t0 = time.time()
        # u8=True: raw uint8 pixels cross the host->device link (4x less
        # traffic — the measured bottleneck on thin links); scale_m11_u8
        # converts on device, bit-identical to the host fp32 path, in its
        # own jit so the train-step program and numerics are UNCHANGED.
        for batch in data.epoch(cfg.batch_size, data_rng, local=epoch_local, u8=True):
            rng, step_rng = jax.random.split(rng)
            x0_d, z_d, w_d = place_batch(batch.x0, batch.z, batch.weight)
            x0_d = scale_m11_u8(x0_d)
            if use_ema:
                params, opt_state, ema_params, loss = step_fn(
                    params, opt_state, ema_params, x0_d, z_d, w_d, step_rng, clip_on, clip_params,
                )
            else:
                params, opt_state, loss = step_fn(
                    params, opt_state, x0_d, z_d, w_d, step_rng, clip_on, clip_params,
                )
            losses.append(loss)
            weights.append(batch.wsum)  # global real-row count (multi-proc safe)
            step += 1
            logger.step(step, loss)
        # One host sync per epoch for metrics.
        ep_loss = float(np.average([float(l) for l in losses], weights=weights))
        imgs_per_sec = sum(weights) / max(time.time() - t0, 1e-9)
        if jax.process_index() == 0:  # msgpack write: params fully replicated
            save_params(save_dir / f"diffusion_unet_ep{ep + 1}.msgpack", params)
        state = {"params": params, "opt_state": opt_state, "epoch": ep + 1}
        if use_ema:
            state["ema_params"] = ema_params
        # orbax save is a cross-process collective: every process calls it
        # (a process-0 gate deadlocks multi-host runs at the save barrier).
        checkpointer.save(ep + 1, state)
        logger.epoch(ep + 1, cfg.epochs, ep_loss, imgs_per_sec)
    if jax.process_index() == 0:
        save_params(final_path, params)
        if use_ema:
            save_params(save_dir / "diffusion_unet_ema_final.msgpack", ema_params)
    return final_path
