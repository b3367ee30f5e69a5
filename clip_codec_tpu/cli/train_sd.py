"""Train the Stable-Diffusion CLIP adapter from the command line.

Flag-compatible rebuild of the reference's module entry
(``python -m clip_feature_codec.train.sd_diffusion_train``,
``train/sd_diffusion_train.py:342-373``): the same flags with the same
defaults (``--store_dir --model_name --out_size --epochs --batch_size --lr
--timesteps --recon_w --clip_w --tv_w --perc_w --device --save_dir``), plus
TPU-native knobs (``--data_parallel --resume --ema_decay ...``). Also
reachable as ``python -m clip_codec_tpu.train.sd_diffusion_train`` for
path-parity and as ``python -m clip_codec_tpu.cli.train_sd``.

Weights: the frozen UNet/VAE come from ``$CLIP_CODEC_SD_UNET_WEIGHTS`` /
``$CLIP_CODEC_SD_VAE_WEIGHTS`` (diffusers torch/safetensors checkpoints, or
already-converted ``.msgpack`` trees) — ``--model_name`` is kept for flag
parity and recorded, but this zero-egress build cannot download from the
Hub. The ``--clip_w`` alignment term (DINOv2-backed in the reference,
``train/sd_diffusion_train.py:168-179,246-254``) activates when
``$CLIP_CODEC_DINO_WEIGHTS`` is set; ``--perc_w`` LPIPS activates with
``$CLIP_CODEC_LPIPS_WEIGHTS``.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from ._common import apply_device_flag, default_device


def main() -> None:
    ap = argparse.ArgumentParser(description="Train StableDiffusionDecoder's CLIP adapter on a store.")
    # --- reference flags, same defaults (sd_diffusion_train.py:344-357)
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--model_name", type=str, default="runwayml/stable-diffusion-v1-5")
    ap.add_argument("--out_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--recon_w", type=float, default=0.05)
    ap.add_argument("--clip_w", type=float, default=0.1,
                    help="DINO-alignment weight (the reference's name for it)")
    ap.add_argument("--tv_w", type=float, default=1e-4)
    ap.add_argument("--perc_w", type=float, default=0.1,
                    help="LPIPS weight (honored; the reference shadows it to 0.05)")
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--save_dir", type=str, default=None)
    # --- TPU-native additions
    ap.add_argument("--perc_every", type=int, default=10)
    ap.add_argument("--n_tokens", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8,
                    help="UNet attention heads (not recoverable from kernel shapes)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest orbax checkpoint in save_dir")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of the adapter params (0=off); also writes "
                         "sd_adapter_ema_final.msgpack")
    ap.add_argument("--data_workers", type=int, default=0,
                    help="host threads decoding each batch's images/latents "
                         "(DataLoader-workers equivalent; 0 = synchronous)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each batch over all devices (adapter+frozen params "
                         "replicated; batch_size is global)")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-host cluster first (see cli.train); implies "
                         "--data_parallel")
    args = ap.parse_args()
    apply_device_flag(args.device)
    if args.distributed:
        from ..parallel import initialize_distributed

        initialize_distributed()
        args.data_parallel = True

    from ..io.store import Store
    from ..models.sd import StableDiffusionDecoder
    from ..train.sd_diffusion_train import SDTrainConfig, train_sd_diffusion
    from ..weights.convert_sd import (
        infer_sd_configs, load_sd_params, require_sd_weight_paths,
    )

    unet_path, vae_path = require_sd_weight_paths(args.model_name)

    unet_params, vae_params = load_sd_params(unet_path, vae_path)
    unet_cfg, vae_cfg = infer_sd_configs(unet_params, vae_params, heads=args.heads)

    store = Store.open(args.store_dir, manifest_name="manifest_latents.json")
    decoder = StableDiffusionDecoder(
        vae_params, unet_params, clip_dim=store.dim, n_tokens=args.n_tokens,
        unet_cfg=unet_cfg, vae_cfg=vae_cfg,
    )

    dino_embed_fn = dino_params = None
    if args.clip_w > 0 and os.environ.get("CLIP_CODEC_DINO_WEIGHTS"):
        from ..encoders import DinoEncoder
        from ..encoders.dino import embed_m11_images_dino

        enc = DinoEncoder()
        dino_embed_fn = lambda dp, imgs: embed_m11_images_dino(
            enc.model, dp, imgs, enc.cfg.image_size
        )
        dino_params = enc.params

    lpips_model = None
    if args.perc_w > 0:
        from ..eval.lpips import LPIPSModel

        lpips_model = LPIPSModel.from_env()  # None without weights

    mesh = None
    if args.data_parallel:
        from ..parallel import make_mesh

        mesh = make_mesh()

    cfg = SDTrainConfig(
        out_size=args.out_size, epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr, timesteps=args.timesteps, recon_w=args.recon_w,
        clip_w=args.clip_w, perc_w=args.perc_w, tv_w=args.tv_w,
        perc_every=args.perc_every, seed=args.seed, log_every=args.log_every,
        ema_decay=args.ema_decay, data_workers=args.data_workers,
    )
    final = train_sd_diffusion(
        Path(args.store_dir), decoder,
        save_dir=Path(args.save_dir) if args.save_dir else None,
        dino_embed_fn=dino_embed_fn, dino_params=dino_params,
        lpips_model=lpips_model, config=cfg, mesh=mesh, resume=args.resume,
    )
    print(f"Saved final adapter to {final}")


if __name__ == "__main__":
    main()
