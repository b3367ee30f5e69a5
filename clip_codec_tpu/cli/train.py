"""Train the pixel-space diffusion decoder from the command line.

[Beyond-reference] The reference exposes training only as an importable
function (``README.md:52-58`` runs ``python -c "...train_diffusion(...)"``);
this wraps it with the same kwarg names as flags.

Run: ``python -m clip_codec_tpu.cli.train --store_dir store [--epochs 40] ...``
"""

from __future__ import annotations

import argparse

from ._common import apply_device_flag, default_device


def main() -> None:
    ap = argparse.ArgumentParser(description="Train the CLIP-conditioned diffusion decoder on a store.")
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--out_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--schedule", type=str, default="cosine", choices=["cosine", "linear"])
    ap.add_argument("--recon_w", type=float, default=0.05)
    ap.add_argument("--clip_w", type=float, default=0.1)
    ap.add_argument("--tv_w", type=float, default=1e-4)
    ap.add_argument("--save_dir", type=str, default=None)
    ap.add_argument("--base", type=int, default=128)
    ap.add_argument("--ch_mult", type=str, default="1,2,2")
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--resume", action="store_true", help="continue from the latest orbax checkpoint")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of params (0=off, reference behavior; 0.9999 typical); "
                         "also writes diffusion_unet_ema_final.msgpack")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=0)
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--clip_weights", type=str, default=None,
                    help="enable the CLIP-alignment loss term with these CLIP weights")
    ap.add_argument("--data_workers", type=int, default=0,
                    help="host threads decoding each batch's images (the "
                         "DataLoader-workers equivalent; 0 = synchronous)")
    ap.add_argument("--cache_images", action="store_true",
                    help="cache decoded images as resized uint8 in RAM so "
                         "epochs after the first skip JPEG decode entirely")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize ResBlocks in the backward pass (more "
                         "FLOPs, much less activation memory; for 512px+ batches)")
    ap.add_argument("--spatial_shard", type=int, default=1,
                    help="also shard image height over K devices (memory lever "
                         "for 512px+; out_size must divide by K)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each batch over all devices (params replicated; "
                         "batch_size is global and must divide the device count)")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-host cluster first (coordinator from "
                         "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID "
                         "or TPU-pod auto-discovery); implies --data_parallel")
    args = ap.parse_args()
    apply_device_flag(args.device)
    if args.distributed:
        from ..parallel import initialize_distributed

        initialize_distributed()  # must precede any backend use
        args.data_parallel = True

    from ..train import DiffusionTrainConfig, train_diffusion

    clip_embed_fn, clip_params = None, None
    if args.clip_weights:
        import jax.numpy as jnp

        from ..encoders import ClipEncoder
        from ..encoders.clip import embed_m11_images

        enc = ClipEncoder(weights_path=args.clip_weights, dtype=jnp.bfloat16)
        # params threaded as a step argument, never a closure constant
        clip_embed_fn = lambda cp, imgs: embed_m11_images(enc.model, cp, imgs)
        clip_params = enc.params

    cfg = DiffusionTrainConfig(
        out_size=args.out_size, epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        timesteps=args.timesteps, schedule=args.schedule, recon_w=args.recon_w,
        clip_w=args.clip_w, tv_w=args.tv_w, base=args.base,
        ch_mult=tuple(int(c) for c in args.ch_mult.split(",")),
        bf16=not args.no_bf16, seed=args.seed, log_every=args.log_every,
        ema_decay=args.ema_decay, remat=args.remat,
        data_workers=args.data_workers, cache_images=args.cache_images,
    )
    mesh = None
    spatial = args.spatial_shard > 1
    if args.data_parallel or spatial:
        from ..parallel import make_mesh

        mesh = make_mesh(model_parallel=args.spatial_shard if spatial else 1)
    ckpt = train_diffusion(args.store_dir, config=cfg, save_dir=args.save_dir,
                           clip_embed_fn=clip_embed_fn, clip_params=clip_params,
                           resume=args.resume, mesh=mesh, spatial=spatial)
    print(f"Final checkpoint: {ckpt}")


if __name__ == "__main__":
    main()
