"""Export the compiled decompress program as an AOT serving artifact.

Beyond-reference surface (the reference re-builds the torch model in every
serving process, ``cli/reconstruct_diffusion.py:47-52``). This CLI traces and
lowers the full DDIM / DPM-Solver++(2M) trajectory ONCE and serializes the
StableHLO program via ``jax.export``; serving boxes reload it with
:func:`clip_codec_tpu.deploy.load_decompressor` — no flax model code, no
retracing, weights stay call-time arguments.

    python -m clip_codec_tpu.cli.export_decoder \
        --weights ckpt.msgpack --out decoder.jaxprog \
        --size 256 --steps 50 --batch_size 16 --platforms tpu,cpu
"""

from __future__ import annotations

import argparse

from ._common import apply_device_flag, default_device


def main() -> None:
    ap = argparse.ArgumentParser(description="Export the decompress program as an AOT jax.export artifact.")
    ap.add_argument("--weights", type=str, default=None,
                    help="pixel path: msgpack checkpoint or reference torch .pt state_dict")
    ap.add_argument("--sd", action="store_true",
                    help="export the SD latent path instead (frozen UNet/VAE from "
                         "$CLIP_CODEC_SD_UNET_WEIGHTS/$CLIP_CODEC_SD_VAE_WEIGHTS + --adapter)")
    ap.add_argument("--adapter", type=str, default=None,
                    help="trained SD adapter checkpoint (with --sd)")
    ap.add_argument("--out", type=str, default="decoder.jaxprog")
    ap.add_argument("--size", type=int, default=None,
                    help="output resolution (default: 256 pixel / 512 sd)")
    ap.add_argument("--steps", type=int, default=None,
                    help="sampling steps (default: 50 pixel / 30 sd)")
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--batch_size", type=int, default=None,
                    help="static serving batch baked into the artifact "
                         "(default: 16 pixel / 1 sd)")
    ap.add_argument("--sampler", type=str, default="ddim", choices=("ddim", "ddim_std", "dpmpp"))
    ap.add_argument("--platforms", type=str, default=None,
                    help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                         "(default: current backend only)")
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--base", type=int, default=None)
    ap.add_argument("--ch_mult", type=str, default=None)
    ap.add_argument("--z_dim", type=int, default=None,
                    help="override the z_dim inferred from the checkpoint")
    ap.add_argument("--heads", type=int, default=8,
                    help="SD UNet attention heads (not recoverable from kernel shapes)")
    ap.add_argument("--int8", action="store_true",
                    help="static-int8 serving program; calibrates here and "
                         "writes <out>.quant.msgpack for serve boxes")
    ap.add_argument("--output", type=str, default="float32",
                    choices=("float32", "uint8"),
                    help="pixel path: uint8 folds the PNG-prep conversion "
                         "into the program (4x smaller device->host transfer)")
    args = ap.parse_args()
    apply_device_flag(args.device)
    platforms = args.platforms.split(",") if args.platforms else None

    if args.sd:
        _export_sd(args, platforms)
        return
    if args.weights is None:
        ap.error("--weights is required (or pass --sd --adapter for the SD path)")
    args.size = 256 if args.size is None else args.size
    args.steps = 50 if args.steps is None else args.steps
    args.batch_size = 16 if args.batch_size is None else args.batch_size

    from ..deploy import export_decompressor
    from ..utils.checkpoint import load_unet_checkpoint
    from ..utils.config import ModelConfig

    mc = ModelConfig.find_for_checkpoint(args.weights)
    ch_mult = (tuple(int(c) for c in args.ch_mult.split(","))
               if args.ch_mult is not None else (mc.ch_mult if mc else (1, 2, 2)))
    params = load_unet_checkpoint(args.weights, ch_mult)
    overrides = {}
    if args.z_dim is not None:
        overrides["z_dim"] = args.z_dim
    if args.base is not None:
        overrides["base"] = args.base
    if args.ch_mult is not None:
        overrides["ch_mult"] = ch_mult
    if mc is None:
        mc = ModelConfig.infer_from_params(params, **overrides)
    elif overrides:
        # explicit flags beat the config file (same precedence as the
        # reconstruct/eval CLIs)
        import dataclasses

        mc = dataclasses.replace(mc, **overrides)
    quant = None
    if args.int8:
        # calibrate on the build box (real params available here) and ship
        # the 'quant' collection as a sidecar the serving box passes back in
        import jax.numpy as jnp

        from ..models import CLIPCondUNet
        from ..ops.int8 import calibrate_unet
        from ..utils.checkpoint import save_params

        net = CLIPCondUNet(z_dim=mc.z_dim, base=mc.base, ch_mult=mc.ch_mult,
                           img_ch=mc.img_ch, dtype=jnp.bfloat16, int8=True)
        quant = calibrate_unet(net.apply, {"params": params}, args.size,
                               mc.z_dim, timesteps=mc.timesteps)
    path = export_decompressor(
        params, mc, args.out, size=args.size, steps=args.steps,
        sampler=args.sampler, eta=args.eta, batch_size=args.batch_size,
        quant=quant, output=args.output, platforms=platforms,
    )
    if quant is not None:
        # only after the export succeeded — an orphan/stale sidecar next to a
        # failed or old artifact would mis-calibrate a later serve
        save_params(str(args.out) + ".quant.msgpack", quant)
    sidecar = f" + {path}.quant.msgpack" if args.int8 else ""
    print(f"Exported {path} ({path.stat().st_size / 1024:.1f} KiB, "
          f"sampler={args.sampler}, steps={args.steps}, size={args.size}, "
          f"batch={args.batch_size}, int8={args.int8}){sidecar}")


def _export_sd(args, platforms) -> None:
    if args.adapter is None:
        raise SystemExit("--sd requires --adapter <trained adapter checkpoint>")
    from pathlib import Path

    from ..deploy import export_sd_decompressor
    from ..weights.convert_sd import (
        infer_sd_configs, load_sd_params, require_sd_weight_paths,
    )

    unet_path, vae_path = require_sd_weight_paths()
    from .reconstruct_sd_diffusion import load_adapter_params

    size = 512 if args.size is None else args.size
    steps = 30 if args.steps is None else args.steps
    batch = 1 if args.batch_size is None else args.batch_size
    unet_params, vae_params = load_sd_params(unet_path, vae_path)
    unet_cfg, vae_cfg = infer_sd_configs(unet_params, vae_params, heads=args.heads)
    adapter_params = load_adapter_params(Path(args.adapter))
    quant = None
    if args.int8:
        import jax.numpy as jnp
        import numpy as np

        from ..models.sd import StableDiffusionDecoder
        from ..utils.checkpoint import save_params

        clip_dim = (int(jnp.shape(adapter_params["fc1"]["kernel"])[0])
                    if args.z_dim is None else args.z_dim)
        n_tokens = int(jnp.shape(adapter_params["fc2"]["kernel"])[1]) // unet_cfg.cross_dim
        dec = StableDiffusionDecoder(
            vae_params, unet_params, adapter_params=adapter_params,
            clip_dim=clip_dim, n_tokens=n_tokens,
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, int8=True,
        )
        f = 2 ** (len(vae_cfg.block_out) - 1)
        r = np.random.default_rng(0).standard_normal((batch, clip_dim))
        z_cal = jnp.asarray(r / (np.linalg.norm(r, axis=1, keepdims=True) + 1e-9),
                            jnp.float32)
        dec.calibrate_int8_scales(z_cal, (batch, size // f, size // f, vae_cfg.latent_ch))
        quant = dec.unet_quant
    path = export_sd_decompressor(
        unet_params, vae_params, adapter_params, args.out,
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, clip_dim=args.z_dim,
        size=size, steps=steps, sampler=args.sampler, eta=args.eta,
        batch_size=batch, quant=quant, platforms=platforms,
    )
    if quant is not None:
        # only after the export succeeded (see main(): stale-sidecar hazard)
        save_params(str(args.out) + ".quant.msgpack", quant)
    sidecar = f" + {path}.quant.msgpack" if args.int8 else ""
    print(f"Exported {path} ({path.stat().st_size / 1024:.1f} KiB, sd path, "
          f"sampler={args.sampler}, steps={steps}, size={size}, batch={batch}, "
          f"int8={args.int8}){sidecar}")


if __name__ == "__main__":
    main()
