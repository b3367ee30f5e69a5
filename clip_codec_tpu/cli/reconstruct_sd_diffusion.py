"""Reconstruct via the frozen SD-1.5 decoder + trained CLIP adapter, with CFG
and optional gradient-based feature-inversion guidance.

Flag-compatible with the reference (``cli/reconstruct_sd_diffusion.py:56-82``):
``--store_dir --bitstream --adapter --model_name --out --steps --eta
--guidance --size --device --inv_weight --inv_every --inv_clip_arch
--inv_clip_ckpt --inv_backend --inv_dino_model``. Parity behaviors:

* adapter checkpoints load with container-unwrapping and ``module.``/
  ``adapter.`` prefix stripping (reference ``:26-44``) — both our msgpack and
  reference torch ``.pt`` files are accepted;
* inversion backend auto-picked by bitstream dim: 512 -> CLIP, else DINOv2
  (``:108-110``); the CLIP inversion preprocess is the reference's
  bilinear-224 + CLIP mean/std on [-1,1] inputs (``:47-53``);
* default output name ``<stem>-<steps>-<guidance>-<inv_weight>.png`` next to
  the bitstream (``:191-194``).

Weights: ``$CLIP_CODEC_SD_UNET_WEIGHTS`` / ``$CLIP_CODEC_SD_VAE_WEIGHTS``
(diffusers checkpoints), ``$CLIP_CODEC_CLIP_WEIGHTS`` / ``$CLIP_CODEC_DINO_WEIGHTS``
for the inversion encoders.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ._common import apply_device_flag, default_device


def _fmt_num(x: float) -> str:
    return f"{x:g}"


def load_adapter_params(path: Path):
    """Our msgpack or a reference torch adapter checkpoint."""
    if path.suffix in (".pt", ".pth", ".bin"):
        import torch

        from ..weights.convert_sd import convert_sd_adapter

        return convert_sd_adapter(torch.load(path, map_location="cpu", weights_only=True))
    from ..utils.checkpoint import load_params

    return load_params(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store_dir", type=Path, required=True)
    ap.add_argument("--bitstream", type=Path, required=True)
    ap.add_argument("--adapter", type=Path, required=True, help="trained adapter checkpoint")
    ap.add_argument("--model_name", type=str, default="runwayml/stable-diffusion-v1-5")
    ap.add_argument("--out", type=Path, default=Path("recon.png"))
    ap.add_argument("--steps", type=int, default=30)
    # beyond-reference: DPM-Solver++(2M) reaches DDIM-30-class quality at a
    # fraction of the UNet evaluations — measured on the SD path itself:
    # dpmpp-5 >= ddim-30 on both PSNR and SSIM at 1/6 the evals
    # (docs/performance.md "SD-path sampler knee"; try --sampler dpmpp --steps 10)
    ap.add_argument("--sampler", type=str, default="ddim", choices=("ddim", "dpmpp"))
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--inv_weight", type=float, default=1.0)
    ap.add_argument("--inv_every", type=int, default=1)
    ap.add_argument("--inv_clip_arch", type=str, default="ViT-B-32")
    ap.add_argument("--inv_clip_ckpt", type=str, default="openai")
    ap.add_argument("--inv_backend", type=str, default="auto", choices=["auto", "dino", "clip"])
    ap.add_argument("--inv_dino_model", type=str, default="vit_base_patch14_dinov2.lvd142m")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--heads", type=int, default=8,
                    help="UNet attention heads (not recoverable from kernel shapes)")
    from ._common import add_int8_flag

    add_int8_flag(ap)
    args = ap.parse_args()
    if getattr(args, "int8", False) and args.inv_weight > 0:
        raise SystemExit(
            "--int8 is incompatible with inversion guidance (round() has zero "
            "gradient, so the latent gradient through int8 convs vanishes); "
            "pass --inv_weight 0"
        )
    apply_device_flag(args.device)

    from ..weights.convert_sd import require_sd_weight_paths

    unet_path, vae_path = require_sd_weight_paths()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..models.sd import StableDiffusionDecoder
    from ..train.train_decoder import decode_embedding
    from ..weights.convert_sd import infer_sd_configs, load_sd_params

    z = decode_embedding(args.bitstream, args.store_dir)  # (1, dim), L2-normalized
    dim = z.shape[1]

    unet_params, vae_params = load_sd_params(unet_path, vae_path)
    # Architecture recovered from the kernel shapes (head count is the one
    # free parameter) — any converted checkpoint serves without config flags.
    unet_cfg, vae_cfg = infer_sd_configs(unet_params, vae_params, heads=args.heads)
    dec = StableDiffusionDecoder(
        vae_params, unet_params,
        adapter_params=load_adapter_params(args.adapter),
        clip_dim=dim, n_tokens=8,
        unet_cfg=unet_cfg, vae_cfg=vae_cfg,
        int8=True if args.int8 else None,
    )

    inv_use = args.inv_weight > 0
    embed_fn = None
    if inv_use:
        backend = args.inv_backend
        if backend == "auto":
            backend = "clip" if dim == 512 else "dino"
        if backend == "clip":
            if dim != 512:
                raise ValueError(
                    f"inv_backend=clip but bitstream dim is {dim}; use --inv_backend dino (or auto)"
                )
            from ..encoders import ClipEncoder
            from ..encoders.clip import CLIP_MEAN, CLIP_STD, CLIPModel

            enc = ClipEncoder()

            def embed_fn(x_m11):  # reference _clip_preprocess_torch semantics
                x = (jnp.clip(x_m11, -1, 1) + 1.0) / 2.0
                B = x.shape[0]
                x = jax.image.resize(x, (B, 224, 224, 3), method="bilinear", antialias=False)
                x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
                return enc.model.apply(enc.params, x, method=CLIPModel.encode_image).astype(jnp.float32)

        else:
            from ..encoders import DinoEncoder
            from ..encoders.dino import IMAGENET_MEAN, IMAGENET_STD

            denc = DinoEncoder()
            size = denc.cfg.image_size

            def embed_fn(x_m11):
                x = (jnp.clip(x_m11, -1, 1) + 1.0) / 2.0
                B = x.shape[0]
                x = jax.image.resize(x, (B, size, size, 3), method="bilinear", antialias=False)
                x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
                return denc.model.apply(denc.params, x).astype(jnp.float32)

    # Latent geometry from the (inferred) VAE config: 8x for SD-1.5.
    f = 2 ** (len(vae_cfg.block_out) - 1)
    shape = (1, args.size // f, args.size // f, vae_cfg.latent_ch)
    if args.int8:
        # static activation scales: the measured-best int8 mode (dynamic
        # per-layer absmax costs 3.6x at B=1, docs/performance.md)
        dec.calibrate_int8_scales(jnp.asarray(z), shape)
    zj = jnp.asarray(z)
    if inv_use:
        img = dec.sample_with_inversion(
            zj, zj, embed_fn, shape, steps=args.steps, eta=args.eta,
            guidance_scale=args.guidance, inv_weight=args.inv_weight,
            inv_every=args.inv_every, rng=jax.random.PRNGKey(args.seed),
            sampler=args.sampler,
        )
    else:
        img = dec.sample(
            zj, shape, steps=args.steps, eta=args.eta, guidance_scale=args.guidance,
            rng=jax.random.PRNGKey(args.seed), sampler=args.sampler,
        )

    arr = ((np.asarray(jnp.clip(img[0], -1, 1)) + 1.0) * 127.5).astype(np.uint8)
    # Reference quirk kept for behavior parity: the default output name is
    # detected BY VALUE (cli/reconstruct_sd_diffusion.py:191), so an explicit
    # "--out recon.png" also gets the derived <stem>-<steps>-... name.
    if args.out == Path("recon.png"):
        stem = args.bitstream.stem
        out_path = args.bitstream.with_name(
            f"{stem}-{args.steps}-{_fmt_num(args.guidance)}-{_fmt_num(args.inv_weight)}.png"
        )
    else:
        out_path = args.out
    Image.fromarray(arr).save(out_path)
    print("Saved to", out_path)


if __name__ == "__main__":
    main()
