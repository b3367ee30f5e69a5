"""Evaluate reconstruction quality over a whole store.

Flag-compatible with the reference (``cli/eval.py:34-42``): ``--store_dir
--weights --size --steps --eta --device --out_json``; same stdout aggregate
format and NaN-skipping means (``cli/eval.py:77-83``).

TPU-first redesign of the reference's severe serialization (SURVEY.md §3.4 —
1 image per DDIM batch, LPIPS/CLIP models re-instantiated per image): here
reconstruction runs in device batches through one compiled sampler, PSNR/SSIM
are computed batched on device, and the optional LPIPS/CLIP scorers load once.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ._common import add_int8_flag, apply_device_flag, apply_int8_flag, default_device


def main() -> None:
    ap = argparse.ArgumentParser(description="Evaluate reconstruction quality on a store of images.")
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--weights", type=str, required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--sampler", type=str, default="ddim", choices=("ddim", "ddim_std", "dpmpp"),
                    help="ddim (reference-parity), ddim_std (textbook strided DDIM), "
                         "or dpmpp (DPM-Solver++(2M), eta=0 only)")
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--out_json", type=str, default=None)
    ap.add_argument("--batch_size", type=int, default=8, help="DDIM reconstruction batch")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each reconstruction batch over all devices "
                         "(batch_size must divide the device count)")
    ap.add_argument("--base", type=int, default=None,
                    help="U-Net base width (default: model_config.json next to --weights, else 128)")
    ap.add_argument("--ch_mult", type=str, default=None, help="U-Net channel multipliers")
    ap.add_argument("--seed", type=int, default=0)
    add_int8_flag(ap)
    args = ap.parse_args()
    apply_device_flag(args.device)
    apply_int8_flag(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..diffusion import NoiseSchedule, make_sampler
    from ..eval.metrics import clip_similarity_batch, lpips_batch, psnr_batch, ssim_batch
    from ..eval.metrics import _default_clip_encoder, _default_lpips
    from ..models import CLIPCondUNet
    from ..train.data import load_image_m11
    from ..io.store import Store
    from ..utils.checkpoint import load_unet_checkpoint

    from ..utils.config import ModelConfig

    store = Store.open(args.store_dir)
    mc = ModelConfig.find_for_checkpoint(args.weights)
    base = args.base if args.base is not None else (mc.base if mc else 128)
    ch_mult = (tuple(int(c) for c in args.ch_mult.split(","))
               if args.ch_mult is not None else (mc.ch_mult if mc else (1, 2, 2)))
    params = load_unet_checkpoint(args.weights, ch_mult)
    net = CLIPCondUNet(z_dim=store.dim, base=base, ch_mult=ch_mult, img_ch=3,
                       dtype=jnp.bfloat16, int8=True if args.int8 else None)
    sched = (NoiseSchedule.create(mc.timesteps, mc.schedule) if mc
             else NoiseSchedule.create(1000, "cosine"))
    sampler = make_sampler(args.sampler, sched, eta=args.eta)
    model_fn = lambda p, xt, zz, t: net.apply(p, xt, zz, t)
    model_params = {"params": params}
    if args.int8:
        # static activation scales (see ops/int8.py calibrate_unet)
        from ..ops.int8 import calibrate_unet

        model_params["quant"] = calibrate_unet(
            net.apply, {"params": params}, args.size, store.dim,
            timesteps=sched.timesteps,
        )

    mesh = None
    if args.data_parallel:
        from ..parallel import make_mesh, replicate, sample_sharded

        mesh = make_mesh()
        if args.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size={args.batch_size} not divisible by the "
                f"data-axis size {mesh.shape['data']}"
            )
        model_params = replicate(mesh, model_params)

    lpips_model = _default_lpips()
    clip_enc = _default_clip_encoder()

    metrics = []
    B = args.batch_size
    n = len(store)
    rng = jax.random.PRNGKey(args.seed)
    for s in range(0, n, B):
        idx = list(range(s, min(s + B, n)))
        from ..utils.batching import pad_rows

        z = np.stack([store.decode_vector(i) for i in idx])
        zb = pad_rows(z, B)
        rng, srng = jax.random.split(rng)
        if mesh is not None:
            x = sample_sharded(mesh, model_fn, sched, zb, args.size,
                               steps=args.steps, eta=args.eta, rng=srng,
                               model_params=model_params)
        else:
            x = sampler.sample(model_fn, jnp.asarray(zb), (B, args.size, args.size, 3),
                               steps=args.steps, rng=srng, model_params=model_params)
        recon = np.asarray(np.clip(np.asarray(x), -1, 1))[: len(idx)]
        orig = np.stack([load_image_m11(store.manifest[i]["image"], args.size) for i in idx])
        ps = np.asarray(psnr_batch(jnp.asarray(orig), jnp.asarray(recon)))
        ss = np.asarray(ssim_batch(jnp.asarray(orig), jnp.asarray(recon)))
        # All four metrics batched: PSNR/SSIM fully on device, LPIPS one
        # jitted VGG pass per batch, CLIP-sim one ViT pass per batch (host
        # PIL preprocess kept for reference-exact semantics).
        lp = lpips_batch(orig, recon, lpips_model=lpips_model)
        cs = clip_similarity_batch(orig, recon, encoder=clip_enc)
        for j, i in enumerate(idx):
            metrics.append({
                "image": store.manifest[i]["image"],
                "psnr": float(ps[j]),
                "ssim": float(ss[j]),
                "lpips": float(lp[j]),
                "clip_sim": float(cs[j]),
            })

    def _agg(key):
        vals = [m[key] for m in metrics if not np.isnan(m[key])]
        return float(np.mean(vals)) if vals else float("nan")

    print(f"Average PSNR: {_agg('psnr'):.2f} dB")
    print(f"Average SSIM: {_agg('ssim'):.4f}")
    print(f"Average LPIPS: {_agg('lpips'):.4f}")
    print(f"Average CLIP similarity: {_agg('clip_sim'):.4f}")
    if args.out_json:
        with open(args.out_json, "w", encoding="utf-8") as f:
            json.dump(metrics, f, ensure_ascii=False, indent=2)


if __name__ == "__main__":
    main()
