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
    ap.add_argument("--weights", type=str, required=True,
                    help="msgpack checkpoint or reference torch .pt state_dict")
    ap.add_argument("--out", type=str, default="decoder.jaxprog")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--batch_size", type=int, default=16,
                    help="static serving batch baked into the artifact")
    ap.add_argument("--sampler", type=str, default="ddim", choices=("ddim", "dpmpp"))
    ap.add_argument("--platforms", type=str, default=None,
                    help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                         "(default: current backend only)")
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--base", type=int, default=None)
    ap.add_argument("--ch_mult", type=str, default=None)
    ap.add_argument("--z_dim", type=int, default=None,
                    help="override the z_dim inferred from the checkpoint")
    args = ap.parse_args()
    apply_device_flag(args.device)

    from ..deploy import export_decompressor
    from ..utils.checkpoint import load_unet_checkpoint
    from ..utils.config import ModelConfig

    mc = ModelConfig.find_for_checkpoint(args.weights)
    ch_mult = (tuple(int(c) for c in args.ch_mult.split(","))
               if args.ch_mult is not None else (mc.ch_mult if mc else (1, 2, 2)))
    params = load_unet_checkpoint(args.weights, ch_mult)
    if mc is None:
        overrides = {}
        if args.z_dim is not None:
            overrides["z_dim"] = args.z_dim
        if args.base is not None:
            overrides["base"] = args.base
        mc = ModelConfig.infer_from_params(params, **overrides)
    platforms = args.platforms.split(",") if args.platforms else None
    path = export_decompressor(
        params, mc, args.out, size=args.size, steps=args.steps,
        sampler=args.sampler, eta=args.eta, batch_size=args.batch_size,
        platforms=platforms,
    )
    print(f"Exported {path} ({path.stat().st_size / 1024:.1f} KiB, "
          f"sampler={args.sampler}, steps={args.steps}, size={args.size}, "
          f"batch={args.batch_size})")


if __name__ == "__main__":
    main()
