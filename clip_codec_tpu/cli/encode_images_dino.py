"""Encode images with DINOv2 into a ``.clp`` store (DINO front-end).

Flag-compatible with the reference (``cli/encode_images_dino.py:57-66``):
``--img_dir --out_dir --model_name --device``. Reference behaviors kept:
non-recursive sorted directory listing with the gif-including extension set
(``:71-73``), quantizer eps 1e-6 (``:45-53``), ``dim`` saved as int64 scalar
(``:92-94``). Improvement: images are encoded in device batches instead of
one-by-one.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ._common import apply_device_flag, default_device

DINO_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".gif"}


def main() -> None:
    ap = argparse.ArgumentParser(description="Encode images into DINOv2 feature bitstreams.")
    ap.add_argument("--img_dir", type=Path, required=True, help="Directory of input images")
    ap.add_argument("--out_dir", type=Path, required=True, help="Directory to write bitstreams and metadata")
    ap.add_argument("--model_name", type=str, default="vit_base_patch14_dinov2.lvd142m",
                    help="DINOv2 variant (only the ViT-B/14 config ships natively)")
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--weights", type=str, default=None,
                    help="Dinov2 checkpoint path (else $CLIP_CODEC_DINO_WEIGHTS)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each encode batch over all chips (params "
                         "replicated); same embeddings, N-chip throughput")
    args = ap.parse_args()
    apply_device_flag(args.device)

    if "vit_base_patch14_dinov2" not in args.model_name:
        raise SystemExit(f"Only vit_base_patch14_dinov2 is built in (got {args.model_name}).")

    img_paths = [p for p in sorted(args.img_dir.iterdir()) if p.suffix.lower() in DINO_EXTS]
    if not img_paths:
        raise ValueError(f"No supported image files found in {args.img_dir}")

    from ..codecs.quantizer import fit_affine, quantize
    from ..encoders import DinoEncoder
    from ..io.store import write_store

    mesh = None
    if args.data_parallel:
        from ..parallel import make_mesh

        mesh = make_mesh()
    encoder = DinoEncoder(weights_path=args.weights, mesh=mesh)
    z, kept = encoder.encode_images([str(p) for p in img_paths])
    if z.size == 0:
        raise SystemExit("No images encoded.")
    scale, zero = fit_affine(z, eps=1e-6)  # DINO-path eps (encode_images_dino.py:48)
    q = np.asarray(quantize(z, scale, zero))
    write_store(args.out_dir, z, kept, np.asarray(scale), np.asarray(zero), q, dim_dtype="int64")
    print(f"Encoded {len(kept)} images to {args.out_dir}")


if __name__ == "__main__":
    main()
