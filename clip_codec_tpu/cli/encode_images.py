"""Encode a directory of images to CLIP embeddings -> quantized ``.clp`` store.

Flag-compatible with the reference CLI (``cli/encode_images.py:58-66``):
``--img_dir --out_dir --model --pretrained --batch_size --device``. The
encode path is the native Flax CLIP tower (weights via
``CLIP_CODEC_CLIP_WEIGHTS``; ``--model/--pretrained`` select the config —
only ViT-B-32 ships natively so far).

Run: ``python -m clip_codec_tpu.cli.encode_images --img_dir D --out_dir S``
"""

from __future__ import annotations

import argparse

import numpy as np

from ._common import apply_device_flag, default_device, rglob_images


def main() -> None:
    ap = argparse.ArgumentParser(description="Encode images to CLIP and save per-vector bitstreams.")
    ap.add_argument("--img_dir", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--model", type=str, default="ViT-B-32")
    ap.add_argument("--pretrained", type=str, default="openai")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--weights", type=str, default=None,
                    help="CLIP checkpoint path (else $CLIP_CODEC_CLIP_WEIGHTS)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each encode batch over all chips (params "
                         "replicated); same embeddings, N-chip throughput")
    ap.add_argument("--append", action="store_true",
                    help="add images to an EXISTING store: new vectors are "
                         "quantized against the store's codec_meta (old "
                         "frames stay byte-identical; out-of-range values "
                         "clamp) and the manifest grows — the reference can "
                         "only re-encode a whole directory")
    args = ap.parse_args()
    apply_device_flag(args.device)

    if args.model != "ViT-B-32":
        raise SystemExit(f"Only ViT-B-32 is built in (got {args.model}); extend encoders/clip.py CLIPConfig.")

    from ..codecs.quantizer import fit_affine, quantize
    from ..encoders import ClipEncoder
    from ..io.store import append_store, write_store

    if args.append:
        # fail BEFORE the expensive encode pass: the store must exist
        from ..io.store import Store

        try:
            st = Store.open(args.out_dir)
        except FileNotFoundError as e:
            raise SystemExit(f"--append needs an existing store: {e}")

    mesh = None
    if args.data_parallel:
        from ..parallel import make_mesh

        mesh = make_mesh()
    encoder = ClipEncoder(weights_path=args.weights, mesh=mesh)
    if args.append and st.dim != encoder.cfg.embed_dim:
        # still before the encode pass: dim mismatch fails in seconds,
        # not after hours of encoding
        raise SystemExit(f"--append target {args.out_dir} is {st.dim}-d but "
                         f"this encoder emits {encoder.cfg.embed_dim}-d "
                         f"embeddings")
    paths = rglob_images(args.img_dir)
    feats, kept = encoder.encode_images(paths, batch_size=args.batch_size)
    if feats.size == 0:
        raise SystemExit("No images encoded.")

    if args.append:
        recs = append_store(args.out_dir, feats, kept)
        print(f"Done. Appended {len(recs)} vectors to {args.out_dir}")
        return

    scale, zero = fit_affine(feats)  # eps=1e-8, matching the torch quantizer
    q = np.asarray(quantize(feats, scale, zero))
    manifest = write_store(args.out_dir, feats, kept, np.asarray(scale), np.asarray(zero), q, dim_dtype="int32")
    print(f"Done. Stored {len(manifest)} vectors in {args.out_dir}")


if __name__ == "__main__":
    main()
