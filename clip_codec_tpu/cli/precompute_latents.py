"""Precompute SD VAE latents for every store image (SD latent path, step 1).

Flag-compatible with the reference (``cli/precompute_latents.py:15-21``):
``--store_dir``. Behavior parity: per manifest image, 512px BICUBIC resize,
VAE encode, x0.18215 scaling, saved as fp16 ``(4, H/8, W/8)`` CHW under
``latents/<stem>.npz`` key ``lat`` (``:8-13,26-29``); writes
``manifest_latents.json`` with an added ``latent`` field (``:30-31``).

SD VAE weights: ``--vae_weights`` or ``$CLIP_CODEC_SD_VAE_WEIGHTS``
(a diffusers ``AutoencoderKL`` checkpoint, converted on load).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

from ._common import apply_device_flag, default_device


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store_dir", type=Path, required=True)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--device", type=str, default=default_device())
    ap.add_argument("--vae_weights", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    apply_device_flag(args.device)

    vae_path = args.vae_weights or os.environ.get("CLIP_CODEC_SD_VAE_WEIGHTS")
    if not vae_path or not Path(vae_path).exists():
        raise RuntimeError(
            "SD VAE weights not found. Convert a diffusers AutoencoderKL checkpoint "
            "and set CLIP_CODEC_SD_VAE_WEIGHTS=<path> (see clip_codec_tpu/weights/convert_sd.py)."
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.sd import SD15_VAE, AutoencoderKL, SD_SCALING_FACTOR
    from ..train.data import load_image_m11
    from ..weights.convert_sd import load_sd_params

    _, vae_params = load_sd_params(vae_path=vae_path)
    vae = AutoencoderKL(SD15_VAE, dtype=jnp.bfloat16)

    @jax.jit
    def encode(x, rng):
        moments = vae.apply({"params": vae_params}, x, method=AutoencoderKL.encode_moments)
        lat = vae.apply({"params": vae_params}, moments, rng, method=AutoencoderKL.sample_latents)
        return lat.astype(jnp.float32) * SD_SCALING_FACTOR

    from ..io.store import dedupe_stems

    store = args.store_dir
    meta = json.loads((store / "manifest.json").read_text())
    stems = dedupe_stems([r["image"] for r in meta])
    out_dir = store / "latents"
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    B = args.batch_size
    for s in range(0, len(meta), B):
        recs = meta[s : s + B]
        from ..utils.batching import pad_rows

        x = pad_rows(np.stack([load_image_m11(r["image"], args.size) for r in recs]), B)
        rng, srng = jax.random.split(rng)
        lats = np.asarray(encode(jnp.asarray(x), srng))[: len(recs)]
        for j, (r, lat) in enumerate(zip(recs, lats)):
            lat_path = out_dir / (stems[s + j] + ".npz")
            # fp16 CHW, key 'lat' — byte-format parity with the reference
            np.savez_compressed(lat_path, lat=lat.transpose(2, 0, 1).astype(np.float16))
            r["latent"] = str(lat_path)
    (store / "manifest_latents.json").write_text(json.dumps(meta, indent=2))
    print(f"Wrote {len(meta)} latents to {out_dir}")


if __name__ == "__main__":
    main()
