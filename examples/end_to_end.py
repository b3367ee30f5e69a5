"""Runnable end-to-end example on synthetic data (no pretrained weights).

    python examples/end_to_end.py          # CPU-forced in-process
    python examples/end_to_end.py --tpu    # use the default accelerator

Builds a tiny store, trains a small diffusion decoder, reconstructs an image
from its .clp bitstream, and scores it.
"""

import sys
import tempfile
from pathlib import Path

import jax

# In-process platform forcing: a preloaded TPU plugin can override the
# JAX_PLATFORMS env var from sitecustomize, so the env var alone is not
# reliable (see CLAUDE.md "Environment rules"). Must run before backend use.
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clip_codec_tpu.codec import ClipCodec
from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.eval.metrics import psnr
from clip_codec_tpu.io.store import write_store
from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion


def main(size=32, epochs=8):
    tmp = Path(tempfile.mkdtemp())
    rng = np.random.default_rng(0)
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(8):
        p = img_dir / f"im{i}.png"
        Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))

    # synthetic "CLIP" embeddings (real pipelines use cli.encode_images)
    feats = rng.standard_normal((8, 64)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp / "store"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    print(f"store written: {store} ({sum(f.stat().st_size for f in store.glob('*.clp'))} bytes of bitstreams)")

    cfg = DiffusionTrainConfig(out_size=size, epochs=epochs, batch_size=8, lr=1e-3,
                               timesteps=100, base=16, ch_mult=(1, 2), bf16=False)
    train_diffusion(store, config=cfg)

    codec = ClipCodec.load(store)
    blob = (store / "im0.clp").read_bytes()
    recon = codec.decompress([blob], size=size, steps=20)[0]
    orig = np.asarray(Image.open(paths[0]), dtype=np.float32) / 127.5 - 1.0
    print(f"reconstructed im0: PSNR={psnr(orig.transpose(2,0,1), recon.transpose(2,0,1)):.2f} dB")
    out = tmp / "recon0.png"
    Image.fromarray(((recon + 1) * 127.5).astype(np.uint8)).save(out)
    print(f"saved {out}")

    # AOT deployment: serialize the compiled decompress program and serve it
    # without re-tracing the model (docs/deployment.md)
    from clip_codec_tpu.deploy import export_decompressor, load_decompressor
    from clip_codec_tpu.utils.checkpoint import load_params
    from clip_codec_tpu.utils.config import ModelConfig

    ckpt = store / "diffusion_unet_final.msgpack"
    params = load_params(ckpt)
    art = export_decompressor(params, ModelConfig.find_for_checkpoint(ckpt),
                              tmp / "decoder.jaxprog", size=size, steps=20,
                              batch_size=1)
    dec = load_decompressor(art)
    img2 = np.asarray(dec(params, codec.decode_embeddings([blob]), seed=0))[0]
    print(f"AOT artifact {art.name}: {art.stat().st_size // 1024} KiB "
          f"(weights stay arguments), serve output finite={np.isfinite(img2).all()}")


if __name__ == "__main__":
    main()
