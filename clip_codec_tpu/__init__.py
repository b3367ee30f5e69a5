"""clip_codec_tpu — a TPU-native (JAX / Flax / Pallas / pjit) neural image codec.

A from-scratch rebuild of the capabilities of ``lionl1106/Clip-Neural-image-conpression``
(the ``clip-feature-codec`` package): images are compressed to a single CLIP (or
DINOv2) embedding, quantized to uint8 with a per-channel affine quantizer, and
framed into a zstd ``.clp`` bitstream; decompression runs a CLIP-conditioned
diffusion decoder (FiLM-conditioned pixel-space U-Net sampled with DDIM, or a
frozen Stable-Diffusion latent decoder with a small trainable adapter). The
package also ships training, evaluation (PSNR/SSIM/LPIPS/CLIP-sim) and
text-to-image retrieval over the compressed store.

Layer map (mirrors the reference's layers, see SURVEY.md §1):

========  =============================  =====================================
Layer     Reference location             This package
========  =============================  =====================================
L0        ``io/bitstream.py``            :mod:`clip_codec_tpu.io.bitstream`
L1        ``codecs/quantizer.py``        :mod:`clip_codec_tpu.codecs.quantizer`
L2        ``cli/encode_images*.py``      :mod:`clip_codec_tpu.encoders`
L3        ``diffusion/``                 :mod:`clip_codec_tpu.diffusion`
L4        ``models/``                    :mod:`clip_codec_tpu.models`
L5        ``train/``                     :mod:`clip_codec_tpu.train`
L6        ``eval/metrics.py``            :mod:`clip_codec_tpu.eval`
L7        ``index/faiss_index.py``       :mod:`clip_codec_tpu.index`
L8        ``cli/``                       :mod:`clip_codec_tpu.cli`
—         (none in reference)            :mod:`clip_codec_tpu.ops` (Pallas),
                                         :mod:`clip_codec_tpu.parallel` (mesh)
========  =============================  =====================================
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (kept lazy — importing the full stack pulls
    in flax/optax, which CLI --help paths should not pay for)."""
    if name == "ClipCodec":
        from .codec import ClipCodec

        return ClipCodec
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
