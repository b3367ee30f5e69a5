"""Numerical parity: Flax models with converted weights vs the torch reference.

Loads the actual reference implementation (read-only, torch CPU), randomly
initializes it, converts the state_dict with weights/convert.py, and asserts
the NHWC Flax forward matches the NCHW torch forward.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF_SRC.exists(), reason="reference checkout not available")

if REF_SRC.exists():
    if str(REF_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SRC))


def _to_nhwc(a):
    return a.transpose(0, 2, 3, 1)


def test_unet_parity(rng):
    torch = pytest.importorskip("torch")
    from clip_feature_codec.models.unet import CLIPCondUNet as TorchUNet

    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.weights.convert import convert_unet

    torch.manual_seed(0)
    z_dim, base, ch_mult = 32, 16, (1, 2)
    tnet = TorchUNet(z_dim=z_dim, base=base, ch_mult=ch_mult, img_ch=3).eval()
    params = {"params": convert_unet(tnet.state_dict(), ch_mult)}

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    z = rng.standard_normal((2, z_dim)).astype(np.float32)
    t = np.array([7, 812])

    with torch.no_grad():
        ref = tnet(torch.from_numpy(x), torch.from_numpy(z), torch.from_numpy(t)).numpy()

    net = CLIPCondUNet(z_dim=z_dim, base=base, ch_mult=ch_mult, img_ch=3)
    ours = np.asarray(net.apply(params, _to_nhwc(x), z, t.astype(np.int32)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)

    # Param count parity
    import jax

    n_ours = sum(a.size for a in jax.tree_util.tree_leaves(params))
    n_ref = sum(p.numel() for p in tnet.parameters())
    assert n_ours == n_ref


def test_resblock_parity(rng):
    torch = pytest.importorskip("torch")
    from clip_feature_codec.models.blocks import ResBlock as TorchRB

    from clip_codec_tpu.models import ResBlock
    from clip_codec_tpu.weights.convert import _resblock

    torch.manual_seed(1)
    trb = TorchRB(16, 24).eval()
    params = {"params": _resblock({f"x.{k}": v for k, v in trb.state_dict().items()}, "x")}

    x = rng.standard_normal((2, 16, 8, 8)).astype(np.float32)
    h = rng.standard_normal((2, 24)).astype(np.float32)
    with torch.no_grad():
        ref = trb(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    ours = np.asarray(ResBlock(16).apply(params, _to_nhwc(x), h))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_lite_decoder_parity(rng):
    torch = pytest.importorskip("torch")
    from clip_feature_codec.models.decoders import FeatureToImageDecoderLite as TorchLite

    from clip_codec_tpu.models import FeatureToImageDecoderLite
    from clip_codec_tpu.weights.convert import convert_lite_decoder

    torch.manual_seed(2)
    tdec = TorchLite(in_dim=32, base=32, out_size=32).eval()
    params = {"params": convert_lite_decoder(tdec.state_dict())}
    z = rng.standard_normal((2, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()
    ours = np.asarray(FeatureToImageDecoderLite(in_dim=32, base=32, out_size=32).apply(params, z))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)


def test_clip_cond_decoder_parity(rng):
    torch = pytest.importorskip("torch")
    from clip_feature_codec.models.decoders import CLIPCondDecoder as TorchDec

    from clip_codec_tpu.models import CLIPCondDecoder
    from clip_codec_tpu.weights.convert import convert_clip_cond_decoder

    torch.manual_seed(3)
    tdec = TorchDec(in_dim=32, base=32, out_size=64).eval()
    params = {"params": convert_clip_cond_decoder(tdec.state_dict(), base=32, out_size=64)}
    z = rng.standard_normal((2, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()
    ours = np.asarray(CLIPCondDecoder(in_dim=32, base=32, out_size=64).apply(params, z))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-3)
