"""Bitwise ``.clp`` parity vs the torch reference, backed by measurement.

BASELINE.md's strongest format target: given the SAME fp32 embeddings, the
two frameworks must emit byte-identical ``.clp`` bitstreams. Round 1 claimed
this was blocked by rounding-boundary ties ("~0.5% of coordinates within
1e-5 of a boundary"); this file replaces that prose with data on a committed
fixture (``tests/fixtures/clip_embeddings_fp32.npz``: 256 l2-normalized
512-dim fp32 vectors, CLIP-embedding-shaped):

* codebook (scale, zero) BIT-equal to the reference's
  ``PerChannelAffineQuantizer.fit`` (``codecs/quantizer.py:22-27``) — this
  required pinning the final scale division to host IEEE fp32 semantics,
  because XLA rewrites divide-by-constant into a reciprocal multiply that is
  1 ulp off in ~74% of channels (see ``fit_affine``'s docstring);
* quantized integers: measured **131072/131072 agreement (100%)**;
* ``.clp`` frames byte-identical through each framework's full writer
  (magic + length + zstd-22 framing).

The boundary-distance histogram is also asserted so a future fixture change
that happens to dodge all ties cannot silently weaken the test: ~0.02% of
coordinates land within 1e-4 of a rounding boundary, and they still agree
because the pre-round quotients are bit-identical, not merely close.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF_SRC.exists(), reason="reference checkout not available")

if REF_SRC.exists() and str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))

FIXTURE = Path(__file__).parent / "fixtures" / "clip_embeddings_fp32.npz"


@pytest.fixture(scope="module")
def Z():
    return np.load(FIXTURE)["Z"]


@pytest.fixture(scope="module")
def quantizers(Z):
    torch = pytest.importorskip("torch")
    from clip_feature_codec.codecs.quantizer import PerChannelAffineQuantizer as RefQ

    from clip_codec_tpu.codecs import PerChannelAffineQuantizer as OurQ

    return RefQ().fit(torch.from_numpy(Z)), OurQ().fit(Z)


def test_codebook_bitwise_equal(quantizers):
    rq, oq = quantizers
    np.testing.assert_array_equal(
        rq.scale.numpy().view(np.uint32), np.asarray(oq.scale).view(np.uint32)
    )
    np.testing.assert_array_equal(
        rq.zero.numpy().view(np.uint32), np.asarray(oq.zero).view(np.uint32)
    )


def test_quantized_integers_bitwise_equal(Z, quantizers):
    import torch

    rq, oq = quantizers
    q_ref = np.stack([rq.encode(torch.from_numpy(Z[i])) for i in range(Z.shape[0])])
    q_ours = np.stack([oq.encode(Z[i]) for i in range(Z.shape[0])])
    agree = q_ref == q_ours
    print(f"integer agreement: {agree.sum()}/{agree.size} = {100 * agree.mean():.6f}%")
    np.testing.assert_array_equal(q_ours, q_ref)


def test_ties_are_present_and_still_agree(Z, quantizers):
    """The fixture must actually exercise near-boundary coordinates (else the
    100% above proves nothing about ties). Measured histogram on this
    fixture: ~0.002% within 1e-5 and ~0.02% within 1e-4 of a boundary."""
    _, oq = quantizers
    y = (Z - np.asarray(oq.zero)[None, :]) / np.asarray(oq.scale)[None, :]
    dist = np.abs(np.abs(y - np.floor(y)) - 0.5)  # distance to the .5 boundary
    n_near = int((dist < 1e-4).sum())
    print(f"coords within 1e-4 of a rounding boundary: {n_near}/{dist.size}")
    assert n_near >= 10  # histogram support: the test has teeth


def test_clp_frames_byte_identical(Z, quantizers, tmp_path):
    """Through each framework's FULL writer (quantize -> frame -> zstd)."""
    import torch
    from clip_feature_codec.io.bitstream import write_bitstream as ref_write

    from clip_codec_tpu.io import write_bitstream as our_write

    rq, oq = quantizers
    for i in range(0, Z.shape[0], 37):  # a spread of vectors
        q_ref = rq.encode(torch.from_numpy(Z[i]))
        q_ours = oq.encode(Z[i])
        ref_path, our_path = tmp_path / f"r{i}.clp", tmp_path / f"o{i}.clp"
        ref_write(q_ref.tobytes(), Z.shape[1], ref_path)
        our_write(q_ours.tobytes(), Z.shape[1], our_path)
        assert ref_path.read_bytes() == our_path.read_bytes()


def test_dino_variant_matches_reference_math(Z):
    """The DINO CLI's numpy ``quantise_vectors`` (eps=1e-6, denominator
    255.0 — ``cli/encode_images_dino.py:45-53``): our eps=1e-6 fit must be
    bit-equal to that math. Replicated inline because importing the
    reference CLI module pulls in timm, which this environment lacks."""
    from clip_codec_tpu.codecs import PerChannelAffineQuantizer as OurQ

    xmin = Z.min(axis=0)
    xmax = Z.max(axis=0)
    scale = np.maximum(xmax - xmin, np.float32(1e-6)) / np.float32(255.0)
    q_ref = np.clip(np.round((Z - xmin) / scale), 0, 255).astype(np.uint8)

    oq = OurQ(eps=1e-6).fit(Z)
    np.testing.assert_array_equal(
        np.asarray(oq.scale).view(np.uint32), scale.astype(np.float32).view(np.uint32)
    )
    q_ours = np.stack([oq.encode(Z[i]) for i in range(Z.shape[0])])
    np.testing.assert_array_equal(q_ours, q_ref)
