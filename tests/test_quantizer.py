"""Quantizer parity and error-bound tests.

Parity oracle is an independent numpy transcription of the reference math
(``codecs/quantizer.py:22-39``); both use round-half-to-even so the uint8 codes
must agree exactly.
"""

import numpy as np
import pytest

from clip_codec_tpu.codecs.quantizer import (
    PerChannelAffineQuantizer,
    dequantize,
    dequantize_l2norm,
    fit_affine,
    quantize,
)


def _np_fit(X, bits=8, eps=1e-8):
    xmin, xmax = X.min(axis=0), X.max(axis=0)
    scale = np.maximum(xmax - xmin, eps) / (2**bits - 1)
    return scale.astype(np.float32), xmin.astype(np.float32)


def _np_encode(x, scale, zero, bits=8):
    q = np.clip(np.round((x - zero) / scale), 0, 2**bits - 1)
    return q.astype(np.uint8)


@pytest.mark.parametrize("dim", [512, 768])
def test_fit_encode_matches_numpy(rng, dim):
    X = rng.standard_normal((64, dim)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    scale, zero = fit_affine(X)
    scale_np, zero_np = _np_fit(X)
    np.testing.assert_allclose(np.asarray(scale), scale_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(zero), zero_np, rtol=1e-6)
    q = np.asarray(quantize(X, scale, zero))
    q_np = _np_encode(X, np.asarray(scale), np.asarray(zero))
    np.testing.assert_array_equal(q, q_np)


def test_roundtrip_error_bound(rng):
    X = rng.standard_normal((32, 512)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    scale, zero = fit_affine(X)
    q = quantize(X, scale, zero)
    Xh = np.asarray(dequantize(q, scale, zero))
    # Max error is half an LSB per channel.
    err = np.abs(Xh - X)
    assert np.all(err <= 0.5 * np.asarray(scale) + 1e-7)


def test_constant_channel_eps(rng):
    # A constant channel hits the eps floor; codes must be 0 and decode to xmin.
    X = rng.standard_normal((16, 8)).astype(np.float32)
    X[:, 3] = 0.25
    scale, zero = fit_affine(X)
    assert np.asarray(scale)[3] == pytest.approx(1e-8 / 255)
    q = np.asarray(quantize(X, scale, zero))
    assert np.all(q[:, 3] == 0)


def test_class_api(rng):
    X = rng.standard_normal((16, 32)).astype(np.float32)
    qzr = PerChannelAffineQuantizer(8).fit(X)
    q = qzr.encode(X)
    assert q.dtype == np.uint8
    Xh = qzr.decode(q)
    assert Xh.dtype == np.float32
    assert np.abs(Xh - X).max() < np.asarray(qzr.scale).max()


def test_unfitted_raises():
    qzr = PerChannelAffineQuantizer()
    with pytest.raises(RuntimeError):
        qzr.encode(np.zeros((1, 4), np.float32))


def test_dequantize_l2norm(rng):
    X = rng.standard_normal((8, 64)).astype(np.float32)
    scale, zero = fit_affine(X)
    q = quantize(X, scale, zero)
    z = np.asarray(dequantize_l2norm(q, scale, zero))
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, rtol=1e-5)


def test_dino_variant_eps(rng):
    # DINO path uses eps=1e-6, denominator 255.0 (cli/encode_images_dino.py:45-53)
    X = rng.standard_normal((16, 768)).astype(np.float32)
    scale, zero = fit_affine(X, num_bits=8, eps=1e-6)
    z_min, z_max = X.min(axis=0), X.max(axis=0)
    expect = np.maximum(z_max - z_min, 1e-6) / 255.0
    np.testing.assert_allclose(np.asarray(scale), expect.astype(np.float32), rtol=1e-6)


def test_losses_edge_cases(rng):
    """weighted_mean with all-zero weights, TV on flat images."""
    import jax.numpy as jnp

    from clip_codec_tpu.train.losses import total_variation, weighted_mean

    # all-pad batch: mean must not divide by zero
    v = weighted_mean(jnp.ones(4), jnp.zeros(4))
    assert np.isfinite(float(v))
    # flat image has zero TV
    tv = total_variation(jnp.ones((2, 8, 8, 3)))
    np.testing.assert_allclose(np.asarray(tv), 0.0, atol=1e-7)


def test_device_flag_noop_for_tpu(monkeypatch):
    from clip_codec_tpu.cli._common import apply_device_flag

    # 'cpu' flips the backend (conftest already forced cpu, so it's a no-op
    # here); any other value must leave config untouched and not raise.
    apply_device_flag("cpu")
    apply_device_flag("tpu")
    apply_device_flag("cuda")  # reference default string: accepted, ignored
