"""High-level ClipCodec facade: load from store, decompress, embeddings."""

import numpy as np
import pytest

from clip_codec_tpu.codec import ClipCodec


def test_facade_decompress(tmp_path, rng):
    from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
    from clip_codec_tpu.io.bitstream import compress_frame
    from clip_codec_tpu.io.store import write_store
    from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion
    from PIL import Image

    # tiny store + trained decoder
    img_dir = tmp_path / "imgs"; img_dir.mkdir()
    paths = []
    for i in range(4):
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((4, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    train_diffusion(store, config=DiffusionTrainConfig(
        out_size=16, epochs=1, batch_size=4, timesteps=50, base=8, ch_mult=(1, 2), bf16=False))

    codec = ClipCodec.load(store)
    blobs = [compress_frame(q[i].tobytes()) for i in range(4)]
    z = codec.decode_embeddings(blobs)
    assert z.shape == (4, 16)
    np.testing.assert_allclose(np.linalg.norm(z, axis=1), 1.0, rtol=1e-5)

    imgs = codec.decompress(blobs, size=16, steps=3, batch_size=3)
    assert imgs.shape == (4, 16, 16, 3)
    assert np.all(np.isfinite(imgs))
    assert np.abs(imgs).max() <= 1.0

    # DPM-Solver++ serving mode shares the facade
    imgs2 = codec.decompress(blobs, size=16, steps=3, batch_size=3, sampler="dpmpp")
    assert imgs2.shape == (4, 16, 16, 3)
    assert np.all(np.isfinite(imgs2))
    with pytest.raises(ValueError, match="deterministic"):
        codec.decompress(blobs, size=16, steps=3, eta=0.5, sampler="dpmpp")
    with pytest.raises(ValueError, match="unknown sampler"):
        codec.decompress(blobs, size=16, steps=3, sampler="euler")

    # seed= reproduces trajectories (matches the AOT artifact semantics);
    # default internal rng evolves call to call
    a = codec.decompress(blobs[:1], size=16, steps=3, batch_size=1, seed=11)
    b = codec.decompress(blobs[:1], size=16, steps=3, batch_size=1, seed=11)
    c = codec.decompress(blobs[:1], size=16, steps=3, batch_size=1, seed=12)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    d1 = codec.decompress(blobs[:1], size=16, steps=3, batch_size=1)
    d2 = codec.decompress(blobs[:1], size=16, steps=3, batch_size=1)
    assert not np.array_equal(d1, d2)

    # the numpy serving hot path decodes identically to the jitted path
    np.testing.assert_allclose(
        codec.decode_embeddings_host(blobs), codec.decode_embeddings(blobs),
        rtol=1e-6, atol=1e-7)


def test_facade_without_decoder(tmp_path, rng):
    from clip_codec_tpu.codecs.quantizer import fit_affine
    import numpy as np

    feats = rng.standard_normal((4, 16)).astype(np.float32)
    scale, zero = fit_affine(feats)
    np.savez(tmp_path / "codec_meta.npz", scale=np.asarray(scale), zero=np.asarray(zero), dim=np.int32(16))
    codec = ClipCodec.load(tmp_path)
    with pytest.raises(RuntimeError, match="checkpoint"):
        codec.decompress([b""], size=16)


def test_facade_infers_config_without_json(tmp_path, rng):
    """ClipCodec.load works on a checkpoint with NO model_config.json by
    inferring base/ch_mult/z_dim from the parameter tree (regression: raw
    ScopeParamShapeError before)."""
    from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
    from clip_codec_tpu.io.bitstream import compress_frame
    from clip_codec_tpu.io.store import write_store
    from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion
    from PIL import Image

    img_dir = tmp_path / "imgs"; img_dir.mkdir()
    paths = []
    for i in range(2):
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((2, 16)).astype(np.float32)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    train_diffusion(store, config=DiffusionTrainConfig(
        out_size=16, epochs=1, batch_size=2, timesteps=50, base=8, ch_mult=(1, 2), bf16=False))
    (store / "model_config.json").unlink()  # simulate an older checkpoint dir

    codec = ClipCodec.load(store)
    assert codec.mc.base == 8 and codec.mc.ch_mult == (1, 2) and codec.mc.z_dim == 16
    out = codec.decompress([compress_frame(q[0].tobytes())], size=16, steps=2, batch_size=1)
    assert out.shape == (1, 16, 16, 3)
