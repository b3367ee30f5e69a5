"""Store round-trip: write_store -> Store.open -> decode matches source."""

import json

import numpy as np

from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.io.store import Store, write_store


def test_store_roundtrip(tmp_path, rng):
    feats = rng.standard_normal((8, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    paths = [f"/data/img_{i}.png" for i in range(8)]
    manifest = write_store(tmp_path, feats, paths, np.asarray(scale), np.asarray(zero), q)
    assert len(manifest) == 8
    assert (tmp_path / "manifest.json").exists()
    assert (tmp_path / "codec_meta.npz").exists()
    assert (tmp_path / "img_0.clp").exists()

    st = Store.open(tmp_path)
    assert len(st) == 8
    assert st.dim == 512
    # Decoded vectors are within quantization error, then renormalized.
    z = st.decode_all(renormalize=False)
    assert np.abs(z - feats).max() <= 0.5 * np.asarray(scale).max() + 1e-7
    zn = st.decode_all(renormalize=True)
    np.testing.assert_allclose(np.linalg.norm(zn, axis=1), 1.0, rtol=1e-5)


def test_manifest_schema(tmp_path, rng):
    feats = rng.standard_normal((2, 16)).astype(np.float32)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    write_store(tmp_path, feats, ["a.jpg", "b.jpg"], np.asarray(scale), np.asarray(zero), q)
    recs = json.loads((tmp_path / "manifest.json").read_text())
    assert set(recs[0].keys()) == {"image", "bitstream"}
    meta = np.load(tmp_path / "codec_meta.npz")
    assert meta["scale"].dtype == np.float32
    assert meta["zero"].dtype == np.float32
    assert int(meta["dim"]) == 16
