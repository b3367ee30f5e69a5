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


def test_epoch_prefetch_equivalence(tmp_path, rng):
    """Prefetched and synchronous epoch iteration yield identical batches."""
    from PIL import Image

    from clip_codec_tpu.train.data import StoreData

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(5):
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((5, 8)).astype(np.float32)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "s"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)

    data = StoreData(store, out_size=8)
    a = list(data.epoch(2, np.random.default_rng(1), prefetch=2))
    b = list(data.epoch(2, np.random.default_rng(1), prefetch=0))
    assert len(a) == len(b) == 3
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.x0, bb.x0)
        np.testing.assert_array_equal(ba.z, bb.z)
        np.testing.assert_array_equal(ba.weight, bb.weight)


def test_workers_and_cache_equivalence(tmp_path, rng):
    """Threaded decode and the uint8 RAM cache are bit-identical to the
    synchronous path, across epochs (cache hit path included)."""
    from PIL import Image

    from clip_codec_tpu.train.data import StoreData

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(5):
        p = img_dir / f"{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((5, 8)).astype(np.float32)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "s"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)

    base = StoreData(store, out_size=8)
    pooled = StoreData(store, out_size=8, workers=3)
    cached = StoreData(store, out_size=8, cache_images=True)
    both = StoreData(store, out_size=8, workers=2, cache_images=True)
    for epoch_seed in (1, 2):  # epoch 2 exercises cache hits
        ref = list(base.epoch(2, np.random.default_rng(epoch_seed)))
        for variant in (pooled, cached, both):
            got = list(variant.epoch(2, np.random.default_rng(epoch_seed)))
            assert len(got) == len(ref)
            for ba, bb in zip(ref, got):
                np.testing.assert_array_equal(ba.x0, bb.x0)
                np.testing.assert_array_equal(ba.z, bb.z)
                np.testing.assert_array_equal(ba.weight, bb.weight)
    # Cache actually populated (decode-free epochs after the first).
    assert all(a is not None for a in cached._cache)


def test_epoch_local_slicing(tmp_path, rng):
    """``epoch(local=(lo, hi))`` (multi-process DP): the per-process slices
    concatenate to exactly the global batch, and ``wsum`` stays global."""
    from PIL import Image

    from clip_codec_tpu.train.data import StoreData

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(5):  # 5 % 4 != 0: exercises tail padding
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((5, 8)).astype(np.float32)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "s"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)

    data = StoreData(store, out_size=8)
    B, P = 4, 2
    glob = list(data.epoch(B, np.random.default_rng(3)))
    locs = [
        list(data.epoch(B, np.random.default_rng(3), local=(p * B // P, (p + 1) * B // P)))
        for p in range(P)
    ]
    assert len(glob) == len(locs[0]) == len(locs[1]) == 2
    for bi, g in enumerate(glob):
        np.testing.assert_array_equal(
            g.x0, np.concatenate([locs[p][bi].x0 for p in range(P)]))
        np.testing.assert_array_equal(
            g.z, np.concatenate([locs[p][bi].z for p in range(P)]))
        np.testing.assert_array_equal(
            g.weight, np.concatenate([locs[p][bi].weight for p in range(P)]))
        for p in range(P):
            assert locs[p][bi].wsum == g.weight.sum()  # global, not local


def test_lazy_top_level_export():
    import clip_codec_tpu

    assert clip_codec_tpu.ClipCodec.__name__ == "ClipCodec"
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        clip_codec_tpu.NotAThing


def test_append_store(tmp_path, rng):
    """append_store adds vectors under the EXISTING codec meta: old frames
    stay byte-identical, the manifest grows, stems never clobber existing
    frames, a stale decoded.npy cache is removed, and appended vectors decode
    within quantization error. (The reference can only re-encode a whole
    directory — there is no add operation.)"""
    from clip_codec_tpu.io.store import append_store

    feats = rng.standard_normal((5, 32)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    write_store(tmp_path, feats, [f"a/img_{i}.png" for i in range(5)],
                np.asarray(scale), np.asarray(zero), q)
    old_meta = (tmp_path / "codec_meta.npz").read_bytes()
    old_frames = {p.name: p.read_bytes() for p in tmp_path.glob("*.clp")}
    np.save(tmp_path / "decoded.npy", feats)  # now-stale cache

    # convex combinations of existing rows stay inside the per-dim fit range
    # (out-of-range components clamp to the 0/255 rail — documented contract)
    w = rng.random((3, 5)).astype(np.float32)
    new = (w / w.sum(axis=1, keepdims=True)) @ feats
    # one colliding stem: b/img_0.png must NOT clobber a/img_0.png's frame
    recs = append_store(tmp_path, new,
                        ["b/img_0.png", "b/fresh.png", "b/fresh2.png"])
    assert len(recs) == 3
    assert recs[0]["bitstream"].endswith("img_0__1.clp")
    assert (tmp_path / "codec_meta.npz").read_bytes() == old_meta
    for name, blob in old_frames.items():
        assert (tmp_path / name).read_bytes() == blob
    assert not (tmp_path / "decoded.npy").exists()

    st = Store.open(tmp_path)
    assert len(st) == 8
    z = st.decode_all(renormalize=False)
    # appended rows quantized with the ORIGINAL scale/zero; in-range values
    # land within half a quantization step per component
    err = np.abs(z[5:] - new).max()
    assert err <= 0.5 * np.asarray(scale).max() + 1e-6

    with np.testing.assert_raises(ValueError):  # dim mismatch refused
        append_store(tmp_path, rng.standard_normal((1, 16)).astype(np.float32),
                     ["x.png"])
