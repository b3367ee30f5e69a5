"""Native C++ store codec: byte-identity with the python framing + fallback."""

import numpy as np
import pytest

from clip_codec_tpu.io.bitstream import compress_frame, decompress_frame
from clip_codec_tpu.io.native import compress_frames, decompress_frames, get_lib

native_available = get_lib() is not None


@pytest.mark.skipif(not native_available, reason="native toolchain unavailable")
def test_native_frames_byte_identical(rng):
    q = rng.integers(0, 256, size=(16, 512), dtype=np.uint8)
    frames = compress_frames(q)
    assert frames is not None
    for i in range(16):
        assert frames[i] == compress_frame(q[i].tobytes()), f"record {i} differs"


@pytest.mark.skipif(not native_available, reason="native toolchain unavailable")
def test_native_decode_roundtrip(rng):
    q = rng.integers(0, 256, size=(8, 768), dtype=np.uint8)
    frames = compress_frames(q)
    out = decompress_frames(frames, 768)
    np.testing.assert_array_equal(out, q)
    # python reader parses native frames too
    for i in range(8):
        np.testing.assert_array_equal(decompress_frame(frames[i]), q[i])


@pytest.mark.skipif(not native_available, reason="native toolchain unavailable")
def test_native_rejects_corrupt(rng):
    q = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    frames = compress_frames(q)
    bad = [frames[0], b"XXXX" + frames[1][4:]]
    assert decompress_frames(bad, 64) is None


def test_store_works_regardless_of_native(tmp_path, rng):
    """write_store/decode_all produce identical results with or without the
    native engine (the store tests elsewhere already cover the integrated
    path; this pins the fallback explicitly)."""
    from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
    from clip_codec_tpu.io import native
    from clip_codec_tpu.io.store import Store, write_store

    feats = rng.standard_normal((4, 32)).astype(np.float32)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    paths = [f"i{i}.png" for i in range(4)]

    write_store(tmp_path / "a", feats, paths, np.asarray(scale), np.asarray(zero), q)
    za = Store.open(tmp_path / "a").decode_all()

    # force the python fallback
    orig_lib, orig_tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        write_store(tmp_path / "b", feats, paths, np.asarray(scale), np.asarray(zero), q)
        zb = Store.open(tmp_path / "b").decode_all()
    finally:
        native._LIB, native._TRIED = orig_lib, orig_tried

    np.testing.assert_array_equal(za, zb)
    for i in range(4):
        assert (tmp_path / "a" / f"i{i}.clp").read_bytes() == (tmp_path / "b" / f"i{i}.clp").read_bytes()
