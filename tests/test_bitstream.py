"""Golden tests for the ``.clp`` frame format (byte-exact vs the reference spec).

The expected bytes are built from the published format definition — magic
``CLPF`` + ``<I`` compressed length + zstd(level=22) payload (reference
``io/bitstream.py:14-23``) — via an independent inline construction.
"""

import struct

import numpy as np
import pytest
import zstandard as zstd

from clip_codec_tpu.io.bitstream import MAGIC, read_bitstream, write_bitstream, compress_frame, decompress_frame


def _expected_frame(payload: bytes) -> bytes:
    comp = zstd.ZstdCompressor(level=22).compress(payload)
    return b"CLPF" + struct.pack("<I", len(comp)) + comp


def test_magic_constant():
    assert MAGIC == b"CLPF"


def test_frame_bytes_match_spec(rng):
    q = rng.integers(0, 256, size=512, dtype=np.uint8)
    assert compress_frame(q.tobytes()) == _expected_frame(q.tobytes())


def test_roundtrip_file(tmp_path, rng):
    q = rng.integers(0, 256, size=768, dtype=np.uint8)
    p = tmp_path / "x.clp"
    write_bitstream(q.tobytes(), 768, p)
    assert p.read_bytes() == _expected_frame(q.tobytes())
    out = read_bitstream(p)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, q)


def test_dim_not_serialized(tmp_path, rng):
    # Reference quirk: dim is accepted but never written (io/bitstream.py:18).
    q = rng.integers(0, 256, size=64, dtype=np.uint8)
    p1, p2 = tmp_path / "a.clp", tmp_path / "b.clp"
    write_bitstream(q.tobytes(), 64, p1)
    write_bitstream(q.tobytes(), 9999, p2)
    assert p1.read_bytes() == p2.read_bytes()


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.clp"
    p.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError):
        read_bitstream(p)


def test_compression_is_effective(tmp_path):
    # Constant vectors compress far below raw size.
    q = np.full(512, 7, dtype=np.uint8)
    p = tmp_path / "c.clp"
    write_bitstream(q.tobytes(), 512, p)
    assert p.stat().st_size < 64


def test_decompress_frame_matches_read(tmp_path, rng):
    q = rng.integers(0, 256, size=512, dtype=np.uint8)
    p = tmp_path / "d.clp"
    write_bitstream(q.tobytes(), 512, p)
    np.testing.assert_array_equal(decompress_frame(p.read_bytes()), q)


def test_committed_golden_fixture():
    """Frames must stay byte-stable across zstd versions/environments; a
    change here means stored .clp files are no longer reproducible."""
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    q = np.load(fx / "golden_payload.npy")
    assert compress_frame(q.tobytes()) == (fx / "golden.clp").read_bytes()
    np.testing.assert_array_equal(decompress_frame((fx / "golden.clp").read_bytes()), q)


def test_truncated_frame_raises(tmp_path, rng):
    q = rng.integers(0, 256, size=128, dtype=np.uint8)
    full = compress_frame(q.tobytes())
    p = tmp_path / "trunc.clp"
    p.write_bytes(full[: len(full) // 2])
    with pytest.raises(Exception):  # zstd error or length mismatch
        read_bitstream(p)


def test_empty_file_raises(tmp_path):
    p = tmp_path / "empty.clp"
    p.write_bytes(b"")
    with pytest.raises(ValueError):
        read_bitstream(p)


def test_length_field_beyond_eof_tolerated(tmp_path, rng):
    """A length field larger than the file still decodes: the payload slice
    truncates at EOF and zstd sees the complete frame. The reference reader
    (io/bitstream.py:29-33, f.read(ln) short-reads) behaves identically —
    tolerance parity, pinned here."""
    q = rng.integers(0, 256, size=64, dtype=np.uint8)
    full = bytearray(compress_frame(q.tobytes()))
    full[4:8] = (2**31).to_bytes(4, "little")  # absurd length
    p = tmp_path / "lie.clp"
    p.write_bytes(bytes(full))
    np.testing.assert_array_equal(read_bitstream(p), q)


def test_decompression_bomb_guard(rng):
    """A tiny frame whose zstd header declares a huge content size must not
    make the host allocate it (untrusted input reaches decompress_frame via
    the HTTP serving path). 64 MiB of zeros compresses to ~100 bytes; the
    default 16 MiB output cap rejects it at parse time."""
    import zstandard as zstd

    from clip_codec_tpu.io.bitstream import decompress_frame

    bomb = compress_frame(b"\x00" * (64 << 20))
    assert len(bomb) < 10_000  # the attack premise: tiny wire size
    with pytest.raises(zstd.ZstdError):
        decompress_frame(bomb)
    # explicit opt-out for trusted bulk paths still works
    out = decompress_frame(bomb, max_output=(64 << 20))
    assert out.shape == (64 << 20,)
    # legit frames (hundreds of bytes) are far below the cap
    q = rng.integers(0, 256, size=768, dtype=np.uint8)
    np.testing.assert_array_equal(decompress_frame(compress_frame(q.tobytes())), q)


def test_truncated_header_is_valueerror():
    from clip_codec_tpu.io.bitstream import decompress_frame

    with pytest.raises(ValueError):
        decompress_frame(b"CLPF\x01")  # magic ok, length field truncated
