"""``.clp`` bitstream framing (layer L0).

Byte-identical to the reference format (``/root/reference`` —
``src/clip_feature_codec/io/bitstream.py:14-33``): a frame is

    4 bytes  magic ``b"CLPF"``
    4 bytes  ``<I`` little-endian length of the compressed payload
    N bytes  zstd(level=22) of the raw uint8 vector bytes

Replicated quirks, kept for wire compatibility:

* ``dim`` is accepted by :func:`write_bitstream` but never serialized — the
  vector dimension travels out-of-band in ``codec_meta.npz``
  (reference ``io/bitstream.py:18``).
* ``VERSION`` is declared but never written to the frame
  (reference ``io/bitstream.py:15``).

This layer is host-side by design: zstd is CPU work and the payloads are a few
hundred bytes. Batched encode/decode of whole stores can optionally go through
the native C++ engine in :mod:`clip_codec_tpu.io.native` when built.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Union

import numpy as np
import zstandard as zstd

MAGIC = b"CLPF"
VERSION = 1
_ZSTD_LEVEL = 22

PathLike = Union[str, Path]


def compress_frame(q_bytes: bytes) -> bytes:
    """Produce one framed ``.clp`` record as bytes (magic + len + zstd payload)."""
    comp = zstd.ZstdCompressor(level=_ZSTD_LEVEL).compress(q_bytes)
    return MAGIC + struct.pack("<I", len(comp)) + comp


# Decompressed frames hold one uint8 embedding vector (512-768 bytes in
# practice); 16 MiB is orders of magnitude above any real dim while bounding
# what a crafted frame can make the host allocate (zstd's header declares
# the content size — an 80-byte frame may otherwise claim gigabytes). The
# reference reader has no such guard (``io/bitstream.py:29-34``); this only
# changes behavior for malicious input.
MAX_FRAME_BYTES = 16 << 20


def decompress_frame(data: bytes, max_output: int = MAX_FRAME_BYTES) -> np.ndarray:
    """Parse one framed ``.clp`` record from bytes into a uint8 vector.

    Raises ``ValueError`` on bad magic or a truncated header, and
    ``zstandard.ZstdError`` if the payload is corrupt or would decompress
    past ``max_output`` (decompression-bomb guard for untrusted frames,
    e.g. the HTTP serving path).
    """
    if data[:4] != MAGIC:
        raise ValueError("Bad magic")
    if len(data) < 8:
        raise ValueError("Truncated frame header")
    (ln,) = struct.unpack("<I", data[4:8])
    payload = data[8 : 8 + ln]
    # zstandard's max_output_size only bounds UNKNOWN-size frames; a frame
    # that declares a huge content size in its header is allocated as
    # declared (probed), so check the declaration ourselves.
    try:
        declared = zstd.get_frame_parameters(payload).content_size
    except zstd.ZstdError:
        declared = 0  # not a zstd frame: let decompress() raise its error
    if declared > max_output:
        raise zstd.ZstdError(
            f"frame declares {declared} bytes, over the {max_output}-byte "
            f"decompression-bomb guard"
        )
    raw = zstd.ZstdDecompressor().decompress(payload, max_output_size=max_output)
    return np.frombuffer(raw, dtype=np.uint8)


def write_bitstream(q_bytes: bytes, dim: int, out_path: PathLike) -> None:
    """Write one quantized vector as a ``.clp`` frame.

    ``dim`` is unused (see module docstring) but kept for API compatibility
    with the reference signature.
    """
    del dim  # never serialized — reference quirk (io/bitstream.py:18)
    Path(out_path).write_bytes(compress_frame(q_bytes))


def read_bitstream(in_path: PathLike) -> np.ndarray:
    """Read one ``.clp`` frame back into a uint8 numpy vector."""
    return decompress_frame(Path(in_path).read_bytes())
