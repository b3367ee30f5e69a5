"""ctypes binding for the native C++ store codec (``native/store_codec.cpp``).

Auto-builds ``libstore_codec.so`` on first use when a toolchain is present
(cached next to the source); every entry point degrades to the pure-python
zstandard path in :mod:`clip_codec_tpu.io.bitstream`, so the native engine is
an accelerator, never a requirement. Frames are byte-identical either way
(asserted in tests/test_native_codec.py).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    so = _NATIVE_DIR / "libstore_codec.so"
    src = _NATIVE_DIR / "store_codec.cpp"
    # Rebuild when missing OR stale (source newer than the binary) — a stale
    # or foreign-ABI .so would otherwise pin the native path off forever.
    if so.exists() and src.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, timeout=120,
        )
    except Exception:
        return None
    return so if so.exists() else None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    sz = ctypes.c_size_t
    u8p = ctypes.POINTER(ctypes.c_uint8)
    szp = ctypes.POINTER(sz)
    lib.clp_frame_bound.restype = sz
    lib.clp_frame_bound.argtypes = [sz]
    lib.clp_compress_frame.restype = sz
    lib.clp_compress_frame.argtypes = [u8p, sz, u8p, sz, ctypes.c_int]
    lib.clp_decompress_frame.restype = sz
    lib.clp_decompress_frame.argtypes = [u8p, sz, u8p, sz]
    lib.clp_compress_batch.restype = sz
    lib.clp_compress_batch.argtypes = [u8p, sz, sz, u8p, sz, szp, szp, ctypes.c_int]
    lib.clp_decompress_batch.restype = sz
    lib.clp_decompress_batch.argtypes = [u8p, szp, szp, sz, sz, u8p]
    if not _self_check(lib):
        # The system libzstd produced different bytes than the bundled python
        # zstandard build would — disable the native path so stores stay
        # byte-identical regardless of toolchain (reproducibility contract).
        return None
    _LIB = lib
    return _LIB


def _self_check(lib) -> bool:
    """Native frames must be byte-identical to the python zstandard framing."""
    try:
        from .bitstream import compress_frame

        probe = (np.arange(512, dtype=np.uint64) * 2654435761 % 256).astype(np.uint8)
        bound = int(lib.clp_frame_bound(probe.size))
        out = np.empty(bound, dtype=np.uint8)
        got = lib.clp_compress_frame(_u8(probe), probe.size, _u8(out), out.size, 22)
        return got > 0 and out[: int(got)].tobytes() == compress_frame(probe.tobytes())
    except Exception:
        return False


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress_frames(q: np.ndarray) -> Optional[List[bytes]]:
    """(N, D) uint8 -> list of framed .clp records; None if native missing."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, dtype=np.uint8)
    n, d = q.shape
    bound = int(lib.clp_frame_bound(d))
    out = np.empty(n * bound, dtype=np.uint8)
    offsets = np.empty(n, dtype=np.uintp)
    sizes = np.empty(n, dtype=np.uintp)
    total = lib.clp_compress_batch(
        _u8(q), n, d, _u8(out), out.size,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)), 22,
    )
    if total == 0:
        return None
    return [out[int(o) : int(o) + int(s)].tobytes() for o, s in zip(offsets, sizes)]


def decompress_frames(frames: List[bytes], dim: int) -> Optional[np.ndarray]:
    """List of framed records (each decoding to ``dim`` bytes) -> (N, dim)
    uint8 matrix; None if native missing or any record fails."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(frames)
    blob = np.frombuffer(b"".join(frames), dtype=np.uint8)
    offsets = np.zeros(n, dtype=np.uintp)
    sizes = np.array([len(f) for f in frames], dtype=np.uintp)
    if n > 1:
        offsets[1:] = np.cumsum(sizes)[:-1]
    out = np.empty((n, dim), dtype=np.uint8)
    ok = lib.clp_decompress_batch(
        _u8(blob),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        n, dim, _u8(out),
    )
    if int(ok) != n:
        return None
    return out
