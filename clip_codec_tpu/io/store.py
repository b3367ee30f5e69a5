"""On-disk "store" contract (the interface between pipeline stages).

A store directory contains (reference ``cli/encode_images.py:77-85``):

* ``manifest.json``   — list of ``{"image": <path>, "bitstream": <path>}``
* ``codec_meta.npz``  — ``scale[D] float32``, ``zero[D] float32``, ``dim``
* one ``.clp`` file per image (see :mod:`clip_codec_tpu.io.bitstream`)

and, for the Stable-Diffusion latent path (reference
``cli/precompute_latents.py:24-31``):

* ``latents/<stem>.npz`` — key ``lat``, fp16 ``(4, H/8, W/8)`` VAE latents
* ``manifest_latents.json`` — manifest records with an added ``latent`` field
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

from .bitstream import read_bitstream, write_bitstream

PathLike = Union[str, Path]


def l2_normalize_np(x: np.ndarray, axis: int = -1, eps: float = 1e-9) -> np.ndarray:
    """Host-side L2 normalization (reference ``train/diffusion_train.py:30-32``)."""
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


@dataclass
class Store:
    """Read-side view of a store directory."""

    store_dir: Path
    manifest: List[Dict[str, str]]
    scale: np.ndarray  # (D,) float32
    zero: np.ndarray  # (D,) float32
    dim: int

    @classmethod
    def open(cls, store_dir: PathLike, manifest_name: str = "manifest.json") -> "Store":
        store_dir = Path(store_dir)
        manifest = json.loads((store_dir / manifest_name).read_text(encoding="utf-8"))
        meta = np.load(store_dir / "codec_meta.npz")
        scale = meta["scale"].astype("float32")
        zero = meta["zero"].astype("float32")
        dim = int(meta["dim"]) if "dim" in meta else int(scale.shape[0])
        return cls(store_dir=store_dir, manifest=manifest, scale=scale, zero=zero, dim=dim)

    def __len__(self) -> int:
        return len(self.manifest)

    def decode_vector(self, i: int, renormalize: bool = True) -> np.ndarray:
        """Read record *i*'s bitstream and dequantize (optionally L2-renorm)."""
        q = read_bitstream(self.manifest[i]["bitstream"])
        z = q.astype(np.float32) * self.scale + self.zero
        if renormalize:
            z = l2_normalize_np(z[None, :]).astype(np.float32)[0]
        return z

    def read_codes(self) -> np.ndarray:
        """Read every record's RAW quantized codes into an ``(N, D)`` uint8
        matrix — no dequantization (native batched zstd when built, python
        fallback otherwise). This is the zero-conversion input for the
        uint8-resident retrieval index (:func:`clip_codec_tpu.index.build_index_u8`),
        which keeps the store compressed on device."""
        if not self.manifest:
            return np.zeros((0, self.dim), dtype=np.uint8)
        from .native import decompress_frames

        frames = [Path(rec["bitstream"]).read_bytes() for rec in self.manifest]
        q = decompress_frames(frames, self.dim)
        if q is None:
            q = np.stack([read_bitstream(rec["bitstream"]) for rec in self.manifest])
        return q

    def decode_all(self, renormalize: bool = True) -> np.ndarray:
        """Dequantize every record into an ``(N, D)`` float32 matrix."""
        if not self.manifest:
            return np.zeros((0, self.dim), dtype=np.float32)
        z = self.read_codes().astype(np.float32) * self.scale + self.zero
        if renormalize:
            z = l2_normalize_np(z)
        return z


def dedupe_stems(paths: List[str], used: Optional[set] = None) -> List[str]:
    """Collision-safe per-path file stems.

    The reference names artifacts by bare image stem (``cli/encode_images.py:81``,
    ``cli/precompute_latents.py:28``), so ``a/img.png`` and ``b/img.png``
    silently clobber each other. Unique stems keep the reference naming;
    duplicates get a deterministic ``__{k}`` suffix. ``used`` pre-seeds the
    taken stems (append mode: never clobber an existing frame).
    """
    used = set() if used is None else set(used)
    stems: List[str] = []
    for p in paths:
        base = Path(p).stem
        cand, k = base, 0
        while cand in used:
            k += 1
            cand = f"{base}__{k}"
        used.add(cand)
        stems.append(cand)
    return stems


def write_store(
    out_dir: PathLike,
    feats: np.ndarray,
    image_paths: List[str],
    scale: np.ndarray,
    zero: np.ndarray,
    quantized: np.ndarray,
    dim_dtype: str = "int32",
) -> List[Dict[str, str]]:
    """Write a full store: ``codec_meta.npz`` + per-image ``.clp`` + manifest.

    ``dim_dtype`` mirrors the reference's two writers: ``int32`` for the CLIP
    path (``cli/encode_images.py:77``) and ``int64`` scalar for the DINO path
    (``cli/encode_images_dino.py:92-94``).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    D = int(feats.shape[1])
    dim = np.int32(D) if dim_dtype == "int32" else np.array(D, dtype=np.int64)
    np.savez(
        out / "codec_meta.npz",
        scale=np.asarray(scale, dtype="float32"),
        zero=np.asarray(zero, dtype="float32"),
        dim=dim,
    )
    manifest = _write_frames(out, image_paths, quantized, dedupe_stems(image_paths))
    _dump_manifest(out, manifest)
    return manifest


def _dump_manifest(out: Path, manifest: List[Dict[str, str]]) -> None:
    """Atomic manifest write (tmp + rename): the manifest is the only
    image->bitstream mapping, so a crash mid-dump must never leave a
    truncated file orphaning every existing frame."""
    tmp = out / "manifest.json.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=2)
    import os

    os.replace(tmp, out / "manifest.json")


def _write_frames(out: Path, image_paths: List[str], quantized: np.ndarray,
                  stems: List[str]) -> List[Dict[str, str]]:
    q_mat = np.ascontiguousarray(np.asarray(quantized, dtype=np.uint8))
    D = int(q_mat.shape[1])
    from .native import compress_frames

    # Native and python paths are guaranteed byte-identical (the native lib
    # self-checks against the python framing at load and is disabled on any
    # mismatch), so which one runs never changes the stored bytes.
    frames = compress_frames(q_mat) if len(image_paths) > 0 else None
    manifest: List[Dict[str, str]] = []
    for i, p in enumerate(image_paths):
        out_path = out / (stems[i] + ".clp")
        if frames is not None:
            out_path.write_bytes(frames[i])
        else:
            write_bitstream(q_mat[i].tobytes(), D, out_path)
        manifest.append({"image": str(p), "bitstream": str(out_path)})
    return manifest


def append_store(
    store_dir: PathLike,
    feats: np.ndarray,
    image_paths: List[str],
) -> List[Dict[str, str]]:
    """Add vectors to an EXISTING store (the FAISS ``index.add`` analogue at
    the store level; the reference can only re-encode a whole directory).

    New vectors are quantized against the store's existing ``codec_meta.npz``
    — the codec contract: scale/zero are fixed at the initial fit, so every
    old ``.clp`` frame stays byte-identical and any embedding component
    outside the original fit range clamps to the 0/255 rail (same clamp the
    quantizer always applies). Existing frames are never clobbered (stems
    dedupe against the current manifest). A stale ``decoded.npy`` cache is
    removed BEFORE the manifest grows (readers fall back to decoding frames
    — a crash can never leave a shorter cache silently shadowing the grown
    store). SD latent side-files are NOT touched: re-run
    ``cli.precompute_latents`` after appending (a warning is printed when
    ``manifest_latents.json`` exists). Returns the new manifest records.
    """
    st = Store.open(store_dir)
    feats = np.asarray(feats, np.float32)
    if feats.ndim != 2 or feats.shape[1] != st.dim:
        raise ValueError(f"appending {feats.shape}-shaped features to a "
                         f"{st.dim}-d store")
    if feats.shape[0] != len(image_paths):
        raise ValueError(f"{feats.shape[0]} feature rows but "
                         f"{len(image_paths)} image paths")
    from ..codecs.quantizer import quantize

    q = np.asarray(quantize(feats, st.scale, st.zero))
    used = {Path(rec["bitstream"]).stem for rec in st.manifest}
    stems = dedupe_stems(image_paths, used=used)
    out = Path(store_dir)
    cache = out / "decoded.npy"
    if cache.exists():
        cache.unlink()  # stale the moment we add rows; delete FIRST
    new_records = _write_frames(out, image_paths, q, stems)
    _dump_manifest(out, st.manifest + new_records)
    if (out / "manifest_latents.json").exists():
        import sys

        print(f"[append_store] {out / 'manifest_latents.json'} does not cover "
              f"the appended rows — re-run cli.precompute_latents",
              file=sys.stderr)
    return new_records
