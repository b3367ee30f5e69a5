"""Shared CLI plumbing: device-flag handling and image discovery."""

from __future__ import annotations

from pathlib import Path
from typing import List


def apply_device_flag(device: str) -> None:
    """Map the reference's ``--device cuda|cpu`` flag onto JAX platforms:
    ``cpu`` forces the CPU backend, anything else keeps the default
    accelerator (TPU). Must run before first backend use."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")


def default_device() -> str:
    return "tpu"


def add_int8_flag(ap) -> None:
    """The shared --int8 serving-mode flag (reconstruct/eval/serve)."""
    ap.add_argument(
        "--int8", action="store_true",
        help="int8 MXU serving mode (faster; sampled trajectories change "
             "like a different seed — not for parity runs)",
    )


def apply_int8_flag(args) -> None:
    if getattr(args, "int8", False):
        from ..ops import set_int8_conv

        set_int8_conv(True)


IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".webp", ".bmp"}


def rglob_images(img_dir: str) -> List[str]:
    """Recursive image discovery (reference ``cli/encode_images.py:71``)."""
    return [str(p) for p in Path(img_dir).rglob("*") if p.suffix.lower() in IMAGE_EXTS]
