"""Export our Flax checkpoints to reference-compatible torch state_dicts.

The inverse of :mod:`clip_codec_tpu.weights.convert`: lets weights trained
here run inside the original torch reference (for cross-framework parity
evaluation) and gives reference users a two-way migration path. Torch is
needed only to *write* the ``.pt`` file.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np


def _t(a) -> np.ndarray:
    return np.asarray(a)


def _linear(dst: Dict, prefix: str, p: Mapping) -> None:
    dst[f"{prefix}.weight"] = _t(p["kernel"]).T
    dst[f"{prefix}.bias"] = _t(p["bias"])


def _conv(dst: Dict, prefix: str, p: Mapping) -> None:
    dst[f"{prefix}.weight"] = _t(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        dst[f"{prefix}.bias"] = _t(p["bias"])


def _conv_transpose(dst: Dict, prefix: str, p: Mapping) -> None:
    # our (kh, kw, out, in) -> torch (in, out, kh, kw)
    dst[f"{prefix}.weight"] = _t(p["kernel"]).transpose(3, 2, 0, 1)
    dst[f"{prefix}.bias"] = _t(p["bias"])


def _gn(dst: Dict, prefix: str, scale, bias) -> None:
    dst[f"{prefix}.weight"] = _t(scale)
    dst[f"{prefix}.bias"] = _t(bias)


def _resblock(dst: Dict, prefix: str, p: Mapping) -> None:
    _gn(dst, f"{prefix}.norm1", p["norm1_scale"], p["norm1_bias"])
    _gn(dst, f"{prefix}.norm2", p["norm2_scale"], p["norm2_bias"])
    _conv(dst, f"{prefix}.conv1", p["conv1"])
    _conv(dst, f"{prefix}.conv2", p["conv2"])
    _linear(dst, f"{prefix}.film.to_scale", p["film"]["to_scale"])
    _linear(dst, f"{prefix}.film.to_shift", p["film"]["to_shift"])


def export_unet(params: Mapping, ch_mult: Sequence[int] = (1, 2, 2)) -> Dict[str, np.ndarray]:
    """Our ``CLIPCondUNet`` params -> reference torch state_dict (numpy
    values; pass through ``torch.from_numpy`` + ``torch.save`` to write)."""
    sd: Dict[str, np.ndarray] = {}
    _linear(sd, "time_proj.0", params["time_proj_0"])
    _linear(sd, "time_proj.2", params["time_proj_2"])
    _linear(sd, "z_proj.0", params["z_proj_0"])
    _conv(sd, "in_conv", params["in_conv"])
    _resblock(sd, "mid1", params["mid1"])
    _resblock(sd, "mid2", params["mid2"])
    _gn(sd, "out_norm", params["out_norm_scale"], params["out_norm_bias"])
    _conv(sd, "out", params["out"])
    for i in range(len(ch_mult)):
        _resblock(sd, f"down.{3 * i}", params[f"down_{i}_rb0"])
        _resblock(sd, f"down.{3 * i + 1}", params[f"down_{i}_rb1"])
        _conv(sd, f"down.{3 * i + 2}", params[f"down_{i}_ds"])
        _resblock(sd, f"up.{3 * i}", params[f"up_{i}_rb0"])
        _resblock(sd, f"up.{3 * i + 1}", params[f"up_{i}_rb1"])
        _conv_transpose(sd, f"up.{3 * i + 2}", params[f"up_{i}_us"])
    return sd


def save_torch_unet(path: str, params: Mapping, ch_mult: Sequence[int] = (1, 2, 2)) -> None:
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in export_unet(params, ch_mult).items()}
    torch.save(sd, path)
