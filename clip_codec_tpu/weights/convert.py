"""Torch-checkpoint -> Flax-pytree weight conversion.

The reference saves plain ``torch.save(state_dict)`` checkpoints
(``train/diffusion_train.py:143-147``). For parity evaluation (and for users
migrating trained weights) this module maps those state_dicts onto the NHWC
Flax parameter trees of :mod:`clip_codec_tpu.models`. Conversion is offline /
host-side only — torch never enters the runtime compute path.

Layout rules:

* ``nn.Linear``  (out, in)          -> Dense ``kernel`` (in, out): transpose
* ``nn.Conv2d``  (out, in, kh, kw)  -> Conv ``kernel`` (kh, kw, in, out)
* ``nn.ConvTranspose2d`` (in, out, kh, kw) -> ConvTranspose(transpose_kernel=True)
  ``kernel`` (kh, kw, out, in)
* ``nn.GroupNorm`` weight/bias      -> ``*_scale`` / ``*_bias`` fp32 vectors

All arrays are converted through numpy; no torch tensors survive.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T.astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0).astype(np.float32)}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def conv_transpose(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch: (in, out, kh, kw) -> flax transpose_kernel=True: (kh, kw, out, in)
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def group_norm_pair(sd: Mapping, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    return (
        _np(sd[f"{prefix}.weight"]).astype(np.float32),
        _np(sd[f"{prefix}.bias"]).astype(np.float32),
    )


def _resblock(sd: Mapping, prefix: str) -> Dict:
    n1s, n1b = group_norm_pair(sd, f"{prefix}.norm1")
    n2s, n2b = group_norm_pair(sd, f"{prefix}.norm2")
    return {
        "norm1_scale": n1s,
        "norm1_bias": n1b,
        "norm2_scale": n2s,
        "norm2_bias": n2b,
        "conv1": conv(sd, f"{prefix}.conv1"),
        "conv2": conv(sd, f"{prefix}.conv2"),
        "film": {
            "to_scale": linear(sd, f"{prefix}.film.to_scale"),
            "to_shift": linear(sd, f"{prefix}.film.to_shift"),
        },
    }


def strip_prefixes(sd: Mapping) -> Dict[str, object]:
    """Tolerant checkpoint unwrapping: container dicts and ``module.`` /
    ``adapter.`` prefixes, mirroring the reference's loader behavior
    (``cli/reconstruct_sd_diffusion.py:26-44``)."""
    for key in ("state_dict", "model", "adapter"):
        if key in sd and isinstance(sd[key], Mapping):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        for pref in ("module.", "adapter."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def convert_unet(sd: Mapping, ch_mult: Sequence[int] = (1, 2, 2)) -> Dict:
    """Map a reference ``CLIPCondUNet`` state_dict onto our Flax param tree."""
    sd = strip_prefixes(sd)
    params: Dict = {
        "time_proj_0": linear(sd, "time_proj.0"),
        "time_proj_2": linear(sd, "time_proj.2"),
        "z_proj_0": linear(sd, "z_proj.0"),
        "in_conv": conv(sd, "in_conv"),
        "mid1": _resblock(sd, "mid1"),
        "mid2": _resblock(sd, "mid2"),
        "out": conv(sd, "out"),
    }
    ons, onb = group_norm_pair(sd, "out_norm")
    params["out_norm_scale"] = ons
    params["out_norm_bias"] = onb
    for i in range(len(ch_mult)):
        params[f"down_{i}_rb0"] = _resblock(sd, f"down.{3 * i}")
        params[f"down_{i}_rb1"] = _resblock(sd, f"down.{3 * i + 1}")
        params[f"down_{i}_ds"] = conv(sd, f"down.{3 * i + 2}")
        params[f"up_{i}_rb0"] = _resblock(sd, f"up.{3 * i}")
        params[f"up_{i}_rb1"] = _resblock(sd, f"up.{3 * i + 1}")
        params[f"up_{i}_us"] = conv_transpose(sd, f"up.{3 * i + 2}")
    return params


def _dwconv(sd: Mapping, prefix: str) -> Dict:
    gs, gb = group_norm_pair(sd, f"{prefix}.gn")
    return {
        "dw": conv(sd, f"{prefix}.dw", bias=False),
        "pw": conv(sd, f"{prefix}.pw", bias=False),
        "gn_scale": gs,
        "gn_bias": gb,
    }


def convert_clip_cond_decoder(sd: Mapping, base: int = 192, out_size: int = 512) -> Dict:
    """Map a reference ``CLIPCondDecoder`` state_dict onto our Flax tree.

    The torch module stores stages in one ``nn.Sequential`` named ``up`` with
    3 entries per stage (DWConv, Upsample, DWConv) — Upsample has no params,
    so stage *i* uses indices ``3i`` and ``3i+2``.
    """
    sd = strip_prefixes(sd)
    from ..models.decoders import CLIPCondDecoder

    plan, _ = CLIPCondDecoder.stage_plan(base, out_size)
    params: Dict = {"fc": linear(sd, "fc.0"), "to_img": conv(sd, "to_img.0")}
    for i in range(len(plan)):
        params[f"up_{i}_a"] = _dwconv(sd, f"up.{3 * i}")
        params[f"up_{i}_b"] = _dwconv(sd, f"up.{3 * i + 2}")
    return params


def convert_lite_decoder(sd: Mapping) -> Dict:
    """Map a reference ``FeatureToImageDecoderLite`` state_dict onto our tree."""
    sd = strip_prefixes(sd)
    params: Dict = {"fc": linear(sd, "fc.0"), "to_img": conv(sd, "to_img.0")}
    for name in ("up1", "up2", "up3"):
        # torch block: Sequential(Conv, GN, GELU, Conv, GN, GELU) -> indices 0,1,3,4
        for k, (ci, gi) in enumerate([(0, 1), (3, 4)]):
            params[f"{name}_conv{k}"] = conv(sd, f"{name}.{ci}")
            gs, gb = group_norm_pair(sd, f"{name}.{gi}")
            params[f"{name}_gn{k}_scale"] = gs
            params[f"{name}_gn{k}_bias"] = gb
    return params
