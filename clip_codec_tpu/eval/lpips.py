"""LPIPS perceptual distance (VGG16 backbone) in pure JAX.

The reference calls the ``lpips`` package (``eval/metrics.py:49-62``,
``net='vgg'``). This is the same computation natively: scale-shift the
``[-1,1]`` inputs, run VGG16 features, tap relu1_2/relu2_2/relu3_3/relu4_3/
relu5_3, channel-unit-normalize each tap, square the difference, apply the
learned non-negative 1x1 "lin" weights, spatial-mean, sum over taps.

Weights are converted from a ``lpips.LPIPS(net='vgg')`` state_dict exported
wherever the packages exist (``torch.save(lpips.LPIPS(net='vgg').state_dict(),
'lpips_vgg.pt')``) and pointed at via ``CLIP_CODEC_LPIPS_WEIGHTS``.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: conv channel widths with 'M' maxpools; LPIPS taps
# after the ReLU preceding each 'M' boundary below.
VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# index (within conv-only list) after which each tap is taken
TAP_AFTER_CONV = [1, 3, 6, 9, 12]
# lpips's torch Sequential slices keep torchvision feature indices:
_SLICE_CONV_IDX = {
    "slice1": [0, 2],
    "slice2": [5, 7],
    "slice3": [10, 12, 14],
    "slice4": [17, 19, 21],
    "slice5": [24, 26, 28],
}


def lpips_forward(params: Dict, a_m11: jax.Array, b_m11: jax.Array) -> jax.Array:
    """(B, H, W, 3) [-1,1] pairs -> (B,) LPIPS distance."""

    def scale(x):
        return (x - params["shift"]) / params["scale"]

    def vgg_taps(x):
        taps: List[jax.Array] = []
        ci = 0
        for item in VGG_CFG:
            if item == "M":
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                continue
            w = params["convs"][ci]
            x = jax.lax.conv_general_dilated(
                x, w["kernel"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + w["bias"]
            x = jax.nn.relu(x)
            if ci in TAP_AFTER_CONV:
                taps.append(x)
            ci += 1
        return taps

    def unit_norm(x):
        return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)

    ta = vgg_taps(scale(a_m11.astype(jnp.float32)))
    tb = vgg_taps(scale(b_m11.astype(jnp.float32)))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(ta, tb)):
        d = (unit_norm(xa) - unit_norm(xb)) ** 2
        w = params["lins"][i]  # (C,) non-negative learned weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def convert_lpips_torch(sd) -> Dict:
    """``lpips.LPIPS(net='vgg')`` state_dict -> our params pytree."""
    from ..weights.convert import _np

    convs = []
    for slice_name, idxs in _SLICE_CONV_IDX.items():
        for i in idxs:
            convs.append({
                "kernel": _np(sd[f"net.{slice_name}.{i}.weight"]).transpose(2, 3, 1, 0).astype(np.float32),
                "bias": _np(sd[f"net.{slice_name}.{i}.bias"]).astype(np.float32),
            })
    lins = [
        _np(sd[f"lin{i}.model.1.weight"]).reshape(-1).astype(np.float32) for i in range(5)
    ]
    return {
        "shift": _np(sd["scaling_layer.shift"]).reshape(3).astype(np.float32),
        "scale": _np(sd["scaling_layer.scale"]).reshape(3).astype(np.float32),
        "convs": convs,
        "lins": lins,
    }


class LPIPSModel:
    """Loaded-once LPIPS scorer with a jitted batched distance."""

    def __init__(self, params: Dict) -> None:
        self.params = params
        # params as jit argument, not closure constant (see encoders/__init__)
        _dist = jax.jit(lpips_forward)
        self.distance = lambda a, b: _dist(self.params, a, b)

    @classmethod
    def from_checkpoint(cls, path) -> "LPIPSModel":
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return cls(convert_lpips_torch(sd))

    @classmethod
    def from_env(cls) -> Optional["LPIPSModel"]:
        path = os.environ.get("CLIP_CODEC_LPIPS_WEIGHTS")
        if not path or not Path(path).exists():
            return None
        return cls.from_checkpoint(path)
