"""Stable-Diffusion weight conversion: diffusers checkpoints -> our Flax trees.

Maps ``UNet2DConditionModel`` / ``AutoencoderKL`` state_dicts (SD-1.5 layout,
new ``to_q``-style attention names with legacy ``query``/1x1-conv fallback)
and the reference's adapter checkpoints
(``train/sd_diffusion_train.py:335-338`` saves ``{'adapter': state_dict}``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from .convert import _np, conv, linear, strip_prefixes


def _gn(sd: Mapping, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    return (
        _np(sd[f"{prefix}.weight"]).astype(np.float32),
        _np(sd[f"{prefix}.bias"]).astype(np.float32),
    )


def _resnet(sd: Mapping, prefix: str) -> Dict:
    n1s, n1b = _gn(sd, f"{prefix}.norm1")
    n2s, n2b = _gn(sd, f"{prefix}.norm2")
    out = {
        "norm1_scale": n1s, "norm1_bias": n1b,
        "norm2_scale": n2s, "norm2_bias": n2b,
        "conv1": conv(sd, f"{prefix}.conv1"),
        "conv2": conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = linear(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = conv(sd, f"{prefix}.conv_shortcut")
    return out


def _geglu(sd: Mapping, prefix: str) -> Dict:
    """diffusers GEGLU ``proj`` (out = 2*dim_out, order [hidden | gate]) ->
    our separate ``proj_h``/``proj_g`` Dense params."""
    w = _np(sd[f"{prefix}.weight"]).T.astype(np.float32)  # (in, 2*dim_out)
    b = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    half = w.shape[1] // 2
    return {
        "proj_h": {"kernel": w[:, :half], "bias": b[:half]},
        "proj_g": {"kernel": w[:, half:], "bias": b[half:]},
    }


def _attn_linear(sd: Mapping, prefix: str, name: str, bias: bool) -> Dict:
    w = _np(sd[f"{prefix}.{name}.weight"]).astype(np.float32)
    if w.ndim == 4:  # legacy 1x1-conv attention weights
        w = w[:, :, 0, 0]
    out = {"kernel": w.T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.{name}.bias"]).astype(np.float32)
    return out


def _xattn(sd: Mapping, prefix: str) -> Dict:
    return {
        "to_q": _attn_linear(sd, prefix, "to_q", bias=False),
        "to_k": _attn_linear(sd, prefix, "to_k", bias=False),
        "to_v": _attn_linear(sd, prefix, "to_v", bias=False),
        "to_out": linear(sd, f"{prefix}.to_out.0"),
    }


def _transformer2d(sd: Mapping, prefix: str) -> Dict:
    ns, nb = _gn(sd, f"{prefix}.norm")
    blk = f"{prefix}.transformer_blocks.0"
    return {
        "norm_scale": ns, "norm_bias": nb,
        "proj_in": conv(sd, f"{prefix}.proj_in"),
        "proj_out": conv(sd, f"{prefix}.proj_out"),
        "block_0": {
            "norm1": {"scale": _gn(sd, f"{blk}.norm1")[0], "bias": _gn(sd, f"{blk}.norm1")[1]},
            "norm2": {"scale": _gn(sd, f"{blk}.norm2")[0], "bias": _gn(sd, f"{blk}.norm2")[1]},
            "norm3": {"scale": _gn(sd, f"{blk}.norm3")[0], "bias": _gn(sd, f"{blk}.norm3")[1]},
            "attn1": _xattn(sd, f"{blk}.attn1"),
            "attn2": _xattn(sd, f"{blk}.attn2"),
            # diffusers fuses hidden|gate into one proj; our GEGLU keeps them
            # as separate Dense params so TP can column-shard each half
            # (models/sd/layers.py GEGLU docstring)
            "ff_geglu": _geglu(sd, f"{blk}.ff.net.0.proj"),
            "ff_out": linear(sd, f"{blk}.ff.net.2"),
        },
    }


def convert_sd_unet(sd: Mapping, n_blocks: int = 4, layers_per_block: int = 2) -> Dict:
    """diffusers ``UNet2DConditionModel`` (SD-1.5 topology) -> SDUNet params."""
    sd = strip_prefixes(sd)
    has_attn = [i < n_blocks - 1 for i in range(n_blocks)]
    params: Dict = {
        "conv_in": conv(sd, "conv_in"),
        "time_linear_1": linear(sd, "time_embedding.linear_1"),
        "time_linear_2": linear(sd, "time_embedding.linear_2"),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1"),
        "mid_attn": _transformer2d(sd, "mid_block.attentions.0"),
        "conv_out": conv(sd, "conv_out"),
    }
    ons, onb = _gn(sd, "conv_norm_out")
    params["out_norm_scale"], params["out_norm_bias"] = ons, onb
    for i in range(n_blocks):
        for j in range(layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if has_attn[i]:
                params[f"down_{i}_attn_{j}"] = _transformer2d(sd, f"down_blocks.{i}.attentions.{j}")
        if i < n_blocks - 1:
            params[f"down_{i}_ds"] = {"conv": conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    for k in range(n_blocks):
        i = n_blocks - 1 - k
        for j in range(layers_per_block + 1):
            params[f"up_{k}_res_{j}"] = _resnet(sd, f"up_blocks.{k}.resnets.{j}")
            if has_attn[i]:
                params[f"up_{k}_attn_{j}"] = _transformer2d(sd, f"up_blocks.{k}.attentions.{j}")
        if i > 0:
            params[f"up_{k}_us"] = {"conv": conv(sd, f"up_blocks.{k}.upsamplers.0.conv")}
    return params


def _vae_attn(sd: Mapping, prefix: str) -> Dict:
    # new names: group_norm + to_q/to_k/to_v/to_out.0 (Linear, with bias);
    # legacy: norm + query/key/value/proj_attn (1x1 conv)
    if f"{prefix}.to_q.weight" in sd:
        gs, gb = _gn(sd, f"{prefix}.group_norm")
        return {
            "norm_scale": gs, "norm_bias": gb,
            "to_q": _attn_linear(sd, prefix, "to_q", bias=True),
            "to_k": _attn_linear(sd, prefix, "to_k", bias=True),
            "to_v": _attn_linear(sd, prefix, "to_v", bias=True),
            "to_out": linear(sd, f"{prefix}.to_out.0"),
        }
    gs, gb = _gn(sd, f"{prefix}.norm")
    out = {"norm_scale": gs, "norm_bias": gb}
    for src, dst in [("query", "to_q"), ("key", "to_k"), ("value", "to_v"), ("proj_attn", "to_out")]:
        w = _np(sd[f"{prefix}.{src}.weight"]).astype(np.float32)
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        out[dst] = {"kernel": w.T, "bias": _np(sd[f"{prefix}.{src}.bias"]).astype(np.float32)}
    return out


def convert_sd_vae(sd: Mapping, n_blocks: int = 4, enc_layers: int = 2) -> Dict:
    """diffusers ``AutoencoderKL`` -> our AutoencoderKL params."""
    sd = strip_prefixes(sd)
    enc: Dict = {
        "conv_in": conv(sd, "encoder.conv_in"),
        "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "conv_out": conv(sd, "encoder.conv_out"),
        "quant_conv": conv(sd, "quant_conv"),
    }
    s, b = _gn(sd, "encoder.conv_norm_out")
    enc["out_norm_scale"], enc["out_norm_bias"] = s, b
    for i in range(n_blocks):
        for j in range(enc_layers):
            enc[f"down_{i}_res_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            enc[f"down_{i}_ds"] = {"conv": conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}

    dec: Dict = {
        "post_quant_conv": conv(sd, "post_quant_conv"),
        "conv_in": conv(sd, "decoder.conv_in"),
        "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "conv_out": conv(sd, "decoder.conv_out"),
    }
    s, b = _gn(sd, "decoder.conv_norm_out")
    dec["out_norm_scale"], dec["out_norm_bias"] = s, b
    for k in range(n_blocks):
        for j in range(enc_layers + 1):
            dec[f"up_{k}_res_{j}"] = _resnet(sd, f"decoder.up_blocks.{k}.resnets.{j}")
        if k < n_blocks - 1:
            dec[f"up_{k}_us"] = {"conv": conv(sd, f"decoder.up_blocks.{k}.upsamplers.0.conv")}
    return {"encoder": enc, "decoder": dec}


def convert_sd_adapter(sd: Mapping) -> Dict:
    """Reference ``SDClipAdapter`` torch state_dict (``proj.0/1/3`` Sequential)
    -> our adapter params; accepts the ``{'adapter': ...}`` container and
    ``module.``/``adapter.`` prefixes (``cli/reconstruct_sd_diffusion.py:26-44``)."""
    sd = strip_prefixes(sd)
    return {
        "ln": {
            "scale": _np(sd["proj.0.weight"]).astype(np.float32),
            "bias": _np(sd["proj.0.bias"]).astype(np.float32),
        },
        "fc1": linear(sd, "proj.1"),
        "fc2": linear(sd, "proj.3"),
    }


def require_sd_weight_paths(model_name: Optional[str] = None) -> Tuple[str, str]:
    """The (unet, vae) checkpoint paths from the environment, or a uniform
    RuntimeError telling the operator how to configure them — the one place
    every SD-consuming surface (CLIs, serving) resolves weights from."""
    import os

    unet_path = os.environ.get("CLIP_CODEC_SD_UNET_WEIGHTS")
    vae_path = os.environ.get("CLIP_CODEC_SD_VAE_WEIGHTS")
    if not unet_path or not vae_path:
        what = f" for {model_name}" if model_name else ""
        raise RuntimeError(
            f"SD weights not configured. Convert diffusers SD-1.5 UNet/VAE "
            f"checkpoints{what} and set CLIP_CODEC_SD_UNET_WEIGHTS and "
            "CLIP_CODEC_SD_VAE_WEIGHTS (torch/.safetensors, or converted .msgpack)."
        )
    return unet_path, vae_path


def load_sd_params(unet_path: Optional[str] = None, vae_path: Optional[str] = None) -> Tuple[Dict, Dict]:
    """Read diffusers checkpoint files (torch ``.bin`` or ``.safetensors``),
    or already-converted Flax param trees (``.msgpack`` from
    ``utils.checkpoint.save_params``) — the latter skips conversion, so a
    converted tree can be cached once and loaded torch-free."""

    def read(path, convert):
        if str(path).endswith(".msgpack"):
            from ..utils.checkpoint import load_params

            return load_params(path)
        if str(path).endswith(".safetensors"):
            from safetensors.numpy import load_file

            return convert(load_file(str(path)))
        import torch

        return convert(torch.load(path, map_location="cpu", weights_only=True))

    unet = read(unet_path, convert_sd_unet) if unet_path else None
    vae = read(vae_path, convert_sd_vae) if vae_path else None
    return unet, vae


def infer_sd_configs(unet_params: Dict, vae_params: Dict, heads: int = 8):
    """Recover ``(SDUNetConfig, VAEConfig)`` from converted parameter trees.

    Every architecture dimension is determined by kernel shapes except the
    head COUNT (head splitting never changes parameter shapes) — pass
    ``heads`` for non-SD-1.5 models. Lets the CLIs serve any converted
    checkpoint (including sized-down test trees) without config flags."""
    from ..models.sd.unet import SDUNetConfig
    from ..models.sd.vae import VAEConfig

    block_out = []
    while f"down_{len(block_out)}_res_0" in unet_params:
        block_out.append(int(unet_params[f"down_{len(block_out)}_res_0"]["conv1"]["kernel"].shape[3]))
    layers = 0
    while f"down_0_res_{layers}" in unet_params:
        layers += 1
    cross = int(unet_params["mid_attn"]["block_0"]["attn2"]["to_k"]["kernel"].shape[0])
    ucfg = SDUNetConfig(
        in_ch=int(unet_params["conv_in"]["kernel"].shape[2]),
        out_ch=int(unet_params["conv_out"]["kernel"].shape[3]),
        block_out=tuple(block_out),
        layers_per_block=layers,
        cross_dim=cross,
        heads=heads,
        freq_dim=int(unet_params["time_linear_1"]["kernel"].shape[0]),
    )
    enc = vae_params["encoder"]
    v_block = []
    while f"down_{len(v_block)}_res_0" in enc:
        v_block.append(int(enc[f"down_{len(v_block)}_res_0"]["conv1"]["kernel"].shape[3]))
    v_layers = 0
    while f"down_0_res_{v_layers}" in enc:
        v_layers += 1
    vcfg = VAEConfig(
        block_out=tuple(v_block),
        layers_per_block=v_layers,
        latent_ch=int(enc["quant_conv"]["kernel"].shape[3]) // 2,
    )
    return ucfg, vcfg
