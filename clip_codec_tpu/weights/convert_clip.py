"""CLIP weight conversion: HuggingFace or OpenAI/open_clip -> our Flax tree.

The reference loads ``open_clip.create_model_and_transforms('ViT-B-32',
pretrained='openai')`` (``cli/encode_images.py:69``). Users can feed either:

* a HuggingFace ``CLIPModel`` state_dict (``openai/clip-vit-base-patch32``), or
* an OpenAI / open_clip checkpoint (``visual.conv1...``, fused qkv).

Conversion is host-side numpy; torch is only needed to *read* ``.pt`` files.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .convert import _np, linear


def _ln(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _hf_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "ln1": _ln(sd, f"{prefix}.layer_norm1"),
        "ln2": _ln(sd, f"{prefix}.layer_norm2"),
        "attn": {
            "q_proj": linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "fc1": linear(sd, f"{prefix}.mlp.fc1"),
        "fc2": linear(sd, f"{prefix}.mlp.fc2"),
    }


def convert_clip_hf(sd: Mapping, vision_depth: int = 12, text_depth: int = 12) -> Dict:
    """HuggingFace ``CLIPModel`` state_dict -> params for our ``CLIPModel``."""
    visual: Dict = {
        "patch_embed": {
            "kernel": _np(sd["vision_model.embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0).astype(np.float32)
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]).astype(np.float32),
        "position_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]).astype(np.float32),
        # HF's actual (typo'd) key name is "pre_layrnorm".
        "pre_ln": _ln(sd, "vision_model.pre_layrnorm"),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
        "visual_projection": _np(sd["visual_projection.weight"]).T.astype(np.float32),
        "encoder": {
            f"block_{i}": _hf_block(sd, f"vision_model.encoder.layers.{i}") for i in range(vision_depth)
        },
    }
    text: Dict = {
        "token_embedding": {"embedding": _np(sd["text_model.embeddings.token_embedding.weight"]).astype(np.float32)},
        "position_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]).astype(np.float32),
        "final_ln": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": _np(sd["text_projection.weight"]).T.astype(np.float32),
        "encoder": {
            f"block_{i}": _hf_block(sd, f"text_model.encoder.layers.{i}") for i in range(text_depth)
        },
    }
    return {"visual": visual, "text": text}


def _openai_block(sd: Mapping, prefix: str, dim: int) -> Dict:
    qkv_w = _np(sd[f"{prefix}.attn.in_proj_weight"]).astype(np.float32)  # (3D, D)
    qkv_b = _np(sd[f"{prefix}.attn.in_proj_bias"]).astype(np.float32)
    qw, kw, vw = qkv_w[:dim], qkv_w[dim : 2 * dim], qkv_w[2 * dim :]
    qb, kb, vb = qkv_b[:dim], qkv_b[dim : 2 * dim], qkv_b[2 * dim :]
    return {
        "ln1": _ln(sd, f"{prefix}.ln_1"),
        "ln2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": linear(sd, f"{prefix}.attn.out_proj"),
        },
        "fc1": linear(sd, f"{prefix}.mlp.c_fc"),
        "fc2": linear(sd, f"{prefix}.mlp.c_proj"),
    }


def convert_clip_openai(sd: Mapping, vision_depth: int = 12, text_depth: int = 12,
                        vision_dim: int = 768, text_dim: int = 512) -> Dict:
    """OpenAI / open_clip checkpoint (fused qkv, ``visual.*`` naming) -> params."""
    visual: Dict = {
        "patch_embed": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0).astype(np.float32)},
        "class_embedding": _np(sd["visual.class_embedding"]).astype(np.float32),
        "position_embedding": _np(sd["visual.positional_embedding"]).astype(np.float32),
        "pre_ln": _ln(sd, "visual.ln_pre"),
        "post_ln": _ln(sd, "visual.ln_post"),
        "visual_projection": _np(sd["visual.proj"]).astype(np.float32),
        "encoder": {
            f"block_{i}": _openai_block(sd, f"visual.transformer.resblocks.{i}", vision_dim)
            for i in range(vision_depth)
        },
    }
    text: Dict = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"]).astype(np.float32)},
        "position_embedding": _np(sd["positional_embedding"]).astype(np.float32),
        "final_ln": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]).astype(np.float32),
        "encoder": {
            f"block_{i}": _openai_block(sd, f"transformer.resblocks.{i}", text_dim)
            for i in range(text_depth)
        },
    }
    return {"visual": visual, "text": text}


def load_clip_params(path: str, vision_depth: int = 12, text_depth: int = 12) -> Dict:
    """Auto-detecting loader for a ``.pt``/``.bin``/``.safetensors`` CLIP
    checkpoint (torch needed to read torch files)."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd:
            sd = sd["state_dict"]
    if any(k.startswith("visual.conv1") for k in sd):
        return convert_clip_openai(sd, vision_depth, text_depth)
    return convert_clip_hf(sd, vision_depth, text_depth)
