"""Shared pipeline configuration (SURVEY.md §5 "config / flag system").

The reference hard-codes model hyperparams at every call site
(``train/diffusion_train.py:103``, ``cli/reconstruct_diffusion.py:47``) — a
latent bug: train at a non-default size/width and reconstruction silently
builds a mismatched model. Here the trainer writes one ``model_config.json``
next to its checkpoints and the reconstruct/eval CLIs pick it up
automatically (explicit flags still win).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Optional, Tuple, Union

PathLike = Union[str, Path]

CONFIG_NAME = "model_config.json"


@dataclass
class ModelConfig:
    """Everything needed to rebuild the trained diffusion decoder."""

    z_dim: int
    base: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2)
    time_dim: int = 256
    img_ch: int = 3
    timesteps: int = 1000
    schedule: str = "cosine"
    out_size: int = 256

    def save(self, directory: PathLike) -> Path:
        path = Path(directory) / CONFIG_NAME
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(asdict(self), indent=2))
        return path

    @classmethod
    def load(cls, path: PathLike) -> "ModelConfig":
        d = json.loads(Path(path).read_text())
        d["ch_mult"] = tuple(d["ch_mult"])
        return cls(**d)

    @classmethod
    def find_for_checkpoint(cls, weights_path: PathLike) -> Optional["ModelConfig"]:
        """The config sitting next to a checkpoint file, if any."""
        cand = Path(weights_path).parent / CONFIG_NAME
        return cls.load(cand) if cand.exists() else None

    @classmethod
    def infer_from_params(cls, params, **overrides) -> "ModelConfig":
        """Reconstruct the architecture from a CLIPCondUNet param tree:
        ``base`` from the stem conv, ``ch_mult`` from each stage's downsample
        conv channel ratio, ``z_dim`` from the conditioning projection. Makes
        checkpoints self-describing even without model_config.json."""
        base = int(params["in_conv"]["kernel"].shape[-1])
        z_dim = int(params["z_proj_0"]["kernel"].shape[0])
        time_dim = int(params["z_proj_0"]["kernel"].shape[1])
        img_ch = int(params["in_conv"]["kernel"].shape[-2])
        ch_mult = []
        i = 0
        while f"down_{i}_ds" in params:
            k = params[f"down_{i}_ds"]["kernel"]
            ch_mult.append(int(k.shape[-1]) // int(k.shape[-2]))
            i += 1
        d = dict(z_dim=z_dim, base=base, ch_mult=tuple(ch_mult), time_dim=time_dim, img_ch=img_ch)
        d.update(overrides)
        return cls(**d)
