"""Checkpointing (SURVEY.md §5): save/restore params and full train state.

The reference only does ``torch.save(state_dict)`` per epoch with no resume
and no optimizer state (``train/diffusion_train.py:143-147``). Here:

* :func:`save_params` / :func:`load_params` — single-file msgpack param
  snapshots, the per-epoch cadence artifact (named ``diffusion_unet_ep{N}``
  for parity with the reference's filenames);
* :class:`TrainCheckpointer` — orbax-backed full state (params + opt state +
  step) with resume, the upgrade the reference lacks;
* :func:`load_unet_checkpoint` — tolerant loader that accepts our msgpack
  *or* a reference ``.pt`` state_dict (converted on the fly; torch needed
  only in that branch), mirroring the reference's tolerant unwrap behavior
  (``cli/reconstruct_sd_diffusion.py:26-44``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np
from flax import serialization

PathLike = Union[str, Path]


def save_params(path: PathLike, params: Dict) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_params = jax.tree_util.tree_map(np.asarray, params)
    path.write_bytes(serialization.msgpack_serialize(host_params))
    return path


def load_params(path: PathLike) -> Dict:
    return serialization.msgpack_restore(Path(path).read_bytes())


def load_unet_checkpoint(path: PathLike, ch_mult=(1, 2, 2)) -> Dict:
    """Load UNet params from our msgpack or a reference torch ``.pt``."""
    path = Path(path)
    if path.suffix in (".pt", ".pth", ".bin"):
        import torch  # conversion-only dependency

        from ..weights.convert import convert_unet

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return convert_unet(sd, ch_mult)
    return load_params(path)


class TrainCheckpointer:
    """Orbax checkpoint manager for full train state with resume."""

    def __init__(self, directory: PathLike, max_to_keep: int = 3) -> None:
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step, args=self._ocp.args.StandardRestore(state_template))
