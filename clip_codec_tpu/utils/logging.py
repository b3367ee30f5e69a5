"""Metrics/observability (SURVEY.md §5): stdout summaries + structured dicts.

The reference's surface is print + tqdm postfix (``train/diffusion_train.py:
115,145``); this keeps the same stdout shape and adds a structured record
stream that a TensorBoard writer (SD path parity) or JSON sink can consume.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class TrainLogger:
    def __init__(self, log_every: int = 0, jsonl_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None) -> None:
        self.log_every = log_every
        self.jsonl_path = Path(jsonl_path) if jsonl_path else None
        self._t0 = time.time()
        self._tb = None
        if tensorboard_dir:
            try:  # TB per-step scalars, matching the reference SD path
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None

    def _emit(self, record: dict) -> None:
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")

    def step(self, step: int, loss) -> None:
        if self._tb is not None:
            self._tb.add_scalar("train/loss", float(loss), step)
        if self.log_every and step % self.log_every == 0:
            v = float(loss)
            print(f"[train] step {step} loss={v:.4f}")
            self._emit({"kind": "step", "step": step, "loss": v, "t": time.time() - self._t0})

    def epoch(self, ep: int, total: int, loss: float, imgs_per_sec: float) -> None:
        # Same stdout shape as the reference's per-epoch print
        # (train/diffusion_train.py:145), plus throughput.
        print(f"[train] epoch {ep}/{total} loss={loss:.4f} ({imgs_per_sec:.1f} imgs/s)")
        if self._tb is not None:
            self._tb.add_scalar("train/epoch_loss", loss, ep)
        self._emit({"kind": "epoch", "epoch": ep, "loss": loss, "imgs_per_sec": imgs_per_sec})
