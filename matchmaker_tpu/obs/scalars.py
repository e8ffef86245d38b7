"""Training-scalar logging: TensorBoard + CSV.

Contract: reference train.py:280-293,570-574,623-661 — ~20 training stats
flushed every 100 steps to TensorBoard plus CSVs. Every scalar goes to both
sinks: TensorBoard (when available) and a long-format
``{prefix}-scalars.csv`` (step, name, value) in the run folder — the CSV
works even where tensorboard isn't installed.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, TextIO


class ScalarWriter:
    def __init__(self, run_folder: str, enable_tensorboard: bool = True):
        self.run_folder = run_folder
        self._tb = None
        self._csv: Dict[str, TextIO] = {}
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(run_folder, "tensorboard"))
            except Exception:
                self._tb = None

    def _csv_sink(self, prefix: str) -> Optional[TextIO]:
        if prefix not in self._csv:
            try:
                path = os.path.join(self.run_folder, f"{prefix}-scalars.csv")
                fresh = not os.path.exists(path)
                f = open(path, "a", encoding="utf-8")
                if fresh:
                    f.write("step,name,value\n")
                self._csv[prefix] = f
            except Exception:
                self._csv[prefix] = None
        return self._csv[prefix]

    def write(self, scalars: Dict[str, float], step: int, prefix: str = "train") -> None:
        csv = self._csv_sink(prefix)
        for k, v in scalars.items():
            try:
                fv = float(v)
            except Exception:
                continue
            if self._tb is not None:
                try:
                    self._tb.add_scalar(f"{prefix}/{k}", fv, step)
                except Exception:
                    pass
            if csv is not None:
                csv.write(f"{step},{k},{fv}\n")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        for f in self._csv.values():
            if f is not None:
                f.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        for f in self._csv.values():
            if f is not None:
                f.close()
        self._csv.clear()


def collect_learned_scalars(params, max_size: int = 16) -> Dict[str, float]:
    """Model-internal learned scalars for per-validation telemetry.

    The reference logs each model's hand-picked learned scalars to
    TensorBoard every validation (train.py:240-244 get_param_stats — e.g.
    ecai20_tk.py:126-129: TK's mixer and kernel-alpha scalers) so researchers
    can watch them move during training. Here the selection is automatic:
    every float param leaf with ≤ ``max_size`` elements is a learned scalar
    (TK mixer (1,), kernel_alpha_scaler (1,1,11), TK-Sparse mixer_stop, IDCM
    top_k_scoring (1,K), the MTL log-vars, ...) — real weight tensors are
    orders of magnitude larger. Plain `bias`/`scale`/`embedding` leaves are
    excluded by name so tiny-model test runs don't spam LN/dense vectors.

    Returns {"path/to/leaf[/i]": value} ready for ScalarWriter.write.
    """
    import jax
    import numpy as np

    out: Dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, leaf in flat:
        if not hasattr(leaf, "shape") or not hasattr(leaf, "dtype"):
            continue
        if leaf.dtype.kind != "f" or int(np.prod(leaf.shape)) > max_size:
            continue
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp
        )
        base = name.rsplit("/", 1)[-1]
        if base in ("bias", "scale", "embedding", "kernel"):
            continue
        vals = np.asarray(leaf).reshape(-1)
        if vals.size == 1:
            out[name] = float(vals[0])
        else:
            for i, v in enumerate(vals):
                out[f"{name}/{i}"] = float(v)
    return out
