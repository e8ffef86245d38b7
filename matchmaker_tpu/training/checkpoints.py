"""Checkpointing.

The reference stores plain ``state_dict`` files with best-checkpoint rotation
(train.py:631-651) and no optimizer-state resume (SURVEY.md §5.4). Here:
msgpack param files for best-model snapshots + hub-style warmstart, and an
orbax-backed full train state (params + optimizer + step) for true mid-run
resume — sharded-array aware, so it works identically under a multi-chip mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization
import jax


def save_params(path: str, params) -> None:
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_params(path: str, template) -> Any:
    with open(path, "rb") as f:
        restored = flax.serialization.from_bytes(template, f.read())

    # preserve the template's device placement: from_bytes returns HOST
    # arrays, and host-numpy params re-upload the whole model on every
    # jitted call (~266 MB/batch for a DistilBERT tower over a tunneled TPU)
    def place(t, r):
        if isinstance(t, jax.Array):
            return jax.device_put(r, t.sharding)
        return r

    return jax.tree_util.tree_map(place, template, restored)


def rotate_best(run_folder: str, n_best: int) -> None:
    """best-model.flax → best-model-2.flax → ... (reference train.py:637-647)."""
    if n_best <= 1:
        return
    for i in range(n_best - 1, 0, -1):
        src = os.path.join(run_folder, f"best-model-{i}.flax" if i > 1 else "best-model.flax")
        dst = os.path.join(run_folder, f"best-model-{i + 1}.flax")
        if os.path.exists(src):
            os.replace(src, dst)


class TrainStateCheckpointer:
    """Full train-state (params+opt+step) checkpoints via orbax."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.checkpointer = ocp.StandardCheckpointer()

    def save(self, step: int, state) -> None:
        path = os.path.join(self.directory, f"step_{step}")
        self.checkpointer.save(path, state, force=True)
        # StandardCheckpointer commits ASYNCHRONOUSLY: without the barrier a
        # reader (resume_from_train_state, or a crash right after train())
        # can scan the directory before the tmp dir is renamed and see no
        # checkpoint at all (flaked under CPU contention in the full suite)
        if hasattr(self.checkpointer, "wait_until_finished"):
            self.checkpointer.wait_until_finished()

    def restore(self, step: int, template) -> Any:
        path = os.path.join(self.directory, f"step_{step}")
        return self.checkpointer.restore(path, target=template)

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None


def load_encoder_subtree(path: str, params) -> Any:
    """Graft a checkpoint's ``encoder`` subtree into a ranker's param tree.

    The MLM pre-train driver (cli/pretrain.py) saves ``MLMPretrainModel``
    params — {encoder, mlm head, ...} — whose tree does NOT match a ranker's,
    so ``load_params`` (strict template match) can't warmstart from it. This
    is the reference's "load the LM, keep the head random" warmstart
    (models/bert_*.py from_pretrained semantics): every encoder slot of the
    ranker (``encoder`` / ``query_encoder`` / ``doc_encoder``) is replaced by
    the checkpoint's encoder weights; heads keep their fresh init."""
    import flax.serialization

    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    enc = raw.get("encoder", raw)
    out = dict(params)
    replaced = 0
    for key in params:
        if key in ("encoder", "query_encoder", "doc_encoder"):
            out[key] = flax.serialization.from_state_dict(params[key], enc)
            replaced += 1
    if not replaced:
        raise ValueError(f"no encoder subtree in target params to graft {path} into")
    return out
