"""Subprocess driver for the multi-process CPU dryruns (tests/test_multihost.py).

Each process runs THIS script with MATCHMAKER_{COORDINATOR,NUM_PROCESSES,
PROCESS_ID} set; jax.distributed wires them into one 8-device (N×(8/N) CPU)
runtime and the Trainer runs a real multi-process training loop: per-process
batch slices (strided BEFORE tokenization), make_array_from_process_local_data
placement, GSPMD gradient all-reduce across the process boundary (gloo).

Modes (argv[2], default "plain"):
  plain      one uninterrupted run; asserts steps and validation artifacts
  interrupt  save_train_state + max_training_batches=2: stops mid-epoch with
             a collective orbax snapshot (the "kill")
  resume     restores the snapshot (params+opt+step+data cursor), finishes
             the epoch from the exact next batch
  full       uninterrupted run with the same config as interrupt+resume;
             dumps final params for bit-comparison against the resumed run
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
N_PROC = int(os.environ["MATCHMAKER_NUM_PROCESSES"])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // N_PROC}"

import jax

jax.config.update("jax_platforms", "cpu")

from matchmaker_tpu.parallel.multihost import maybe_initialize_distributed

assert maybe_initialize_distributed(), "env contract not detected"

import numpy as np

from matchmaker_tpu.config import Config, auto_fill
from matchmaker_tpu.training.trainer import Trainer


def build_config(work_dir: str, run_folder: str, save_state: bool) -> Config:
    return Config(auto_fill({
        "model": "bert_dot",
        "model_input_type": "auto", "token_embedder_type": "auto",
        "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 16,
        "batch_size_train": 8,  # GLOBAL; 8/N_PROC rows per process
        "batch_size_eval": 6,   # NOT divisible by the 8 devices: exercises the
                                # eval step's pad-to-device-count row padding
        "epochs": 1,
        "loss": "ranknet",
        "in_batch_negatives": True,
        "in_batch_neg_loss": "ranknet",
        "learning_rate": 1e-3,
        "param_group0_learning_rate": 1e-3,
        "param_group1_learning_rate": 1e-3,
        "optimizer_warmup_steps": 0,
        "lr_schedule": "constant",
        # continuous validation ACROSS the process boundary: every process
        # scores the full tuple stream through the data-sharded eval step
        # (replicated outputs), metrics/early-stopping run in lockstep, and
        # only process 0 writes the run folder
        "validate_every_n_batches": 2,
        "validation_cont": {
            "tsv": os.path.join(work_dir, "validation.tsv"),
            "qrels": os.path.join(work_dir, "validation.qrels"),
            "binarization_point": 1.0,
        },
        "validation_metric": "MRR@10",
        "expirement_base_path": work_dir,
        "train_tsv": os.path.join(work_dir, "train.tsv"),
        "save_train_state": save_state,
    }))


def dump_params(trainer: Trainer, path: str) -> None:
    flat = {
        "/".join(map(str, kp)): np.asarray(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(trainer.params)[0]
        if hasattr(leaf, "shape")
    }
    np.savez(path, **flat)


def main() -> int:
    work_dir = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "plain"
    pid = jax.process_index()
    assert jax.device_count() == 8 and jax.local_device_count() == 8 // N_PROC

    run_folder = os.path.join(work_dir, "run" if mode == "plain" else f"run_{mode}")
    if mode == "resume":  # same run folder as the interrupted phase
        run_folder = os.path.join(work_dir, "run_interrupt")
    os.makedirs(run_folder, exist_ok=True)
    config = build_config(work_dir, run_folder, save_state=mode != "plain")
    if mode == "interrupt":
        config["max_training_batches"] = 2

    trainer = Trainer(config, run_folder)
    if mode == "resume":
        assert trainer.resume_from_train_state(), "no snapshot to resume"
        assert trainer.global_step == 2, trainer.global_step
    trainer.train()

    # 32 triples → 8 global rows/step → 4 global steps per epoch
    want_steps = 2 if mode == "interrupt" else 4
    assert trainer.global_step == want_steps, (pid, mode, trainer.global_step)
    if mode == "plain":
        # every process computed the (identical, replicated) validation metrics
        assert trainer.best_metric > 0.0, (pid, trainer.best_metric)
        if pid == 0:
            assert os.path.exists(os.path.join(run_folder, "best-model.flax"))
            assert os.path.exists(os.path.join(run_folder, "validation-metrics-cont.csv"))
    if mode in ("resume", "full") and pid == 0:
        dump_params(trainer, os.path.join(work_dir, f"params_{mode}.npz"))
    print(f"[driver p{pid}] MULTIHOST_DRYRUN_OK mode={mode} steps={trainer.global_step}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
