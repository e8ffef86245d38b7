"""Subprocess driver for the 2-process CPU dryrun (tests/test_multihost.py).

Each process runs THIS script with MATCHMAKER_{COORDINATOR,NUM_PROCESSES,
PROCESS_ID} set; jax.distributed wires them into one 8-device (2×4 CPU)
runtime and the Trainer runs a real multi-process training loop: per-process
batch slices, make_array_from_process_local_data placement, GSPMD gradient
all-reduce across the process boundary (gloo).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

from matchmaker_tpu.parallel.multihost import maybe_initialize_distributed

assert maybe_initialize_distributed(), "env contract not detected"

import numpy as np

from matchmaker_tpu.config import Config, auto_fill
from matchmaker_tpu.training.trainer import Trainer


def main() -> int:
    work_dir = sys.argv[1]
    pid = jax.process_index()
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    run_folder = os.path.join(work_dir, "run")
    os.makedirs(run_folder, exist_ok=True)
    config = Config(auto_fill({
        "model": "bert_dot",
        "model_input_type": "auto", "token_embedder_type": "auto",
        "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 16,
        "batch_size_train": 8,  # GLOBAL; 4 rows per process
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
    }))
    trainer = Trainer(config, run_folder)
    trainer.train()
    # 32 triples → 8 local 4-row batches → strided into 4 global steps of
    # 8 global rows (each process contributes every other local batch)
    assert trainer.global_step == 4, (pid, trainer.global_step)
    # every process computed the (identical, replicated) validation metrics
    assert trainer.best_metric > 0.0, (pid, trainer.best_metric)
    if pid == 0:
        assert os.path.exists(os.path.join(run_folder, "best-model.flax"))
        assert os.path.exists(os.path.join(run_folder, "validation-metrics-cont.csv"))
    print(f"[driver p{pid}] MULTIHOST_DRYRUN_OK steps={trainer.global_step}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
