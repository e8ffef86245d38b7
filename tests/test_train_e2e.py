"""End-to-end: train KNRM on the planted-relevance dataset over the virtual
8-device mesh, check the loss falls and validation MRR beats random."""

import os

import numpy as np
import pytest

from matchmaker_tpu.config import Config, auto_fill
from matchmaker_tpu.training.trainer import Trainer
from tests.make_tiny_dataset import make_tiny_dataset


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("tiny_ir")
    return make_tiny_dataset(str(out))


def _config(paths, run_base):
    return Config(auto_fill({
        "model": "knrm",
        "token_embedder_type": "embedding",
        "vocab_path": paths["vocab"],
        "token_embedding_size": 32,
        "knrm_kernels": 7,
        "max_query_length": 8,
        "max_doc_length": 24,
        "batch_size_train": 16,
        "batch_size_eval": 16,
        "epochs": 8,
        "loss": "ranknet",
        "learning_rate": 0.01,
        "param_group1_learning_rate": 0.01,
        "embedding_optimizer_learning_rate": 0.01,
        "optimizer_warmup_steps": 0,
        "lr_schedule": "constant",
        "validate_every_n_batches": -1,
        "validation_metric": "MRR@10",
        "random_seed": 7,
        "expirement_base_path": run_base,
        "train_tsv": paths["train_tsv"],
        "validation_cont": {
            "tsv": paths["val_tsv"],
            "qrels": paths["qrels"],
            "binarization_point": 1.0,
        },
        "test": {
            "tiny": {
                "tsv": paths["val_tsv"],
                "qrels": paths["qrels"],
                "binarization_point": 1.0,
            }
        },
    }))


def test_knrm_end_to_end(tiny, tmp_path, eight_devices):
    run_folder = str(tmp_path / "run")
    os.makedirs(run_folder)
    config = _config(tiny, str(tmp_path))
    trainer = Trainer(config, run_folder)

    # capture loss trajectory by training manually for a few epochs
    from matchmaker_tpu.data.loaders import device_prefetch, triple_training_loader

    losses = []
    for _ in range(6):
        loader = triple_training_loader(config, trainer.tokenizer, config["train_tsv"])
        for batch in device_prefetch(loader, sharding=trainer.batch_sharding):
            trainer.params, trainer.opt_state, stats = trainer.train_step(
                trainer.params, trainer.opt_state, batch
            )
            losses.append(float(np.asarray(stats["loss"])))

    assert losses[-1] < losses[0] * 0.8, f"loss did not fall: {losses[0]} -> {losses[-1]}"

    from matchmaker_tpu.evaluation import validate_model

    metrics, value, _ = validate_model(
        "cont", trainer.eval_step, trainer.params, config, trainer.tokenizer,
        run_folder, config["validation_cont"], use_cache=False,
    )
    # random ranking over 10 docs ≈ MRR 0.29; planted relevance should be near 1
    assert value > 0.6, f"MRR@10 too low: {value}"
    assert metrics["QueriesRanked"] == 12


def test_trainer_full_loop_writes_artifacts(tiny, tmp_path, eight_devices):
    run_folder = str(tmp_path / "run_full")
    os.makedirs(run_folder)
    config = _config(tiny, str(tmp_path))
    config["epochs"] = 2
    trainer = Trainer(config, run_folder)
    trainer.train()

    assert os.path.exists(os.path.join(run_folder, "best-model.flax"))
    assert os.path.exists(os.path.join(run_folder, "validation-metrics-cont.csv"))
    assert os.path.exists(os.path.join(run_folder, "test-tiny-output.txt"))
    assert os.path.exists(os.path.join(run_folder, "test-tiny-metrics.csv"))
    assert os.path.exists(os.path.join(run_folder, "efficiency-metrics.json"))
    assert os.path.exists(os.path.join(run_folder, "best-info.csv"))


def test_train_state_save_and_resume(tiny, tmp_path, eight_devices):
    """Full params+optimizer+step snapshot restores exactly."""
    run_folder = str(tmp_path / "run_resume")
    os.makedirs(run_folder)
    config = _config(tiny, str(tmp_path))
    config["epochs"] = 1
    config["save_train_state"] = True
    trainer = Trainer(config, run_folder)
    trainer.train()
    assert trainer.global_step > 0
    saved_step = trainer.global_step

    trainer2 = Trainer(config, run_folder)
    assert trainer2.resume_from_train_state()
    assert trainer2.global_step == saved_step
    # params identical to the trained ones
    import jax

    leaves1 = jax.tree_util.tree_leaves(trainer.params)
    leaves2 = jax.tree_util.tree_leaves(trainer2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validate_model_cs_n_sweep(tiny, tmp_path, eight_devices):
    """cs@N candidate-depth sweep through the validation path."""
    run_folder = str(tmp_path / "run_csn")
    os.makedirs(run_folder)
    config = _config(tiny, str(tmp_path))
    trainer = Trainer(config, run_folder)

    # candidate file: every val doc with a synthetic first-stage rank
    import itertools
    from matchmaker_tpu.data.readers import read_reranking_tuples

    cand_path = str(tmp_path / "cands.txt")
    per_q = {}
    for s in read_reranking_tuples(tiny["val_tsv"]):
        per_q.setdefault(s.query_id, []).append(s.doc_id)
    with open(cand_path, "w") as f:
        for qid, dids in per_q.items():
            for rank, did in enumerate(dids, start=1):
                f.write(f"{qid} {did} {rank} {10 - rank}\n")

    vcfg = dict(config["validation_cont"])
    vcfg["candidate_set_path"] = cand_path
    vcfg["candidate_set_from_to"] = [2, 10]
    from matchmaker_tpu.evaluation import validate_model

    metrics, value, _ = validate_model(
        "cont", trainer.eval_step, trainer.params, config, trainer.tokenizer,
        run_folder, vcfg, use_cache=False,
    )
    assert "cs@n" in metrics and 2 <= metrics["cs@n"] <= 10
    assert os.path.exists(os.path.join(run_folder, "validation-metrics-cont-cs_5.csv"))


def test_auto_dense_retrieval_after_training(tiny, tmp_path, eight_devices):
    """run_dense_retrieval_eval auto-launches encode+index+search post-training
    (reference train.py:758-763)."""
    run_folder = str(tmp_path / "run_dr")
    os.makedirs(run_folder)
    config = _config(tiny, str(tmp_path))
    config.update({
        "epochs": 2,
        "run_dense_retrieval_eval": True,
        "model": "bert_dot",  # dense-capable model
        "token_embedder_type": "huggingface_bpe",
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "collection_tsv": tiny["collection"],
        "collection_batch_size": 16,
        "query_batch_size": 16,
        "token_dtype": "float32",
        "token_block_size": 64,
        "faiss_index_type": "flat",
        "query_sets": {
            "tiny": {"queries_tsv": tiny["queries"], "qrels": tiny["qrels"], "top_n": 10}
        },
    })
    del config["vocab_path"]
    from matchmaker_tpu.config import auto_fill, Config

    config = Config(auto_fill({**config, "model_input_type": "auto"}))
    trainer = Trainer(config, run_folder)
    trainer.train()
    dr = os.path.join(run_folder, "dense-retrieval")
    assert os.path.exists(os.path.join(dr, "tiny-output.txt"))
    assert os.path.exists(os.path.join(dr, "tiny-metrics.csv"))
