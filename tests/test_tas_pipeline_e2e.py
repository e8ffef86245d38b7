"""Full TAS-Balanced + dynamic-teacher pipeline through the Trainer:
cluster file + scored pairs + collection → dynamic sampler → teacher-wrapped
batches → jitted train step (the reference's 3-process pipeline, SURVEY §3.4,
as one in-process TPU program chain)."""

import os

import numpy as np
import pytest
import yaml

import jax


@pytest.fixture(scope="module")
def tas_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("tas_e2e")
    rng = np.random.default_rng(3)

    n_docs, n_queries = 40, 12
    coll = root / "collection.tsv"
    coll.write_text("".join(f"d{i}\tdocument body {i} topic{i % 5}\n" for i in range(n_docs)))
    queries = root / "queries.tsv"
    queries.write_text("".join(f"q{i}\tquery about topic{i % 5}\n" for i in range(n_queries)))

    pairs = root / "pairs.tsv"
    lines = []
    for qi in range(n_queries):
        for _ in range(5):
            dp, dn = rng.choice(n_docs, 2, replace=False)
            lines.append(f"{rng.normal(6):.3f} {rng.normal(0):.3f} q{qi} d{dp} d{dn}\n")
    pairs.write_text("".join(lines))

    clusters = root / "clusters.tsv"
    clusters.write_text(
        " ".join(f"q{i}" for i in range(0, n_queries, 2)) + "\n"
        + " ".join(f"q{i}" for i in range(1, n_queries, 2)) + "\n"
    )

    # tiny teacher checkpoint (random init is fine — we test the plumbing)
    from matchmaker_tpu.config import auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.checkpoints import save_params

    teacher_dir = root / "teacher"
    os.makedirs(teacher_dir)
    t_config = auto_fill({
        "model": "bert_dot", "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 16,
        "model_input_type": "auto", "token_embedder_type": "auto",
    })
    yaml.safe_dump(dict(t_config), open(teacher_dir / "config.yaml", "w"))
    tok = build_tokenizer(t_config)
    model = get_model(t_config, tok)
    save_params(str(teacher_dir / "best-model.flax"), init_params(model, t_config, jax.random.PRNGKey(1)))

    return {
        "collection": str(coll), "queries": str(queries), "pairs": str(pairs),
        "clusters": str(clusters), "teacher": str(teacher_dir), "root": str(root),
    }


def test_tas_dynamic_teacher_training(tas_setup, tmp_path, eight_devices):
    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.training.trainer import Trainer

    run_folder = str(tmp_path / "run")
    os.makedirs(run_folder)
    config = Config(auto_fill({
        "model": "bert_dot",
        "model_input_type": "auto", "token_embedder_type": "auto",
        "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 16,
        "batch_size_train": 8, "batch_size_eval": 8,
        "epochs": 1, "tas_batches_per_epoch": 6,
        "loss": "margin-mse", "train_pairwise_distillation": True,
        "in_batch_negatives": True, "in_batch_neg_loss": "KLDivTeacherList",
        "dynamic_sampler": True,
        "dynamic_sampler_collection": tas_setup["collection"],
        "dynamic_sampler_queries": tas_setup["queries"],
        "dynamic_sampler_pairs_with_teacher_scores": tas_setup["pairs"],
        "dynamic_sampler_query_cluster_file": tas_setup["clusters"],
        "tas_balanced_pair_strategy": "bins",
        "dynamic_teacher": True,
        "dynamic_teacher_path": tas_setup["teacher"],
        "dynamic_teacher_in_batch_scoring": True,
        "param_group0_learning_rate": 0.001, "param_group1_learning_rate": 0.001,
        "lr_schedule": "constant", "optimizer_warmup_steps": 0,
        "validate_every_n_batches": -1, "random_seed": 11,
        "validation_metric": "MRR@10",
    }))
    trainer = Trainer(config, run_folder)
    trainer.train()
    assert trainer.global_step == 6
    # losses were logged finite
    import csv

    assert os.path.exists(os.path.join(run_folder, "best-model.flax"))
