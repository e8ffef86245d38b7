"""The full user story in one test, mirroring the reference's intended
workflow end-to-end on the virtual 8-device mesh:

1. MLM-pretrain a tiny encoder on the collection
2. train a BERT_CAT teacher on triples (warmstarted from the MLM encoder)
3. score the triples with the teacher (Margin-MSE file)
4. train a BERT_DOT student with pairwise distillation + in-batch negatives
5. run dense retrieval (encode → flat index → search) with the student
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.make_tiny_dataset import make_tiny_dataset

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def _run(args, timeout=600):
    r = subprocess.run([sys.executable, "-m"] + args, capture_output=True, text=True, env=ENV, timeout=timeout)
    assert r.returncode == 0, f"{args}\nstdout:{r.stdout[-2000:]}\nstderr:{r.stderr[-2000:]}"
    return r.stdout


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    data = make_tiny_dataset(str(tmp_path / "data"))
    exp = str(tmp_path / "exp")
    os.makedirs(exp)

    base = {
        "expirement_base_path": exp,
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "max_query_length": 8,
        "max_doc_length": 24,
        "lr_schedule": "constant",
        "optimizer_warmup_steps": 0,
        "param_group0_learning_rate": 0.002,
        "param_group1_learning_rate": 0.002,
        "embedding_optimizer_learning_rate": 0.002,
        "validate_every_n_batches": -1,
        "validation_metric": "MRR@10",
        "random_seed": 7,
        "model_input_type": "auto",
        "token_embedder_type": "auto",
    }

    # -- 1. MLM pretrain ----------------------------------------------------
    mlm_cfg = dict(base, model="bert_dot", collection_tsv=data["collection"],
                   batch_size_train=16, epochs=2)
    yaml.safe_dump(mlm_cfg, open(tmp_path / "mlm.yaml", "w"))
    _run(["matchmaker_tpu.cli.pretrain", "--config-file", str(tmp_path / "mlm.yaml"),
          "--run-name", "mlm"])
    mlm_run = [f for f in os.listdir(exp) if f.endswith("_mlm")][0]
    assert os.path.exists(os.path.join(exp, mlm_run, "best-model.flax"))

    # -- 2. BERT_CAT teacher ------------------------------------------------
    cat_cfg = dict(base, model="bert_cat", loss="ranknet", epochs=6,
                   batch_size_train=16, batch_size_eval=16,
                   train_tsv=data["train_tsv"],
                   validation_cont={"tsv": data["val_tsv"], "qrels": data["qrels"],
                                    "binarization_point": 1.0})
    yaml.safe_dump(cat_cfg, open(tmp_path / "cat.yaml", "w"))
    _run(["matchmaker_tpu.cli.train", "--config-file", str(tmp_path / "cat.yaml"),
          "--run-name", "teacher"])
    teacher_run = os.path.join(exp, [f for f in os.listdir(exp) if f.endswith("_teacher")][0])

    # -- 3. teacher-score triples -------------------------------------------
    scored = str(tmp_path / "scored.tsv")
    _run(["matchmaker_tpu.cli.score_teacher", "--teacher", teacher_run,
          "--triples", data["train_tsv"], "--out", scored, "--batch-size", "16"])
    rows = open(scored).read().strip().split("\n")
    assert len(rows) == 120 and all(len(r.split("\t")) == 5 for r in rows)

    # -- 4. BERT_DOT student with Margin-MSE + in-batch negatives -----------
    dot_cfg = dict(base, model="bert_dot", loss="margin-mse",
                   train_pairwise_distillation=True,
                   in_batch_negatives=True, in_batch_neg_loss="margin-mse",
                   epochs=10, batch_size_train=16, batch_size_eval=16,
                   train_tsv=scored,
                   validation_cont={"tsv": data["val_tsv"], "qrels": data["qrels"],
                                    "binarization_point": 1.0},
                   test={"tiny": {"tsv": data["val_tsv"], "qrels": data["qrels"],
                                  "binarization_point": 1.0}})
    yaml.safe_dump(dot_cfg, open(tmp_path / "dot.yaml", "w"))
    out = _run(["matchmaker_tpu.cli.train", "--config-file", str(tmp_path / "dot.yaml"),
                "--run-name", "student"])
    student_run = os.path.join(exp, [f for f in os.listdir(exp) if f.endswith("_student")][0])
    import csv

    with open(os.path.join(student_run, "best-info.csv")) as f:
        best = list(csv.reader(f))[1]
    assert float(best[1]) > 0.5, f"student reranking MRR too low: {best[1]}"

    # -- 5. dense retrieval with the student --------------------------------
    dr_cfg = dict(base, model="bert_dot", trained_model=student_run,
                  collection_tsv=data["collection"], collection_batch_size=16,
                  query_batch_size=8, token_block_size=64, token_dtype="float16",
                  faiss_index_type="flat",
                  query_sets={"tiny": {"queries_tsv": data["queries"],
                                       "qrels": data["qrels"],
                                       "binarization_point": 1, "top_n": 10}})
    yaml.safe_dump(dr_cfg, open(tmp_path / "dr.yaml", "w"))
    _run(["matchmaker_tpu.cli.dense_retrieval", "encode+index+search",
          "--config-file", str(tmp_path / "dr.yaml"), "--run-name", "dr"])
    dr_run = os.path.join(exp, [f for f in os.listdir(exp) if f.endswith("_dr")][0])
    with open(os.path.join(dr_run, "tiny-metrics.csv")) as f:
        header, values = list(csv.reader(f))
    mrr = float(values[header.index("MRR@10")])
    assert mrr > 0.3, f"full-corpus retrieval MRR too low: {mrr}"
