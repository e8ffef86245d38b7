"""The one-command TAS-B recipe driver (cli/tasb_recipe.py) end to end.

Small-scale smoke on the virtual CPU mesh: every stage of the recipe — MLM
pretrain, baseline train + query clustering, ColBERT teacher train, pair
scoring, TAS-Balanced student with the dynamic in-batch teacher, encode →
binmax index → search → metrics — must run and produce a ranking far above
random. The full-scale pinned floors live in the TPU runbook numbers
(docs/msmarco_runbook.md) and RECIPE_RESULT artifacts.
"""

import os

import pytest


@pytest.mark.slow
def test_tasb_recipe_smoke(tmp_path, eight_devices):
    from matchmaker_tpu.cli.tasb_recipe import run_recipe

    out = run_recipe(
        str(tmp_path), model_name="tiny-test", n_docs=1200,
        n_train_queries=80, n_eval_queries=20, mlm_steps=30,
        teacher_epochs=2, tas_batches_per_epoch=40, student_epochs=1,
        batch_size=16, n_clusters=8, teacher_lr=1e-3, student_lr=1e-3,
    )
    assert out["QueriesRanked"] == 20
    # planted ceiling is MRR 1.0; random over 1200 docs is ~0.005 — the tiny
    # budget must land far above random (measured 0.31 / 0.90 round 4 after
    # the topic-structured corpus + normalized teacher; floors leave slack
    # for 20-query noise)
    assert out["MRR@10"] is not None and out["MRR@10"] >= 0.2, out
    assert out["Recall@100"] >= 0.6, out
    assert os.path.exists(tmp_path / "tasb_recipe_result.json")
    # every stage left its artifact
    for sub in ("mlm_run", "baseline_bert_dot", "colbert_teacher",
                "student_run", "retrieval_run"):
        assert os.path.isdir(tmp_path / sub), sub
    assert os.path.getsize(tmp_path / "pairs_with_teacher_scores.tsv") > 0
    assert sum(1 for _ in open(tmp_path / "query_clusters.tsv")) >= 2, \
        "query clustering collapsed to one cluster"
