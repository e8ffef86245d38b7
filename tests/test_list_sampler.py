"""Listwise dynamic sampler (qrels + candidate run → graded list batches) and
the list branch of the jitted train step — the reference's
IrDynamicTripleDatasetLoader rebuilt (list_training_loader.py:30-166)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.make_tiny_dataset import make_tiny_dataset


def _write_candidates(paths, tmp_path):
    """A candidate run per validation query: its own docs in arbitrary order
    (qid did rank score)."""
    by_q = {}
    with open(paths["val_tsv"]) as f:
        for line in f:
            qid, did = line.split("\t")[:2]
            by_q.setdefault(qid, []).append(did)
    run = os.path.join(str(tmp_path), "candidates.txt")
    with open(run, "w") as f:
        for qid, dids in by_q.items():
            for rank, did in enumerate(dids, 1):
                f.write(f"{qid} {did} {rank} {1.0 / rank}\n")
    return run


@pytest.fixture()
def sampler_setup(tmp_path):
    paths = make_tiny_dataset(str(tmp_path / "data"))
    run = _write_candidates(paths, tmp_path)
    from matchmaker_tpu.data.list_sampler import ListwiseDynamicSampler

    sampler = ListwiseDynamicSampler(
        collection_file=paths["collection"],
        query_file=paths["queries"],
        qrels_file=paths["qrels"],
        candidate_file=run,
        list_size=6,
        queries_per_batch=4,
        seed=3,
    )
    return paths, sampler


def test_list_sampler_semantics(sampler_setup):
    paths, sampler = sampler_setup
    it = sampler.sample_lists()
    for _ in range(20):
        query, docs, labels = next(it)
        assert len(docs) == 6 and labels.shape == (6,)
        # slot 0 = judged positive (grade 3); candidates grade 1; random 0
        assert labels[0] == 3.0
        assert set(labels[1:]) <= {0.0, 1.0}
        assert (labels == 1.0).sum() == sampler.candidate_count
    # judged positives never appear among the label-1 candidates
    for qid, cands in sampler.candidates.items():
        assert not set(cands) & set(sampler.qrels[qid])


def test_list_sampler_batches_fixed_shapes(sampler_setup):
    paths, sampler = sampler_setup
    from matchmaker_tpu.data.tokenization import build_tokenizer

    config = {
        "model_input_type": "independent", "token_embedder_type": "embedding",
        "vocab_path": paths["vocab"], "max_query_length": 8, "max_doc_length": 24,
    }
    tokenizer = build_tokenizer(config)
    batches = list(sampler.batches(config, tokenizer, max_batches=3))
    assert len(batches) == 3
    b = batches[0]
    assert b["query_ids"].shape == (4, 8)
    assert b["list_doc_ids"].shape == (4, 6, 24)
    assert b["list_labels"].shape == (4, 6)
    assert b["valid"].shape == (4,)


@pytest.mark.parametrize("loss_name", ["listnet", "lambdarank"])
def test_list_training_step_learns(sampler_setup, loss_name):
    """A KNRM ranker trained on list batches with a listwise loss must rank
    the planted positive above the random negatives after a few steps."""
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    paths, sampler = sampler_setup
    config = {
        "model": "knrm", "model_input_type": "independent",
        "token_embedder_type": "embedding", "vocab_path": paths["vocab"],
        "max_query_length": 8, "max_doc_length": 24,
        "embedding_dim": 32, "loss": loss_name,
        "param_group0_learning_rate": 0.05,
        "gradient_clip_norm": 100.0, "max_training_steps": 120,
        "optimizer_warmup_steps": 0, "random_seed": 1,
    }
    tokenizer = build_tokenizer(config)
    model = get_model(config, tokenizer)
    params = init_params(model, config, jax.random.PRNGKey(0))
    losses = get_loss(config)
    tx = build_optimizer(config, params)
    opt_state = tx.init(params)
    step = make_train_step(model, losses, tx, config)

    first_loss = last_loss = None
    batches = sampler.batches(config, tokenizer, max_batches=100)
    for batch in batches:
        params, opt_state, stats = step(params, opt_state, batch)
        last_loss = float(np.asarray(stats["loss"]))
        if first_loss is None:
            first_loss = last_loss
    assert np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)

    # the trained model ranks slot-0 positives above average negatives
    pos_mean = float(np.asarray(stats["score_pos_mean"]))
    neg_mean = float(np.asarray(stats["score_neg_mean"]))
    assert pos_mean > neg_mean, (pos_mean, neg_mean)
