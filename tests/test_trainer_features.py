"""Trainer feature coverage: listwise losses, grad accumulation, warmstart,
n-best checkpoint rotation, in-loop validation cadence."""

import os

import numpy as np
import pytest

import jax

from matchmaker_tpu.config import Config, auto_fill
from matchmaker_tpu.training.trainer import Trainer
from tests.make_tiny_dataset import make_tiny_dataset


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return make_tiny_dataset(str(tmp_path_factory.mktemp("tiny_tf")))


def _base_config(tiny, run_base, **kw):
    cfg = {
        "model": "knrm",
        "token_embedder_type": "embedding",
        "model_input_type": "auto",
        "vocab_path": tiny["vocab"],
        "token_embedding_size": 24,
        "knrm_kernels": 5,
        "max_query_length": 8,
        "max_doc_length": 24,
        "batch_size_train": 16,
        "batch_size_eval": 16,
        "epochs": 2,
        "loss": "ranknet",
        "param_group1_learning_rate": 0.01,
        "embedding_optimizer_learning_rate": 0.01,
        "optimizer_warmup_steps": 0,
        "lr_schedule": "constant",
        "validate_every_n_batches": -1,
        "validation_metric": "MRR@10",
        "random_seed": 7,
        "expirement_base_path": run_base,
        "train_tsv": tiny["train_tsv"],
        "validation_cont": {"tsv": tiny["val_tsv"], "qrels": tiny["qrels"], "binarization_point": 1.0},
    }
    cfg.update(kw)
    return Config(auto_fill(cfg))


@pytest.mark.parametrize("loss", ["mrr", "listnet", "lambdarank", "margin", "margin-mse"])
def test_losses_train_finite(tiny, tmp_path, loss, eight_devices):
    run = str(tmp_path / f"run_{loss}")
    os.makedirs(run)
    kw = {"loss": loss, "epochs": 1}
    if loss == "margin-mse":
        kw["train_pairwise_distillation"] = False  # zero teacher scores
    config = _base_config(tiny, str(tmp_path), **kw)
    trainer = Trainer(config, run)
    from matchmaker_tpu.data.loaders import triple_training_loader

    batch = next(iter(triple_training_loader(config, trainer.tokenizer, config["train_tsv"])))
    _, _, stats = trainer.train_step(trainer.params, trainer.opt_state, batch)
    assert np.isfinite(float(np.asarray(stats["loss"]))), loss


def test_gradient_accumulation(tiny, tmp_path, eight_devices):
    run = str(tmp_path / "run_accum")
    os.makedirs(run)
    config = _base_config(tiny, str(tmp_path), gradient_accumulation_steps=2, epochs=1)
    trainer = Trainer(config, run)
    from matchmaker_tpu.data.loaders import triple_training_loader

    loader = triple_training_loader(config, trainer.tokenizer, config["train_tsv"])
    b1 = next(iter(loader))
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0]).copy()
    params, opt_state, _ = trainer.train_step(trainer.params, trainer.opt_state, b1)
    # first accumulation micro-step: no parameter change yet
    p1 = np.asarray(jax.tree_util.tree_leaves(params)[0])
    np.testing.assert_array_equal(p0, p1)
    params, opt_state, _ = trainer.train_step(params, opt_state, b1)
    p2 = np.asarray(jax.tree_util.tree_leaves(params)[0])
    assert not np.array_equal(p0, p2)


def test_warmstart_model_path(tiny, tmp_path, eight_devices):
    run1 = str(tmp_path / "run_a")
    os.makedirs(run1)
    config = _base_config(tiny, str(tmp_path), epochs=1)
    t1 = Trainer(config, run1)
    t1.train()
    ckpt = os.path.join(run1, "best-model.flax")
    assert os.path.exists(ckpt)

    run2 = str(tmp_path / "run_b")
    os.makedirs(run2)
    config2 = _base_config(tiny, str(tmp_path), warmstart_model_path=ckpt)
    t2 = Trainer(config2, run2)
    for a, b in zip(jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_n_best_checkpoint_rotation(tmp_path):
    """rotate_best shifts best-model.flax → best-model-2.flax → ... (reference
    train.py:637-647)."""
    from matchmaker_tpu.training.checkpoints import rotate_best

    run = str(tmp_path)
    open(os.path.join(run, "best-model.flax"), "w").write("v1")
    rotate_best(run, 3)
    open(os.path.join(run, "best-model.flax"), "w").write("v2")
    rotate_best(run, 3)
    open(os.path.join(run, "best-model.flax"), "w").write("v3")
    assert open(os.path.join(run, "best-model.flax")).read() == "v3"
    assert open(os.path.join(run, "best-model-2.flax")).read() == "v2"
    assert open(os.path.join(run, "best-model-3.flax")).read() == "v1"


def test_param_labels_route_encoder_lr(eight_devices):
    """Encoder towers get group0 (encoder) labels; heads get group1."""
    import jax.numpy as jnp

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig
    from matchmaker_tpu.training.optim import label_params

    model = BertDot(encoder_cfg=EncoderConfig.tiny(), compress_dim=8, compute_dtype=jnp.float32)
    batch = {
        "query_ids": np.zeros((2, 4), np.int32), "query_mask": np.ones((2, 4), np.float32),
        "doc_ids": np.zeros((2, 8), np.int32), "doc_mask": np.ones((2, 8), np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    labels = label_params(params, {})
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    by_top = {}
    for path, label in flat:
        top = str(getattr(path[0], "key", path[0]))
        by_top.setdefault(top, set()).add(label)
    assert by_top["encoder"] == {"encoder"}
    assert by_top["compressor"] == {"head"}
