"""KNRM / TK model tests: shapes, masking invariance, determinism, lexical signal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchmaker_tpu.models.knrm import KNRM
from matchmaker_tpu.models.tk import TK


def _batch(rng, b=3, lq=6, ld=12, vocab=50):
    q_len = rng.integers(2, lq, size=b)
    d_len = rng.integers(4, ld, size=b)
    batch = {
        "query_ids": np.zeros((b, lq), np.int32),
        "query_mask": np.zeros((b, lq), np.float32),
        "doc_ids": np.zeros((b, ld), np.int32),
        "doc_mask": np.zeros((b, ld), np.float32),
    }
    for i in range(b):
        batch["query_ids"][i, : q_len[i]] = rng.integers(2, vocab, size=q_len[i])
        batch["query_mask"][i, : q_len[i]] = 1
        batch["doc_ids"][i, : d_len[i]] = rng.integers(2, vocab, size=d_len[i])
        batch["doc_mask"][i, : d_len[i]] = 1
    return batch


@pytest.mark.parametrize("model_cls,kwargs", [
    (KNRM, dict(vocab_size=50, dim=24, n_kernels=7)),
    (TK, dict(vocab_size=50, dim=24, att_heads=4, att_layers=1, att_ff_dim=32, max_length=12)),
])
def test_forward_shapes_and_determinism(model_cls, kwargs, rng):
    model = model_cls(**kwargs)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out1 = model.apply({"params": params}, batch)
    out2 = model.apply({"params": params}, batch)
    assert out1["score"].shape == (3,)
    np.testing.assert_allclose(out1["score"], out2["score"])


@pytest.mark.parametrize("model_cls,kwargs", [
    (KNRM, dict(vocab_size=50, dim=24, n_kernels=7)),
    (TK, dict(vocab_size=50, dim=24, att_heads=4, att_layers=1, att_ff_dim=32, max_length=24)),
])
def test_padding_invariance(model_cls, kwargs, rng):
    """Scores must not change when extra padding columns are appended."""
    model = model_cls(**kwargs)
    batch = _batch(rng, ld=12)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    base = model.apply({"params": params}, batch)["score"]

    wide = dict(batch)
    wide["doc_ids"] = np.pad(batch["doc_ids"], ((0, 0), (0, 8)))
    wide["doc_mask"] = np.pad(batch["doc_mask"], ((0, 0), (0, 8)))
    wide_score = model.apply({"params": params}, wide)["score"]
    np.testing.assert_allclose(base, wide_score, rtol=2e-5, atol=2e-5)


def test_knrm_prefers_lexical_overlap(rng):
    """Exact-match kernel: overlapping q/d tokens must yield different features
    than disjoint ones even at init."""
    model = KNRM(vocab_size=50, dim=24, n_kernels=7)
    b = {
        "query_ids": np.array([[5, 6, 0, 0]], np.int32),
        "query_mask": np.array([[1, 1, 0, 0]], np.float32),
        "doc_ids": np.array([[5, 6, 5, 6]], np.int32),
        "doc_mask": np.ones((1, 4), np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), b)["params"]
    overlap = model.apply({"params": params}, b, output_secondary=True)
    b_disjoint = dict(b)
    b_disjoint["doc_ids"] = np.array([[11, 12, 13, 14]], np.int32)
    disjoint = model.apply({"params": params}, b_disjoint, output_secondary=True)
    # exact-match kernel (index 0) must fire for the overlap pair only
    assert float(overlap["secondary"]["per_kernel"][0, 0]) > float(
        disjoint["secondary"]["per_kernel"][0, 0]
    )


def test_tk_secondary_output(rng):
    model = TK(vocab_size=50, dim=24, att_heads=4, att_layers=1, att_ff_dim=32, max_length=12)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch, True)
    assert "cosine_matrix" in out["secondary"]
    assert out["secondary"]["cosine_matrix"].shape == (3, 6, 12)


def test_tk_with_bert_vectors_trains(tmp_path, eight_devices):
    """token_embedder_type bert_vectors: frozen transformer supplies contextual
    embeddings to TK (reference models/all.py:70-77); TK's head trains while
    the frozen encoder stays fixed."""
    import optax

    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models import get_model, init_params
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    config = Config(auto_fill({
        "model": "tk",
        "model_input_type": "independent",
        "token_embedder_type": "bert_vectors",
        "bert_pretrained_model": "tiny-test",
        "train_embedding": False,
        "use_fp16": False,
        "loss": "ranknet",
        "max_query_length": 6,
        "max_doc_length": 12,
        "batch_size_train": 4,
        "max_training_steps": 10,
        "optimizer_warmup_steps": 0,
        "lr_schedule": "constant",
        "learning_rate": 0.01,
        "param_group1_learning_rate": 0.01,
    }))
    tokenizer = build_tokenizer(config)
    model = get_model(config, tokenizer)
    params = init_params(model, config, jax.random.PRNGKey(0))
    assert "encoder" in params  # the transformer subtree
    # no token embedding table: external embeddings replace it
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    assert not any("token_embedding" in "/".join(str(getattr(p, "key", p)) for p in path)
                   for path, _ in leaves)

    rng = np.random.default_rng(0)
    batch = {
        "query_ids": rng.integers(5, 900, (4, 6)).astype(np.int32),
        "query_mask": np.ones((4, 6), np.float32),
        "doc_pos_ids": rng.integers(5, 900, (4, 12)).astype(np.int32),
        "doc_pos_mask": np.ones((4, 12), np.float32),
        "doc_neg_ids": rng.integers(5, 900, (4, 12)).astype(np.int32),
        "doc_neg_mask": np.ones((4, 12), np.float32),
    }
    # make pos docs overlap the query (plant signal)
    batch["doc_pos_ids"][:, :6] = batch["query_ids"]

    tx = build_optimizer(config, params)
    step = make_train_step(model, get_loss(config), tx, config)
    opt_state = tx.init(params)
    encoder_before = jax.tree_util.tree_leaves(params["encoder"])[0].copy()
    losses = []
    p = params
    for _ in range(8):
        p, opt_state, stats = step(p, opt_state, batch)
        losses.append(float(np.asarray(stats["loss"])))
    assert losses[-1] < losses[0], losses
    # frozen encoder: stop_gradient keeps the transformer fixed
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(p["encoder"])[0]), np.asarray(encoder_before)
    )
