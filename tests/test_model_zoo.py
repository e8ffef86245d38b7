"""Model-zoo sweep: every registered model builds from config and scores a
fixed-shape batch with finite outputs; chunk models checked for padding logic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchmaker_tpu.config import Config, auto_fill
from matchmaker_tpu.models import example_batch, get_model


class _FakeVocabTok:
    vocab_size = 200
    pad_id = 0
    idf_lookup = None

    class vocab:
        token_to_id = {}


def _cfg(model, **kw):
    base = {
        "model": model,
        "model_input_type": "auto",
        "token_embedder_type": "auto",
        "_vocab_size": 200,
        "token_embedding_size": 32,
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "max_query_length": 8,
        "max_doc_length": 64,
        "tk_att_heads": 4,
        "tk_att_ff_dim": 32,
        "idcm_chunk_size": 16,
        "idcm_overlap": 4,
        "tkl_chunk_size": 16,
        "tkl_overlap": 4,
        "tkl_sliding_window_size": 8,
        "match_pyramid_conv_output_size": [8, 8],
        "match_pyramid_conv_kernel_size": [[3, 3], [3, 3]],
        "match_pyramid_adaptive_pooling_size": [[6, 20], [3, 10]],
    }
    base.update(kw)
    return Config(auto_fill(base))


ALL_MODELS = [
    "knrm", "tk", "tk_sparse", "tkl", "conv_knrm", "matchpyramid", "drmm",
    "pacrr", "co_pacrr", "duet",
    "bert_cat", "bert_dot", "bert_dot_dualencoder", "colbert",
    "parade", "prettr", "idcm",
    "maxP->bert_cat", "meanP->bert_cat", "maxP->bert_dot",
]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_builds_and_scores(name, rng):
    config = _cfg(name)
    model = get_model(config, _FakeVocabTok())
    batch = example_batch(config, batch_size=2)
    # make inputs non-trivial
    for k in batch:
        if k.endswith("_ids"):
            batch[k] = rng.integers(2, 150, size=batch[k].shape).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert out["score"].shape == (2,)
    assert np.isfinite(np.asarray(out["score"])).all(), name


def test_idcm_selection_training(rng):
    config = _cfg("idcm", idcm_train_selection=True, idcm_sample_n=2)
    model = get_model(config, _FakeVocabTok())
    batch = example_batch(config, batch_size=2)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert "selection_loss" in out
    assert np.isfinite(float(out["selection_loss"]))


def test_maxp_masks_empty_chunks(rng):
    config = _cfg("maxP->bert_dot")
    model = get_model(config, _FakeVocabTok())
    batch = example_batch(config, batch_size=2)
    # doc 0: only first 10 tokens real; doc 1: full
    batch["doc_ids"] = rng.integers(2, 150, size=batch["doc_ids"].shape).astype(np.int32)
    batch["doc_mask"] = np.ones_like(batch["doc_mask"])
    batch["doc_ids"][0, 10:] = 0
    batch["doc_mask"][0, 10:] = 0
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch, True)
    non_empty = np.asarray(out["secondary"]["packed_indices"])
    assert non_empty[0].sum() < non_empty[1].sum()


def test_tk_sparse_returns_sparsity(rng):
    config = _cfg("tk_sparse")
    model = get_model(config, _FakeVocabTok())
    batch = example_batch(config, batch_size=2)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert out["sparsity"].shape == (2, 64)
    assert (np.asarray(out["sparsity"]) >= 0).all()


def test_idcm_bert_part_cached(rng):
    """Cached BERT chunk scores replace the expensive forward path exactly."""
    config = _cfg("idcm", idcm_sample_n=-1)
    model = get_model(config, _FakeVocabTok())
    batch = example_batch(config, batch_size=2)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    full_scores = np.asarray(out["passage_scores"])

    cached_batch = dict(batch)
    cached_batch["bert_part_cached"] = jnp.asarray(full_scores)
    out2 = model.apply({"params": params}, cached_batch)
    np.testing.assert_allclose(np.asarray(out2["score"]), np.asarray(out["score"]), rtol=1e-5)


def test_forward_triple_matches_two_apply_path(rng):
    """The packed triple fast path (one query pass + one 2B-row doc encode,
    train_step.py dispatch) must be numerically identical to the generic
    two-apply path for every model that implements it."""
    from matchmaker_tpu.models.bert_dot import BertDot, BertDotDualEncoder
    from matchmaker_tpu.models.colbert import ColBert
    from matchmaker_tpu.models.encoder import EncoderConfig
    from matchmaker_tpu.training.train_step import split_triple_batch

    b, mq, md = 4, 6, 10
    batch = {
        "query_ids": rng.integers(1, 999, (b, mq)).astype(np.int32),
        "query_mask": (rng.random((b, mq)) > 0.2).astype(np.float32),
        "doc_pos_ids": rng.integers(1, 999, (b, md)).astype(np.int32),
        "doc_pos_mask": (rng.random((b, md)) > 0.2).astype(np.float32),
        "doc_neg_ids": rng.integers(1, 999, (b, md)).astype(np.int32),
        "doc_neg_mask": (rng.random((b, md)) > 0.2).astype(np.float32),
    }
    cases = [
        (BertDot, {}),
        (BertDotDualEncoder, {}),
        (ColBert, dict(compression_dim=32, return_per_term=True)),
    ]
    for cls, kw in cases:
        m = cls(encoder_cfg=EncoderConfig.tiny(), return_vecs=True,
                compute_dtype=jnp.float32, **kw)
        pos_b, neg_b = split_triple_batch(batch)
        params = m.init(jax.random.PRNGKey(0), pos_b)["params"]
        pos_ref = m.apply({"params": params}, pos_b)
        neg_ref = m.apply({"params": params}, neg_b)
        pos_new, neg_new = m.apply({"params": params}, batch, method="forward_triple")
        assert set(pos_new) == set(pos_ref) and set(neg_new) == set(neg_ref)
        for k in pos_ref:
            np.testing.assert_allclose(
                pos_ref[k], pos_new[k], rtol=1e-5, atol=1e-5,
                err_msg=f"{cls.__name__} pos {k}")
        for k in neg_ref:
            np.testing.assert_allclose(
                neg_ref[k], neg_new[k], rtol=1e-5, atol=1e-5,
                err_msg=f"{cls.__name__} neg {k}")
