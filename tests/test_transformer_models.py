"""Transformer family tests: encoder parity vs HF torch, model forwards,
in-batch-negative training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM


def _rand_inputs(rng, b=2, l=10, vocab=120):
    ids = rng.integers(5, vocab, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.float32)
    mask[0, l - 3 :] = 0
    ids[0, l - 3 :] = 0
    return ids, mask


# ---------------------------------------------------------------------------
# parity: my Flax encoder loaded with HF torch weights == torch model output
# ---------------------------------------------------------------------------


def _parity_case(tmp_path, rng, family: str):
    torch = pytest.importorskip("torch")
    import transformers

    if family == "distilbert":
        hf_cfg = transformers.DistilBertConfig(
            vocab_size=120, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
            max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
        )
        hf_model = transformers.DistilBertModel(hf_cfg)
    else:
        hf_cfg = transformers.BertConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        hf_model = transformers.BertModel(hf_cfg)
    hf_model.eval()
    ckpt = tmp_path / family
    hf_model.save_pretrained(str(ckpt))

    from matchmaker_tpu.models.hf_import import load_hf_encoder

    cfg, params = load_hf_encoder(str(ckpt))
    flax_model = TransformerEncoderLM(cfg, compute_dtype=jnp.float32)

    ids, mask = _rand_inputs(rng)
    with torch.no_grad():
        torch_out = hf_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    flax_out = np.asarray(flax_model.apply({"params": params}, ids, mask))
    # only compare non-padded positions (HF computes garbage under padding too,
    # but identical masks mean identical values there as well)
    np.testing.assert_allclose(flax_out, torch_out, rtol=2e-4, atol=2e-4)


def test_distilbert_parity(tmp_path, rng):
    _parity_case(tmp_path, rng, "distilbert")


def test_bert_parity(tmp_path, rng):
    _parity_case(tmp_path, rng, "bert")


# ---------------------------------------------------------------------------
# ranker forwards
# ---------------------------------------------------------------------------


def _tiny_cfg():
    return {
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "model_input_type": "independent",
    }


def _indep_batch(rng, b=3, lq=8, ld=12):
    ids_q, mask_q = _rand_inputs(rng, b, lq, 900)
    ids_d, mask_d = _rand_inputs(rng, b, ld, 900)
    return {
        "query_ids": ids_q, "query_mask": mask_q,
        "doc_ids": ids_d, "doc_mask": mask_d,
    }


def test_bert_cat_forward(rng):
    from matchmaker_tpu.models.bert_cat import BertCat

    model = BertCat(encoder_cfg=EncoderConfig.tiny(), compute_dtype=jnp.float32)
    batch = {
        "seq_ids": rng.integers(5, 900, size=(3, 16)).astype(np.int32),
        "seq_mask": np.ones((3, 16), np.float32),
        "seq_type_ids": np.zeros((3, 16), np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert out["score"].shape == (3,)


def test_bert_dot_returns_vecs(rng):
    from matchmaker_tpu.models.bert_dot import BertDot

    model = BertDot(encoder_cfg=EncoderConfig.tiny(), compress_dim=16, return_vecs=True, compute_dtype=jnp.float32)
    batch = _indep_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert out["score"].shape == (3,)
    assert out["query_vecs"].shape == (3, 16)
    # score must equal the dot product of the returned vectors
    np.testing.assert_allclose(
        out["score"], np.einsum("bd,bd->b", out["query_vecs"], out["doc_vecs"]), rtol=1e-4
    )


def test_colbert_maxsim_consistency(rng):
    """Vectorized MaxSim == naive per-pair loop."""
    from matchmaker_tpu.models.colbert import ColBert

    model = ColBert(encoder_cfg=EncoderConfig.tiny(), compression_dim=16, return_vecs=True, compute_dtype=jnp.float32)
    batch = _indep_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)

    q, d = np.asarray(out["query_vecs"]), np.asarray(out["doc_vecs"])
    naive = []
    for i in range(q.shape[0]):
        per_term = q[i] @ d[i].T
        per_term[:, batch["doc_mask"][i] == 0] = -1000.0
        best = per_term.max(axis=-1) * batch["query_mask"][i]
        naive.append(best.sum())
    np.testing.assert_allclose(out["score"], naive, rtol=1e-4)

    # all-pairs diagonal == pairwise scores
    from matchmaker_tpu.ops.maxsim import maxsim_all_pairs

    allp = maxsim_all_pairs(
        jnp.asarray(q), jnp.asarray(d), jnp.asarray(batch["query_mask"]), jnp.asarray(batch["doc_mask"])
    )
    np.testing.assert_allclose(np.diagonal(allp), out["score"], rtol=1e-4)


def test_bert_dot_inbatch_training_step(rng, eight_devices):
    """Full train step with in-batch negatives over the 8-device mesh."""
    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    config = {
        "loss": "margin-mse",
        "in_batch_negatives": True,
        "in_batch_neg_loss": "margin-mse",
        "max_training_steps": 10,
        "optimizer_warmup_steps": 0,
    }
    model = BertDot(encoder_cfg=EncoderConfig.tiny(), return_vecs=True, compute_dtype=jnp.float32)
    b = 16
    batch = {
        "query_ids": rng.integers(5, 900, size=(b, 8)).astype(np.int32),
        "query_mask": np.ones((b, 8), np.float32),
        "doc_pos_ids": rng.integers(5, 900, size=(b, 12)).astype(np.int32),
        "doc_pos_mask": np.ones((b, 12), np.float32),
        "doc_neg_ids": rng.integers(5, 900, size=(b, 12)).astype(np.int32),
        "doc_neg_mask": np.ones((b, 12), np.float32),
        "pos_score": rng.normal(size=b).astype(np.float32),
        "neg_score": rng.normal(size=b).astype(np.float32),
        "valid": np.ones(b, np.float32),
    }
    mesh = make_mesh()
    pos_like = {
        "query_ids": batch["query_ids"], "query_mask": batch["query_mask"],
        "doc_ids": batch["doc_pos_ids"], "doc_mask": batch["doc_pos_mask"],
    }
    params = shard_params(model.init(jax.random.PRNGKey(0), pos_like)["params"], mesh)
    tx = build_optimizer(config, params)
    opt_state = tx.init(params)
    sharding = batch_sharding(mesh)
    device_batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    step = make_train_step(model, get_loss(config), tx, config)
    new_params, _, stats = step(params, opt_state, device_batch)
    assert np.isfinite(float(np.asarray(stats["loss"])))
    assert "inbatch_loss" in stats

def test_score_normalization_flags(rng):
    """colbert_normalize / bert_dot_normalize: unit-norm scoring vectors
    (cosine scoring — the original ColBERT formulation; the reference ships
    it commented out, colbert.py:62-63), identical param trees to the
    unnormalized models, score still the dot of the returned vectors."""
    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.colbert import ColBert

    batch = _indep_batch(rng)

    model = BertDot(encoder_cfg=EncoderConfig.tiny(), return_vecs=True,
                    compute_dtype=jnp.float32, normalize=True)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    np.testing.assert_allclose(np.linalg.norm(out["query_vecs"], axis=-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(out["doc_vecs"], axis=-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        out["score"], np.einsum("bd,bd->b", out["query_vecs"], out["doc_vecs"]), rtol=1e-4
    )
    # same param tree as the unnormalized model (checkpoint compatible)
    base = BertDot(encoder_cfg=EncoderConfig.tiny(), return_vecs=True, compute_dtype=jnp.float32)
    base_params = base.init(jax.random.PRNGKey(0), batch)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(base_params)

    cb = ColBert(encoder_cfg=EncoderConfig.tiny(), compression_dim=16,
                 return_vecs=True, compute_dtype=jnp.float32, normalize=True)
    cparams = cb.init(jax.random.PRNGKey(1), batch)["params"]
    cout = cb.apply({"params": cparams}, batch)
    norms = np.linalg.norm(np.asarray(cout["query_vecs"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # per-token cosine in [-1, 1] -> |MaxSim| bounded by live query tokens
    assert (np.abs(np.asarray(cout["score"])) <= batch["query_mask"].sum(1) + 1e-4).all()
    # packed-triple forward agrees with two-apply under normalization
    pos_out, neg_out = cb.apply({"params": cparams}, {
        "query_ids": batch["query_ids"], "query_mask": batch["query_mask"],
        "doc_pos_ids": batch["doc_ids"], "doc_pos_mask": batch["doc_mask"],
        "doc_neg_ids": batch["doc_ids"], "doc_neg_mask": batch["doc_mask"],
    }, method="forward_triple")
    np.testing.assert_allclose(pos_out["score"], cout["score"], rtol=1e-4)
    np.testing.assert_allclose(neg_out["score"], cout["score"], rtol=1e-4)
