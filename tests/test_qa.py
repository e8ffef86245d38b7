"""QA multi-task path: span labels, QA head, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchmaker_tpu.data.tokenization import HashBertTokenizer, char_spans_to_token_labels


def test_char_spans_to_token_labels():
    # doc "alpha beta gamma": tokens at chars (0,5) (6,10) (11,16)
    offsets = [None, (0, 5), (6, 10), (11, 16), None]
    starts, ends, has = char_spans_to_token_labels("6,16", offsets, position_offset=10)
    assert has == 1
    assert starts[0] == 10 + 2  # "beta"
    assert ends[0] == 10 + 3  # "gamma"
    assert starts[1] == -1

    starts, ends, has = char_spans_to_token_labels("", offsets, position_offset=0)
    assert has == 0
    assert (starts == -1).all()


def test_encode_with_offsets_hash_tokenizer():
    tok = HashBertTokenizer(30522)
    ids, mask, offsets = tok.encode_with_offsets("alpha beta", 6)
    assert offsets[0] is None  # CLS
    assert offsets[1] == (0, 5)
    assert offsets[2] == (6, 10)


def test_qa_training_loader_and_step(tmp_path, eight_devices):
    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.data.loaders import triple_training_loader
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models import example_batch, get_model
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    triples = tmp_path / "qa_triples.tsv"
    triples.write_text(
        "0,10\twhat is alpha\talpha thing is here described\tnothing relevant words\n"
        "\twhat is beta\tbeta text body\tother words entirely\n"
    )
    config = Config(auto_fill({
        "model": "bert_cat",
        "model_input_type": "auto",
        "token_embedder_type": "auto",
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "train_qa_spans": True,
        "qa_loss": "StartEndCrossEntropy",
        "loss": "ranknet",
        "max_query_length": 8,
        "max_doc_length": 16,
        "batch_size_train": 2,
        "max_training_steps": 10,
        "optimizer_warmup_steps": 0,
    }))
    tokenizer = build_tokenizer(config)
    batches = list(triple_training_loader(config, tokenizer, str(triples)))
    assert len(batches) == 1
    batch = batches[0]
    assert batch["qa_start"].shape == (2, 4)
    assert batch["qa_has_answer"].tolist() == [1, 0]
    assert batch["pos_ids"].shape == (2, 24)
    # first sample's span points into the doc segment
    assert batch["qa_start"][0, 0] >= 8

    model = get_model(config, tokenizer)
    params = model.init(jax.random.PRNGKey(0), {
        "seq_ids": batch["pos_ids"], "seq_mask": batch["pos_mask"], "seq_type_ids": batch["pos_type_ids"],
    })["params"]
    tx = build_optimizer(config, params)
    opt_state = tx.init(params)
    step = make_train_step(model, get_loss(config), tx, config)
    _, _, stats = step(params, opt_state, batch)
    assert "qa_span_loss" in stats
    assert "qa_answerability_loss" in stats
    assert np.isfinite(float(np.asarray(stats["loss"])))

    # --- uncertainty-weighted multi-loss merge (reference train.py:481 intent,
    # losses/all.py:13-21): learned log-vars must receive gradients -------
    params_mtl = dict(params)
    params_mtl["mtl_log_vars"] = jnp.zeros(3, jnp.float32)
    tx2 = build_optimizer(config, params_mtl)
    step2 = make_train_step(model, get_loss(config), tx2, config)
    new_params, opt2, stats2 = step2(params_mtl, tx2.init(params_mtl), batch)
    new_params, _, stats2 = step2(new_params, opt2, batch)  # step 0 has lr=0 (warmup)
    assert "qa_weighted_ranking_loss" in stats2
    assert "qa_weighted_qa_loss" in stats2
    assert "qa_answerability_loss_neg" in stats2
    # log-vars moved: the merge is part of the differentiated graph
    assert float(np.abs(np.asarray(new_params["mtl_log_vars"])).sum()) > 0.0
    assert np.isfinite(float(np.asarray(stats2["loss"])))


def test_trainer_adds_mtl_log_vars_for_qa(tmp_path, eight_devices):
    """train_qa_spans + qa_uncertainty_weighting (default) → params carry the
    learned log-variance vector."""
    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.training.trainer import Trainer

    triples = tmp_path / "qa_triples.tsv"
    triples.write_text(
        "0,10\twhat is alpha\talpha thing is here described\tnothing relevant words\n"
    )
    config = Config(auto_fill({
        "model": "bert_cat",
        "model_input_type": "auto",
        "token_embedder_type": "auto",
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "train_qa_spans": True,
        "qa_loss": "StartEndCrossEntropy",
        "loss": "ranknet",
        "max_query_length": 8,
        "max_doc_length": 16,
        "batch_size_train": 2,
        "max_training_steps": 4,
        "optimizer_warmup_steps": 0,
        "epochs": 1,
        "validate_every_n_batches": -1,
        "train_tsv": str(triples),
    }))
    trainer = Trainer(config, str(tmp_path))
    assert "mtl_log_vars" in trainer.params
    assert trainer.params["mtl_log_vars"].shape == (3,)


def test_qa_evaluate_extracts_top_ranked_answer(tmp_path):
    """qa_evaluate walks the ranking, takes the first answerable doc's span,
    and scores EM/F1 (reference eval.py:343-372)."""
    from matchmaker_tpu.data.tokenization import HashBertTokenizer
    from matchmaker_tpu.evaluation import qa_evaluate

    tuples = tmp_path / "tuples.tsv"
    tuples.write_text(
        "q1\td1\twhat is alpha\talpha is the answer here\n"
        "q1\td2\twhat is alpha\tbeta gamma delta words\n"
    )
    tok = HashBertTokenizer(30522)
    config = {"max_query_length": 8, "max_doc_length": 16}

    def fake_eval_step(params, batch, output_secondary=False):
        # point the span at doc tokens 2..3 ("the answer" in d1's text);
        # mark d2 (second call) unanswerable via a call counter
        fake_eval_step.calls += 1
        L = batch["seq_ids"].shape[1]
        start = np.full((1, L), -1e4, np.float32)
        end = np.full((1, L), -1e4, np.float32)
        start[0, 8 + 3] = 10.0  # CLS + 2 tokens in → "the"
        end[0, 8 + 4] = 10.0  # "answer"
        answerable = np.array([[0.0, 5.0]] if fake_eval_step.calls == 1 else [[5.0, 0.0]], np.float32)
        return {
            "score": np.zeros(1, np.float32),
            "qa_logits_start": start,
            "qa_logits_end": end,
            "answerability_logits": answerable,
        }

    fake_eval_step.calls = 0
    ranked = {"q1": ["d1", "d2"]}
    stats, predictions = qa_evaluate(
        fake_eval_step, None, config, tok, str(tuples),
        {"q1": ["the answer"]}, ranked,
    )
    assert predictions["q1"] == "the answer"
    assert stats["QA_EM"] == 1.0
    assert stats["QA_F1"] == 1.0
    assert fake_eval_step.calls == 1  # stopped at the first answerable doc


def test_validate_model_runs_qa_answer_eval(tmp_path, eight_devices):
    """validation with qa_answers configured adds QA metrics and writes
    last-qa-output.tsv (VERDICT missing #2)."""
    import jax

    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.evaluation import validate_model
    from matchmaker_tpu.models import get_model
    from matchmaker_tpu.training.train_step import make_eval_step

    tuples = tmp_path / "tuples.tsv"
    tuples.write_text(
        "q1\td1\twhat is alpha\talpha is the answer here\n"
        "q1\td2\twhat is alpha\tbeta gamma delta words\n"
    )
    qrels = tmp_path / "qrels.txt"
    qrels.write_text("q1 0 d1 1\n")
    answers = tmp_path / "answers.tsv"
    answers.write_text("q1\tthe answer\n")

    config = Config(auto_fill({
        "model": "bert_cat",
        "model_input_type": "auto",
        "token_embedder_type": "auto",
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "train_qa_spans": True,
        "qa_loss": "StartEndCrossEntropy",
        "loss": "ranknet",
        "max_query_length": 8,
        "max_doc_length": 16,
        "batch_size_eval": 4,
    }))
    tokenizer = build_tokenizer(config)
    model = get_model(config, tokenizer)
    from matchmaker_tpu.models import example_batch

    params = model.init(jax.random.PRNGKey(0), example_batch(config))["params"]
    eval_step = make_eval_step(model)
    metrics, _, _ = validate_model(
        "cont", eval_step, params, config, tokenizer, str(tmp_path),
        {"tsv": str(tuples), "qrels": str(qrels), "qa_answers": str(answers)},
        use_cache=False,
    )
    assert "QA/ExactMatch_TopRanked" in metrics
    assert "QA/F1_TopRanked" in metrics
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "last-qa-output.tsv"))
