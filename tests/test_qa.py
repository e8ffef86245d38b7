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
