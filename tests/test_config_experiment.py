"""Config merge/overwrite/auto-fill + experiment utilities tests."""

import math
import os

import pytest

from matchmaker_tpu.config import Config, get_config, parse_overwrites
from matchmaker_tpu.experiment import (
    EarlyStopping,
    parse_candidate_set,
    prepare_experiment,
    read_best_info,
    save_best_info,
)


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_yaml_merge_later_wins(tmp_path):
    a = _write(tmp_path, "a.yaml", "lr: 1e-4\nmodel: knrm\nnested: {x: 1, y: 2}\n")
    b = _write(tmp_path, "b.yaml", "lr: 7e-5\nnested: {y: 3}\n")
    cfg = get_config([a, b])
    assert cfg["lr"] == 7e-5
    assert cfg["nested"] == {"x": 1, "y": 3}


def test_overwrites_string(tmp_path):
    a = _write(tmp_path, "a.yaml", "model: bert_cat\nbatch_size: 32\n")
    cfg = get_config([a], "batch_size: 8,validate_every_n_batches: 40")
    assert cfg["batch_size"] == 8
    assert cfg["validate_every_n_batches"] == 40


def test_dotted_overwrites():
    out = parse_overwrites("opt.lr: 0.1,opt.wd: 0.01")
    assert out == {"opt": {"lr": 0.1, "wd": 0.01}}


def test_auto_fill(tmp_path):
    for model, input_type, embedder in [
        ("bert_cat", "concatenated", "huggingface_bpe"),
        ("bert_dot", "independent", "huggingface_bpe"),
        ("colbert", "independent", "huggingface_bpe"),
        ("knrm", "independent", "embedding"),
        ("tk", "independent", "embedding"),
        ("maxP->bert_cat", "independent", "huggingface_bpe"),
    ]:
        a = _write(tmp_path, "m.yaml", f"model: {model}\n")
        cfg = get_config([a])
        assert cfg["model_input_type"] == input_type, model
        assert cfg["token_embedder_type"] == embedder, model


def test_config_attribute_access():
    cfg = Config({"a": {"b": 5}})
    assert cfg.a.b == 5
    assert cfg.get_path("a.b") == 5
    assert cfg.get_path("a.missing", "dflt") == "dflt"


def test_early_stopping_max_mode():
    es = EarlyStopping(patience=2, mode="max")
    assert not es.step(0.5)
    assert not es.step(0.6)
    assert not es.step(0.55)  # bad 1
    assert not es.step(0.55)  # bad 2
    assert es.step(0.55)  # bad 3 > patience → stop
    assert es.best == 0.6


def test_early_stopping_nan_stops():
    es = EarlyStopping(patience=10)
    assert es.step(math.nan)
    assert es.stopped


def test_prepare_experiment_and_best_info(tmp_path):
    folder = prepare_experiment(str(tmp_path), "unit", {"model": "knrm"})
    assert os.path.exists(os.path.join(folder, "config.yaml"))
    assert os.path.exists(os.path.join(folder, "source-snapshot.zip"))
    save_best_info(folder, "MRR@10", 0.31, epoch=2, batch_number=4000)
    name, value, epoch, batch = read_best_info(folder)
    assert (name, value, epoch, batch) == ("MRR@10", 0.31, 2, 4000)


def test_parse_candidate_set(tmp_path):
    p = tmp_path / "cands.txt"
    p.write_text("q1 d1 1 9.9\nq1 d2 2 9.1\nq1 d3 3 8.0\n")
    cs = parse_candidate_set(str(p), depth=2)
    assert cs == {"q1": {"d1": 1, "d2": 2}}


def test_hub_config_stub_resolution():
    """HF-hub model names resolve to local config stubs
    (reference utils/config.py:30-36 + config/huggingface_modelhub/)."""
    from matchmaker_tpu.config import get_config_single, resolve_hub_config

    assert resolve_hub_config("sebastian-hofstaetter/distilbert-dot-tas_b-b256-msmarco")
    cfg = get_config_single("sebastian-hofstaetter/distilbert-dot-tas_b-b256-msmarco")
    assert cfg["model"] == "bert_dot"
    assert cfg["bert_pretrained_model"].startswith("sebastian-hofstaetter/")
    assert resolve_hub_config("unknown-org/not-a-model") is None

    import pytest

    with pytest.raises(FileNotFoundError):
        get_config_single("unknown-org/not-a-model")
