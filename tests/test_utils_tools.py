"""Utility-layer tests: rank fusion, replay cache, preprocessing, HF export."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_rrf_fusion(tmp_path):
    from matchmaker_tpu.utils.ensemble import fuse_runs

    a = tmp_path / "a.txt"
    a.write_text("q1 d1 1 5.0\nq1 d2 2 4.0\n")
    b = tmp_path / "b.txt"
    b.write_text("q1 d2 1 9.0\nq1 d3 2 1.0\n")
    fused = fuse_runs([str(a), str(b)], method="rrf")
    docs = [d for d, _ in fused["q1"]]
    assert docs[0] == "d2"  # appears in both runs


def test_avg_fusion(tmp_path):
    from matchmaker_tpu.utils.ensemble import fuse_runs

    a = tmp_path / "a.txt"
    a.write_text("q1 d1 1 10.0\nq1 d2 2 0.0\n")
    b = tmp_path / "b.txt"
    b.write_text("q1 d1 1 10.0\nq1 d2 2 0.0\n")
    fused = fuse_runs([str(a), str(b)], method="avg")
    assert fused["q1"][0][0] == "d1"
    assert fused["q1"][0][1] == pytest.approx(1.0)


def test_replay_cache_roundtrip(tmp_path):
    from matchmaker_tpu.utils.replay_cache import CrossExperimentReplayCache

    cache = CrossExperimentReplayCache(str(tmp_path / "cache"), write=True)
    tensors = [np.arange(6, dtype=np.float32).reshape(2, 3), np.ones((4,), np.float32)]
    for t in tensors:
        cache.cache(t)
    cache.finish()

    reader = CrossExperimentReplayCache(str(tmp_path / "cache"), write=False)
    np.testing.assert_array_equal(reader.get_next(), tensors[0])
    np.testing.assert_array_equal(reader.get_next(), tensors[1])
    assert reader.get_next() is None


def test_running_average():
    from matchmaker_tpu.utils.replay_cache import RunningAverage

    ra = RunningAverage(size=3)
    ra.add(1.0)
    ra.add(2.0)
    assert ra.mean() == pytest.approx(1.5)
    ra.add(3.0)
    ra.add(5.0)  # evicts 1.0
    assert ra.mean() == pytest.approx((2 + 3 + 5) / 3)


@pytest.fixture
def prep_files(tmp_path):
    (tmp_path / "queries.tsv").write_text("q1\talpha beta\nq2\tgamma delta\n")
    (tmp_path / "collection.tsv").write_text(
        "d1\talpha beta alpha\nd2\tgamma gamma\nd3\tnoise words here\nd4\tdelta gamma\n"
    )
    (tmp_path / "qrels.txt").write_text("q1 0 d1 1\nq2 0 d4 1\n")
    (tmp_path / "cands.txt").write_text(
        "q1 d1 1 9.0\nq1 d3 2 5.0\nq2 d4 1 8.0\nq2 d3 2 4.0\nq2 d2 3 3.0\n"
    )
    return tmp_path


def _run_prep(args):
    return subprocess.run(
        [sys.executable, "-m", "matchmaker_tpu.preprocessing"] + args,
        capture_output=True, text=True,
    )


def test_preprocessing_training_triples(prep_files):
    out = prep_files / "triples.tsv"
    r = _run_prep([
        "training-triples", "--candidates", str(prep_files / "cands.txt"),
        "--qrels", str(prep_files / "qrels.txt"), "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"), "--out", str(out),
        "--triples-per-query", "2",
    ])
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 4
    assert all(len(l.split("\t")) == 3 for l in lines)


def test_preprocessing_validation_tuples(prep_files):
    out = prep_files / "val.tsv"
    r = _run_prep([
        "validation-tuples", "--candidates", str(prep_files / "cands.txt"),
        "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"), "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("q1\td1\t")


def test_preprocessing_vocab_and_idf(prep_files):
    vocab_out = prep_files / "vocab.txt"
    r = _run_prep(["vocab", "--inputs", str(prep_files / "collection.tsv"), "--out", str(vocab_out), "--min-count", "1"])
    assert r.returncode == 0, r.stderr
    vocab = vocab_out.read_text().split()
    assert "alpha" in vocab and "gamma" in vocab

    idf_out = prep_files / "idf.txt"
    r = _run_prep(["idf", "--collection", str(prep_files / "collection.tsv"), "--out", str(idf_out)])
    assert r.returncode == 0, r.stderr
    idf = dict(l.split() for l in idf_out.read_text().strip().split("\n"))
    # gamma appears in 2 docs, alpha in 1 → idf(alpha) > idf(gamma)
    assert float(idf["alpha"]) > float(idf["gamma"])


def test_hf_export_roundtrip(tmp_path, rng):
    """Export my encoder → HF checkpoint → re-import → identical params."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM
    from matchmaker_tpu.models.hf_import import load_hf_encoder
    from matchmaker_tpu.utils.hf_export import export_to_huggingface

    cfg = EncoderConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=0,
    )
    model = TransformerEncoderLM(cfg, jnp.float32)
    ids = rng.integers(2, 100, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]

    out_dir = str(tmp_path / "export")
    export_to_huggingface({"encoder": params}, cfg, out_dir, model_type="distilbert")
    _, reimported = load_hf_encoder(out_dir)

    flax_out = model.apply({"params": params}, ids, mask)
    re_out = model.apply({"params": reimported}, ids, mask)
    np.testing.assert_allclose(np.asarray(flax_out), np.asarray(re_out), rtol=1e-5, atol=1e-5)


def test_preprocessing_smart_earlystopping(prep_files):
    (prep_files / "metric.tsv").write_text("q1\t0.9\nq2\t0.1\n")
    out = prep_files / "smart_val.tsv"
    r = _run_prep([
        "smart-earlystopping", "--candidates", str(prep_files / "cands.txt"),
        "--candidate-metric", str(prep_files / "metric.tsv"),
        "--qrels", str(prep_files / "qrels.txt"),
        "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"),
        "--out", str(out), "--n-queries", "10",
    ])
    assert r.returncode == 0, r.stderr
    lines = [l.split("\t") for l in out.read_text().strip().split("\n")]
    pairs = {(l[0], l[1]) for l in lines}
    # candidates included, and every judged positive force-included
    assert ("q1", "d1") in pairs and ("q2", "d4") in pairs
    assert all(len(l) == 4 for l in lines)
    assert len(pairs) == len(lines)  # deduped


def test_preprocessing_validation_from_n_candidates(prep_files):
    (prep_files / "cands2.txt").write_text("q1 Q0 d2 1 3.3 run2\nq1 Q0 d1 2 3.0 run2\n")
    out = prep_files / "merged_val.tsv"
    r = _run_prep([
        "validation-from-n-candidates",
        "--candidates", str(prep_files / "cands.txt"), str(prep_files / "cands2.txt"),
        "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"),
        "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    lines = [l.split("\t") for l in out.read_text().strip().split("\n")]
    pairs = [(l[0], l[1]) for l in lines]
    assert ("q1", "d2") in pairs  # from the second run
    assert len(set(pairs)) == len(pairs)  # (q1, d1) appears once despite both runs


def test_preprocessing_msmarco_qidpid(prep_files):
    (prep_files / "text_triples.tsv").write_text(
        "alpha beta\talpha beta alpha\tnoise words here\n"
        "gamma delta\tdelta gamma\tunknown text\n"
    )
    out = prep_files / "id_triples.tsv"
    r = _run_prep([
        "msmarco-qidpid", "--triples", str(prep_files / "text_triples.tsv"),
        "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"),
        "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().split("\n")
    assert lines == ["q1\td1\td3"]  # second triple's neg text unmatched → skipped


def test_preprocessing_msmarco_qa_qrels(tmp_path):
    import json

    data = [
        {"query_id": 7, "passages": [
            {"passage_text": "a", "is_selected": 0},
            {"passage_text": "b", "is_selected": 1},
        ]},
        {"query_id": 8, "passages": [{"passage_text": "c", "is_selected": 1, "passage_id": "p9"}]},
    ]
    inp = tmp_path / "dev.json"
    inp.write_text(json.dumps(data))
    out = tmp_path / "qrels.txt"
    r = _run_prep(["msmarco-qa-qrels", "--inp", str(inp), "--out", str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_text() == "7 0 1 1\n8 0 p9 1\n"


def test_preprocessing_validation_from_qrels_and_triples_from_ids(prep_files):
    out = prep_files / "qrel_val.tsv"
    r = _run_prep([
        "validation-from-qrels", "--qrels", str(prep_files / "qrels.txt"),
        "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"), "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    pairs = {tuple(l.split("\t")[:2]) for l in out.read_text().strip().split("\n")}
    assert pairs == {("q1", "d1"), ("q2", "d4")}

    (prep_files / "id_triples.tsv").write_text("q1\td1\td3\nq9\td1\td2\n")
    out2 = prep_files / "text_triples.tsv"
    r = _run_prep([
        "triples-from-ids", "--triples", str(prep_files / "id_triples.tsv"),
        "--queries", str(prep_files / "queries.tsv"),
        "--collection", str(prep_files / "collection.tsv"), "--out", str(out2),
    ])
    assert r.returncode == 0, r.stderr
    lines = out2.read_text().strip().split("\n")
    assert lines == ["alpha beta\talpha beta alpha\tnoise words here"]  # q9 unmatched


def test_preprocessing_find_missing_and_fix_unicode(prep_files, tmp_path):
    (prep_files / "train_ids.tsv").write_text("q1\td1\td3\n")
    out = prep_files / "missing.tsv"
    r = _run_prep([
        "find-missing-queries", "--queries", str(prep_files / "queries.tsv"),
        "--train-ids", str(prep_files / "train_ids.tsv"), "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    assert out.read_text() == "q2\tgamma delta\n"

    dirty = tmp_path / "dirty.tsv"
    dirty.write_bytes("d1\ttext with\x00controĺ chars\n".encode("utf-8"))
    clean = tmp_path / "clean.tsv"
    r = _run_prep(["fix-unicode", "--inp", str(dirty), "--out", str(clean)])
    assert r.returncode == 0, r.stderr
    assert "\x00" not in clean.read_text()
    assert clean.read_text().startswith("d1\ttext with")


def test_preprocessing_doc_to_mlm_passages(tmp_path):
    doc = " ".join(f"word{i}" for i in range(100)) + ". " + " ".join(f"tok{i}" for i in range(100)) + "."
    inp = tmp_path / "docs.tsv"
    inp.write_text(f"D1\t{doc}\n")
    out = tmp_path / "passages.tsv"
    r = _run_prep([
        "doc-to-mlm-passages", "--inp", str(inp), "--out", str(out),
        "--max-words", "120", "--min-words", "50",
    ])
    assert r.returncode == 0, r.stderr
    lines = [l.split("\t") for l in out.read_text().strip().split("\n")]
    assert len(lines) >= 2
    assert lines[0][0] == "D1_0"
    assert all(50 <= len(l[1].split()) <= 120 for l in lines)
