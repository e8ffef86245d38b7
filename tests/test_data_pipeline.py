"""Data pipeline tests: readers, tokenizers, fixed-shape batching."""

import numpy as np
import pytest

from matchmaker_tpu.data.batching import pad_to_batch
from matchmaker_tpu.data.readers import read_reranking_tuples, read_triples
from matchmaker_tpu.data.tokenization import Vocabulary, VocabTokenizer, OOV_ID, PAD_ID
from matchmaker_tpu.data.loaders import reranking_inference_loader, triple_training_loader


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_read_triples_formats(tmp_path):
    p3 = _write(tmp_path, "t3.tsv", "q one\tdoc pos\tdoc neg\n")
    s = next(read_triples(p3))
    assert (s.query, s.doc_pos, s.doc_neg) == ("q one", "doc pos", "doc neg")

    p5 = _write(tmp_path, "t5.tsv", "3.5\t-1.25\tq\tdp\tdn\n")
    s = next(read_triples(p5, with_scores=True))
    assert s.pos_score == 3.5 and s.neg_score == -1.25

    p7 = _write(tmp_path, "t7.tsv", "3.5\t1 2\t-1.0\t0.5 0.1\tq\tdp\tdn\n")
    s = next(read_triples(p7, with_scores=True))
    assert s.pos_passage_scores == [1.0, 2.0]

    bad = _write(tmp_path, "bad.tsv", "only\ttwo\n")
    with pytest.raises(ValueError):
        list(read_triples(bad))


def test_read_rerank_tuples(tmp_path):
    p = _write(tmp_path, "r.tsv", "q1\td9\tquery text\tdoc text\n")
    s = next(read_reranking_tuples(p))
    assert (s.query_id, s.doc_id) == ("q1", "d9")


def test_vocab_tokenizer_fixed_shape():
    vocab = Vocabulary(["hello", "world"])
    tok = VocabTokenizer(vocab)
    ids, mask = tok.encode("Hello world unknownword", max_length=6)
    assert ids.shape == (6,)
    assert ids[0] == vocab["hello"]
    assert ids[2] == OOV_ID
    assert ids[3] == PAD_ID
    assert mask.tolist() == [1, 1, 1, 0, 0, 0]


def test_pad_to_batch():
    batch = {"x": np.ones((3, 4), np.float32)}
    out = pad_to_batch(batch, 8)
    assert out["x"].shape == (8, 4)
    assert out["valid"].tolist() == [1, 1, 1, 0, 0, 0, 0, 0]


def _tiny_config(vocab_path):
    return {
        "model_input_type": "independent",
        "token_embedder_type": "embedding",
        "vocab_path": vocab_path,
        "max_query_length": 8,
        "max_doc_length": 16,
        "batch_size_train": 4,
        "batch_size_eval": 4,
    }


def test_triple_loader_shapes(tmp_path):
    vocab = _write(tmp_path, "vocab.txt", "alpha\nbeta\ngamma\n")
    triples = _write(
        tmp_path, "train.tsv", "".join(f"alpha beta\tgamma alpha\tbeta beta\n" for _ in range(6))
    )
    from matchmaker_tpu.data.tokenization import build_tokenizer

    config = _tiny_config(vocab)
    tok = build_tokenizer(config)
    batches = list(triple_training_loader(config, tok, triples))
    assert len(batches) == 2
    first = batches[0]
    assert first["query_ids"].shape == (4, 8)
    assert first["doc_pos_ids"].shape == (4, 16)
    assert first["valid"].sum() == 4
    # last batch padded to full size
    assert batches[1]["query_ids"].shape == (4, 8)
    assert batches[1]["valid"].sum() == 2


def test_rerank_loader_keeps_ids(tmp_path):
    vocab = _write(tmp_path, "vocab.txt", "alpha\nbeta\n")
    tuples = _write(
        tmp_path, "val.tsv", "".join(f"q{i}\td{i}\talpha\tbeta alpha\n" for i in range(5))
    )
    from matchmaker_tpu.data.tokenization import build_tokenizer

    config = _tiny_config(vocab)
    tok = build_tokenizer(config)
    batches = list(reranking_inference_loader(config, tok, tuples))
    assert len(batches) == 2
    batch, qids, dids = batches[0]
    assert qids == ["q0", "q1", "q2", "q3"]
    assert batch["doc_ids"].shape == (4, 16)
    _, qids2, _ = batches[1]
    assert qids2 == ["q4"]


def test_rerank_loader_length_buckets(tmp_path):
    """eval_length_buckets batches short docs at a smaller doc length."""
    vocab = _write(tmp_path, "vocab.txt", "alpha\nbeta\n")
    lines = []
    for i in range(4):
        lines.append(f"q{i}\tds{i}\talpha\tbeta alpha\n")  # short doc
    for i in range(4):
        long_doc = " ".join(["alpha"] * 14)
        lines.append(f"q{i}\tdl{i}\talpha\t{long_doc}\n")  # long doc
    tuples = _write(tmp_path, "val.tsv", "".join(lines))
    from matchmaker_tpu.data.tokenization import build_tokenizer

    config = _tiny_config(vocab)
    config["eval_length_buckets"] = [8]
    tok = build_tokenizer(config)
    batches = list(reranking_inference_loader(config, tok, tuples))
    shapes = sorted({b[0]["doc_ids"].shape[1] for b in batches})
    assert shapes == [8, 16]
    # every tuple accounted for exactly once
    seen = [d for _, _, dids in batches for d in dids]
    assert sorted(seen) == sorted([f"ds{i}" for i in range(4)] + [f"dl{i}" for i in range(4)])
