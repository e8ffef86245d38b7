"""Native C++ text pipeline: build, parity with the Python tokenizer, reader."""

import numpy as np
import pytest

from matchmaker_tpu.data.native import build_native, native_available


pytestmark = pytest.mark.skipif(not build_native(), reason="native toolchain unavailable")


def test_native_vocab_tokenizer_parity(tmp_path):
    from matchmaker_tpu.data.native import NativeVocabTokenizer
    from matchmaker_tpu.data.tokenization import Vocabulary, VocabTokenizer

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("hello\nworld\ntest\n,\n")

    py_tok = VocabTokenizer(Vocabulary.from_file(str(vocab_file)))
    c_tok = NativeVocabTokenizer(str(vocab_file))
    assert c_tok.vocab_size == py_tok.vocab_size

    texts = ["Hello world, TEST unknownword", "world hello", ""]
    for text in texts:
        py_ids, py_mask = py_tok.encode(text, 8)
        c_ids, c_mask = c_tok.encode(text, 8)
        np.testing.assert_array_equal(py_ids, c_ids, err_msg=text)
        np.testing.assert_array_equal(py_mask, c_mask, err_msg=text)


def test_native_mask_oov(tmp_path):
    from matchmaker_tpu.data.native import NativeVocabTokenizer

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("known\n")
    tok = NativeVocabTokenizer(str(vocab_file), mask_oov=True)
    ids, mask = tok.encode("known unknown", 4)
    assert ids[0] == 2 and ids[1] == 1  # OOV
    assert mask.tolist() == [1.0, 0.0, 0.0, 0.0]


def test_native_triple_reader(tmp_path):
    from matchmaker_tpu.data.native import NativeTripleReader

    f = tmp_path / "triples.tsv"
    f.write_text("q one\tpos one\tneg one\nq two\tpos two\tneg two\nq three\tpos three\tneg three\n")
    reader = NativeTripleReader(str(f))
    batch = reader.next_batch(2)
    assert batch == (["q one", "q two"], ["pos one", "pos two"], ["neg one", "neg two"])
    batch = reader.next_batch(2)
    assert batch == (["q three"], ["pos three"], ["neg three"])
    assert reader.next_batch(2) is None


def test_native_batch_tokenize_speed_smoke(tmp_path):
    """Native batch call handles a few thousand docs without issue."""
    from matchmaker_tpu.data.native import NativeVocabTokenizer

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(f"word{i}" for i in range(1000)))
    tok = NativeVocabTokenizer(str(vocab_file))
    texts = [f"word{i % 1000} word{(i * 7) % 1000} filler" for i in range(5000)]
    ids, mask = tok.encode_batch(texts, 16)
    assert ids.shape == (5000, 16)
    assert (mask.sum(axis=1) >= 3).all()
