"""MLM masking: whole-word spans, BERT recipe, frequency-biased sampling
(reference dataloaders/mlm_masked_sequence_loader.py:35,143-185)."""

import random
from collections import Counter

import numpy as np

from matchmaker_tpu.data.mlm import (
    IGNORE_LABEL,
    mask_tokens,
    mask_whole_words,
    mlm_training_loader,
    word_groups_from_offsets,
)


def test_word_groups_from_offsets():
    # [CLS] alp ##ha ##bet beta [SEP] pad
    offsets = [None, (0, 3), (3, 5), (5, 8), (9, 13), None, None]
    groups = word_groups_from_offsets(offsets)
    assert groups == [[1, 2, 3], [4]]


def test_mask_whole_words_masks_full_word_spans():
    ids = np.array([101, 5, 6, 7, 8, 102, 0, 0], dtype=np.int32)
    mask = np.array([1, 1, 1, 1, 1, 1, 0, 0], dtype=np.float32)
    offsets = [None, (0, 3), (3, 5), (5, 8), (9, 13), None, None, None]
    rng = random.Random(0)
    masked, labels = mask_whole_words(ids, mask, offsets, rng, 103, 30522, mask_prob=1.0)
    # both words fully labeled; specials/padding untouched
    assert (labels[1:4] == [5, 6, 7]).all()
    assert labels[4] == 8
    assert labels[0] == IGNORE_LABEL and labels[5] == IGNORE_LABEL
    # one action per word: subwords of a masked word share the [MASK]/random fate
    word1 = masked[1:4]
    assert (word1 == 103).all() or (word1 != 103).all()


def test_mask_whole_words_boundary_alignment_under_partial_prob():
    ids = np.array([101, 5, 6, 7, 8, 9, 102, 0], dtype=np.int32)
    mask = np.array([1, 1, 1, 1, 1, 1, 1, 0], dtype=np.float32)
    offsets = [None, (0, 3), (3, 5), (5, 8), (9, 13), (13, 16), None, None]
    # groups: [1,2,3] and [4,5]
    for seed in range(50):
        _, labels = mask_whole_words(
            ids, mask, offsets, random.Random(seed), 103, 30522, mask_prob=0.5
        )
        g1 = labels[1:4] != IGNORE_LABEL
        g2 = labels[4:6] != IGNORE_LABEL
        assert g1.all() or (~g1).all(), labels
        assert g2.all() or (~g2).all(), labels


def test_frequency_biased_sampling_prefers_rare_words():
    """tf bias: with a shared running counter, rare words get masked more than
    frequent ones (reference :167-185)."""
    counter = Counter()
    counter[5] = 1000  # frequent token
    counter[9] = 1  # rare token
    ids = np.array([5, 9], dtype=np.int32)
    mask = np.ones(2, dtype=np.float32)
    offsets = [(0, 3), (4, 7)]
    freq_masked = rare_masked = 0
    for seed in range(400):
        _, labels = mask_whole_words(
            ids, mask, offsets, random.Random(seed), 103, 30522, mask_prob=0.15,
            token_counter=counter, bias_sampling="tf",
        )
        freq_masked += int(labels[0] != IGNORE_LABEL)
        rare_masked += int(labels[1] != IGNORE_LABEL)
        # keep counts stable so probabilities stay comparable across trials
        counter[5] -= 1
        counter[9] -= 1
    assert rare_masked > freq_masked * 2, (rare_masked, freq_masked)


def test_mask_tokens_subword_mode_still_available():
    ids = np.array([101, 5, 6, 7, 102], dtype=np.int32)
    mask = np.ones(5, dtype=np.float32)
    masked, labels = mask_tokens(ids, mask, random.Random(1), 103, 30522, mask_prob=1.0)
    assert (labels[1:4] == [5, 6, 7]).all()
    assert labels[0] == IGNORE_LABEL and labels[4] == IGNORE_LABEL


def test_mlm_training_loader_whole_word_default(tmp_path):
    from matchmaker_tpu.data.tokenization import HashBertTokenizer

    path = tmp_path / "collection.tsv"
    path.write_text("".join(f"d{i}\talpha beta gamma delta epsilon zeta\n" for i in range(8)))
    tok = HashBertTokenizer(30522)
    config = {"batch_size_train": 4, "max_doc_length": 12, "mlm_mask_probability": 0.5, "random_seed": 3}
    batches = list(mlm_training_loader(config, tok, str(path)))
    assert len(batches) == 2
    b = batches[0]
    assert b["seq_ids"].shape == (4, 12)
    assert (b["mlm_labels"] != IGNORE_LABEL).sum() > 0


def test_word_groups_text_refinement_punctuation_and_cjk():
    # "hello, world" → "hello" (0,5) + "," (5,6) contiguous but ',' is not
    # alphanumeric → separate groups; "wor|ld" split stays one word
    text = "hello, world"
    offsets = [(0, 5), (5, 6), (7, 10), (10, 12)]
    groups = word_groups_from_offsets(offsets, text)
    assert groups == [[0], [1], [2, 3]]

    # per-char CJK tokens are contiguous but each is its own word
    text = "中文词"
    offsets = [(0, 1), (1, 2), (2, 3)]
    groups = word_groups_from_offsets(offsets, text)
    assert groups == [[0], [1], [2]]


def test_mask_whole_words_respects_punctuation_boundary():
    ids = np.array([5, 6, 7], dtype=np.int32)
    mask = np.ones(3, dtype=np.float32)
    text = "hi, yo"
    offsets = [(0, 2), (2, 3), (4, 6)]  # "hi" "," "yo"
    seen_patterns = set()
    for seed in range(40):
        _, labels = mask_whole_words(
            ids, mask, offsets, random.Random(seed), 103, 30522,
            mask_prob=0.5, text=text,
        )
        seen_patterns.add(tuple(labels != IGNORE_LABEL))
    # "hi" and "," must be maskable independently (they'd always co-mask if
    # grouped); with 40 seeds at p=0.5 we must see a split decision
    assert any(p[0] != p[1] for p in seen_patterns), seen_patterns
