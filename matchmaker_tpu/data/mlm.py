"""MLM masked-sequence batches for encoder pre-training.

Contract: reference dataloaders/mlm_masked_sequence_loader.py:26-256 —
whole-word masking over ``id \t text`` collections with the BERT recipe
(mask_prob of words; 80% → [MASK], 10% → random token, 10% → unchanged),
labels = original ids at masked positions, -100 elsewhere.

(The reference's pre-train.py driver is broken — imports a nonexistent module,
SURVEY.md §2.1; this pipeline + cli/pretrain.py is the working equivalent.)
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, Optional

import numpy as np

from matchmaker_tpu.data.batching import pad_to_batch
from matchmaker_tpu.data.readers import read_id_sequences

IGNORE_LABEL = -100


def mask_tokens(
    ids: np.ndarray,
    mask: np.ndarray,
    rng: random.Random,
    mask_token_id: int,
    vocab_size: int,
    mask_prob: float = 0.15,
    special_ids: Optional[set] = None,
):
    """BERT masking recipe on one fixed-shape sequence; returns (masked_ids, labels)."""
    special_ids = special_ids or {0, 100, 101, 102, 103}
    masked = ids.copy()
    labels = np.full_like(ids, IGNORE_LABEL)
    for i in range(len(ids)):
        if mask[i] == 0 or ids[i] in special_ids:
            continue
        if rng.random() < mask_prob:
            labels[i] = ids[i]
            roll = rng.random()
            if roll < 0.8:
                masked[i] = mask_token_id
            elif roll < 0.9:
                masked[i] = rng.randrange(1000, vocab_size) if vocab_size > 1000 else rng.randrange(4, vocab_size)
    return masked, labels


def mlm_training_loader(
    config,
    tokenizer,
    path: str,
    batch_size: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    batch_size = batch_size or config.get("batch_size_train", 32)
    max_len = config.get("max_doc_length", 200)
    mask_prob = config.get("mlm_mask_probability", 0.15)
    rng = random.Random(config.get("random_seed", 42))
    mask_id = getattr(tokenizer, "mask_token_id", 103)

    buf = []
    for _sid, text in read_id_sequences(path):
        ids, mask = tokenizer.encode(text, max_len)
        masked, labels = mask_tokens(ids, mask, rng, mask_id, tokenizer.vocab_size, mask_prob)
        buf.append({"seq_ids": masked, "seq_mask": mask, "mlm_labels": labels})
        if len(buf) == batch_size:
            batch = {k: np.stack([s[k] for s in buf]) for k in buf[0]}
            buf.clear()
            yield pad_to_batch(batch, batch_size)
    if buf:
        batch = {k: np.stack([s[k] for s in buf]) for k in buf[0]}
        yield pad_to_batch(batch, batch_size)
