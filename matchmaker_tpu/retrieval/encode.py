"""Corpus/query encoding into memmapped vector blocks.

Contract with the reference encode phase (dense_retrieval.py:197-286): stream
the ``id \t text`` collection through the encoder, append vectors to fixed-size
on-disk blocks (``token_reps_N.npy``, ``token_block_size`` rows), record
``doc_infos`` = {seq_id: (block, start, end)} (saved as doc_infos.npz), strip
all-zero rows for multi-vector models (ColBERT per-token vectors).

TPU shape: the encoder pass is one jitted program per fixed-shape batch;
host-side the loader thread keeps the next batch in flight (device_prefetch)
while blocks are flushed with numpy memmaps.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, single_sequence_loader
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor


class BlockWriter:
    """Append rows into fixed-size .npy blocks (reference token_reps_N.npy)."""

    def __init__(self, folder: str, dim: int, block_rows: int, dtype=np.float16):
        self.folder = folder
        self.dim = dim
        self.block_rows = block_rows
        self.dtype = dtype
        self.block_num = 0
        self.row_in_block = 0
        self._block: Optional[np.ndarray] = None
        os.makedirs(folder, exist_ok=True)

    def _ensure_block(self):
        if self._block is None:
            self._block = np.zeros((self.block_rows, self.dim), dtype=self.dtype)

    def append(self, rows: np.ndarray) -> Tuple[int, int, int]:
        """Write rows; returns (block, start, end). Rows never span blocks
        (matches the reference's block handling, dense_retrieval.py:248-262)."""
        n = rows.shape[0]
        if n > self.block_rows:
            raise ValueError("single sequence larger than block size")
        self._ensure_block()
        if self.row_in_block + n > self.block_rows:
            self.flush()
            self._ensure_block()
        start = self.row_in_block
        self._block[start : start + n] = rows
        self.row_in_block += n
        return self.block_num, start, start + n

    def flush(self):
        if self._block is None:
            return
        np.save(
            os.path.join(self.folder, f"token_reps_{self.block_num}.npy"),
            self._block[: self.row_in_block],
        )
        self.block_num += 1
        self.row_in_block = 0
        self._block = None


def encode_corpus(
    encode_fn: Callable,  # (params, ids, mask) -> (B, D) or (B, L/C, D)
    params,
    config,
    tokenizer,
    input_path: str,
    out_folder: str,
    sequence_type: str = "doc",
    sharding=None,
) -> Dict[str, tuple]:
    """Encode a full id\\ttext file into blocks + doc_infos; returns doc_infos."""
    perf = PerformanceMonitor.get()
    dtype = np.float16 if config.get("token_dtype", "float16") == "float16" else np.float32
    block_rows = config.get("token_block_size", 50000)
    writer: Optional[BlockWriter] = None
    doc_infos: Dict[str, tuple] = {}
    n_seqs = 0

    loader = single_sequence_loader(config, tokenizer, input_path, sequence_type)
    perf.start_block("encode")
    for batch, seq_ids in device_prefetch(loader, sharding=sharding):
        reps = np.asarray(encode_fn(params, batch["seq_ids"], batch["seq_mask"]))
        if writer is None:
            writer = BlockWriter(out_folder, reps.shape[-1], block_rows, dtype)
        if reps.ndim == 2:
            # single-vector models: one bulk write for the whole batch chunk
            rows = reps[: len(seq_ids)].astype(dtype)
            i = 0
            while i < len(seq_ids):
                space = writer.block_rows - writer.row_in_block
                take = min(space, len(seq_ids) - i) or min(writer.block_rows, len(seq_ids) - i)
                block, start, _ = writer.append(rows[i : i + take])
                for j, sid in enumerate(seq_ids[i : i + take]):
                    doc_infos[sid] = (block, start + j, start + j + 1)
                i += take
            n_seqs += len(seq_ids)
            continue
        for i, sid in enumerate(seq_ids):
            vecs = reps[i]
            # multi-vector models: keep only non-zero (unmasked) rows
            keep = np.abs(vecs).sum(axis=-1) > 0
            vecs = vecs[keep]
            if vecs.shape[0] == 0:
                vecs = reps[i][:1]
            block, start, end = writer.append(vecs.astype(dtype))
            doc_infos[sid] = (block, start, end)
            n_seqs += 1
    writer.flush()
    perf.stop_block("encode", n_seqs)

    np.savez_compressed(
        os.path.join(out_folder, "doc_infos.npz"),
        ids=np.array(list(doc_infos.keys())),
        spans=np.array(list(doc_infos.values()), dtype=np.int64),
    )
    with open(os.path.join(out_folder, "encode_meta.json"), "w") as f:
        json.dump(
            {"dim": writer.dim, "dtype": str(np.dtype(dtype)), "blocks": writer.block_num, "sequences": n_seqs},
            f,
        )
    return doc_infos


def load_encoded(folder: str) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate blocks → (vectors (N, D), row→seq-id array)."""
    with open(os.path.join(folder, "encode_meta.json")) as f:
        meta = json.load(f)
    blocks = [
        np.load(os.path.join(folder, f"token_reps_{i}.npy")) for i in range(meta["blocks"])
    ]
    vectors = np.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
    data = np.load(os.path.join(folder, "doc_infos.npz"), allow_pickle=True)
    ids, spans = data["ids"], data["spans"]
    row_ids = np.empty(vectors.shape[0], dtype=ids.dtype)
    block_offsets = np.cumsum([0] + [b.shape[0] for b in blocks])
    for sid, (block, start, end) in zip(ids, spans):
        base = block_offsets[block]
        row_ids[base + start : base + end] = sid
    return vectors, row_ids
