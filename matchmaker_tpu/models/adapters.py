"""MaxP / MeanP chunk adapters — wrap any ranker over document chunks.

Behavior contract: reference models/max_p_adapter.py:7-156 /
mean_p_adapter.py:7-140 — documents are split into overlapping chunks
(``idcm_chunk_size`` + 2·``idcm_overlap``), the inner model scores every
(query, chunk) pair, and the document score is the max (or mean) over
non-empty chunks; during distillation training the per-chunk score vector is
returned for the inter-passage losses.

TPU shape: the reference packs non-empty chunks into a dynamic batch
(max_p_adapter.py:64-74); here all chunks run in one static (B·C) batch and
empty chunks are masked out of the pooling — no dynamic shapes, and the
batched matmuls stay MXU-sized.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.modules.pooling import unfold_chunks

NEG_SENTINEL = -9000.0


def chunk_document(doc_ids, doc_mask, chunk_size: int, overlap: int):
    """(B, Ld) → (B, C, ext) ids/mask chunks + (B, C) non-empty flags."""
    chunks = unfold_chunks(doc_ids[..., None], chunk_size, overlap).squeeze(-1)
    mask_chunks = unfold_chunks(doc_mask[..., None], chunk_size, overlap).squeeze(-1)
    inner = mask_chunks[:, :, overlap : overlap + chunk_size]
    non_empty = inner.sum(axis=-1) > 0  # (B, C)
    return chunks, mask_chunks, non_empty


class ChunkPoolAdapter(Ranker):
    inner: Ranker
    inner_input: str = "independent"  # or "concatenated"
    chunk_size: int = 50
    overlap: int = 7
    pool: str = "max"  # or "mean"
    sep_token_id: int = 102
    return_passage_scores: bool = False

    @classmethod
    def from_config(cls, config, inner, pool: str = "max"):
        return cls(
            inner=inner,
            inner_input="concatenated" if type(inner).__name__ in ("BertCat",) else "independent",
            chunk_size=config.get("idcm_chunk_size", 50),
            overlap=config.get("idcm_overlap", 7),
            pool=pool,
            return_passage_scores=config.get("train_pairwise_distillation_on_passages", False),
        )

    def _chunk_batches(self, batch: Batch):
        chunks, mask_chunks, non_empty = chunk_document(
            batch["doc_ids"], batch["doc_mask"], self.chunk_size, self.overlap
        )
        b, c, ext = chunks.shape
        flat_ids = chunks.reshape(b * c, ext)
        flat_mask = mask_chunks.reshape(b * c, ext)
        q_ids = jnp.repeat(batch["query_ids"], c, axis=0)
        q_mask = jnp.repeat(batch["query_mask"], c, axis=0)
        if self.inner_input == "concatenated":
            seq_ids = jnp.concatenate([q_ids, flat_ids], axis=1)
            seq_mask = jnp.concatenate([q_mask, flat_mask], axis=1)
            type_ids = jnp.concatenate(
                [jnp.zeros_like(q_ids), jnp.ones_like(flat_ids) * (flat_mask > 0)], axis=1
            ).astype(jnp.int32)
            inner_batch = {"seq_ids": seq_ids, "seq_mask": seq_mask, "seq_type_ids": type_ids}
        else:
            inner_batch = {
                "query_ids": q_ids, "query_mask": q_mask,
                "doc_ids": flat_ids, "doc_mask": flat_mask,
            }
        return inner_batch, non_empty, b, c

    def passage_scores(self, batch: Batch) -> jnp.ndarray:
        """(B, C) per-chunk scores with empty chunks = 0."""
        inner_batch, non_empty, b, c = self._chunk_batches(batch)
        scores = self.inner(inner_batch)["score"].reshape(b, c)
        return scores * non_empty

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        inner_batch, non_empty, b, c = self._chunk_batches(batch)
        scores = self.inner(inner_batch)["score"].reshape(b, c)
        masked = jnp.where(non_empty, scores, NEG_SENTINEL)
        if self.pool == "max":
            score = masked.max(axis=-1)
        else:
            counts = jnp.maximum(non_empty.sum(axis=-1), 1)
            score = (scores * non_empty).sum(axis=-1) / counts
        out: Output = {"score": score}
        if self.return_passage_scores:
            out["passage_scores"] = scores * non_empty
        if output_secondary:
            out["secondary"] = {"passage_scores": scores * non_empty, "packed_indices": non_empty}
        return out

    def encode(self, ids: jnp.ndarray, mask: jnp.ndarray, sequence_type: str = "doc") -> jnp.ndarray:
        """Chunk-wise representations for maxP dense retrieval
        (reference max_p_adapter.py:109-137): (B, C, D) chunk vectors."""
        if sequence_type == "query":
            return self.inner.encode(ids, mask, sequence_type)
        chunks, mask_chunks, non_empty = chunk_document(ids, mask, self.chunk_size, self.overlap)
        b, c, ext = chunks.shape
        reps = self.inner.encode(chunks.reshape(b * c, ext), mask_chunks.reshape(b * c, ext), "doc")
        reps = reps.reshape(b, c, -1)
        return reps * non_empty[..., None]
