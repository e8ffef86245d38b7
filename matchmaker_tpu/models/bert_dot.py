"""BERT_DOT — dense bi-encoder (the flagship dense-retrieval model).

Behavior contract: reference models/bert_dot.py:51-90 — independent query/doc
encoder passes, CLS vector (optionally linearly compressed), dot-product
score; during training returns the vectors so the in-batch-negative loss can
operate on the full (all-gathered) batch. Dual-encoder variant keeps separate
towers (reference models/bert_dot_dualencoder.py:9).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM, encoder_config_from_model_name


class BertDot(Ranker):
    encoder_cfg: EncoderConfig
    compress_dim: int = -1  # -1 = no compression layer
    return_vecs: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    # L2-normalize CLS vectors (cosine scoring) — config
    # ``bert_dot_normalize: true``, default off (reference parity: raw dot,
    # bert_dot.py:66). Same bootstrap role as ColBert.normalize: a weakly
    # pretrained encoder's CLS space is anisotropic (every pair at cosine
    # ~1.0, dots ~norm² ~780) and ranking training stalls; unit vectors put
    # the margin on an O(1) scale. Retrieval is unaffected structurally —
    # encode() returns the normalized vectors, so MIPS over them IS cosine.
    normalize: bool = False

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            compress_dim=config.get("bert_dot_compress_dim", -1),
            return_vecs=config.get("in_batch_negatives", False) or config.get("_always_return_vecs", False),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
            normalize=config.get("bert_dot_normalize", False),
        )

    def setup(self):
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")
        if self.compress_dim > -1:
            self.compressor = nn.Dense(self.compress_dim, name="compressor")

    def encode(self, ids: jnp.ndarray, mask: jnp.ndarray, sequence_type: str = "doc") -> jnp.ndarray:
        vec = self.encoder(ids, mask)[:, 0, :]
        if self.compress_dim > -1:
            vec = self.compressor(vec)
        if self.normalize:
            vec = vec / jnp.maximum(
                jnp.linalg.norm(vec.astype(jnp.float32), axis=-1, keepdims=True), 1e-6
            ).astype(vec.dtype)
        return vec

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_vecs = self.encode(batch["query_ids"], batch["query_mask"], "query")
        d_vecs = self.encode(batch["doc_ids"], batch["doc_mask"], "doc")
        score = jnp.einsum("bd,bd->b", q_vecs, d_vecs, preferred_element_type=jnp.float32)
        out: Output = {"score": score}
        if self.return_vecs:
            out["query_vecs"] = q_vecs
            out["doc_vecs"] = d_vecs
        if output_secondary:
            out["secondary"] = {}
        return out

    def forward_triple(self, batch: Batch):
        """Packed triple forward for the training hot loop.

        The generic path (train_step.loss_fn) runs ``model.apply`` twice — the
        query tower executes twice on identical inputs and the pos/neg docs run
        as two separate B-row encodes. Here the query tower runs ONCE and the
        documents are packed into a single 2B-row encode: ~13% fewer FLOPs and
        one larger MXU-friendly batch instead of two half-size ones. Same math,
        same param tree — returns (pos_out, neg_out) with ``__call__``'s keys.
        (Covers the reference's two-forward hot loop, train.py:347-543, the
        TPU way.)
        """
        q_vecs = self.encode(batch["query_ids"], batch["query_mask"], "query")
        d_ids = jnp.concatenate([batch["doc_pos_ids"], batch["doc_neg_ids"]], axis=0)
        d_mask = jnp.concatenate([batch["doc_pos_mask"], batch["doc_neg_mask"]], axis=0)
        d_vecs = self.encode(d_ids, d_mask, "doc")
        b = q_vecs.shape[0]
        pos_vecs, neg_vecs = d_vecs[:b], d_vecs[b:]
        pos_out: Output = {
            "score": jnp.einsum("bd,bd->b", q_vecs, pos_vecs, preferred_element_type=jnp.float32)
        }
        neg_out: Output = {
            "score": jnp.einsum("bd,bd->b", q_vecs, neg_vecs, preferred_element_type=jnp.float32)
        }
        if self.return_vecs:
            pos_out["query_vecs"] = q_vecs
            pos_out["doc_vecs"] = pos_vecs
            neg_out["query_vecs"] = q_vecs
            neg_out["doc_vecs"] = neg_vecs
        return pos_out, neg_out


class BertDotDualEncoder(Ranker):
    """DPR-style: separate query and document encoder towers."""

    encoder_cfg: EncoderConfig
    compress_dim: int = -1
    return_vecs: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    normalize: bool = False  # see BertDot.normalize

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            compress_dim=config.get("bert_dot_compress_dim", -1),
            return_vecs=config.get("in_batch_negatives", False),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
            normalize=config.get("bert_dot_normalize", False),
        )

    def setup(self):
        self.query_encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="query_encoder")
        self.doc_encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="doc_encoder")
        if self.compress_dim > -1:
            self.compressor = nn.Dense(self.compress_dim, name="compressor")

    def encode(self, ids: jnp.ndarray, mask: jnp.ndarray, sequence_type: str = "doc") -> jnp.ndarray:
        tower = self.query_encoder if sequence_type == "query" else self.doc_encoder
        vec = tower(ids, mask)[:, 0, :]
        if self.compress_dim > -1:
            vec = self.compressor(vec)
        if self.normalize:
            vec = vec / jnp.maximum(
                jnp.linalg.norm(vec.astype(jnp.float32), axis=-1, keepdims=True), 1e-6
            ).astype(vec.dtype)
        return vec

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_vecs = self.encode(batch["query_ids"], batch["query_mask"], "query")
        d_vecs = self.encode(batch["doc_ids"], batch["doc_mask"], "doc")
        score = jnp.einsum("bd,bd->b", q_vecs, d_vecs, preferred_element_type=jnp.float32)
        out: Output = {"score": score}
        if self.return_vecs:
            out["query_vecs"] = q_vecs
            out["doc_vecs"] = d_vecs
        if output_secondary:
            out["secondary"] = {}
        return out

    def forward_triple(self, batch: Batch):
        """Packed triple forward (see BertDot.forward_triple): one query-tower
        pass, one 2B-row doc-tower pass — the dual-tower variant dedups the
        query encode and packs pos+neg docs through the doc tower."""
        q_vecs = self.encode(batch["query_ids"], batch["query_mask"], "query")
        d_ids = jnp.concatenate([batch["doc_pos_ids"], batch["doc_neg_ids"]], axis=0)
        d_mask = jnp.concatenate([batch["doc_pos_mask"], batch["doc_neg_mask"]], axis=0)
        d_vecs = self.encode(d_ids, d_mask, "doc")
        b = q_vecs.shape[0]
        pos_vecs, neg_vecs = d_vecs[:b], d_vecs[b:]
        pos_out: Output = {
            "score": jnp.einsum("bd,bd->b", q_vecs, pos_vecs, preferred_element_type=jnp.float32)
        }
        neg_out: Output = {
            "score": jnp.einsum("bd,bd->b", q_vecs, neg_vecs, preferred_element_type=jnp.float32)
        }
        if self.return_vecs:
            pos_out["query_vecs"] = q_vecs
            pos_out["doc_vecs"] = pos_vecs
            neg_out["query_vecs"] = q_vecs
            neg_out["doc_vecs"] = neg_vecs
        return pos_out, neg_out
