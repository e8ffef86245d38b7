"""PARADE — passage representation aggregation (Li et al., 2020).

Behavior contract: reference models/parade.py:11-156 — doc chunked
(idcm_chunk_size + 2·idcm_overlap); each (query, chunk) pair cross-encoded,
chunk CLS vectors collected; aggregation either a small transformer over
[CLS-embedding ‖ chunk vectors] taking the CLS output (``tf``) or max pooling
(``max``); linear score head.

TPU shape: all chunks cross-encode in one static (B·C) batch; empty chunks are
masked in the aggregator instead of packed away.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.adapters import chunk_document
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM, encoder_config_from_model_name
from matchmaker_tpu.modules.transformer import TransformerEncoder


class Parade(Ranker):
    encoder_cfg: EncoderConfig
    aggregate_type: str = "tf"  # "tf" | "max"
    aggregate_layers: int = 2
    chunk_size: int = 50
    overlap: int = 7
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            aggregate_type=config.get("parade_aggregate_type", "tf"),
            aggregate_layers=config.get("parade_aggregate_layers", 2),
            chunk_size=config.get("idcm_chunk_size", 50),
            overlap=config.get("idcm_overlap", 7),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
        )

    def setup(self):
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")
        if self.aggregate_type == "tf":
            self.aggregator = TransformerEncoder(
                num_layers=self.aggregate_layers,
                dim=self.encoder_cfg.hidden_size,
                num_heads=self.encoder_cfg.num_heads,
                ff_dim=self.encoder_cfg.intermediate_size,
                name="aggregator",
            )
            self.agg_cls = self.param(
                "agg_cls", nn.initializers.normal(0.02), (1, 1, self.encoder_cfg.hidden_size)
            )
        self.score_reduction = nn.Dense(1, name="score_reduction")

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        chunks, mask_chunks, non_empty = chunk_document(
            batch["doc_ids"], batch["doc_mask"], self.chunk_size, self.overlap
        )
        b, c, ext = chunks.shape
        q_ids = jnp.repeat(batch["query_ids"], c, axis=0)
        q_mask = jnp.repeat(batch["query_mask"], c, axis=0)
        seq_ids = jnp.concatenate([q_ids, chunks.reshape(b * c, ext)], axis=1)
        seq_mask = jnp.concatenate([q_mask, mask_chunks.reshape(b * c, ext)], axis=1)
        cls_vecs = self.encoder(seq_ids, seq_mask)[:, 0, :].reshape(b, c, -1)
        cls_vecs = cls_vecs * non_empty[..., None]

        if self.aggregate_type == "tf":
            agg_in = jnp.concatenate([jnp.broadcast_to(self.agg_cls, (b, 1, cls_vecs.shape[-1])), cls_vecs], axis=1)
            agg_mask = jnp.concatenate([jnp.ones((b, 1)), non_empty.astype(jnp.float32)], axis=1)
            agg_vec = self.aggregator(agg_in, agg_mask)[:, 0, :]
        else:
            masked = jnp.where(non_empty[..., None], cls_vecs, -jnp.inf)
            agg_vec = masked.max(axis=1)
        score = self.score_reduction(agg_vec).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {"chunk_cls": cls_vecs}
        return out
