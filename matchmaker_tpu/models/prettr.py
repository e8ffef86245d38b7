"""PreTTR — split transformer with cacheable lower document layers.

Behavior contract: reference models/prettr.py:10-179 — query and document run
layers ``0..join_layer_idx`` separately (document position embeddings offset
by the query length, PosOffsetEmbeddings prettr.py:68); the hidden states are
concatenated and run through the remaining layers jointly; CLS → linear score.
The split makes document-side lower-layer states precomputable at index time.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM, encoder_config_from_model_name


class PreTTR(Ranker):
    encoder_cfg: EncoderConfig
    join_layer_idx: int = 3
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            join_layer_idx=config.get("prettr_join_layer_idx", 3),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
        )

    def setup(self):
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")
        self.score_layer = nn.Dense(1, use_bias=False, name="score_layer")

    def _embed(self, ids, mask, offset=0):
        """Lower-tower pass: embeddings (+offset positions) through the first
        join_layer_idx layers."""
        x = self.encoder.embed(ids, position_offset=offset)
        return self.encoder.encode_layers(x, mask, 0, self.join_layer_idx)

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_ids, q_mask = batch["query_ids"], batch["query_mask"]
        d_ids, d_mask = batch["doc_ids"], batch["doc_mask"]
        q_low = self._embed(q_ids, q_mask, offset=0)
        d_low = self._embed(d_ids, d_mask, offset=q_ids.shape[1])

        joined = jnp.concatenate([q_low, d_low], axis=1)
        joined_mask = jnp.concatenate([q_mask, d_mask], axis=1)
        hidden = self.encoder.encode_layers(
            joined, joined_mask, self.join_layer_idx, self.encoder_cfg.num_layers
        )
        score = self.score_layer(hidden[:, 0, :]).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {}
        return out
