"""BERT_CAT — concatenated cross-encoder (monoBERT; the Margin-MSE teacher).

Behavior contract: reference models/bert_cat.py:44-72 — one encoder pass over
the concatenated [CLS] q [SEP] d [SEP] sequence, CLS hidden state → linear →
scalar score (distilbert-style: CLS token hidden state directly, no pooler).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM, encoder_config_from_model_name


class BertCat(Ranker):
    encoder_cfg: EncoderConfig
    compute_dtype: jnp.dtype = jnp.bfloat16
    qa_head: bool = False  # extractive-QA span + answerability heads (multi-task)

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
            qa_head=config.get("train_qa_spans", False),
        )

    def setup(self):
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")
        self.score_layer = nn.Dense(1, use_bias=False, name="score_layer")
        if self.qa_head:
            self.qa_span_layer = nn.Dense(2, name="qa_span_layer")
            self.answerability_layer = nn.Dense(2, name="answerability_layer")

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        hidden = self.encoder(batch["seq_ids"], batch["seq_mask"], batch.get("seq_type_ids"))
        cls_vec = hidden[:, 0, :]
        score = self.score_layer(cls_vec).squeeze(-1)
        out: Output = {"score": score}
        if self.qa_head:
            span_logits = self.qa_span_layer(hidden)  # (B, L, 2)
            neg = (1.0 - batch["seq_mask"]) * -1e9
            out["qa_logits_start"] = span_logits[..., 0] + neg
            out["qa_logits_end"] = span_logits[..., 1] + neg
            out["answerability_logits"] = self.answerability_layer(cls_vec)
        if output_secondary:
            out["secondary"] = {"cls_vector": cls_vec}
        return out
