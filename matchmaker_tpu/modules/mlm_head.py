"""MLM prediction head (reference modules/pre_train_heads.py:14-225).

Standard BERT head: Dense → gelu → LayerNorm → vocab projection (weights tied
to the word-embedding table). The POD (per-document contrastive) variant adds
an in-batch CLS contrastive term, computed in cli/pretrain.py's loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM


class MLMPretrainModel(nn.Module):
    cfg: EncoderConfig
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TransformerEncoderLM(self.cfg, self.compute_dtype, name="encoder")
        self.transform = nn.Dense(self.cfg.hidden_size, name="mlm_transform")
        self.transform_norm = nn.LayerNorm(name="mlm_norm")
        self.bias = self.param("mlm_bias", nn.initializers.zeros, (self.cfg.vocab_size,))

    def __call__(self, batch, output_secondary: bool = False):
        hidden = self.encoder(batch["seq_ids"], batch["seq_mask"])
        h = self.transform_norm(nn.gelu(self.transform(hidden), approximate=False))
        # tied decoder: project onto the word-embedding table
        emb_table = self.encoder.word_embeddings.embedding  # (V, H)
        logits = jnp.einsum("blh,vh->blv", h, emb_table, preferred_element_type=jnp.float32)
        out = {"mlm_logits": logits + self.bias, "cls_vecs": hidden[:, 0, :]}
        return out
