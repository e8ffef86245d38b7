"""``bert_vectors`` embedder: a full transformer as the contextual embedding
source for the TK/KNRM family.

Behavior contract: reference models/all.py:70-77 — token_embedder_type
``bert_vectors`` feeds the embedding-based models per-token *contextual*
vectors from a pre-trained transformer (AllenNLP PretrainedTransformerEmbedder)
instead of a static embedding table; ``train_embedding`` controls whether the
transformer is fine-tuned or frozen.

TPU shape: one wrapper module — the transformer forward and the inner model's
kernel-pooling tail fuse into a single XLA program; a frozen transformer is a
``stop_gradient``, which XLA prunes from the backward pass entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM


class ContextualVectorsAdapter(Ranker):
    """Wraps a ranker that exposes ``score_embeddings`` (TK, KNRM, ...),
    replacing its embedding lookup with transformer token vectors."""

    inner: Ranker
    encoder_cfg: EncoderConfig
    trainable: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, config, inner):
        from matchmaker_tpu.models.encoder import encoder_config_from_model_name

        return cls(
            inner=inner,
            encoder_cfg=encoder_config_from_model_name(config),
            trainable=config.get("train_embedding", False),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
        )

    def setup(self):
        # named "encoder" so init_params' HF warmstart replaces this subtree
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")

    def _vectors(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        vecs = self.encoder(ids, mask)
        if not self.trainable:
            vecs = jax.lax.stop_gradient(vecs)
        return vecs.astype(jnp.float32) * mask[..., None]

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_vecs = self._vectors(batch["query_ids"], batch["query_mask"])
        d_vecs = self._vectors(batch["doc_ids"], batch["doc_mask"])
        return self.inner.score_embeddings(
            q_vecs, d_vecs, batch["query_mask"], batch["doc_mask"], output_secondary
        )
