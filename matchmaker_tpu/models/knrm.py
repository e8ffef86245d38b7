"""KNRM — kernel pooling over a cosine match matrix (Xiong et al., SIGIR'17).

Behavior contract: reference models/knrm.py:40-96 (cosine matrix masked by the
joint query×doc mask, gaussian kernels, doc-dim sum, log with 1e-10 clamp
scaled by 0.01, query-dim masked sum, bias-free linear with small uniform
init). The whole scorer is one fused XLA computation (ops/kernel_pooling.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.modules.embedder import TokenEmbedder
from matchmaker_tpu.ops.kernel_pooling import (
    cosine_match_matrix,
    gaussian_kernel_mus,
    gaussian_kernel_sigmas,
    kernel_pooling_features,
)


def small_uniform_init(key, shape, dtype=jnp.float32):
    """U(-0.014, 0.014) — keeps initial kernel-weight outputs in tanh range."""
    import jax

    return jax.random.uniform(key, shape, dtype, -0.014, 0.014)


class KNRM(Ranker):
    vocab_size: int
    dim: int
    n_kernels: int = 11
    pretrained_embeddings: Optional[np.ndarray] = None
    external_embedding: bool = False  # bert_vectors adapter supplies vectors

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            n_kernels=config.get("knrm_kernels", 11),
            pretrained_embeddings=pretrained,
            external_embedding=config.get("_external_embedding", False),
        )

    def setup(self):
        if not self.external_embedding:
            self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        self.mu = jnp.asarray(gaussian_kernel_mus(self.n_kernels))
        self.sigma = jnp.asarray(gaussian_kernel_sigmas(self.n_kernels))
        self.dense = nn.Dense(
            1, use_bias=False, kernel_init=small_uniform_init, name="kernel_weights"
        )  # U(-0.014, 0.014) like matchzoo/reference (knrm.py:41)

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_emb = self.embedder(batch["query_ids"], batch["query_mask"])
        d_emb = self.embedder(batch["doc_ids"], batch["doc_mask"])
        return self.score_embeddings(
            q_emb, d_emb, batch["query_mask"], batch["doc_mask"], output_secondary
        )

    def score_embeddings(self, q_emb, d_emb, q_mask, d_mask, output_secondary: bool = False) -> Output:
        match = cosine_match_matrix(q_emb, d_emb)
        per_kernel = kernel_pooling_features(
            match, q_mask, d_mask, self.mu, self.sigma, log_scale=0.01, mask_match_matrix=True
        )
        score = self.dense(per_kernel).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {
                "per_kernel": per_kernel,
                "cosine_matrix_masked": match * (q_mask[:, :, None] * d_mask[:, None, :]),
            }
        return out
