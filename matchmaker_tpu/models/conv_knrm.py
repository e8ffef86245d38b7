"""Conv-KNRM — n-gram cross-match kernel pooling (Dai et al., WSDM'18).

Behavior contract: reference models/conv_knrm.py:30-201 — per-n-gram 1D
convolutions (right-padded so output length == input length) over query and
document embeddings, kernel pooling on every (q-gram, d-gram) pair's cosine
matrix, concatenated features → bias-free linear.

TPU shape: all n-gram match matrices are independent batched MXU matmuls; the
kernel pooling tail reuses the fused op (ops/kernel_pooling.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.knrm import small_uniform_init
from matchmaker_tpu.modules.embedder import TokenEmbedder
from matchmaker_tpu.ops.kernel_pooling import (
    cosine_match_matrix,
    gaussian_kernel_mus,
    gaussian_kernel_sigmas,
    kernel_pooling_features,
)


class ConvKNRM(Ranker):
    vocab_size: int
    dim: int
    n_grams: int = 3
    n_kernels: int = 11
    conv_out_dim: int = 128
    pretrained_embeddings: Optional[np.ndarray] = None

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            n_grams=config.get("conv_knrm_ngrams", 3),
            n_kernels=config.get("conv_knrm_kernels", 11),
            conv_out_dim=config.get("conv_knrm_conv_out_dim", 128),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        self.mu = jnp.asarray(gaussian_kernel_mus(self.n_kernels))
        self.sigma = jnp.asarray(gaussian_kernel_sigmas(self.n_kernels))
        self.convs = [
            nn.Conv(self.conv_out_dim, kernel_size=(n,), padding=[(0, n - 1)], name=f"conv_{n}gram")
            for n in range(1, self.n_grams + 1)
        ]
        self.dense = nn.Dense(
            1, use_bias=False, kernel_init=small_uniform_init, name="kernel_weights"
        )

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask)
        d_emb = self.embedder(batch["doc_ids"], d_mask)

        q_grams = [nn.relu(conv(q_emb)) for conv in self.convs]
        d_grams = [nn.relu(conv(d_emb)) for conv in self.convs]

        features = []
        for qg in q_grams:
            for dg in d_grams:
                match = cosine_match_matrix(qg, dg)
                features.append(
                    kernel_pooling_features(
                        match, q_mask, d_mask, self.mu, self.sigma, log_scale=0.01, mask_match_matrix=True
                    )
                )
        all_grams = jnp.concatenate(features, axis=1)
        score = self.dense(all_grams).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {"per_kernel_all_grams": all_grams}
        return out
