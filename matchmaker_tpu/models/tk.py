"""TK (ECAI'20) — transformer-kernel re-ranker.

Behavior contract: reference models/published/ecai20_tk.py:9-143 —
sinusoid-position transformer contextualization (optionally with offset
document positions), learned hybrid mix between raw and contextualized
embeddings, cosine match matrix, gaussian kernels with a learned per-kernel
alpha scaler, masked log-sum pooling, bias-free linear bin weights.

TPU shape: contextualization is two MXU-bound attention layers; the scoring
tail is the same fused kernel-pooling computation as KNRM.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.knrm import small_uniform_init
from matchmaker_tpu.modules.embedder import TokenEmbedder, sinusoidal_positions
from matchmaker_tpu.modules.transformer import TransformerEncoder
from matchmaker_tpu.ops.kernel_pooling import (
    cosine_match_matrix,
    gaussian_kernel_mus,
    gaussian_kernel_sigmas,
    kernel_pooling_features,
)


class TK(Ranker):
    vocab_size: int
    dim: int
    kernels_mu: Optional[List[float]] = None
    kernels_sigma: Optional[List[float]] = None
    att_heads: int = 8
    att_layers: int = 2
    att_ff_dim: int = 100
    max_length: int = 200
    use_diff_posencoding: bool = True
    mix_hybrid_context: bool = True
    pretrained_embeddings: Optional[np.ndarray] = None
    # embeddings come from a wrapping module (bert_vectors adapter) — skip the
    # token table and only expose score_embeddings
    external_embedding: bool = False

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            external_embedding=config.get("_external_embedding", False),
            kernels_mu=config.get("tk_kernels_mu"),
            kernels_sigma=config.get("tk_kernels_sigma"),
            att_heads=config.get("tk_att_heads", 8),
            att_layers=config.get("tk_att_layer", 2),
            att_ff_dim=config.get("tk_att_ff_dim", 100),
            max_length=config.get("max_doc_length", 200),
            use_diff_posencoding=config.get("tk_use_diff_posencoding", True),
            mix_hybrid_context=config.get("tk_mix_hybrid_context", True),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        if not self.external_embedding:
            self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        mus = self.kernels_mu or gaussian_kernel_mus(11)
        sigmas = self.kernels_sigma or gaussian_kernel_sigmas(11)
        assert len(mus) == len(sigmas), "len(kernels_mu) != len(kernels_sigma)"
        self.mu = jnp.asarray(mus)
        self.sigma = jnp.asarray(sigmas)
        n_kernels = len(mus)

        self.pos_q = jnp.asarray(sinusoidal_positions(self.max_length, self.dim))
        # document positions offset by 500 so q/d don't share position identity
        # (ecai20_tk.py:52-55)
        offset = 500 if self.use_diff_posencoding else 0
        self.pos_d = jnp.asarray(sinusoidal_positions(self.max_length, self.dim, offset=offset))

        self.contextualizer = TransformerEncoder(
            num_layers=self.att_layers, dim=self.dim, num_heads=self.att_heads, ff_dim=self.att_ff_dim
        )
        self.mixer = self.param("mixer", lambda *_: jnp.full((1,), 0.5))
        self.kernel_alpha_scaler = self.param(
            "kernel_alpha_scaler", lambda *_: jnp.ones((1, 1, n_kernels))
        )
        self.kernel_bin_weights = nn.Dense(
            1, use_bias=False, kernel_init=small_uniform_init, name="kernel_bin_weights"
        )

    def contextualize(self, emb: jnp.ndarray, mask: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        ctx = self.contextualizer(emb + positions[None, : emb.shape[1], :], mask)
        if self.mix_hybrid_context:
            return self.mixer * emb + (1.0 - self.mixer) * ctx
        return ctx

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_emb = self.embedder(batch["query_ids"], batch["query_mask"])
        d_emb = self.embedder(batch["doc_ids"], batch["doc_mask"])
        return self.score_embeddings(
            q_emb, d_emb, batch["query_mask"], batch["doc_mask"], output_secondary
        )

    def score_embeddings(self, q_emb, d_emb, q_mask, d_mask, output_secondary: bool = False) -> Output:
        q_ctx = self.contextualize(q_emb, q_mask, self.pos_q)
        d_ctx = self.contextualize(d_emb, d_mask, self.pos_d)
        match = cosine_match_matrix(q_ctx, d_ctx)
        per_kernel = kernel_pooling_features(
            match,
            q_mask,
            d_mask,
            self.mu,
            self.sigma,
            alpha_scaler=self.kernel_alpha_scaler,
            mask_match_matrix=False,
        )
        score = self.kernel_bin_weights(per_kernel).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {
                "per_kernel": per_kernel,
                "cosine_matrix": match * d_mask[:, None, :] * q_mask[:, :, None],
            }
        return out
