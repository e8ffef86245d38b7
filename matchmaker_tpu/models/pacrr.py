"""PACRR and CO-PACRR — position-aware convolution over the match matrix.

Behavior contract:
- PACRR (reference models/pacrr.py:16-119): per-n-gram-size 2D convolutions
  (right-padded, max over output channels), per-query-row k-max pooling
  (n=1 path uses the raw cosine matrix), idf-softmax query weighting,
  100→10→1 relu MLP.
- CO-PACRR (reference models/co_pacrr.py:16-187): adds a context similarity
  channel (query mean vector vs rolling-window document context) gathered at
  the k-max positions, cascaded k-max views over 25/50/75/100% document
  prefixes.

Note: the reference computes the idf-weighted features but feeds the
*unweighted* tensor to the MLP (pacrr.py:100-103); here the weighting is
actually applied — set ``pacrr_apply_idf_weighting: false`` for strict
reference behavior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.modules.embedder import TokenEmbedder
from matchmaker_tpu.modules.pooling import masked_softmax, sliding_window_mean
from matchmaker_tpu.ops.kernel_pooling import cosine_match_matrix


def _kmax(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k (sorted) over the last axis."""
    return jax.lax.top_k(x, k)[0]


class PACRR(Ranker):
    vocab_size: int
    dim: int
    unified_query_length: int = 30
    unified_document_length: int = 200
    max_conv_kernel_size: int = 3
    conv_output_size: int = 32
    kmax_pooling_size: int = 5
    apply_idf_weighting: bool = True
    pretrained_embeddings: Optional[np.ndarray] = None

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            unified_query_length=config.get("pacrr_unified_query_length", config.get("max_query_length", 30)),
            unified_document_length=config.get("pacrr_unified_document_length", config.get("max_doc_length", 200)),
            max_conv_kernel_size=config.get("pacrr_max_conv_kernel_size", 3),
            conv_output_size=config.get("pacrr_conv_output_size", 32),
            kmax_pooling_size=config.get("pacrr_kmax_pooling_size", 5),
            apply_idf_weighting=config.get("pacrr_apply_idf_weighting", True),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        self.convs = [
            nn.Conv(
                self.conv_output_size,
                kernel_size=(n, n),
                padding=[(0, n - 1), (0, n - 1)],
                name=f"conv_{n}",
            )
            for n in range(2, self.max_conv_kernel_size + 1)
        ]
        self.dense = nn.Dense(100, name="dense")
        self.dense2 = nn.Dense(10, name="dense2")
        self.dense3 = nn.Dense(1, use_bias=False, name="dense3")

    def _conv_kmax_features(self, match: jnp.ndarray):
        """[(B, Lq, k)] per n-gram size: raw matrix + channel-maxed convs."""
        feats = [_kmax(match, self.kmax_pooling_size)]
        x = match[..., None]
        for conv in self.convs:
            cr = conv(x).max(axis=-1)  # max over output channels (MaxPool3d trick)
            feats.append(_kmax(cr, self.kmax_pooling_size))
        return feats

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask)
        d_emb = self.embedder(batch["doc_ids"], d_mask)
        match = cosine_match_matrix(q_emb, d_emb)

        per_query = jnp.concatenate(self._conv_kmax_features(match), axis=-1)  # (B, Lq, n*k)
        if self.apply_idf_weighting:
            idfs = batch.get("query_idfs", jnp.zeros_like(q_mask))
            weights = masked_softmax(idfs, q_mask, axis=1)[..., None]
            per_query = per_query * weights
        flat = per_query.reshape(per_query.shape[0], -1)

        h = nn.relu(self.dense(flat))
        h = nn.relu(self.dense2(h))
        score = self.dense3(h).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {}
        return out


class CoPACRR(PACRR):
    context_pool_size: int = 6
    view_percents: Tuple[float, ...] = (0.25, 0.5, 0.75, 1.0)

    @classmethod
    def from_config(cls, config, pretrained=None):
        base = PACRR.from_config(config, pretrained)
        return cls(
            **{k: getattr(base, k) for k in (
                "vocab_size", "dim", "unified_query_length", "unified_document_length",
                "max_conv_kernel_size", "conv_output_size", "kmax_pooling_size",
                "apply_idf_weighting", "pretrained_embeddings",
            )},
            context_pool_size=config.get("copacrr_context_pool_size", 6),
        )

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask)
        d_emb = self.embedder(batch["doc_ids"], d_mask)
        match = cosine_match_matrix(q_emb, d_emb)

        # context channel: query mean vector vs rolling doc windows (co_pacrr.py:99-104)
        q_len = jnp.maximum(q_mask.sum(axis=1, keepdims=True), 1.0)
        q_context = (q_emb * q_mask[..., None]).sum(axis=1) / q_len  # (B, D)
        d_context = sliding_window_mean(d_emb, self.context_pool_size)  # (B, Ld, D)
        context_sim = cosine_match_matrix(q_context[:, None, :], d_context).squeeze(1)  # (B, Ld)

        ld = match.shape[-1]
        feats = []
        sources = [match[..., None]]
        for conv in self.convs:
            sources.append(conv(match[..., None]).max(axis=-1, keepdims=True))
        for src in sources:
            src2d = src.squeeze(-1)  # (B, Lq, Ld)
            for pct in self.view_percents:
                view = max(1, int(ld * pct))
                vals, idx = jax.lax.top_k(src2d[:, :, :view], self.kmax_pooling_size)
                # context similarity gathered at the same positions (cascade views)
                ctx = jnp.take_along_axis(
                    jnp.broadcast_to(context_sim[:, None, :view], src2d[:, :, :view].shape), idx, axis=-1
                )
                feats.append(vals)
                feats.append(ctx)

        per_query = jnp.concatenate(feats, axis=-1)  # (B, Lq, views*2*k*n_sources)
        if self.apply_idf_weighting:
            idfs = batch.get("query_idfs", jnp.zeros_like(q_mask))
            weights = masked_softmax(idfs, q_mask, axis=1)[..., None]
            per_query = per_query * weights
        flat = per_query.reshape(per_query.shape[0], -1)
        h = nn.relu(self.dense(flat))
        h = nn.relu(self.dense2(h))
        score = self.dense3(h).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {"context_sim": context_sim}
        return out
