"""Duet — dual local (lexical match) + distributed (semantic) paths.

Behavior contract: reference models/duet.py:17-117 (the updated MS MARCO Duet
baseline) — local path: idf-weighted cosine match matrix → 1×1 conv over the
doc dim → MLP; distributed path: width-3 convs over query and document
embeddings, query max-pooled to one vector, document pooled with a sliding
window, elementwise product → MLP; combined → MLP → ×0.1.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.modules.embedder import TokenEmbedder
from matchmaker_tpu.modules.pooling import sliding_window_max
from matchmaker_tpu.ops.kernel_pooling import cosine_match_matrix


def _small_uniform(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.uniform(key, shape, dtype, 0.0, 0.01)


class Duet(Ranker):
    vocab_size: int
    dim: int
    max_query_length: int = 30
    max_doc_length: int = 200
    pretrained_embeddings: Optional[np.ndarray] = None

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            max_query_length=config.get("max_query_length", 30),
            max_doc_length=config.get("max_doc_length", 200),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        h = self.dim
        self.embedder = TokenEmbedder(self.vocab_size, h, pretrained=self.pretrained_embeddings)
        # local path
        self.local_conv = nn.Dense(h, name="local_conv")  # 1x1 conv over doc dim == Dense on axis
        self.local_fc1 = nn.Dense(h, name="local_fc1")
        self.local_fc2 = nn.Dense(h, name="local_fc2")
        # distributed path
        self.dist_q_conv = nn.Conv(h, kernel_size=(3,), padding="VALID", name="dist_q_conv")
        self.dist_q_fc = nn.Dense(h, name="dist_q_fc")
        self.dist_d_conv = nn.Conv(h, kernel_size=(3,), padding="VALID", name="dist_d_conv")
        self.dist_d_proj = nn.Dense(h, name="dist_d_proj")
        self.dist_fc1 = nn.Dense(h, name="dist_fc1")
        self.dist_fc2 = nn.Dense(h, name="dist_fc2")
        # combination
        self.comb_fc1 = nn.Dense(h, kernel_init=_small_uniform, name="comb_fc1")
        self.comb_fc2 = nn.Dense(h, kernel_init=_small_uniform, name="comb_fc2")
        self.comb_out = nn.Dense(1, kernel_init=_small_uniform, name="comb_out")

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask) * q_mask[..., None]
        d_emb = self.embedder(batch["doc_ids"], d_mask) * d_mask[..., None]

        # ---- local path: (B, Lq, Ld) idf-weighted exact/cosine matches
        match = cosine_match_matrix(q_emb, d_emb)
        idfs = batch.get("query_idfs", jnp.ones_like(q_mask))
        local = match * idfs[..., None]  # (B, Lq, Ld)
        h_local = nn.relu(self.local_conv(local))  # project doc dim → hidden
        h_local = h_local.reshape(h_local.shape[0], -1)
        h_local = nn.relu(self.local_fc1(h_local))
        h_local = nn.relu(self.local_fc2(h_local))

        # ---- distributed path
        h_q = nn.relu(self.dist_q_conv(q_emb))  # (B, Lq-2, H)
        h_q = h_q.max(axis=1)  # query max-pool → (B, H)
        h_q = nn.relu(self.dist_q_fc(h_q))
        h_d = nn.relu(self.dist_d_conv(d_emb))  # (B, Ld-2, H)
        window = min(100, h_d.shape[1])
        h_d = sliding_window_max(h_d, window, stride=1)  # (B, W, H)
        h_d = nn.relu(self.dist_d_proj(h_d))
        h_dist = h_q[:, None, :] * h_d  # (B, W, H)
        h_dist = h_dist.reshape(h_dist.shape[0], -1)
        h_dist = nn.relu(self.dist_fc1(h_dist))
        h_dist = nn.relu(self.dist_fc2(h_dist))

        combined = h_local + h_dist
        h = nn.relu(self.comb_fc1(combined))
        h = nn.relu(self.comb_fc2(h))
        score = nn.relu(self.comb_out(h)).squeeze(-1) * 0.1
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {}
        return out
