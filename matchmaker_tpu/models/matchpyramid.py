"""MatchPyramid — 2D CNN over the cosine match matrix (Pang et al., AAAI'16).

Behavior contract: reference models/matchpyramid.py:17-112 — stacked
[pad → conv2d → relu → adaptive max pool] layers over the (Lq, Ld) match
matrix, flattened → 100 → 10 → 1 MLP with relu.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.modules.embedder import TokenEmbedder
from matchmaker_tpu.modules.pooling import adaptive_max_pool_2d
from matchmaker_tpu.ops.kernel_pooling import cosine_match_matrix


class MatchPyramid(Ranker):
    vocab_size: int
    dim: int
    conv_output_size: Tuple[int, ...] = (16, 16, 16)
    conv_kernel_size: Tuple[Tuple[int, int], ...] = ((3, 3), (3, 3), (3, 3))
    adaptive_pooling_size: Tuple[Tuple[int, int], ...] = ((18, 90), (9, 30), (3, 10))
    pretrained_embeddings: Optional[np.ndarray] = None

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            conv_output_size=tuple(config.get("match_pyramid_conv_output_size", [16, 16, 16])),
            conv_kernel_size=tuple(tuple(k) for k in config.get("match_pyramid_conv_kernel_size", [[3, 3]] * 3)),
            adaptive_pooling_size=tuple(
                tuple(p) for p in config.get("match_pyramid_adaptive_pooling_size", [[18, 90], [9, 30], [3, 10]])
            ),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        assert len(self.conv_output_size) == len(self.conv_kernel_size) == len(self.adaptive_pooling_size)
        self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        self.convs = [
            nn.Conv(
                out_ch,
                kernel_size=k,
                padding=[(0, k[0] - 1), (0, k[1] - 1)],
                name=f"conv_{i}",
            )
            for i, (out_ch, k) in enumerate(zip(self.conv_output_size, self.conv_kernel_size))
        ]
        self.dense = nn.Dense(100, name="dense")
        self.dense2 = nn.Dense(10, name="dense2")
        self.dense3 = nn.Dense(1, use_bias=False, name="dense3")

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_emb = self.embedder(batch["query_ids"], batch["query_mask"])
        d_emb = self.embedder(batch["doc_ids"], batch["doc_mask"])
        x = cosine_match_matrix(q_emb, d_emb)[..., None]  # (B, Lq, Ld, 1)
        for conv, pool in zip(self.convs, self.adaptive_pooling_size):
            x = nn.relu(conv(x))
            x = adaptive_max_pool_2d(x, pool)
        flat = x.reshape(x.shape[0], -1)
        h = nn.relu(self.dense(flat))
        h = nn.relu(self.dense2(h))
        score = self.dense3(h).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {}
        return out
