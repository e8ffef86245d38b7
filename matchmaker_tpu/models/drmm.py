"""DRMM — histogram matching with term gating (Guo et al., CIKM'16).

Behavior contract: reference models/drmm.py:17-120 — per-query-term histogram
of cosine similarities over ``bin_count`` bins on [-1, 1], log1p, 2-layer tanh
MLP; query gate = 2-layer tanh MLP on the query embedding → masked softmax;
score = gated sum.

TPU shape: the reference computes histograms with ``torch.histc`` per (batch,
query) element **on the CPU** (drmm.py:66-72). Here the histogram is a
one-hot bucketize matmul on device — (B,Lq,Ld) digitized bins → (B,Lq,bins)
via segment-sum — so the whole model stays inside one XLA program.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.modules.embedder import TokenEmbedder
from matchmaker_tpu.modules.pooling import masked_softmax
from matchmaker_tpu.ops.kernel_pooling import cosine_match_matrix


class DRMM(Ranker):
    vocab_size: int
    dim: int
    bin_count: int = 30
    pretrained_embeddings: Optional[np.ndarray] = None

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            vocab_size=config["_vocab_size"],
            dim=config.get("token_embedding_size", 300),
            bin_count=config.get("drmm_bins", 30),
            pretrained_embeddings=pretrained,
        )

    def setup(self):
        self.embedder = TokenEmbedder(self.vocab_size, self.dim, pretrained=self.pretrained_embeddings)
        self.match_hidden = nn.Dense(self.bin_count, name="match_hidden")
        self.match_out = nn.Dense(1, name="match_out")
        self.gate_hidden = nn.Dense(self.dim, name="gate_hidden")
        self.gate_out = nn.Dense(1, name="gate_out")

    def _histogram(self, match: jnp.ndarray, d_mask: jnp.ndarray) -> jnp.ndarray:
        """(B,Lq,Ld) cosines → (B,Lq,bins) counts over [-1,1] (histc semantics:
        values on the top edge land in the last bin)."""
        bins = self.bin_count
        idx = jnp.clip(jnp.floor((match + 1.0) * (bins / 2.0)).astype(jnp.int32), 0, bins - 1)
        one_hot = jax.nn.one_hot(idx, bins, dtype=match.dtype)
        return (one_hot * d_mask[:, None, :, None]).sum(axis=2)

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask)
        d_emb = self.embedder(batch["doc_ids"], d_mask)
        match = cosine_match_matrix(q_emb, d_emb)

        hist = jnp.log1p(self._histogram(match, d_mask))
        h = jnp.tanh(self.match_hidden(hist))
        matches_per_query = jnp.tanh(self.match_out(h))  # (B, Lq, 1)

        gate_raw = jnp.tanh(self.gate_out(jnp.tanh(self.gate_hidden(q_emb)))).squeeze(-1)
        gates = masked_softmax(gate_raw, q_mask, axis=1)[..., None]

        score = (matches_per_query * gates).sum(axis=1).squeeze(-1)
        out: Output = {"score": score}
        if output_secondary:
            out["secondary"] = {"histogram": hist, "query_gates": gates.squeeze(-1)}
        return out
