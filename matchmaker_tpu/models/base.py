"""Model API conventions.

Every ranker is a ``flax.linen.Module`` whose ``__call__`` consumes a batch
dict and returns an output dict — a uniform, jit-friendly contract replacing
the reference's per-model forward signatures (models/all.py + per-model files):

batch keys (independent input):   query_ids, query_mask, doc_ids, doc_mask
batch keys (concatenated input):  seq_ids, seq_mask, seq_type_ids

output keys:
  "score"       (B,)  — always present
  "query_vecs"  (B, D) or (B, Lq, D)  — bi-encoders, for in-batch negatives
  "doc_vecs"    (B, D) or (B, Ld, D)
  "sparsity"    (B, Ld) — TK-Sparse stopword gates, fed to the L1 loss
  "secondary"   dict of interpretability tensors (only when output_secondary)

Representation methods for the retrieval runtime (reference
forward_representation / forward_aggregation, e.g. models/bert_dot.py:72-81,
colbert.py:100):
  encode(ids, mask, sequence_type)  → per-sequence vectors
  aggregate(q_reps, d_reps, q_mask, d_mask) → scores (late-interaction models)
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

Batch = Dict[str, jnp.ndarray]
Output = Dict[str, Any]


class Ranker(nn.Module):
    """Marker base class; see module docstring for the API contract."""

    def encode(self, ids: jnp.ndarray, mask: jnp.ndarray, sequence_type: str = "doc") -> jnp.ndarray:
        raise NotImplementedError(f"{type(self).__name__} is not a dense encoder")

    def aggregate(self, q_reps, d_reps, q_mask=None, d_mask=None) -> jnp.ndarray:
        raise NotImplementedError(f"{type(self).__name__} has no late-interaction aggregation")
