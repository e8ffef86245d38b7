"""TK-Sparse (CIKM'20) — TK with a learned per-document-term stopword gate.

Behavior contract: reference models/published/cikm20_tk_sparse.py:9-237 —
TK contextualization; a tanh→relu MLP on the (separately mixed) document
embeddings produces a non-negative gate per doc term that multiplies the
kernel activations *after* the gaussian kernels (so the exact-match kernel
can't count removed words); the gate vector is returned for the L1 sparsity
loss; ``reanimate()`` bumps the gate bias to escape all-zero collapse.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output
from matchmaker_tpu.models.tk import TK
from matchmaker_tpu.ops.kernel_pooling import cosine_match_matrix, kernel_activations


class TKSparse(TK):
    @classmethod
    def from_config(cls, config, pretrained=None):
        base = TK.from_config(config, pretrained)
        return cls(**{f.name: getattr(base, f.name) for f in base.__dataclass_fields__.values()
                      if f.name not in ("parent", "name")})

    def setup(self):
        super().setup()
        self.mixer_stop = self.param("mixer_stop", lambda *_: jnp.full((1,), 0.5))
        self.stop_word_reducer = nn.Dense(100, name="stop_word_reducer")
        self.stop_word_reducer2 = nn.Dense(
            1, bias_init=nn.initializers.ones, name="stop_word_reducer2"
        )  # bias=1 so the gate doesn't start in a collapsed state

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_mask, d_mask = batch["query_mask"], batch["doc_mask"]
        q_emb = self.embedder(batch["query_ids"], q_mask)
        d_emb = self.embedder(batch["doc_ids"], d_mask)

        q_ctx = self.contextualize(q_emb, q_mask, self.pos_q)
        d_ctx_raw = self.contextualizer(d_emb + self.pos_d[None, : d_emb.shape[1], :], d_mask)
        d_ctx = self.mixer * d_emb + (1.0 - self.mixer) * d_ctx_raw

        joint_mask = q_mask[:, :, None] * d_mask[:, None, :]
        match = cosine_match_matrix(q_ctx, d_ctx) * joint_mask
        acts = kernel_activations(match, self.mu, self.sigma)

        # stopword gate on a separately mixed doc representation (cikm20:134-137)
        d_stop_in = self.mixer_stop * d_emb + (1.0 - self.mixer_stop) * d_ctx_raw
        gate = nn.relu(self.stop_word_reducer2(jnp.tanh(self.stop_word_reducer(d_stop_in)))).squeeze(-1)
        gate = gate * d_mask  # (B, Ld)

        acts = acts * joint_mask[..., None] * gate[:, None, :, None]
        per_kernel_query = acts.sum(axis=2) * self.kernel_alpha_scaler.reshape(1, 1, -1)
        log_pkq = jnp.log(jnp.clip(per_kernel_query, min=1e-10)) * q_mask[..., None]
        per_kernel = log_pkq.sum(axis=1)
        score = self.kernel_bin_weights(per_kernel).squeeze(-1)

        out: Output = {"score": score, "sparsity": gate}
        if output_secondary:
            out["secondary"] = {
                "per_kernel": per_kernel,
                "cosine_matrix_masked": match,
                "document_stop_words": gate,
            }
        return out


def reanimate_gate_bias(params: dict, added_bias: float) -> dict:
    """Functional ``reanimate`` (cikm20_tk_sparse.py:91): bump the gate bias."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    params["stop_word_reducer2"]["bias"] = params["stop_word_reducer2"]["bias"] + added_bias
    return params
