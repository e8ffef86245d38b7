"""ColBERT — late-interaction ranking (Khattab & Zaharia, SIGIR'20).

Behavior contract: reference models/colbert.py:25-162 — per-token encoder
vectors, linear compression to ``colbert_compression_dim``, MaxSim scoring
(ops/maxsim.py), vectors zeroed by mask when encoding for storage
(``sequence_type="doc_encode"/"query_encode"``), in-batch all-pairs scoring
for the dynamic-teacher path, ``is_teacher_model`` returning per-term vectors.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM, encoder_config_from_model_name
from matchmaker_tpu.ops.maxsim import maxsim_all_pairs, maxsim_pairwise


class ColBert(Ranker):
    encoder_cfg: EncoderConfig
    compression_dim: int = 768
    return_vecs: bool = True
    return_per_term: bool = False  # per-query-term MaxSim scores (teacher/term distillation)
    compute_dtype: jnp.dtype = jnp.bfloat16
    # L2-normalize token vectors (cosine MaxSim) — the ORIGINAL ColBERT
    # formulation (Khattab & Zaharia '20 §3.2); the reference variant ships it
    # commented out (colbert.py:62-63) because it starts from pretrained
    # weights whose geometry tolerates raw dots. Config
    # ``colbert_normalize: true``; essential when bootstrapping from weak
    # warmstarts: raw-encoder token dots carry a huge anisotropic common mode
    # (measured |s|~7000 at margins <1 — ranking training spends its whole
    # gradient budget deflating it; teacher accuracy stuck ~0.5)
    normalize: bool = False

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            compression_dim=config.get("colbert_compression_dim", 768),
            return_vecs=config.get("in_batch_negatives", False),
            return_per_term=config.get("dynamic_teacher_per_term_scores", False)
            or config.get("colbert_per_term_scores", False),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
            normalize=config.get("colbert_normalize", False),
        )

    def setup(self):
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")
        self.compressor = nn.Dense(self.compression_dim, name="compressor")

    def encode(self, ids: jnp.ndarray, mask: jnp.ndarray, sequence_type: str = "n/a") -> jnp.ndarray:
        vecs = self.compressor(self.encoder(ids, mask))
        if self.normalize:
            vecs = vecs / jnp.maximum(
                jnp.linalg.norm(vecs.astype(jnp.float32), axis=-1, keepdims=True), 1e-6
            ).astype(vecs.dtype)
        if sequence_type in ("doc_encode", "query_encode"):
            vecs = vecs * mask[..., None]
        return vecs

    def aggregate(self, q_reps, d_reps, q_mask=None, d_mask=None) -> jnp.ndarray:
        """Score pre-encoded vectors (reference forward_aggregation,
        colbert.py:100-112): padding already zeroed at encode time."""
        per_term = jnp.einsum("bqd,bkd->bqk", q_reps, d_reps, preferred_element_type=jnp.float32)
        return per_term.max(axis=-1).sum(axis=-1)

    def inbatch_aggregate(self, q_vecs, q_mask, d_vecs, d_mask) -> jnp.ndarray:
        """(Bq, Bd) all-pairs MaxSim (reference forward_inbatch_aggregation,
        colbert.py:114-162) — used by the dynamic teacher."""
        return maxsim_all_pairs(q_vecs, d_vecs, q_mask, d_mask)

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_vecs = self.encode(batch["query_ids"], batch["query_mask"])
        d_vecs = self.encode(batch["doc_ids"], batch["doc_mask"])
        score = maxsim_pairwise(q_vecs, d_vecs, batch["query_mask"], batch["doc_mask"])
        out: Output = {"score": score}
        if self.return_per_term:
            # per-query-token max-sim contribution (reference colbert.py per-term
            # scores used by the dynamic teacher, dynamic_teacher.py:262-267)
            per_term = jnp.einsum(
                "bqd,bkd->bqk", q_vecs, d_vecs, preferred_element_type=jnp.float32
            )
            per_term = jnp.where(batch["doc_mask"][:, None, :] > 0, per_term, -1000.0)
            out["per_term_scores"] = per_term.max(axis=-1) * batch["query_mask"]
        if self.return_vecs:
            out["query_vecs"] = q_vecs
            out["doc_vecs"] = d_vecs
            out["query_vecs_mask"] = batch["query_mask"]
            out["doc_vecs_mask"] = batch["doc_mask"]
        if output_secondary:
            out["secondary"] = {}
        return out

    def forward_triple(self, batch: Batch):
        """Packed triple forward (see BertDot.forward_triple): query tokens
        encoded once, pos+neg docs packed into one 2B-row encoder pass; the
        MaxSim interaction runs per half (its FLOPs are pairwise either way)."""
        q_vecs = self.encode(batch["query_ids"], batch["query_mask"])
        d_ids = jnp.concatenate([batch["doc_pos_ids"], batch["doc_neg_ids"]], axis=0)
        d_mask = jnp.concatenate([batch["doc_pos_mask"], batch["doc_neg_mask"]], axis=0)
        d_vecs = self.encode(d_ids, d_mask)
        b = q_vecs.shape[0]
        halves = {}
        for name, sl in (("pos", slice(0, b)), ("neg", slice(b, 2 * b))):
            dv, dm = d_vecs[sl], d_mask[sl]
            out: Output = {"score": maxsim_pairwise(q_vecs, dv, batch["query_mask"], dm)}
            if self.return_per_term:
                per_term = jnp.einsum(
                    "bqd,bkd->bqk", q_vecs, dv, preferred_element_type=jnp.float32
                )
                per_term = jnp.where(dm[:, None, :] > 0, per_term, -1000.0)
                out["per_term_scores"] = per_term.max(axis=-1) * batch["query_mask"]
            if self.return_vecs:
                out["query_vecs"] = q_vecs
                out["doc_vecs"] = dv
                out["query_vecs_mask"] = batch["query_mask"]
                out["doc_vecs_mask"] = dm
            halves[name] = out
        return halves["pos"], halves["neg"]
