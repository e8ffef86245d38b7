"""IDCM (SIGIR'21) — intra-document cascade: cheap CK selection → BERT on top chunks.

Behavior contract: reference models/published/sigir21_idcm.py:11-583 —
document chunked (idcm_chunk_size 50 + 2·7 overlap); a cheap sampler (CK: CNN
over detached embeddings → L2-normalize → fixed 11-kernel pooling with 1e-4
clamp → linear) scores every chunk; the top ``sample_n`` chunks are scored by
the full BERT_CAT head; final score = learned-weight sum over the sorted top
``top_k_chunks`` BERT scores. Selection training: MSE / KLDiv / soft-CE /
LambdaLoss between sampler scores and (detached) BERT chunk scores.

TPU shape: selection is a static ``lax.top_k`` + gather to a fixed
(B·sample_n) BERT batch — the reference's eval-only dynamic packing
(sigir21_idcm.py:186-196) becomes the *always-on* static fast path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from matchmaker_tpu.models.base import Batch, Output, Ranker
from matchmaker_tpu.models.adapters import chunk_document
from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM, encoder_config_from_model_name
from matchmaker_tpu.losses.listwise import kldiv_teacher_list, lambda_loss, soft_cross_entropy

NEG_SENTINEL = -9000.0

_CK_MUS = [1.0, 0.9, 0.7, 0.5, 0.3, 0.1, -0.1, -0.3, -0.5, -0.7, -0.9]
_CK_SIGMAS = [0.1] * 11


class IDCM(Ranker):
    encoder_cfg: EncoderConfig
    chunk_size: int = 50
    overlap: int = 7
    top_k_chunks: int = 3
    sample_n: int = 3  # -1 = no cascade (BERT on all chunks)
    sample_context: str = "ck"  # ck | ck-small | tk
    sample_train_type: str = "kldivloss"  # mseloss | kldivloss | crossentropy | lambdaloss
    train_selection: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_config(cls, config, pretrained=None):
        return cls(
            encoder_cfg=encoder_config_from_model_name(config),
            chunk_size=config.get("idcm_chunk_size", 50),
            overlap=config.get("idcm_overlap", 7),
            top_k_chunks=config.get("idcm_top_k_chunks", 3),
            sample_n=config.get("idcm_sample_n", 3),
            sample_context=config.get("idcm_sample_context", "ck"),
            sample_train_type=config.get("idcm_sample_train_type", "kldivloss"),
            train_selection=config.get("idcm_train_selection", False),
            compute_dtype=jnp.bfloat16 if config.get("use_fp16", True) else jnp.float32,
        )

    def setup(self):
        h = self.encoder_cfg.hidden_size
        self.encoder = TransformerEncoderLM(self.encoder_cfg, self.compute_dtype, name="encoder")
        self.classification_layer = nn.Dense(1, name="classification_layer")
        self.top_k_scoring = self.param("top_k_scoring", lambda *_: jnp.ones((1, self.top_k_chunks)))

        if self.sample_context == "ck-small":
            self.sample_projector = nn.Dense(384, name="sample_projector")
            self.sample_cnn3 = nn.Conv(128, kernel_size=(3,), padding=[(0, 2)], name="sample_cnn3")
        elif self.sample_context == "ck":
            self.sample_cnn3 = nn.Conv(h, kernel_size=(3,), padding=[(0, 2)], name="sample_cnn3")
        else:  # tk
            from matchmaker_tpu.modules.transformer import TransformerEncoder

            self.tk_projector = nn.Dense(384, name="tk_projector")
            self.tk_contextualizer = TransformerEncoder(1, 384, 8, 384, name="tk_contextualizer")
        self.sampling_binweights = nn.Dense(
            1,
            kernel_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(key, shape, dtype, -0.01, 0.01),
            name="sampling_binweights",
        )
        self.ck_alpha_scaler = self.param("kernel_alpha_scaler", lambda *_: jnp.ones((1, 1, 11)))
        self.ck_mu = jnp.asarray(_CK_MUS)
        self.ck_sigma = jnp.asarray(_CK_SIGMAS)

    # ------------------------------------------------------------------
    def _ck_context(self, ids, mask):
        emb = jax.lax.stop_gradient(self.encoder.embed(ids))
        if self.sample_context == "ck-small":
            ctx = nn.relu(self.sample_cnn3(self.sample_projector(emb)))
        elif self.sample_context == "ck":
            ctx = nn.relu(self.sample_cnn3(emb))
        else:
            ctx = self.tk_contextualizer(self.tk_projector(emb), mask)
        return ctx * jax.lax.rsqrt((ctx**2).sum(-1, keepdims=True) + 1e-8)

    def _sampling_scores(self, q_ids, q_mask, chunk_ids, chunk_mask):
        """CK kernel-pooling chunk scores: (B·C,)"""
        q_ctx = self._ck_context(q_ids, q_mask)
        d_ctx = self._ck_context(chunk_ids, chunk_mask)
        match = jnp.einsum("bqd,bkd->bqk", q_ctx, d_ctx, preferred_element_type=jnp.float32)
        acts = jnp.exp(
            -((match[..., None] - self.ck_mu.reshape(1, 1, 1, -1)) ** 2)
            / (2 * self.ck_sigma.reshape(1, 1, 1, -1) ** 2)
        ) * chunk_mask[:, None, :, None]
        kernel_res = jnp.log(jnp.clip(acts.sum(axis=2) * self.ck_alpha_scaler, min=1e-4))
        kernel_res = kernel_res * q_mask[..., None]
        return self.sampling_binweights(kernel_res.sum(axis=1)).squeeze(-1)

    def _bert_chunk_scores(self, q_ids, q_mask, chunk_ids, chunk_mask):
        seq_ids = jnp.concatenate([q_ids, chunk_ids], axis=1)
        seq_mask = jnp.concatenate([q_mask, chunk_mask], axis=1)
        cls_vec = self.encoder(seq_ids, seq_mask)[:, 0, :]
        return self.classification_layer(cls_vec).squeeze(-1)

    def _final_score(self, chunk_scores, valid_chunks):
        """Sorted top-k weighted sum with empty-chunk sentinel handling."""
        masked = jnp.where(valid_chunks, chunk_scores, NEG_SENTINEL)
        if masked.shape[1] < self.top_k_chunks:
            masked = jnp.pad(masked, ((0, 0), (0, self.top_k_chunks - masked.shape[1])), constant_values=NEG_SENTINEL)
        top = jax.lax.top_k(masked, self.top_k_chunks)[0]
        top = jnp.where(top <= NEG_SENTINEL + 100.0, 0.0, top)
        return (top * self.top_k_scoring).sum(axis=1)

    # ------------------------------------------------------------------
    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        q_ids, q_mask = batch["query_ids"], batch["query_mask"]
        chunks, mask_chunks, non_empty = chunk_document(
            batch["doc_ids"], batch["doc_mask"], self.chunk_size, self.overlap
        )
        b, c, ext = chunks.shape
        flat_ids = chunks.reshape(b * c, ext)
        flat_mask = mask_chunks.reshape(b * c, ext)
        rep_q_ids = jnp.repeat(q_ids, c, axis=0)
        rep_q_mask = jnp.repeat(q_mask, c, axis=0)

        out: Output = {}

        if self.sample_n > -1:
            sampling = self._sampling_scores(rep_q_ids, rep_q_mask, flat_ids, flat_mask).reshape(b, c)
            sampling = sampling * non_empty
            sampling_masked = jnp.where(non_empty, sampling, NEG_SENTINEL)
            out["sampling_scores"] = sampling

        if self.sample_n > -1 and not self.train_selection:
            # cascade fast path: BERT only on the statically-selected top chunks
            k = min(self.sample_n, c)
            sel_idx = jax.lax.top_k(sampling_masked, k)[1]  # (B, k)
            sel_flat = sel_idx + jnp.arange(b)[:, None] * c
            sel_ids = flat_ids[sel_flat.reshape(-1)]
            sel_mask = flat_mask[sel_flat.reshape(-1)]
            sel_valid = jnp.take_along_axis(non_empty, sel_idx, axis=1)
            bert_scores = self._bert_chunk_scores(
                jnp.repeat(q_ids, k, axis=0), jnp.repeat(q_mask, k, axis=0), sel_ids, sel_mask
            ).reshape(b, k)
            bert_scores = jax.lax.stop_gradient(bert_scores)
            score = self._final_score(bert_scores, sel_valid)
            out["score"] = score
            out["passage_scores"] = bert_scores * sel_valid
        else:
            # full path: BERT on all chunks (stage-2 training / sample_n == -1);
            # ``bert_part_cached`` replays scores from the cross-experiment
            # cache instead of recomputing (reference sigir21_idcm.py:203-230,
            # wired through utils/replay_cache + evaluation.evaluate_model)
            if "bert_part_cached" in batch:
                bert_scores = batch["bert_part_cached"]
            else:
                bert_scores = self._bert_chunk_scores(
                    rep_q_ids, rep_q_mask, flat_ids, flat_mask
                ).reshape(b, c)
            if self.sample_n > -1:
                bert_scores = jax.lax.stop_gradient(bert_scores)
            score = self._final_score(bert_scores, non_empty)
            out["score"] = score
            out["passage_scores"] = bert_scores * non_empty

            if self.sample_n > -1 and self.train_selection:
                target = jax.lax.stop_gradient(bert_scores * non_empty)
                valid = non_empty.astype(jnp.float32)
                if self.sample_train_type == "mseloss":
                    sel_loss = (((sampling - target) * valid) ** 2).sum() / jnp.maximum(valid.sum(), 1.0)
                elif self.sample_train_type == "kldivloss":
                    sel_loss = kldiv_teacher_list(sampling, target, valid)
                elif self.sample_train_type == "crossentropy":
                    sel_loss = soft_cross_entropy(sampling, jax.nn.softmax(jnp.where(valid > 0, target, NEG_SENTINEL), -1), valid)
                elif self.sample_train_type == "lambdaloss":
                    ranks = jnp.argsort(jnp.argsort(-jnp.where(valid > 0, target, NEG_SENTINEL), axis=1), axis=1)
                    gains = jnp.clip(self.sample_n - ranks, 0, None).astype(jnp.float32) * valid
                    sel_loss = lambda_loss(sampling, gains, valid, scheme="ndcgLoss2")
                else:
                    raise ValueError(f"unknown sample_train_type {self.sample_train_type}")
                out["selection_loss"] = sel_loss

        if output_secondary:
            out["secondary"] = {
                "packed_indices": non_empty,
                "bert_scores": out["passage_scores"],
                "sampling_scores": out.get("sampling_scores", jnp.zeros((b, c))),
            }
        return out


class IDCMInferenceOnly(IDCM):
    """Exportable cascade-only variant (reference sigir21_idcm.py:333)."""

    def __call__(self, batch: Batch, output_secondary: bool = False) -> Output:
        return super().__call__(batch, output_secondary)
