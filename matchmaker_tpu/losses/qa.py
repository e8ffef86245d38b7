"""Extractive-QA span + answerability losses.

Contract: reference losses/QA_StartEndCrossEntropy.py:6-35 — cross entropy on
start/end span logits averaged over up to S gold spans per sample (label -1 =
no span → ignored), plus a separate answerability CE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ce_ignore_index(logits: jnp.ndarray, labels: jnp.ndarray, ignore: int = -1) -> jnp.ndarray:
    """Mean cross entropy over samples whose label != ignore."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.clip(labels, min=0)
    picked = jnp.take_along_axis(logp, safe[:, None], axis=-1).squeeze(-1)
    mask = (labels != ignore).astype(logits.dtype)
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def qa_start_end_cross_entropy(
    start_logits: jnp.ndarray,  # (B, L)
    end_logits: jnp.ndarray,  # (B, L) or (B, S, L)
    start_labels: jnp.ndarray,  # (B, S)
    end_labels: jnp.ndarray,  # (B, S)
    answerability_logits=None,  # (B, C)
    answerability_labels=None,  # (B,)
):
    """Returns (span_loss, answerability_loss); either may be None."""
    span_loss = None
    if start_logits is not None:
        n_spans = start_labels.shape[1]
        start_terms = []
        end_terms = []
        for s in range(n_spans):
            start_terms.append(_ce_ignore_index(start_logits, start_labels[:, s]))
            end_s = end_logits[:, s] if end_logits.ndim == 3 else end_logits
            end_terms.append(_ce_ignore_index(end_s, end_labels[:, s]))
        span_loss = (jnp.stack(start_terms).mean() + jnp.stack(end_terms).mean()) / 2.0
    answer_loss = None
    if answerability_logits is not None:
        answer_loss = _ce_ignore_index(answerability_logits, answerability_labels)
    return span_loss, answer_loss
