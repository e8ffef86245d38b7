"""Listwise losses (slates of scores per query).

Formula contract with the reference: losses/listnet.py:5-32,
teacher_kldiv_list.py:4-14, loss_smooth_mrr.py:4-33, soft_crossentropy.py:4-25,
lambdarank.py:6-134 (allRank-style LambdaLoss framework with the
ndcgLoss1/ndcgLoss2/lambdaRank/ndcgLoss2++ weighing schemes).

All functions take (B, N) score/label matrices plus an optional (B, N)
``valid`` mask for padded slate entries.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-6
_NEG_BIG = -1e9


def _masked_softmax(x, valid, axis=-1):
    if valid is not None:
        x = jnp.where(valid > 0, x, _NEG_BIG)
    return jax.nn.softmax(x, axis=axis)


def listnet(y_pred, y_true, valid=None):
    """Cross entropy between score softmax and label softmax (listnet.py:12-32)."""
    p = _masked_softmax(y_pred, valid) + _EPS
    t = _masked_softmax(y_true, valid)
    return jnp.mean(-jnp.sum(t * jnp.log(p), axis=1))


def kldiv_teacher_list(y_pred, y_true, valid=None):
    """torch KLDivLoss(batchmean)(softmax(scores), softmax(labels))
    (teacher_kldiv_list.py:4-14). Note the reference feeds *probabilities* (not
    log-probs) as input, so we replicate target*(log(target)-input)."""
    p = _masked_softmax(y_pred, valid)
    t = _masked_softmax(y_true, valid)
    per = t * (jnp.log(jnp.maximum(t, 1e-10)) - p)
    return per.sum() / y_pred.shape[0]


def smooth_rank(scores):
    """Differentiable ranks via pairwise sigmoids (loss_smooth_mrr.py:4-16)."""
    diff = scores[..., None, :] - scores[..., :, None]
    return jax.nn.sigmoid(diff).sum(axis=-1) + 0.5


def smooth_mrr(scores, labels, valid=None):
    """1 - max(label/soft_rank) (loss_smooth_mrr.py:18-33)."""
    ranks = smooth_rank(scores)
    binary = (labels > 0).astype(scores.dtype)
    if valid is not None:
        binary = binary * valid
    rr = binary / ranks
    return jnp.mean(1.0 - rr.max(axis=-1))


def soft_cross_entropy(logits, target, valid=None):
    """CE with soft target distribution (soft_crossentropy.py:4-25)."""
    logits = logits.reshape(logits.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    if valid is not None:
        logits = jnp.where(valid.reshape(valid.shape[0], -1) > 0, logits, _NEG_BIG)
    logp = jax.nn.log_softmax(logits, axis=1)
    return jnp.mean(-jnp.sum(target * logp, axis=1))


def _lambda_weights(scheme: str, G, D, mu, true_sorted):
    n = G.shape[1]
    if scheme == "ndcgLoss1":
        return (G / D)[:, :, None]
    if scheme == "ndcgLoss2":
        pos = jnp.arange(1, n + 1)
        delta_idx = jnp.abs(pos[:, None] - pos[None, :])
        # |1/D_{|i-j|}| - |1/D_{|i-j|+1}| with the diagonal zeroed
        d_row = D[0]
        deltas = jnp.abs(1.0 / jnp.abs(d_row[delta_idx - 1]) - 1.0 / jnp.abs(d_row[delta_idx]))
        deltas = deltas * (1.0 - jnp.eye(n))
        return deltas[None, :, :] * jnp.abs(G[:, :, None] - G[:, None, :])
    if scheme == "lambdaRank":
        return jnp.abs(1.0 / D[:, :, None] - 1.0 / D[:, None, :]) * jnp.abs(G[:, :, None] - G[:, None, :])
    if scheme == "ndcgLoss2PP":
        return mu * _lambda_weights("ndcgLoss2", G, D, mu, true_sorted) + _lambda_weights(
            "lambdaRank", G, D, mu, true_sorted
        )
    if scheme == "rankNet":
        return jnp.ones((1, 1, 1))
    raise ValueError(f"unknown LambdaLoss scheme '{scheme}'")


def lambda_loss(
    y_pred,
    y_true,
    valid=None,
    scheme: str = "ndcgLoss2",
    k: Optional[int] = None,
    sigma: float = 1.0,
    mu: float = 10.0,
    eps: float = _EPS,
    reduction: str = "sum",
):
    """LambdaLoss framework (lambdarank.py:44-121), jit-friendly:
    static slate length, padding via ``valid`` mask instead of -inf writes."""
    b, n = y_pred.shape
    if valid is None:
        valid = jnp.ones_like(y_pred)
    y_pred_m = jnp.where(valid > 0, y_pred, _NEG_BIG)
    y_true_m = jnp.where(valid > 0, y_true, _NEG_BIG)

    order = jnp.argsort(-y_pred_m, axis=1)
    y_pred_sorted = jnp.take_along_axis(y_pred_m, order, axis=1)
    true_sorted_by_preds = jnp.take_along_axis(y_true_m, order, axis=1)
    valid_sorted = jnp.take_along_axis(valid, order, axis=1)
    y_true_sorted = -jnp.sort(-y_true_m, axis=1)

    true_diffs = true_sorted_by_preds[:, :, None] - true_sorted_by_preds[:, None, :]
    pair_mask = (valid_sorted[:, :, None] * valid_sorted[:, None, :]) > 0
    if scheme != "ndcgLoss1":
        pair_mask = pair_mask & (true_diffs > 0)

    k_eff = k if k is not None else n
    at_k = jnp.zeros((n, n), dtype=bool).at[:k_eff, :k_eff].set(True)

    tsp = jnp.clip(jnp.where(valid_sorted > 0, true_sorted_by_preds, 0.0), min=0.0)
    yts = jnp.clip(jnp.where(y_true_sorted > _NEG_BIG / 2, y_true_sorted, 0.0), min=0.0)

    pos_idx = jnp.arange(1, n + 1, dtype=y_pred.dtype)
    D = jnp.log2(1.0 + pos_idx)[None, :]
    max_dcg = jnp.clip(((2.0**yts - 1.0) / D)[:, :k_eff].sum(axis=-1), min=eps)
    G = (2.0**tsp - 1.0) / max_dcg[:, None]

    weights = _lambda_weights(scheme, G, D, mu, true_sorted_by_preds)

    score_diffs = jnp.clip(y_pred_sorted[:, :, None] - y_pred_sorted[:, None, :], -1e4, 1e4)
    weighted_probs = jnp.clip(
        jnp.clip(jax.nn.sigmoid(sigma * score_diffs), min=eps) ** weights, min=eps
    )
    losses = jnp.log2(weighted_probs)
    masked = losses * pair_mask * at_k[None, :, :]
    if reduction == "sum":
        return -masked.sum()
    return -masked.sum() / jnp.maximum((pair_mask * at_k[None]).sum(), 1.0)


def lambda_loss_teacher(y_pred, teacher_scores, valid=None, scheme: str = "ndcgLoss2", **kw):
    """LambdaLossTeacher (lambdarank.py:122-134): teacher scores → softmax,
    boost entries > 0.001 by +2, then run LambdaLoss on the result."""
    t = _masked_softmax(teacher_scores, valid)
    t = jnp.where(t > 0.001, t + 2.0, t)
    return lambda_loss(y_pred, jax.lax.stop_gradient(t), valid=valid, scheme=scheme, **kw)
