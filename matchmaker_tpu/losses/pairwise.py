"""Pairwise (triple-based) ranking losses.

Formula contract with the reference (`matchmaker/losses/*`, see SURVEY.md §2.5);
every function adds a ``valid`` mask argument so the fixed-shape padded rows of
a TPU batch don't contribute to the mean.

Uniform signature: ``loss(pos, neg, t_pos, t_neg, valid) -> scalar`` where
``t_pos/t_neg`` are teacher scores (ignored by teacher-free losses) and
``valid`` is a (B,) 0/1 mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return (x * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def _bce_with_logits(logits, targets, weight=None):
    # numerically stable binary cross entropy on logits
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        per = per * weight
    return per


def margin_mse(pos, neg, t_pos, t_neg, valid):
    """Margin-MSE (Hofstätter et al.): mean(((s+ - s-) - (t+ - t-))^2).
    Reference: losses/msmargin.py:4-14."""
    return _masked_mean(((pos - neg) - (t_pos - t_neg)) ** 2, valid)


def margin_mse_interpassage(pos_psg, neg_psg, t_pos_psg, t_neg_psg, valid):
    """All-pairs margins across per-passage score matrices (B, P).
    Reference: losses/msmargin.py:16-26."""
    p = pos_psg.shape[1]
    margins = pos_psg[:, :, None] - neg_psg[:, None, :]
    t_margins = t_pos_psg[:, :p, None] - t_neg_psg[:, None, :p]
    sq = (margins - t_margins) ** 2
    return _masked_mean(sq.reshape(sq.shape[0], -1).mean(axis=-1), valid)


def mse_teacher_pointwise(pos, neg, t_pos, t_neg, valid):
    """Pointwise MSE against teacher scores (losses/teacher_mse_pointwise.py:4-14)."""
    return 0.5 * (_masked_mean((pos - t_pos) ** 2, valid) + _masked_mean((neg - t_neg) ** 2, valid))


def mse_teacher_pointwise_passages(pos_psg, neg_psg, t_pos_psg, t_neg_psg, valid):
    """Per-passage pointwise MSE, masking zero teacher entries
    (losses/teacher_mse_pointwise.py:16-30)."""
    def one_side(scores, labels):
        labels = labels[:, : scores.shape[1]]
        mask = (labels != 0).astype(scores.dtype) * valid[:, None]
        return ((scores - labels) ** 2 * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    return 0.5 * (one_side(pos_psg, t_pos_psg) + one_side(neg_psg, t_neg_psg))


def kldiv_teacher_pointwise(pos, neg, t_pos, t_neg, valid):
    """Pointwise KLDiv vs teacher scores (torch KLDivLoss semantics:
    target * (log(target) - input); losses/teacher_kldiv_pointwise.py:4-14)."""
    def kl(inp, tgt):
        return _masked_mean(tgt * (jnp.log(jnp.maximum(tgt, 1e-10)) - inp), valid)

    return 0.5 * (kl(pos, t_pos) + kl(neg, t_neg))


def ranknet(pos, neg, t_pos, t_neg, valid):
    """RankNet: BCE on the score difference with target 1 (losses/ranknet.py:4-17)."""
    x = pos - neg
    return _masked_mean(_bce_with_logits(x, jnp.ones_like(x)), valid)


def ranknet_teacher(pos, neg, t_pos, t_neg, valid):
    """RankNet weighted by the teacher margin (losses/teacher_ranknetweighted.py:6-18)."""
    x = pos - neg
    w = t_pos - t_neg
    return _masked_mean(_bce_with_logits(x, jnp.ones_like(x), weight=w), valid)


def mse_ranknet_teacher(pos, neg, t_pos, t_neg, valid):
    """Pointwise MSE + RankNet hybrid (losses/teacher_mse_ranknet.py:4-14)."""
    return mse_teacher_pointwise(pos, neg, t_pos, t_neg, valid) + ranknet(pos, neg, t_pos, t_neg, valid)


def margin_ranking(pos, neg, t_pos, t_neg, valid, margin: float = 1.0):
    """Hinge on the margin (torch MarginRankingLoss(margin=1); losses/all.py:47-48)."""
    return _masked_mean(jnp.maximum(0.0, margin - (pos - neg)), valid)
