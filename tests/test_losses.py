"""Loss tests: hand-computed values + parity fuzz vs the reference (torch)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from matchmaker_tpu.losses import (
    get_loss,
    lambda_loss,
    listnet,
    margin_mse,
    margin_ranking,
    merge_loss,
    mse_teacher_pointwise,
    ranknet,
    smooth_mrr,
)

REF_LOSSES = "/root/reference/matchmaker/losses"


def _ref_module(fname):
    path = os.path.join(REF_LOSSES, fname)
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_" + fname[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_margin_mse_hand():
    pos = jnp.array([2.0, 1.0])
    neg = jnp.array([1.0, 0.0])
    t_pos = jnp.array([3.0, 1.0])
    t_neg = jnp.array([1.0, 0.5])
    valid = jnp.ones(2)
    # margins: model (1,1), teacher (2,0.5) → ((1-2)^2 + (1-0.5)^2)/2
    expected = ((1 - 2) ** 2 + (1 - 0.5) ** 2) / 2
    assert float(margin_mse(pos, neg, t_pos, t_neg, valid)) == pytest.approx(expected)


def test_margin_mse_mask_excludes_padding():
    pos = jnp.array([2.0, 100.0])
    neg = jnp.array([1.0, -100.0])
    t = jnp.zeros(2)
    valid = jnp.array([1.0, 0.0])
    assert float(margin_mse(pos, neg, t, t, valid)) == pytest.approx(1.0)


def test_ranknet_hand():
    pos = jnp.array([1.0])
    neg = jnp.array([0.0])
    valid = jnp.ones(1)
    expected = float(np.log1p(np.exp(-1.0)))
    assert float(ranknet(pos, neg, None, None, valid)) == pytest.approx(expected, rel=1e-4)


def test_margin_ranking_hand():
    pos = jnp.array([0.2])
    neg = jnp.array([0.0])
    valid = jnp.ones(1)
    assert float(margin_ranking(pos, neg, None, None, valid)) == pytest.approx(0.8)


def test_merge_loss_uncertainty_weighting():
    losses = [jnp.array(2.0), jnp.array(4.0)]
    log_vars = jnp.array([0.0, np.log(2.0)])
    total, weighted = merge_loss(losses, log_vars)
    assert float(total) == pytest.approx(2.0 + (4.0 / 2.0 + np.log(2.0)))


def test_get_loss_dispatch():
    bundle = get_loss({"loss": "margin-mse"})
    assert bundle.ranking_loss is margin_mse
    assert not bundle.use_list_loss
    bundle = get_loss({"loss": "listnet"})
    assert bundle.use_list_loss
    bundle = get_loss(
        {"loss": "margin-mse", "in_batch_negatives": True, "in_batch_neg_loss": "KLDivTeacherList"}
    )
    assert bundle.use_inbatch_list_loss
    with pytest.raises(ValueError):
        get_loss({"loss": "nope"})


# ---------------------------------------------------------------------------
# parity vs reference torch implementations
# ---------------------------------------------------------------------------


def test_margin_mse_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _ref_module("msmargin.py")
    pos, neg, tp, tn = (rng.normal(size=16).astype(np.float32) for _ in range(4))
    ours = float(margin_mse(jnp.array(pos), jnp.array(neg), jnp.array(tp), jnp.array(tn), jnp.ones(16)))
    theirs = float(
        ref.MSMarginLoss()(torch.tensor(pos), torch.tensor(neg), torch.tensor(tp), torch.tensor(tn))
    )
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_listnet_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _ref_module("listnet.py")
    scores = rng.normal(size=(4, 9)).astype(np.float32)
    labels = rng.normal(size=(4, 9)).astype(np.float32)
    ours = float(listnet(jnp.array(scores), jnp.array(labels)))
    theirs = float(ref.ListNetLoss()(torch.tensor(scores), torch.tensor(labels)))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_smooth_mrr_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _ref_module("loss_smooth_mrr.py")
    scores = rng.normal(size=(4, 9)).astype(np.float32)
    labels = (rng.random(size=(4, 9)) > 0.7).astype(np.float32)
    ours = float(smooth_mrr(jnp.array(scores), jnp.array(labels)))
    theirs = float(ref.SmoothMRRLoss()(torch.tensor(scores), torch.tensor(labels)))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_lambda_loss_parity(rng):
    torch = pytest.importorskip("torch")
    ref = _ref_module("lambdarank.py")
    scores = rng.normal(size=(3, 8)).astype(np.float32)
    labels = rng.integers(0, 3, size=(3, 8)).astype(np.float32)
    ours = float(lambda_loss(jnp.array(scores), jnp.array(labels), scheme="ndcgLoss2"))
    theirs = float(
        ref.LambdaLoss("ndcgLoss2_scheme")(torch.tensor(scores), torch.tensor(labels))
    )
    assert ours == pytest.approx(theirs, rel=1e-4)
