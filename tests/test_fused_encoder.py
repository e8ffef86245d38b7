"""Fused encoder kernels (ops/fused_attention.py): param-tree compatibility
and numeric parity against the standard flax path (interpret mode on CPU).

The fused path is the production encode configuration on TPU
(encoder_fused_attention: true — measured 12.2k psg/s vs 9.7k, +26%); these
tests pin that it is a pure implementation swap: identical param trees
(checkpoints/HF import oblivious) and f32-identical outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_fused_encoder_param_tree_and_parity():
    from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM

    rng = np.random.default_rng(0)
    m0 = TransformerEncoderLM(EncoderConfig.tiny(), jnp.float32)
    m1 = TransformerEncoderLM(EncoderConfig.tiny(fused_attention=True), jnp.float32)
    ids = rng.integers(2, 900, size=(4, 24)).astype(np.int32)
    mask = np.ones((4, 24), np.float32)
    mask[1, 15:] = 0
    mask[3, 5:] = 0
    p0 = m0.init(jax.random.PRNGKey(0), ids, mask)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, p0, p1)
    )
    # SAME params through both implementations → same outputs (f32)
    o0 = m0.apply({"params": p0}, ids, mask)
    o1 = m1.apply({"params": p0}, ids, mask)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-4, rtol=1e-4)


def test_fused_attention_block_vs_reference():
    from matchmaker_tpu.ops.fused_attention import (
        fused_attention_block,
        reference_attention_block,
    )

    rng = np.random.default_rng(1)
    B, L, HID, NH = 6, 30, 64, 4  # L=30: exercises the sublane padding path
    x = jnp.asarray(rng.normal(size=(B, L, HID)) * 0.5, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(HID, HID)) * 0.1, jnp.float32) for _ in range(4)]
    bs = [jnp.asarray(rng.normal(size=(HID,)) * 0.05, jnp.float32) for _ in range(4)]
    g = jnp.asarray(rng.normal(size=(HID,)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HID,)) * 0.1, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[2, 20:] = 0
    mask = jnp.asarray(mask)
    o1 = fused_attention_block(x, *ws, *bs, mask, NH, g, be)
    o2 = reference_attention_block(x, *ws, *bs, mask, NH, g, be)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)


def test_fused_mlp_block_vs_reference():
    from matchmaker_tpu.ops.fused_attention import fused_mlp_block, reference_mlp_block

    rng = np.random.default_rng(2)
    B, L, HID, FF = 5, 24, 64, 256
    x = jnp.asarray(rng.normal(size=(B, L, HID)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(HID, FF)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(FF,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(FF, HID)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(HID,)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(HID,)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HID,)) * 0.1, jnp.float32)
    o1 = fused_mlp_block(x, w1, b1, w2, b2, g, be, ff_chunks=2)
    o2 = reference_mlp_block(x, w1, b1, w2, b2, g, be)
    # polynomial-erf gelu vs exact erf: ≤1.5e-7 on erf, amplified ≤1e-4 here
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-4)


def test_fused_attention_block_train_grads_vs_reference(monkeypatch):
    """custom-VJP Pallas backward (ops/fused_backward.py) against autodiff of
    the reference block — every gradient: dx, all weight/bias grads, LN."""
    from matchmaker_tpu.ops import fused_backward as fb

    monkeypatch.setattr(fb, "FORCE_PALLAS_BWD", True)
    rng = np.random.default_rng(3)
    B, L, HID, NH = 5, 21, 64, 4  # odd L exercises sublane padding in bwd
    x = jnp.asarray(rng.normal(size=(B, L, HID)) * 0.5, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(HID, HID)) * 0.1, jnp.float32) for _ in range(4)]
    bs = [jnp.asarray(rng.normal(size=(HID,)) * 0.05, jnp.float32) for _ in range(4)]
    g = jnp.asarray(rng.normal(size=(HID,)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HID,)) * 0.1, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[2, 15:] = 0
    mask = jnp.asarray(mask)
    cot = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)

    def loss_fused(x, ws, bs, g, be):
        out = fb.fused_attention_block_train(x, *ws, *bs, mask, NH, g, be)
        return (out * cot).sum()

    def loss_ref(x, ws, bs, g, be):
        from matchmaker_tpu.ops.fused_attention import reference_attention_block

        out = reference_attention_block(x, *ws, *bs, mask, NH, g, be)
        return (out * cot).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, ws, bs, g, be)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, ws, bs, g, be)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2, rtol=1e-2)


def test_fused_mlp_block_train_grads_vs_reference(monkeypatch):
    from matchmaker_tpu.ops import fused_backward as fb

    monkeypatch.setattr(fb, "FORCE_PALLAS_BWD", True)
    rng = np.random.default_rng(4)
    B, L, HID, FF = 4, 19, 64, 256
    x = jnp.asarray(rng.normal(size=(B, L, HID)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(HID, FF)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(FF,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(FF, HID)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(HID,)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(HID,)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HID,)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)

    def loss_fused(x, w1, b1, w2, b2, g, be):
        out = fb.fused_mlp_block_train(x, w1, b1, w2, b2, g, be, ff_chunks=2)
        return (out * cot).sum()

    def loss_ref(x, w1, b1, w2, b2, g, be):
        from matchmaker_tpu.ops.fused_attention import reference_mlp_block

        return (reference_mlp_block(x, w1, b1, w2, b2, g, be) * cot).sum()

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, be)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, be)
    # z recomputed in f32 in both passes; only poly-erf vs exact erf and
    # summation order differ
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_fused_encoder_training_grads_match_flax(monkeypatch):
    """End-to-end wiring: grads of the fused-path tiny encoder match the
    standard flax path on identical params (the trees are identical, so the
    same training run can flip the flag freely)."""
    from matchmaker_tpu.ops import fused_backward as fb

    monkeypatch.setattr(fb, "FORCE_PALLAS_BWD", True)
    from matchmaker_tpu.models.encoder import EncoderConfig, TransformerEncoderLM

    rng = np.random.default_rng(5)
    m0 = TransformerEncoderLM(EncoderConfig.tiny(dropout=0.0), jnp.float32)
    m1 = TransformerEncoderLM(
        EncoderConfig.tiny(dropout=0.0, fused_attention=True), jnp.float32)
    ids = rng.integers(2, 900, size=(3, 17)).astype(np.int32)
    mask = np.ones((3, 17), np.float32)
    mask[1, 11:] = 0
    params = m0.init(jax.random.PRNGKey(0), ids, mask)["params"]

    def loss(params, model):
        out = model.apply({"params": params}, ids, mask)
        return (out * out).sum()

    g0 = jax.grad(loss)(params, m0)
    g1 = jax.grad(loss)(params, m1)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    for (p0, a), (p1, b) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-2, rtol=1e-2,
            err_msg=str(p0),
        )


def test_fused_encoder_through_bert_dot_retrieval():
    """The production wiring: encoder_fused_attention config key flips the
    encode path; ranking behavior must be preserved (scores equal within
    float tolerance on CPU f32)."""
    from matchmaker_tpu.models import example_batch, get_model, init_params
    from matchmaker_tpu.models.encoder import encoder_config_from_model_name

    cfg = {
        "model": "bert_dot", "model_input_type": "independent",
        "token_embedder_type": "huggingface_bpe",
        "bert_pretrained_model": "tiny-test", "use_fp16": False,
        "max_query_length": 8, "max_doc_length": 24,
    }
    assert not encoder_config_from_model_name(cfg).fused_attention
    assert encoder_config_from_model_name(
        {**cfg, "encoder_fused_attention": True}
    ).fused_attention

    class _Tok:
        vocab_size = 1000

    m0 = get_model(cfg, _Tok())
    m1 = get_model({**cfg, "encoder_fused_attention": True}, _Tok())
    params = init_params(m0, cfg, jax.random.PRNGKey(0))
    batch = example_batch(cfg, batch_size=3)
    s0 = np.asarray(m0.apply({"params": params}, batch)["score"])
    s1 = np.asarray(m1.apply({"params": params}, batch)["score"])
    np.testing.assert_allclose(s0, s1, atol=1e-3, rtol=1e-4)


def test_int8_mlp_kernel_close_to_f32():
    """ops/fused_int8.py: the int8 MLP half (per-channel weights, per-row
    activations, int32 accumulation) must track the f32 MLP reference to
    quantization noise — cosine >= 0.9999 per row and the Pallas kernel
    (interpret mode here) must be bit-consistent with its jnp reference."""
    from matchmaker_tpu.ops.fused_attention import reference_mlp_block
    from matchmaker_tpu.ops.fused_int8 import (
        fused_mlp_int8_block,
        quantize_weights_per_col,
        reference_mlp_int8_block,
    )

    rng = np.random.default_rng(2)
    B, L, HID, FF = 4, 24, 64, 128
    x = jnp.asarray(rng.normal(size=(B, L, HID)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(HID, FF)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(FF, HID)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(FF,)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(HID,)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(HID,)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HID,)) * 0.1, jnp.float32)

    w1q, s1 = quantize_weights_per_col(w1)
    w2q, s2 = quantize_weights_per_col(w2)
    o_int8 = fused_mlp_int8_block(x, w1q, s1, b1, w2q, s2, b2, g, be,
                                  ff_chunks=2)
    o_ref_q = reference_mlp_int8_block(x, w1q, s1, b1, w2q, s2, b2, g, be,
                                       ff_chunks=2)
    # kernel == jnp reference of the same quantized math (tight)
    np.testing.assert_allclose(np.asarray(o_int8), np.asarray(o_ref_q),
                               atol=2e-4, rtol=1e-4)
    # quantized output tracks the f32 math to int8 noise
    o_f32 = reference_mlp_block(x, w1, b1, w2, b2, g, be)
    a = np.asarray(o_int8).reshape(-1, HID).astype(np.float64)
    b = np.asarray(o_f32).reshape(-1, HID).astype(np.float64)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.999, cos.min()


def test_int8_mlp_through_encoder_config():
    """encoder_int8_mlp config key: param tree unchanged, deterministic
    (inference) outputs near the f32 path, and training-mode apply does NOT
    take the int8 branch (it is forward-only)."""
    from matchmaker_tpu.models.encoder import (
        EncoderConfig,
        TransformerEncoderLM,
        encoder_config_from_model_name,
    )

    cfg_yaml = {"bert_pretrained_model": "tiny-test", "encoder_int8_mlp": True}
    ecfg = encoder_config_from_model_name(cfg_yaml)
    assert ecfg.int8_mlp and ecfg.fused_attention

    rng = np.random.default_rng(3)
    m0 = TransformerEncoderLM(EncoderConfig.tiny(), jnp.float32)
    mq = TransformerEncoderLM(
        EncoderConfig.tiny(fused_attention=True, int8_mlp=True), jnp.float32
    )
    ids = rng.integers(2, 900, size=(4, 24)).astype(np.int32)
    mask = np.ones((4, 24), np.float32)
    mask[1, 15:] = 0
    p0 = m0.init(jax.random.PRNGKey(0), ids, mask)["params"]
    pq = mq.init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(pq)
    o0 = np.asarray(m0.apply({"params": p0}, ids, mask))
    oq = np.asarray(mq.apply({"params": p0}, ids, mask))
    # int8 noise accumulates over layers; cosine per token stays high
    a = oq.reshape(-1, o0.shape[-1]).astype(np.float64)
    b = o0.reshape(-1, o0.shape[-1]).astype(np.float64)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.99, cos.min()


def test_int8_attention_kernel_close_to_f32():
    """ops/fused_int8.py attention half: int8 Q/K/V/out projections must
    track the f32 attention block to quantization noise, and the Pallas
    kernel (interpret mode) must match its jnp reference tightly."""
    from matchmaker_tpu.ops.fused_attention import reference_attention_block
    from matchmaker_tpu.ops.fused_int8 import (
        fused_attention_int8_block,
        quantize_weights_per_col,
        reference_attention_int8_block,
    )

    rng = np.random.default_rng(4)
    B, L, HID, NH = 4, 24, 64, 4
    x = jnp.asarray(rng.normal(size=(B, L, HID)) * 0.5, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(HID, HID)) * 0.1, jnp.float32) for _ in range(4)]
    bs = [jnp.asarray(rng.normal(size=(HID,)) * 0.05, jnp.float32) for _ in range(4)]
    g = jnp.asarray(rng.normal(size=(HID,)) * 0.1 + 1, jnp.float32)
    be = jnp.asarray(rng.normal(size=(HID,)) * 0.1, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[2, 18:] = 0
    mask = jnp.asarray(mask)

    quant = [quantize_weights_per_col(w) for w in ws]
    qargs = []
    for wq, s in quant:
        qargs.extend([wq, s])
    o_int8 = fused_attention_int8_block(x, *qargs, *bs, mask, NH, g, be)
    o_ref_q = reference_attention_int8_block(x, *qargs, *bs, mask, NH, g, be)
    np.testing.assert_allclose(np.asarray(o_int8), np.asarray(o_ref_q),
                               atol=2e-4, rtol=1e-4)
    o_f32 = reference_attention_block(x, *ws, *bs, mask, NH, g, be)
    a = np.asarray(o_int8).reshape(-1, HID).astype(np.float64)
    b = np.asarray(o_f32).reshape(-1, HID).astype(np.float64)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.999, cos.min()


def test_full_int8_encoder_config():
    """encoder_int8 config key enables both int8 halves; outputs stay close
    to the f32 path through a full tiny encoder."""
    from matchmaker_tpu.models.encoder import (
        EncoderConfig,
        TransformerEncoderLM,
        encoder_config_from_model_name,
    )

    ecfg = encoder_config_from_model_name(
        {"bert_pretrained_model": "tiny-test", "encoder_int8": True}
    )
    assert ecfg.int8_mlp and ecfg.int8_attention and ecfg.fused_attention

    rng = np.random.default_rng(5)
    m0 = TransformerEncoderLM(EncoderConfig.tiny(), jnp.float32)
    mq = TransformerEncoderLM(
        EncoderConfig.tiny(fused_attention=True, int8_mlp=True,
                           int8_attention=True), jnp.float32
    )
    ids = rng.integers(2, 900, size=(4, 24)).astype(np.int32)
    mask = np.ones((4, 24), np.float32)
    mask[1, 15:] = 0
    p0 = m0.init(jax.random.PRNGKey(0), ids, mask)["params"]
    pq = mq.init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(pq)
    o0 = np.asarray(m0.apply({"params": p0}, ids, mask))
    oq = np.asarray(mq.apply({"params": p0}, ids, mask))
    a = oq.reshape(-1, o0.shape[-1]).astype(np.float64)
    b = o0.reshape(-1, o0.shape[-1]).astype(np.float64)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.99, cos.min()


def test_gelu_fastpoly_accuracy():
    """The bf16-path gelu poly (FMA-only, no exp/div) must stay within
    1.5x bf16-ulp-at-1.0 of exact erf-gelu everywhere, fwd and grad."""
    from matchmaker_tpu.ops.fused_attention import _gelu_exact, _gelu_poly
    from matchmaker_tpu.ops.fused_backward import _gelu_grad, _gelu_grad_poly

    z = jnp.asarray(np.linspace(-12.0, 12.0, 100001), jnp.float32)
    assert float(jnp.abs(_gelu_poly(z) - _gelu_exact(z)).max()) < 2e-4
    assert float(jnp.abs(_gelu_grad_poly(z) - _gelu_grad(z)).max()) < 4e-4
    # saturation: linear / zero far outside the clamp (coefficients scaled so
    # the f32 Horner at the clamp is 1.0 ± 5e-6 — the leak is < 5e-6·|z|)
    far = jnp.asarray([-50.0, 50.0], jnp.float32)
    np.testing.assert_allclose(np.asarray(_gelu_poly(far)), [0.0, 50.0], atol=5e-4)
