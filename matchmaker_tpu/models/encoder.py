"""From-scratch Flax transformer encoder (BERT/DistilBERT-compatible layout).

This replaces the reference's dependency on HF ``transformers.AutoModel``
(models/bert_cat.py:30-40, bert_dot.py:28-40, colbert.py:30-43): the encoder
itself is first-party so the whole forward is one XLA program with a bf16
compute policy on the MXU, and HF checkpoints are imported by converting
weights into this module's param tree (models/hf_import.py).

Architecture (post-norm, matching bert-base/distilbert):
  embeddings: word + learned position (+ token type when type_vocab_size > 0)
  → LayerNorm → L× [self-attention → add&LN → GELU MLP → add&LN]

``compute_dtype=bfloat16`` keeps params in f32 and casts activations — the
TPU replacement for torch.cuda.amp autocast (reference train.py:251).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import warnings

import flax.linen as nn
import jax.numpy as jnp

_warned_fused_dropout = False


def _warn_fused_dropout_noop():
    """One-time warning: fused layers silently skip dropout while training.

    The fused whole-layer kernels (ops/fused_attention.py / fused_backward.py)
    do not implement attention/hidden dropout — a documented speed trade
    (docs/tpu_design.md), but a user training with ``dropout > 0`` and
    ``encoder_fused_attention: true`` must see the regularization change."""
    global _warned_fused_dropout
    if not _warned_fused_dropout:
        _warned_fused_dropout = True
        warnings.warn(
            "encoder_fused_attention is enabled with dropout > 0 in a "
            "non-deterministic (training) pass: dropout is a NO-OP inside the "
            "fused Pallas layers. Set dropout: 0.0 to silence, or disable "
            "encoder_fused_attention to train with dropout.",
            UserWarning,
            stacklevel=3,
        )


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 6  # distilbert default
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 0  # 2 for bert, 0 for distilbert
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    # Run LayerNorms (and the residual stream) in compute_dtype instead of
    # f32. Off for training (AMP semantics keep norms in f32, reference
    # train.py:251); the inference encode path can enable it to keep every
    # elementwise op in bf16 — fewer HBM bytes between the matmuls.
    norms_in_compute_dtype: bool = False
    # Fused Pallas self-attention (ops/fused_attention.py): logits never
    # touch HBM, no head transposes — measured 2.3x the XLA attention at
    # encode shapes (B=1024, L=128). Forward-only, so inference paths only;
    # the adapter falls back to flax attention under active dropout.
    fused_attention: bool = False
    # Int8 MXU dots on the INFERENCE path (ops/fused_int8.py): weights
    # per-channel + activations per-row symmetric int8, dequant in-kernel.
    # int8_mlp quantizes the MLP half's two matmuls (~57% of layer FLOPs,
    # measured +15% encode); int8_attention additionally quantizes the
    # Q/K/V/out projections (the attention inner math stays bf16/f32).
    # Both require fused_attention; training and non-deterministic passes
    # keep the bf16 kernels (the int8 kernels are forward-only).
    int8_mlp: bool = False
    int8_attention: bool = False
    # Fused-kernel tile geometry (batch rows per grid step / FF-dim chunks of
    # the training MLP kernels) — sweepable via `encoder_fused_block_b` /
    # `encoder_fused_ff_chunks` and benchmarks/train_benchmark.py
    fused_block_b: int = 8
    fused_ff_chunks: int = 4

    @classmethod
    def distilbert(cls, **kw):
        return cls(**{**dict(num_layers=6, type_vocab_size=0), **kw})

    @classmethod
    def bert_base(cls, **kw):
        return cls(**{**dict(num_layers=12, type_vocab_size=2), **kw})

    @classmethod
    def tiny(cls, **kw):
        """Small config for tests."""
        defaults = dict(
            vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=128,
        )
        return cls(**{**defaults, **kw})

    @classmethod
    def mini(cls, **kw):
        """4-layer/256-hidden encoder (~11M params) — the from-scratch tier.

        Big transformers only rank well after real pretraining; from a weak
        warmstart a DistilBERT-size tower stays at chance on ranking triples
        for thousands of steps (measured: teacher acc ~0.5 after 2.8k steps at
        every stable lr). Recipes that must BOOTSTRAP their own encoder (the
        planted TAS-B proxy, zero-egress environments) use this tier; real
        pretrained checkpoints use distilbert/bert_base."""
        defaults = dict(
            hidden_size=256, num_layers=4, num_heads=4,
            intermediate_size=1024, max_position_embeddings=512,
        )
        return cls(**{**defaults, **kw})


class _AttnParams(nn.Module):
    """Bare kernel+bias holder matching one DenseGeneral's param names.

    ``in_dims`` = number of leading kernel axes that are input dims. The
    initializer computes fans on the flattened 2D view, exactly like flax
    ``DenseGeneral`` — naive lecun_normal on a (hid, heads, head_dim) shape
    would infer fan_in = heads*hid and start q/k/v weights ~sqrt(heads)x too
    small vs the non-fused flax path these params claim to be a pure swap for.
    """

    kernel_shape: tuple
    bias_shape: tuple
    in_dims: int = 1

    @nn.compact
    def __call__(self):
        def flat_init(key, shape, dtype=jnp.float32):
            fan_in = 1
            for s in shape[: self.in_dims]:
                fan_in *= int(s)
            fan_out = 1
            for s in shape[self.in_dims :]:
                fan_out *= int(s)
            flat = nn.initializers.lecun_normal()(key, (fan_in, fan_out), dtype)
            return flat.reshape(shape)

        kernel = self.param("kernel", flat_init, self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros_init(), self.bias_shape)
        return kernel, bias


class _LNParams(nn.Module):
    """scale+bias holder matching nn.LayerNorm's param names."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return scale, bias


class FusedMHABlock(nn.Module):
    """The attention half of a post-norm layer — LN(x + OutProj(MHA(x))) —
    as ONE Pallas kernel (ops/fused_attention.py: projections, softmax,
    output accumulation, AND the following LayerNorm fused; Q/K/V and the
    logits never touch HBM, and no XLA op ever consumes the custom-call
    result through a reduce — that pattern lowers via a 10+ ms/layer
    layout-materialization fusion, measured).

    Param tree is IDENTICAL to ``nn.MultiHeadDotProductAttention`` +
    ``nn.LayerNorm`` (query/key/value/out kernels+biases; the LN params are
    created by the EncoderLayer under the usual ``attention_norm`` name),
    so checkpoints and the HF import are oblivious to which implementation
    runs."""

    num_heads: int
    features: int
    ln_eps: float = 1e-12
    compute_dtype: jnp.dtype = jnp.bfloat16
    int8_projections: bool = False  # inference-only int8 Q/K/V/out dots
    fused_block_b: int = 8  # training-backward batch tile (EncoderConfig)

    @nn.compact
    def __call__(self, x, key_mask, ln_scale, ln_bias, deterministic=True):
        h, hid = self.num_heads, self.features
        d = hid // h
        wq, bq = _AttnParams((hid, h, d), (h, d), name="query")()
        wk, bk = _AttnParams((hid, h, d), (h, d), name="key")()
        wv, bv = _AttnParams((hid, h, d), (h, d), name="value")()
        wo, bo = _AttnParams((h, d, hid), (hid,), in_dims=2, name="out")()
        cd = self.compute_dtype
        args = (
            x.astype(cd),
            wq.reshape(hid, hid).astype(cd), wk.reshape(hid, hid).astype(cd),
            wv.reshape(hid, hid).astype(cd), wo.reshape(hid, hid).astype(cd),
            bq.reshape(hid).astype(jnp.float32), bk.reshape(hid).astype(jnp.float32),
            bv.reshape(hid).astype(jnp.float32), bo.astype(jnp.float32),
            key_mask, h,
            ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        )
        from matchmaker_tpu.ops.fused_attention import (
            _on_tpu,
            reference_attention_block,
        )
        from matchmaker_tpu.ops.fused_backward import fused_attention_block_train

        if self.int8_projections and deterministic:
            # inference-only int8 projections: weights quantized per output
            # channel HERE (params stay full precision), activations per row
            # in-kernel (ops/fused_int8.py)
            from matchmaker_tpu.ops.fused_int8 import (
                fused_attention_int8_block,
                quantize_weights_per_col,
            )

            wqq, sq = quantize_weights_per_col(wq.reshape(hid, hid))
            wkq, sk = quantize_weights_per_col(wk.reshape(hid, hid))
            wvq, sv = quantize_weights_per_col(wv.reshape(hid, hid))
            woq, so = quantize_weights_per_col(wo.reshape(hid, hid))
            return fused_attention_int8_block(
                x.astype(cd), wqq, sq, wkq, sk, wvq, sv, woq, so,
                bq.reshape(hid).astype(jnp.float32),
                bk.reshape(hid).astype(jnp.float32),
                bv.reshape(hid).astype(jnp.float32), bo.astype(jnp.float32),
                key_mask, h, ln_scale.astype(jnp.float32),
                ln_bias.astype(jnp.float32), ln_eps=self.ln_eps,
            )
        if deterministic or _on_tpu():
            # differentiable: Pallas forward + Pallas backward (custom VJP,
            # ops/fused_backward.py) — training runs the fused kernels too.
            # Attention-prob dropout is a no-op on the fused path (documented
            # trade; the off-TPU non-deterministic branch below matches).
            return fused_attention_block_train(*args, ln_eps=self.ln_eps,
                                               block_b=self.fused_block_b)
        # off-TPU training fallback: same math in XLA (fast for CPU tests)
        return reference_attention_block(*args, ln_eps=self.ln_eps)


class EncoderLayer(nn.Module):
    cfg: EncoderConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        cfg = self.cfg
        ln_dtype = self.compute_dtype if cfg.norms_in_compute_dtype else None
        if cfg.fused_attention:
            key_mask = attn_mask[:, 0, 0, :].astype(jnp.float32)
            # the attention_norm LayerNorm runs INSIDE the kernel; its params
            # keep their usual name/shape via the holder module
            ln_scale, ln_bias = _LNParams(cfg.hidden_size, name="attention_norm")()
            x = FusedMHABlock(
                num_heads=cfg.num_heads,
                features=cfg.hidden_size,
                ln_eps=cfg.layer_norm_eps,
                compute_dtype=self.compute_dtype,
                int8_projections=cfg.int8_attention,
                fused_block_b=cfg.fused_block_b,
                name="attention",
            )(x, key_mask, ln_scale, ln_bias, deterministic)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads,
                qkv_features=cfg.hidden_size,
                out_features=cfg.hidden_size,
                dropout_rate=cfg.dropout,
                deterministic=deterministic,
                dtype=self.compute_dtype,
                name="attention",
            )(x, x, x, mask=attn_mask)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=ln_dtype, name="attention_norm")(x + h)
        if cfg.fused_attention:
            # MLP half fused the same way (ops/fused_attention.fused_mlp_block):
            # the (B, L, FF) intermediate never exists in HBM, and the
            # mlp_norm runs in-kernel (an XLA reduce over a custom-call
            # result hits the slow layout-materialization fusion)
            w1, b1 = _AttnParams((cfg.hidden_size, cfg.intermediate_size),
                                 (cfg.intermediate_size,), name="mlp_in")()
            w2, b2 = _AttnParams((cfg.intermediate_size, cfg.hidden_size),
                                 (cfg.hidden_size,), name="mlp_out")()
            ln2_scale, ln2_bias = _LNParams(cfg.hidden_size, name="mlp_norm")()
            from matchmaker_tpu.ops.fused_attention import (
                _on_tpu,
                reference_mlp_block,
            )
            from matchmaker_tpu.ops.fused_backward import fused_mlp_block_train

            cd = self.compute_dtype
            if cfg.int8_mlp and deterministic:
                # inference-only int8 MLP half: weights quantized per output
                # channel HERE (inside the jit — params stay full precision,
                # checkpoints/HF import oblivious), activations per row
                # in-kernel (ops/fused_int8.py)
                from matchmaker_tpu.ops.fused_int8 import (
                    fused_mlp_int8_block,
                    quantize_weights_per_col,
                )

                w1q, s1 = quantize_weights_per_col(w1)
                w2q, s2 = quantize_weights_per_col(w2)
                return fused_mlp_int8_block(
                    x.astype(cd), w1q, s1, b1, w2q, s2, b2,
                    ln2_scale, ln2_bias, ln_eps=cfg.layer_norm_eps,
                )
            mlp_args = (x.astype(cd), w1.astype(cd), b1, w2.astype(cd), b2,
                        ln2_scale, ln2_bias)
            if deterministic or _on_tpu():
                # differentiable fused MLP half (custom VJP, fused_backward.py)
                return fused_mlp_block_train(
                    *mlp_args, ln_eps=cfg.layer_norm_eps,
                    block_b=cfg.fused_block_b, ff_chunks=cfg.fused_ff_chunks)
            return reference_mlp_block(*mlp_args, ln_eps=cfg.layer_norm_eps)
        h = nn.Dense(cfg.intermediate_size, dtype=self.compute_dtype, name="mlp_in")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype, name="mlp_out")(h)
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=ln_dtype, name="mlp_norm")(x + h)


class TransformerEncoderLM(nn.Module):
    cfg: EncoderConfig
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings"
        )
        if cfg.type_vocab_size > 0:
            self.token_type_embeddings = nn.Embed(
                cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings"
            )
        self.embeddings_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=self.compute_dtype if cfg.norms_in_compute_dtype else None,
            name="embeddings_norm",
        )
        self.embeddings_dropout = nn.Dropout(cfg.dropout)
        self.layers = [
            EncoderLayer(cfg, self.compute_dtype, name=f"layer_{i}") for i in range(cfg.num_layers)
        ]

    def embed(
        self,
        ids: jnp.ndarray,
        type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        skip_position: bool = False,
        position_offset: int = 0,
    ) -> jnp.ndarray:
        """Embedding sub-stack: word (+position, +type) → LN → dropout.

        ``position_offset`` shifts position ids (PreTTR doc-tower offset,
        reference prettr.py:68-112); ``skip_position`` drops position
        embeddings entirely (reference modules/bert_parts.py:5)."""
        cfg = self.cfg
        x = self.word_embeddings(ids)
        if not skip_position:
            positions = jnp.arange(ids.shape[1])[None, :] + position_offset
            x = x + self.position_embeddings(positions)
        if cfg.type_vocab_size > 0:
            if type_ids is None:
                type_ids = jnp.zeros_like(ids)
            x = x + self.token_type_embeddings(type_ids)
        x = self.embeddings_norm(x)
        return self.embeddings_dropout(x, deterministic=deterministic)

    def encode_layers(self, x, mask, start: int, end: int, deterministic: bool = True):
        """Run layers [start, end) on already-embedded inputs (PreTTR join)."""
        if not deterministic and self.cfg.fused_attention and self.cfg.dropout > 0:
            _warn_fused_dropout_noop()
        attn_mask = (mask > 0)[:, None, None, :]
        x = x.astype(self.compute_dtype)
        for layer in self.layers[start:end]:
            x = layer(x, attn_mask, deterministic)
        return x.astype(jnp.float32)

    def __call__(
        self,
        ids: jnp.ndarray,
        mask: jnp.ndarray,
        type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        num_layers: Optional[int] = None,
        skip_position: bool = False,
        position_offset: int = 0,
    ) -> jnp.ndarray:
        """Returns final hidden states (B, L, H); ``num_layers`` runs only the
        first N layers (PreTTR's cacheable lower towers)."""
        x = self.embed(ids, type_ids, deterministic, skip_position, position_offset)
        n = num_layers if num_layers is not None else self.cfg.num_layers
        return self.encode_layers(x, mask, 0, n, deterministic)


def encoder_config_from_model_name(config) -> EncoderConfig:
    """Resolve the encoder size from the ``bert_pretrained_model`` config key.

    When a local HF checkpoint directory is given, its config.json wins
    (hf_import.load_hf_encoder_config); otherwise name heuristics pick the
    architecture family and weights start random.
    """
    name = str(config.get("bert_pretrained_model", "distilbert-base-uncased"))
    import dataclasses
    import os

    if os.path.isdir(name):
        from matchmaker_tpu.models.hf_import import load_hf_encoder_config

        cfg = load_hf_encoder_config(name)
    elif "tiny" in name:
        cfg = EncoderConfig.tiny()
    elif "mini" in name:
        cfg = EncoderConfig.mini()
    elif "distilbert" in name:
        cfg = EncoderConfig.distilbert()
    else:
        cfg = EncoderConfig.bert_base()
    # inference-speed options, YAML-selectable (benchmarked in
    # benchmarks/encode_sweep.py; both off by default = training semantics)
    overrides = {}
    if config.get("encoder_bf16_norms"):
        overrides["norms_in_compute_dtype"] = True
    if config.get("encoder_fused_attention"):
        overrides["fused_attention"] = True
    if config.get("encoder_int8_mlp"):
        # int8 MXU dots for the MLP half, inference only (ops/fused_int8.py);
        # implies the fused whole-layer kernels
        overrides["fused_attention"] = True
        overrides["int8_mlp"] = True
    if config.get("encoder_int8"):
        # full int8 projections: MLP half AND the attention Q/K/V/out dots
        overrides["fused_attention"] = True
        overrides["int8_mlp"] = True
        overrides["int8_attention"] = True
    if config.get("encoder_fused_block_b"):
        overrides["fused_block_b"] = int(config["encoder_fused_block_b"])
    if config.get("encoder_fused_ff_chunks"):
        overrides["fused_ff_chunks"] = int(config["encoder_fused_ff_chunks"])
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
