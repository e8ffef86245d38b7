"""Optimizer construction: param groups, LR schedules, grad clipping.

Contract: reference train.py:115-170 — separate hyperparameters for the
pre-trained encoder ("group0", matched by ``param_group0_names`` prefixes),
the rest of the network ("group1"), and the word-embedding table; cosine
schedules with linear warmup; gradient clipping (train.py:533-543).

Implemented as one ``optax.multi_transform`` over parameter labels instead of
multiple torch optimizers — a single pytree update fuses into the jitted step.
"""

from __future__ import annotations

from typing import Any

import optax


_ENCODER_TOWERS = ("encoder", "query_encoder", "doc_encoder")


def label_params(params, config) -> Any:
    """Label each param leaf: 'embedding' (token table), 'encoder' (pre-trained
    transformer towers → param_group0 lr), or 'head' (everything else →
    param_group1 lr). ``param_group1_names`` path substrings force 'head'
    (reference param grouping, train.py:115-142)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    group1_names = tuple(config.get("param_group1_names", []) or [])

    def label_for(path) -> str:
        keys = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(keys)
        if group1_names and any(n in joined for n in group1_names):
            return "head"
        if "token_embedding" in joined:
            return "embedding"
        if keys and keys[0] in _ENCODER_TOWERS:
            return "encoder"
        return "head"

    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [label_for(path) for path, _ in flat]
    )
    return labels


def _schedule(lr: float, warmup_steps: int, total_steps: int, kind: str = "cosine"):
    if warmup_steps <= 0 and kind == "constant":
        return lr
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=lr * 0.01,
        )
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)), optax.constant_schedule(lr)],
        [max(warmup_steps, 1)],
    )


def build_optimizer(config, params) -> optax.GradientTransformation:
    total_steps = config.get("max_training_steps", 100_000)
    warmup = config.get("optimizer_warmup_steps", 1000)
    kind = config.get("lr_schedule", "cosine")

    def adamw(lr, wd=0.0):
        return optax.adamw(
            _schedule(lr, warmup, total_steps, kind),
            b1=config.get("adam_beta1", 0.9),
            b2=config.get("adam_beta2", 0.999),
            eps=config.get("adam_eps", 1e-8),
            weight_decay=wd,
        )

    head_lr = config.get("param_group1_learning_rate", config.get("learning_rate", 1e-4))
    encoder_lr = config.get("param_group0_learning_rate", config.get("learning_rate", 1e-5))
    emb_lr = config.get("embedding_optimizer_learning_rate", head_lr)
    wd = config.get("weight_decay", 0.0)

    tx = optax.multi_transform(
        {
            "embedding": adamw(emb_lr),
            "encoder": adamw(encoder_lr, wd),
            "head": adamw(head_lr, wd),
        },
        label_params(params, config),
    )
    clip = config.get("gradient_clip_norm", 0.0)
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    accum = config.get("gradient_accumulation_steps", 0)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
