"""HuggingFace checkpoint interop.

Replaces the reference's direct dependency on ``transformers.AutoModel`` for
compute (models/bert_cat.py:30-40 etc.): HF checkpoints (BERT / DistilBERT
families) are *converted* into the first-party Flax encoder's param tree
(models/encoder.py) so the forward runs as one XLA program. torch is only used
host-side to read the checkpoint.

Import is offline-safe: it takes a local checkpoint directory. Hub names are
resolved only if already cached (zero-egress environments simply train from
random init or a warmstart file).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from matchmaker_tpu.models.encoder import EncoderConfig


def load_hf_encoder_config(path_or_name: str) -> EncoderConfig:
    from transformers import AutoConfig

    hf = AutoConfig.from_pretrained(path_or_name)
    model_type = getattr(hf, "model_type", "bert")
    if model_type == "distilbert":
        return EncoderConfig(
            vocab_size=hf.vocab_size,
            hidden_size=hf.dim,
            num_layers=hf.n_layers,
            num_heads=hf.n_heads,
            intermediate_size=hf.hidden_dim,
            max_position_embeddings=hf.max_position_embeddings,
            type_vocab_size=0,
            dropout=hf.dropout,
        )
    return EncoderConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        max_position_embeddings=hf.max_position_embeddings,
        type_vocab_size=getattr(hf, "type_vocab_size", 2),
        layer_norm_eps=getattr(hf, "layer_norm_eps", 1e-12),
        dropout=getattr(hf, "hidden_dropout_prob", 0.1),
    )


def _dense(sd, w_key: str, b_key: str) -> Dict[str, np.ndarray]:
    return {"kernel": sd[w_key].T, "bias": sd[b_key]}


def _attn_proj(sd, w_key: str, b_key: str, heads: int) -> Dict[str, np.ndarray]:
    w = sd[w_key].T  # (in, out)
    hidden_in, hidden_out = w.shape
    head_dim = hidden_out // heads
    return {
        "kernel": w.reshape(hidden_in, heads, head_dim),
        "bias": sd[b_key].reshape(heads, head_dim),
    }


def _attn_out(sd, w_key: str, b_key: str, heads: int) -> Dict[str, np.ndarray]:
    w = sd[w_key].T  # (in=heads*dim, out)
    hidden_in, hidden_out = w.shape
    head_dim = hidden_in // heads
    return {
        "kernel": w.reshape(heads, head_dim, hidden_out),
        "bias": sd[b_key],
    }


def _norm(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def hf_state_dict_to_encoder_params(sd: Dict[str, np.ndarray], cfg: EncoderConfig, model_type: str):
    """torch state dict → params for TransformerEncoderLM."""
    p: Dict[str, dict] = {}
    if model_type == "distilbert":
        emb = "embeddings"
        p["word_embeddings"] = {"embedding": sd[f"{emb}.word_embeddings.weight"]}
        p["position_embeddings"] = {"embedding": sd[f"{emb}.position_embeddings.weight"]}
        p["embeddings_norm"] = _norm(sd, f"{emb}.LayerNorm")
        for i in range(cfg.num_layers):
            pre = f"transformer.layer.{i}"
            p[f"layer_{i}"] = {
                "attention": {
                    "query": _attn_proj(sd, f"{pre}.attention.q_lin.weight", f"{pre}.attention.q_lin.bias", cfg.num_heads),
                    "key": _attn_proj(sd, f"{pre}.attention.k_lin.weight", f"{pre}.attention.k_lin.bias", cfg.num_heads),
                    "value": _attn_proj(sd, f"{pre}.attention.v_lin.weight", f"{pre}.attention.v_lin.bias", cfg.num_heads),
                    "out": _attn_out(sd, f"{pre}.attention.out_lin.weight", f"{pre}.attention.out_lin.bias", cfg.num_heads),
                },
                "attention_norm": _norm(sd, f"{pre}.sa_layer_norm"),
                "mlp_in": _dense(sd, f"{pre}.ffn.lin1.weight", f"{pre}.ffn.lin1.bias"),
                "mlp_out": _dense(sd, f"{pre}.ffn.lin2.weight", f"{pre}.ffn.lin2.bias"),
                "mlp_norm": _norm(sd, f"{pre}.output_layer_norm"),
            }
        return p

    # bert family
    emb = "embeddings"
    p["word_embeddings"] = {"embedding": sd[f"{emb}.word_embeddings.weight"]}
    p["position_embeddings"] = {"embedding": sd[f"{emb}.position_embeddings.weight"]}
    if cfg.type_vocab_size > 0:
        p["token_type_embeddings"] = {"embedding": sd[f"{emb}.token_type_embeddings.weight"]}
    p["embeddings_norm"] = _norm(sd, f"{emb}.LayerNorm")
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "query": _attn_proj(sd, f"{pre}.attention.self.query.weight", f"{pre}.attention.self.query.bias", cfg.num_heads),
                "key": _attn_proj(sd, f"{pre}.attention.self.key.weight", f"{pre}.attention.self.key.bias", cfg.num_heads),
                "value": _attn_proj(sd, f"{pre}.attention.self.value.weight", f"{pre}.attention.self.value.bias", cfg.num_heads),
                "out": _attn_out(sd, f"{pre}.attention.output.dense.weight", f"{pre}.attention.output.dense.bias", cfg.num_heads),
            },
            "attention_norm": _norm(sd, f"{pre}.attention.output.LayerNorm"),
            "mlp_in": _dense(sd, f"{pre}.intermediate.dense.weight", f"{pre}.intermediate.dense.bias"),
            "mlp_out": _dense(sd, f"{pre}.output.dense.weight", f"{pre}.output.dense.bias"),
            "mlp_norm": _norm(sd, f"{pre}.output.LayerNorm"),
        }
    return p


def load_hf_encoder(path_or_name: str):
    """(EncoderConfig, params) from a local HF checkpoint directory/name."""
    from transformers import AutoModel

    model = AutoModel.from_pretrained(path_or_name)
    cfg = load_hf_encoder_config(path_or_name)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    # strip possible base-model prefix (e.g. "distilbert.") if present
    model_type = model.config.model_type
    prefix = model.base_model_prefix + "."
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    params = hf_state_dict_to_encoder_params(sd, cfg, model_type)
    return cfg, params


def encoder_checkpoint_available(path_or_name: str) -> bool:
    """True if a checkpoint can be loaded without network access."""
    if os.path.isdir(path_or_name):
        return True
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained(path_or_name, local_files_only=True)
        return True
    except Exception:
        return False
