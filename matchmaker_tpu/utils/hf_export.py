"""Export trained encoders back to HuggingFace checkpoint format.

Contract: reference utils/export_to_huggingface.py:59-87 — save a trained
bert_dot / bert_cat / colbert / idcm / prettr model as an HF checkpoint folder
(model weights + config + tokenizer) so it can be shared on the hub. Inverse
of models/hf_import.py: flax param tree → torch state dict.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from matchmaker_tpu.models.encoder import EncoderConfig


def encoder_params_to_hf_state_dict(params: Dict, cfg: EncoderConfig, model_type: str):
    """TransformerEncoderLM params → HF-layout numpy state dict."""
    heads = cfg.num_heads
    h = cfg.hidden_size

    def t(x):
        return np.asarray(x).T

    def attn_proj(p):  # (in, heads, hd) → (out, in)
        return np.asarray(p["kernel"]).reshape(h, h).T, np.asarray(p["bias"]).reshape(h)

    def attn_out(p):  # (heads, hd, out) → (out, in)
        return np.asarray(p["kernel"]).reshape(h, h).T, np.asarray(p["bias"])

    sd: Dict[str, np.ndarray] = {}
    if model_type == "distilbert":
        sd["embeddings.word_embeddings.weight"] = np.asarray(params["word_embeddings"]["embedding"])
        sd["embeddings.position_embeddings.weight"] = np.asarray(params["position_embeddings"]["embedding"])
        sd["embeddings.LayerNorm.weight"] = np.asarray(params["embeddings_norm"]["scale"])
        sd["embeddings.LayerNorm.bias"] = np.asarray(params["embeddings_norm"]["bias"])
        for i in range(cfg.num_layers):
            lp = params[f"layer_{i}"]
            pre = f"transformer.layer.{i}"
            for name, key in (("q_lin", "query"), ("k_lin", "key"), ("v_lin", "value")):
                w, b = attn_proj(lp["attention"][key])
                sd[f"{pre}.attention.{name}.weight"], sd[f"{pre}.attention.{name}.bias"] = w, b
            w, b = attn_out(lp["attention"]["out"])
            sd[f"{pre}.attention.out_lin.weight"], sd[f"{pre}.attention.out_lin.bias"] = w, b
            sd[f"{pre}.sa_layer_norm.weight"] = np.asarray(lp["attention_norm"]["scale"])
            sd[f"{pre}.sa_layer_norm.bias"] = np.asarray(lp["attention_norm"]["bias"])
            sd[f"{pre}.ffn.lin1.weight"], sd[f"{pre}.ffn.lin1.bias"] = t(lp["mlp_in"]["kernel"]), np.asarray(lp["mlp_in"]["bias"])
            sd[f"{pre}.ffn.lin2.weight"], sd[f"{pre}.ffn.lin2.bias"] = t(lp["mlp_out"]["kernel"]), np.asarray(lp["mlp_out"]["bias"])
            sd[f"{pre}.output_layer_norm.weight"] = np.asarray(lp["mlp_norm"]["scale"])
            sd[f"{pre}.output_layer_norm.bias"] = np.asarray(lp["mlp_norm"]["bias"])
        return sd

    sd["embeddings.word_embeddings.weight"] = np.asarray(params["word_embeddings"]["embedding"])
    sd["embeddings.position_embeddings.weight"] = np.asarray(params["position_embeddings"]["embedding"])
    if cfg.type_vocab_size > 0:
        sd["embeddings.token_type_embeddings.weight"] = np.asarray(params["token_type_embeddings"]["embedding"])
    sd["embeddings.LayerNorm.weight"] = np.asarray(params["embeddings_norm"]["scale"])
    sd["embeddings.LayerNorm.bias"] = np.asarray(params["embeddings_norm"]["bias"])
    for i in range(cfg.num_layers):
        lp = params[f"layer_{i}"]
        pre = f"encoder.layer.{i}"
        for name, key in (("query", "query"), ("key", "key"), ("value", "value")):
            w, b = attn_proj(lp["attention"][key])
            sd[f"{pre}.attention.self.{name}.weight"], sd[f"{pre}.attention.self.{name}.bias"] = w, b
        w, b = attn_out(lp["attention"]["out"])
        sd[f"{pre}.attention.output.dense.weight"], sd[f"{pre}.attention.output.dense.bias"] = w, b
        sd[f"{pre}.attention.output.LayerNorm.weight"] = np.asarray(lp["attention_norm"]["scale"])
        sd[f"{pre}.attention.output.LayerNorm.bias"] = np.asarray(lp["attention_norm"]["bias"])
        sd[f"{pre}.intermediate.dense.weight"], sd[f"{pre}.intermediate.dense.bias"] = t(lp["mlp_in"]["kernel"]), np.asarray(lp["mlp_in"]["bias"])
        sd[f"{pre}.output.dense.weight"], sd[f"{pre}.output.dense.bias"] = t(lp["mlp_out"]["kernel"]), np.asarray(lp["mlp_out"]["bias"])
        sd[f"{pre}.output.LayerNorm.weight"] = np.asarray(lp["mlp_norm"]["scale"])
        sd[f"{pre}.output.LayerNorm.bias"] = np.asarray(lp["mlp_norm"]["bias"])
    return sd


def export_to_huggingface(params: Dict, encoder_cfg: EncoderConfig, out_dir: str, model_type: str = "distilbert"):
    """Write an HF checkpoint folder from a trained model's params.

    ``params`` is the full model param tree; every encoder tower found
    ('encoder', 'query_encoder', 'doc_encoder') is exported (extra heads like
    compressors/score layers are saved as head_weights.npz alongside)."""
    import torch
    import transformers

    os.makedirs(out_dir, exist_ok=True)
    enc_params = params.get("encoder") or params.get("query_encoder")
    if enc_params is None:
        raise ValueError("no encoder tower found in params")
    sd = encoder_params_to_hf_state_dict(enc_params, encoder_cfg, model_type)

    if model_type == "distilbert":
        hf_cfg = transformers.DistilBertConfig(
            vocab_size=encoder_cfg.vocab_size, dim=encoder_cfg.hidden_size,
            n_layers=encoder_cfg.num_layers, n_heads=encoder_cfg.num_heads,
            hidden_dim=encoder_cfg.intermediate_size,
            max_position_embeddings=encoder_cfg.max_position_embeddings,
        )
        model = transformers.DistilBertModel(hf_cfg)
    else:
        hf_cfg = transformers.BertConfig(
            vocab_size=encoder_cfg.vocab_size, hidden_size=encoder_cfg.hidden_size,
            num_hidden_layers=encoder_cfg.num_layers, num_attention_heads=encoder_cfg.num_heads,
            intermediate_size=encoder_cfg.intermediate_size,
            max_position_embeddings=encoder_cfg.max_position_embeddings,
            type_vocab_size=max(encoder_cfg.type_vocab_size, 1),
        )
        model = transformers.BertModel(hf_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    model.save_pretrained(out_dir)

    heads = {
        k: np.asarray(jax_leaf)
        for k, v in params.items()
        if k not in ("encoder", "query_encoder", "doc_encoder")
        for jax_leaf, k in _flatten_head(v, k)
    }
    if heads:
        np.savez(os.path.join(out_dir, "head_weights.npz"), **heads)
    with open(os.path.join(out_dir, "export-info.json"), "w") as f:
        json.dump({"missing_keys": list(missing), "unexpected_keys": list(unexpected)}, f)
    return out_dir


def _flatten_head(tree, prefix):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_head(v, f"{prefix}/{k}")
    else:
        yield tree, prefix
