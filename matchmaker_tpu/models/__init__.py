"""Model factory.

Contract: reference models/all.py:47-208 — ``get_model(config, ...)`` maps the
``model`` config name (including ``maxP->``/``meanP->`` adapter prefixes) to a
model instance; ``get_word_embedder`` resolves the embedding source for
GloVe-era models. Here the factory returns an un-initialized Flax module plus
an example batch for shape-driven init.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from matchmaker_tpu.config import model_base_name
from matchmaker_tpu.models.base import Ranker
from matchmaker_tpu.models.knrm import KNRM
from matchmaker_tpu.models.tk import TK

_REGISTRY = {}


def register_model(name: str, cls) -> None:
    _REGISTRY[name] = cls


register_model("knrm", KNRM)
register_model("tk", TK)


def _register_transformer_models():
    from matchmaker_tpu.models.bert_cat import BertCat
    from matchmaker_tpu.models.bert_dot import BertDot, BertDotDualEncoder
    from matchmaker_tpu.models.colbert import ColBert
    from matchmaker_tpu.models.conv_knrm import ConvKNRM
    from matchmaker_tpu.models.drmm import DRMM
    from matchmaker_tpu.models.duet import Duet
    from matchmaker_tpu.models.idcm import IDCM, IDCMInferenceOnly
    from matchmaker_tpu.models.matchpyramid import MatchPyramid
    from matchmaker_tpu.models.pacrr import PACRR, CoPACRR
    from matchmaker_tpu.models.parade import Parade
    from matchmaker_tpu.models.prettr import PreTTR
    from matchmaker_tpu.models.tk_sparse import TKSparse
    from matchmaker_tpu.models.tkl import TKL

    register_model("bert_cat", BertCat)
    register_model("bert_dot", BertDot)
    register_model("bert_dot_dualencoder", BertDotDualEncoder)
    register_model("colbert", ColBert)
    register_model("conv_knrm", ConvKNRM)
    register_model("drmm", DRMM)
    register_model("duet", Duet)
    register_model("idcm", IDCM)
    register_model("idcm_inference_only", IDCMInferenceOnly)
    register_model("matchpyramid", MatchPyramid)
    register_model("pacrr", PACRR)
    register_model("co_pacrr", CoPACRR)
    register_model("parade", Parade)
    register_model("prettr", PreTTR)
    register_model("tk_sparse", TKSparse)
    register_model("tkl", TKL)


_register_transformer_models()


def load_glove_embeddings(path: str, vocab, dim: int) -> np.ndarray:
    """Text-format embedding file (``token v1 v2 ...``) → (vocab, dim) matrix.
    Unseen tokens get small random vectors; PAD row stays zero."""
    rng = np.random.default_rng(42)
    mat = rng.normal(0.0, 0.1, size=(len(vocab), dim)).astype(np.float32)
    mat[0] = 0.0
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) != dim + 1:
                continue
            tok = parts[0]
            if tok in vocab.token_to_id:
                mat[vocab.token_to_id[tok]] = np.asarray(parts[1:], dtype=np.float32)
    return mat


def get_model(config, tokenizer) -> Ranker:
    """Build the model module named by ``config['model']``."""
    name = model_base_name(config["model"])
    wrapper = config["model"].split("->")[0].strip().lower() if "->" in config["model"] else None

    cfg = dict(config)
    cfg["_vocab_size"] = tokenizer.vocab_size

    pretrained = None
    if config.get("token_embedder_type") == "embedding" and config.get("pre_trained_embedding"):
        pretrained = load_glove_embeddings(
            config["pre_trained_embedding"],
            tokenizer.vocab,
            config.get("token_embedding_size", 300),
        )
    elif config.get("token_embedder_type") == "bert_embedding":
        # use only a BERT checkpoint's word-embedding table as static
        # embeddings (reference modules/bert_embedding_token_embedder.py:21-83)
        from matchmaker_tpu.models.hf_import import encoder_checkpoint_available, load_hf_encoder

        name = str(config.get("bert_pretrained_model", ""))
        if name and encoder_checkpoint_available(name):
            enc_cfg, enc_params = load_hf_encoder(name)
            pretrained = np.asarray(enc_params["word_embeddings"]["embedding"])
            cfg["token_embedding_size"] = pretrained.shape[1]

    if name not in _REGISTRY:
        raise ValueError(f"Model not known: {config['model']}")

    if config.get("token_embedder_type") == "bert_vectors":
        # frozen/fine-tuned full transformer as the contextual embedding
        # source for embedding-family models (reference models/all.py:70-77)
        from matchmaker_tpu.models.bert_vectors import ContextualVectorsAdapter
        from matchmaker_tpu.models.encoder import encoder_config_from_model_name

        cfg["_external_embedding"] = True
        cfg["token_embedding_size"] = encoder_config_from_model_name(config).hidden_size
        inner = _REGISTRY[name].from_config(cfg, pretrained)
        if not hasattr(type(inner), "score_embeddings"):
            raise ValueError(
                f"bert_vectors requires a model with score_embeddings (tk/knrm); got {name}"
            )
        inner = ContextualVectorsAdapter.from_config(cfg, inner)
    else:
        inner = _REGISTRY[name].from_config(cfg, pretrained)

    if wrapper in ("maxp", "meanp"):
        from matchmaker_tpu.models.adapters import ChunkPoolAdapter

        inner = ChunkPoolAdapter.from_config(cfg, inner, pool=wrapper[:-1])
    return inner


def init_params(model, config, rng):
    """Init module params; if the configured HF checkpoint is locally
    available, replace every ``TransformerEncoderLM`` subtree with converted
    pre-trained weights (reference warmstart semantics, models/bert_*.py)."""
    variables = model.init(rng, example_batch(config))
    params = variables["params"]
    name = str(config.get("bert_pretrained_model", ""))
    if config.get("token_embedder_type") != "embedding" and name:
        from matchmaker_tpu.models.hf_import import encoder_checkpoint_available, load_hf_encoder

        if encoder_checkpoint_available(name):
            _, enc_params = load_hf_encoder(name)
            import jax

            enc_params = jax.tree_util.tree_map(np.asarray, enc_params)
            for key in list(params.keys()):
                if key in ("encoder", "query_encoder", "doc_encoder"):
                    params[key] = enc_params
    return params


def example_batch(config, batch_size: int = 2) -> Dict[str, np.ndarray]:
    """Zero batch with the right keys/shapes for module init."""
    max_q = config.get("max_query_length", 30)
    max_d = config.get("max_doc_length", 200)
    if config.get("model_input_type") == "concatenated":
        length = max_q + max_d
        return {
            "seq_ids": np.zeros((batch_size, length), np.int32),
            "seq_mask": np.ones((batch_size, length), np.float32),
            "seq_type_ids": np.zeros((batch_size, length), np.int32),
        }
    return {
        "query_ids": np.zeros((batch_size, max_q), np.int32),
        "query_mask": np.ones((batch_size, max_q), np.float32),
        "doc_ids": np.zeros((batch_size, max_d), np.int32),
        "doc_mask": np.ones((batch_size, max_d), np.float32),
    }
