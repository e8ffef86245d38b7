"""Multi-vector retrieval: ColBERT token-vector index + late-interaction search,
and max-dedup aggregation for chunked corpora."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchmaker_tpu.retrieval.colbert_search import colbert_search_queries
from matchmaker_tpu.retrieval.encode import encode_corpus, load_encoded
from matchmaker_tpu.retrieval.indexes import FlatIndex
from matchmaker_tpu.retrieval.search import aggregate_max_dedup
from tests.make_tiny_dataset import make_tiny_dataset


def test_aggregate_max_dedup_keeps_best_per_doc():
    scores = np.array([5.0, 4.0, 3.0, 2.0])
    ids = np.array(["d1", "d2", "d1", "d3"])
    out = aggregate_max_dedup(scores, ids, top_n=3)
    assert out[0] == ("d1", 5.0)
    assert dict(out)["d2"] == 4.0
    assert len(out) == 3


def test_colbert_token_index_end_to_end(tmp_path, rng, eight_devices):
    """Bag-of-words per-token 'ColBERT': every query token searches the token
    index; planted-relevance docs must win."""
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.metrics import calculate_metrics_plain, load_qrels, unrolled_to_ranked_result
    from matchmaker_tpu.parallel.mesh import make_mesh

    paths = make_tiny_dataset(str(tmp_path / "data"))
    config = {
        "model_input_type": "independent",
        "token_embedder_type": "embedding",
        "vocab_path": paths["vocab"],
        "max_query_length": 8,
        "max_doc_length": 24,
        "batch_size_inference": 8,
        "token_dtype": "float32",
        "token_block_size": 512,
    }
    tokenizer = build_tokenizer(config)
    vocab_size = tokenizer.vocab_size

    def token_encode(params, ids, mask):
        # per-token one-hot vectors, masked rows zeroed (multi-vector output)
        return jax.nn.one_hot(ids, vocab_size) * mask[..., None]

    enc_dir = str(tmp_path / "encoded")
    encode_corpus(token_encode, None, config, tokenizer, paths["collection"], enc_dir)
    vectors, row_ids = load_encoded(enc_dir)
    assert vectors.shape[0] > 120  # multiple token vectors per doc

    index = FlatIndex({"token_dtype": "float32"}, make_mesh())
    index.prepare(vectors.shape[1])
    index.index(row_ids, vectors)

    results = colbert_search_queries(
        token_encode, None, config, tokenizer, index, paths["queries"],
        top_n=10, per_token_candidates=32,
    )
    metrics = calculate_metrics_plain(
        unrolled_to_ranked_result(results), load_qrels(paths["qrels"])
    )
    assert metrics["QueriesRanked"] == 12
    assert metrics["MRR@10"] > 0.9, metrics["MRR@10"]
