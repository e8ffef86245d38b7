"""Batch search phase: query encoding → index search → per-query aggregation.

Contract with the reference search phase (dense_retrieval.py:362-455):
queries stream through the encoder, the index returns (scores, seq_ids) per
vector row, and aggregation produces the final doc ranking — plain top-n for
single-vector corpora, max-dedup for multi-vector corpora (maxP/ColBERT rows
share a doc id; keep the max score per doc, dense_retrieval.py:414-429).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Tuple

import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, single_sequence_loader
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor


def aggregate_plain(scores_row, ids_row, top_n: int) -> List[Tuple[str, float]]:
    out = []
    for s, i in zip(scores_row, ids_row):
        if np.isfinite(s):
            out.append((str(i), float(s)))
        if len(out) == top_n:
            break
    return out


def aggregate_max_dedup(scores_row, ids_row, top_n: int) -> List[Tuple[str, float]]:
    """Keep max score per doc id, preserving score order."""
    best: Dict[str, float] = {}
    for s, i in zip(scores_row, ids_row):
        if not np.isfinite(s):
            continue
        key = str(i)
        if key not in best:
            best[key] = float(s)
        if len(best) == top_n:
            break
    return sorted(best.items(), key=lambda kv: kv[1], reverse=True)


def search_queries(
    encode_fn: Callable,  # (params, ids, mask) -> (B, D) [single-vector queries]
    params,
    config,
    tokenizer,
    indexer,
    query_path: str,
    top_n: int,
    dedup: bool = False,
    oversample: int = 2,
) -> Dict[str, List[Tuple[str, float]]]:
    """→ {query_id: [(doc_id, score) ...]} sorted by score desc."""
    perf = PerformanceMonitor.get()
    results: Dict[str, List[Tuple[str, float]]] = {}
    fetch_n = top_n * oversample if dedup else top_n

    loader = single_sequence_loader(config, tokenizer, query_path, "query")
    perf.start_block("search_total")
    n = 0
    for batch, qids in device_prefetch(loader):
        perf.start_block("search_query_encode")
        q_vecs = np.asarray(encode_fn(params, batch["seq_ids"], batch["seq_mask"]))
        perf.stop_block("search_query_encode", len(qids))
        if q_vecs.ndim == 3:
            # multi-vector queries (ColBERT): per-token search + MaxSim merge.
            # Programmatic callers (not going through the CLI's model-type
            # branch, cli/dense_retrieval.py:117-151) land here on the first
            # batch — hand the whole query stream to the working path instead
            # of crashing (the stream restarts from the file, so nothing from
            # this probe batch is lost).
            from matchmaker_tpu.retrieval.colbert_search import (
                TokenVectorStore,
                colbert_search_queries,
            )

            perf.stop_block("search_total", 0)
            rescore_n = int(config.get("colbert_rescore_n", 0))
            rescore_store = None
            # the CLI stamps encode_folder onto the indexer (dense_retrieval.py:102)
            # but not into config — honor both so programmatic callers rescore too
            enc_folder = config.get("encode_folder") or getattr(
                indexer, "encode_folder", None
            )
            if rescore_n > 0 and enc_folder and os.path.isdir(enc_folder):
                rescore_store = TokenVectorStore(enc_folder)
            return colbert_search_queries(
                encode_fn, params, config, tokenizer, indexer, query_path, top_n,
                per_token_candidates=int(config.get("colbert_per_token_candidates", 64)),
                rescore_store=rescore_store,
                rescore_n=rescore_n,
                device_merge=bool(config.get("colbert_device_merge", True)),
            )
        perf.start_block("search_nn_lookup")
        scores, ids = indexer.search(q_vecs, fetch_n)
        perf.stop_block("search_nn_lookup", len(qids))
        perf.start_block("search_aggregation")
        for qi, qid in enumerate(qids):
            agg = aggregate_max_dedup if dedup else aggregate_plain
            results[qid] = agg(scores[qi], ids[qi], top_n)
        perf.stop_block("search_aggregation", len(qids))
        n += len(qids)
    perf.stop_block("search_total", n)
    return results
