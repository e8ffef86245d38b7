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

import functools
import json
import os
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, single_sequence_loader
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor


class TokenVectorStore:
    """Random access to per-document token vectors from an encode folder.

    The encode phase (retrieval/encode.py) writes variable-length per-doc
    token-vector spans into fixed-size blocks plus a ``doc_infos`` span table;
    this store resolves ``doc_id → (n_tokens, D)`` through memmapped blocks —
    the candidate-refinement data source the reference's vestigial ColBERT
    branch gestured at (dense_retrieval.py:398-412)."""

    def __init__(self, folder: str):
        with open(os.path.join(folder, "encode_meta.json")) as f:
            meta = json.load(f)
        self._blocks = [
            np.load(os.path.join(folder, f"token_reps_{i}.npy"), mmap_mode="r")
            for i in range(meta["blocks"])
        ]
        data = np.load(os.path.join(folder, "doc_infos.npz"), allow_pickle=True)
        ids, spans = data["ids"], data["spans"]
        self._span = {str(sid): tuple(span) for sid, span in zip(ids, spans)}
        self.dim = int(meta["dim"])
        self.max_tokens = int(max((e - s for _, s, e in self._span.values()), default=1))

    def get(self, doc_id: str) -> np.ndarray:
        block, start, end = self._span[str(doc_id)]
        return np.asarray(self._blocks[block][start:end], dtype=np.float32)


@functools.partial(jax.jit, static_argnames=())
def _exact_maxsim(q_vecs, q_mask, d_vecs, d_mask):
    """(Lq,D)·(C,T,D) → (C,) exact MaxSim: max over doc tokens, sum over
    (masked) query tokens."""
    per = jnp.einsum("ld,ctd->clt", q_vecs, d_vecs, preferred_element_type=jnp.float32)
    per = jnp.where(d_mask[:, None, :] > 0, per, -jnp.inf)
    term = per.max(axis=-1)  # (C, Lq)
    term = jnp.where(q_mask[None, :] > 0, term, 0.0)
    # all-padding docs produce -inf terms for every live query token
    term = jnp.where(jnp.isfinite(term), term, 0.0)
    return term.sum(axis=-1)


def exact_rescore(
    q_vecs: np.ndarray,  # (Lq, D)
    q_mask: np.ndarray,  # (Lq,)
    candidates: List[Tuple[str, float]],
    store: TokenVectorStore,
    top_n: int,
    pad_candidates: int,
    pad_tokens: int,
) -> List[Tuple[str, float]]:
    """Re-score candidate docs with the true MaxSim over their stored token
    vectors; static (pad_candidates, pad_tokens, D) shapes keep one compile."""
    c = min(len(candidates), pad_candidates)
    d_vecs = np.zeros((pad_candidates, pad_tokens, store.dim), dtype=np.float32)
    d_mask = np.zeros((pad_candidates, pad_tokens), dtype=np.float32)
    for i, (doc_id, _) in enumerate(candidates[:c]):
        vecs = store.get(doc_id)[:pad_tokens]
        d_vecs[i, : vecs.shape[0]] = vecs
        d_mask[i, : vecs.shape[0]] = 1.0
    scores = np.asarray(
        _exact_maxsim(jnp.asarray(q_vecs), jnp.asarray(q_mask), jnp.asarray(d_vecs), jnp.asarray(d_mask))
    )
    rescored = [(candidates[i][0], float(scores[i])) for i in range(c)]
    rescored.sort(key=lambda kv: kv[1], reverse=True)
    return rescored[:top_n]


def colbert_search_queries(
    encode_fn: Callable,  # (params, ids, mask) -> (B, Lq, D) multi-vector queries
    params,
    config,
    tokenizer,
    indexer,
    query_path: str,
    top_n: int,
    per_token_candidates: int = 64,
    rescore_store: Optional[TokenVectorStore] = None,
    rescore_n: int = 0,
) -> Dict[str, List[Tuple[str, float]]]:
    perf = PerformanceMonitor.get()
    results: Dict[str, List[Tuple[str, float]]] = {}
    if rescore_store is not None and rescore_n > 0:
        # fixed padded shapes: one compile for the whole query stream
        pad_c = rescore_n
        pad_t = -(-rescore_store.max_tokens // 8) * 8

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
            # vectorized per query: per token, best retrieved score per doc
            # (np.maximum.at over dense doc slots); MaxSim sum over tokens —
            # a missing (token, doc) retrieval contributes 0 (lower bound)
            valid = np.isfinite(scores[qi]) & (mask[qi][:, None] > 0)
            flat_ids = ids[qi][valid]
            if flat_ids.size == 0:
                results[qid] = []
                continue
            uniq, inv = np.unique(flat_ids.astype(str), return_inverse=True)
            totals = np.zeros(len(uniq), np.float64)
            inv_full = np.full(ids[qi].shape, -1, np.int64)
            inv_full[valid] = inv
            for t in range(lq):
                row_valid = valid[t]
                if not row_valid.any():
                    continue
                best = np.full(len(uniq), -np.inf)
                np.maximum.at(best, inv_full[t][row_valid], scores[qi, t][row_valid])
                totals += np.where(np.isfinite(best), best, 0.0)
            order = np.argsort(-totals)
            if rescore_store is not None and rescore_n > 0:
                # exact MaxSim refinement of the approximate candidate pool
                cands = [(str(uniq[j]), float(totals[j])) for j in order[:rescore_n]]
                ranked = exact_rescore(
                    q_vecs[qi], mask[qi], cands, rescore_store, top_n, pad_c, pad_t
                )
            else:
                ranked = [(str(uniq[j]), float(totals[j])) for j in order[:top_n]]
            results[qid] = ranked
        perf.stop_block("search_aggregation", len(qids))
        n += len(qids)
    perf.stop_block("search_total", n)
    return results
