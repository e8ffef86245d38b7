"""TAS-B query clustering: encode training queries, k-means, assignment file.

Contract: reference distillation/query_clusterer.py:126-242 — encode all
training queries with a baseline dense retriever, train a ~2000-centroid index
(faiss IVF there, on-device k-means here), assign every query to its nearest
centroid, and write one cluster of query ids per line
(``cluster-assignment-ids.tsv`` — the file the TAS-Balanced sampler consumes).

Usage:
    python -m matchmaker_tpu.cli.cluster_queries --model <bert_dot run folder> \
        --queries train_queries.tsv --out cluster-assignment-ids.tsv \
        [--clusters 2000]
"""

from __future__ import annotations

import os

# persistent XLA compile cache: remote/TPU compiles are expensive; cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import argparse
import sys
from collections import defaultdict

import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, single_sequence_loader
from matchmaker_tpu.distillation.dynamic_teacher import load_teacher
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor
from matchmaker_tpu.retrieval.indexes import DynamicClusterIndex


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="baseline bert_dot run folder")
    parser.add_argument("--queries", required=True, help="id\\ttext query file")
    parser.add_argument("--out", required=True)
    parser.add_argument("--clusters", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args()
    return run(args.model, args.queries, args.out, args.clusters, args.batch_size)


def run(model_path: str, queries: str, out: str, clusters: int = 2000,
        batch_size: int = 128) -> int:
    """In-process clustering (callable from the TAS-B recipe driver)."""
    import jax

    model, params, config, tokenizer = load_teacher(model_path)
    cfg = dict(config)
    cfg["batch_size_inference"] = batch_size

    @jax.jit
    def encode(params, ids, mask):
        return model.apply({"params": params}, ids, mask, "query", method=type(model).encode)

    perf = PerformanceMonitor.get()
    perf.start_block("query_encode")
    all_ids, all_vecs = [], []
    for batch, qids in device_prefetch(
        single_sequence_loader(cfg, tokenizer, queries, "query")
    ):
        vecs = np.asarray(encode(params, batch["seq_ids"], batch["seq_mask"]))
        if vecs.ndim == 3:
            # multi-vector encoder (ColBERT): masked mean-pool the token
            # vectors — clustering wants ONE point per query whatever the
            # model family (the reference clusters bert_dot CLS vectors)
            m = np.asarray(batch["seq_mask"])[..., None]
            vecs = (vecs * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-6)
        keep = int(batch["valid"].sum())
        all_vecs.append(vecs[:keep])
        all_ids.extend(qids[:keep])
    vectors = np.concatenate(all_vecs, axis=0)
    perf.stop_block("query_encode", len(all_ids))

    perf.start_block("clustering")
    index = DynamicClusterIndex({"faiss_ivf_list_count": clusters})
    index.index_all(np.array(all_ids), vectors)
    perf.stop_block("clustering", len(all_ids))

    clusters = defaultdict(list)
    for qid, c in zip(all_ids, index._assignments):
        clusters[int(c)].append(qid)
    with open(out, "w", encoding="utf-8") as f:
        for c in sorted(clusters):
            f.write(" ".join(clusters[c]) + "\n")
    perf.print_summary()
    print(f"wrote {len(clusters)} clusters for {len(all_ids)} queries -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
