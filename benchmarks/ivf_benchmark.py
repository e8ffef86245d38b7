"""IVF at the reference's scale: 20k lists / nprobe 500 over 8.9M×768.

The reference's default approximate config is faiss IVF with
``faiss_index_type: ivf, faiss_ivf_list_count: 20000, faiss_ivf_nprobe: 500``
(reference config/dense_retrieval/minimal-usage-example.yaml:20-45,
faiss_indices.py:106-145). This benchmark builds the TPU-native IVFIndex
(k-means on a bounded device subsample + streamed assignment + CSR storage)
at exactly that geometry over the same synthetic clustered corpus the flat
benchmarks use, and measures end-to-end search QPS + recall@k vs f32-exact
ground truth across an nprobe sweep.

Expected shape of the result (documented either way in docs/tpu_design.md):
IVF's economics differ on TPU — the per-query candidate GATHER is random
access over HBM rows, while the fused binmax kernel STREAMS the whole corpus
through the MXU sequentially. At nprobe=500 the candidate budget is ~5% of
the corpus, so IVF trades a 20x compute reduction for a gather-bound memory
pattern; whichever wins, the number goes in PARITY.md next to binmax's
10.4k QPS.

Usage:
  python benchmarks/ivf_benchmark.py --rows 8900000 --lists 20000 \
      --nprobes 50,100,500 --queries 256 --k 1000
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO = _Path(__file__).resolve().parent.parent
_sys.path.insert(0, str(_REPO))
_sys.path.insert(0, str(_REPO / "benchmarks"))

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

import search_benchmark as sb


def log(msg):
    print(f"[ivf-bench] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_900_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--lists", type=int, default=20_000)
    ap.add_argument("--nprobes", type=str, default="50,100,500")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--train-iters", type=int, default=5)
    ap.add_argument("--block", type=int, default=262_144)
    args = ap.parse_args()

    from matchmaker_tpu.retrieval.indexes import IVFIndex

    gen = sb.make_generators(args.dim, args.block)
    n_blocks = -(-args.rows // args.block)

    log(f"streaming {args.rows} corpus rows to host ({n_blocks} blocks)")
    t0 = time.perf_counter()
    corpus = np.empty((args.rows, args.dim), np.float32)
    for i in range(n_blocks):
        b = np.asarray(gen(i))
        lo = i * args.block
        corpus[lo : lo + args.block] = b[: args.rows - lo]
    log(f"corpus on host in {time.perf_counter() - t0:.1f}s "
        f"({corpus.nbytes / 2**30:.1f} GiB)")

    queries = sb.make_queries(gen, args.queries, args.dim)
    log("computing f32-exact ground truth (regenerated blocks)")
    t0 = time.perf_counter()
    gt = sb.exact_ground_truth(gen, queries, args.rows, args.block, args.k)
    log(f"ground truth in {time.perf_counter() - t0:.1f}s")

    nprobes = [int(x) for x in args.nprobes.split(",")]
    config = {
        "faiss_ivf_list_count": args.lists,
        "faiss_ivf_nprobe": nprobes[0],
        "ivf_train_iters": args.train_iters,
        "token_dtype": "float16",
    }
    index = IVFIndex(config)
    log(f"building IVF: {args.lists} lists over {args.rows} rows "
        f"(k-means on subsample + streamed assignment)")
    t0 = time.perf_counter()
    index.index(np.arange(args.rows), corpus)
    build_s = time.perf_counter() - t0
    counts = np.diff(index._offsets)
    log(f"built in {build_s:.1f}s; cluster sizes p50={int(np.median(counts))} "
        f"p99={int(np.percentile(counts, 99))} max={int(counts.max())}")
    del corpus  # the index holds the sorted f16 copy

    q_np = np.asarray(queries)
    results = []
    for nprobe in nprobes:
        index.nprobe = nprobe
        log(f"nprobe={nprobe}: warm-up (compile + device corpus upload)")
        # warm with the FULL query shape: search chunks queries by the
        # candidate budget, so a small warm-up batch compiles a different
        # chunk shape and the timed run would re-compile inside the clock
        t0 = time.perf_counter()
        index.search(q_np, args.k)
        log(f"  warm in {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        vals, ids = index.search(q_np, args.k)
        elapsed = time.perf_counter() - t0
        qps = args.queries / elapsed
        hit = np.zeros(args.queries)
        for qi in range(args.queries):
            hit[qi] = len(set(ids[qi].tolist()) & set(gt[qi].tolist())) / args.k
        rec = float(hit.mean())
        r_budget = index._budget(min(nprobe, index.n_clusters_eff))
        row = {
            "nprobe": nprobe,
            "qps": round(qps, 1),
            "recall_at_k": round(rec, 4),
            "k": args.k,
            "candidate_rows": int(r_budget),
            "scanned_frac": round(r_budget / args.rows, 4),
            "build_s": round(build_s, 1),
        }
        log(f"  {row}")
        results.append(row)

    print(json.dumps({"rows": args.rows, "lists": args.lists, "results": results}))


if __name__ == "__main__":
    main()
