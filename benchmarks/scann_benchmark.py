"""Literal ScaNN tree-AH at the reference's geometry, vs the binmax default.

The reference's ScaNN config is ``tree(num_leaves=sqrt(N),
num_leaves_to_search=100).score_ah(2, 0.2).reorder(top_n)`` (reference
scann_index.py:32-35). This benchmark builds retrieval/scann_tree_ah.py's
TPU-native equivalent at exactly that geometry over the same synthetic
clustered corpus the flat benchmarks use and measures QPS + recall@k vs
f32-exact ground truth across a leaves_to_search sweep — the number that
decides whether the literal shape or the fused binmax scan (the `scann`
factory default) is the better TPU operating point.

Usage:
  python benchmarks/scann_benchmark.py --rows 1000000 --queries 256 --k 1000 \
      --leaves-to-search 50,100,200
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

import numpy as np

import search_benchmark as sb


def log(msg):
    print(f"[scann-bench] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--leaves", type=int, default=0,
                    help="num_leaves; 0 = sqrt(rows) like the reference")
    ap.add_argument("--leaves-to-search", type=str, default="50,100,200")
    ap.add_argument("--reorder-mult", type=int, default=1,
                    help="reorder depth as a multiple of k (reference: 1)")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--train-iters", type=int, default=5)
    ap.add_argument("--block", type=int, default=262_144)
    args = ap.parse_args()

    from matchmaker_tpu.retrieval.scann_tree_ah import ScaNNTreeAHIndex

    gen = sb.make_generators(args.dim, args.block)
    n_blocks = -(-args.rows // args.block)
    log(f"streaming {args.rows} corpus rows to host ({n_blocks} blocks)")
    corpus = np.empty((args.rows, args.dim), np.float32)
    for i in range(n_blocks):
        b = np.asarray(gen(i))
        lo = i * args.block
        corpus[lo : lo + args.block] = b[: args.rows - lo]

    queries = sb.make_queries(gen, args.queries, args.dim)
    log("computing f32-exact ground truth (regenerated blocks)")
    gt = sb.exact_ground_truth(gen, queries, args.rows, args.block, args.k)

    leaves = args.leaves or int(args.rows ** 0.5)
    sweeps = [int(x) for x in args.leaves_to_search.split(",")]
    index = ScaNNTreeAHIndex({
        "scann_num_leaves": leaves,
        "scann_leaves_to_search": sweeps[0],
        "scann_reorder_mult": args.reorder_mult,
        "ivf_train_iters": args.train_iters,
        "token_dtype": "float16",
    })
    log(f"building tree-AH: {leaves} leaves over {args.rows} rows "
        f"(k-means tree + anisotropic int8 residual codes)")
    t0 = time.perf_counter()
    index.index(np.arange(args.rows), corpus)
    build_s = time.perf_counter() - t0
    log(f"built in {build_s:.1f}s; storage {index.storage_bytes() / 2**30:.2f} GiB")
    del corpus

    q_np = np.asarray(queries)
    results = []
    for lts in sweeps:
        index.nprobe = lts
        log(f"leaves_to_search={lts}: warm-up (compile + device upload)")
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
        row = {
            "leaves_to_search": lts,
            "qps": round(qps, 1),
            "recall_at_k": round(float(hit.mean()), 4),
            "k": args.k,
            "candidate_rows": int(index._budget(min(lts, index.n_clusters_eff))),
            "build_s": round(build_s, 1),
        }
        log(f"  {row}")
        results.append(row)

    print(json.dumps({"rows": args.rows, "leaves": leaves,
                      "reorder_mult": args.reorder_mult, "results": results}))


if __name__ == "__main__":
    main()
