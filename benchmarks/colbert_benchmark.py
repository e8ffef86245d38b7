"""ColBERT late-interaction retrieval components over 1M token vectors.

Decomposes the e2e path of retrieval/colbert_search.py on synthetic data:
  phase 1  per-token candidate search: (B·Lq) query rows through the token
           index (FlatIndex `scann` = fused binmax engine, q-chunked —
           ColBERT sends batch*query_len rows per dispatch)
  phase 2  host MaxSim merge (numpy maximum.at over dense doc slots — the
           single-core host side of the pipeline)

The composite 1/(1/qps1 + 1/qps2) approximates the CLI's end-to-end rate
(the CLI additionally streams query encoding, measured separately at >20k
query-encodes/s). Usage: python benchmarks/colbert_benchmark.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root importable

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk, padding_grain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--token-rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)  # ColBERT compression dim
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--query-len", type=int, default=32)
    ap.add_argument("--cands", type=int, default=64)  # per-token candidates
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--int8", action="store_true",
                    help="int8 token corpus (MXU double-rate + half HBM traffic)")
    ap.add_argument("--q-chunk", type=int, default=256,
                    help="query rows per kernel launch (corpus sweeps = flat_q/q_chunk)")
    ap.add_argument("--per-bin", type=int, default=2,
                    help="binmax candidates per 128-row bin (1 = skip the rank-2 pass)")
    ap.add_argument("--tile-rows", type=int, default=2048)
    args = ap.parse_args()
    print(f"[colbert-bench] device={jax.devices()[0]} tokens={args.token_rows} "
          f"B={args.batch} Lq={args.query_len} k={args.cands} "
          f"int8={args.int8} q_chunk={args.q_chunk}", flush=True)

    grain = padding_grain(args.tile_rows, args.per_bin)
    n_pad = -(-args.token_rows // grain) * grain
    if args.int8:
        # ColBERT token vectors are L2-normalized (cosine MaxSim) — absmax
        # int8 is near-lossless there; scales are per 128-row bin (the
        # kernel's dequant granularity). Synthetic stand-in here
        def make(key):
            v = jax.random.normal(key, (n_pad, args.dim), jnp.float32)
            v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
            s = jnp.maximum(
                jnp.abs(v).reshape(-1, 128, args.dim).max(axis=(1, 2), keepdims=False)
                / 127.0, 1e-10)[:, None]
            vq = jnp.clip(jnp.round(v / jnp.repeat(s[:, 0], 128)[:, None]), -127, 127)
            return vq.astype(jnp.int8), s
        corpus, cscales = jax.jit(make)(jax.random.PRNGKey(0))
        jax.block_until_ready((corpus, cscales))
    else:
        corpus = jax.jit(lambda key: jax.random.normal(key, (n_pad, args.dim), jnp.bfloat16))(
            jax.random.PRNGKey(0))
        cscales = None
        jax.block_until_ready(corpus)
    flat_q = args.batch * args.query_len
    queries = jax.random.normal(jax.random.PRNGKey(1), (flat_q, args.dim), jnp.float32)

    # phase 1: device per-token candidate search (q-chunked binmax), honest
    @jax.jit
    def search(q, seed, c):
        vals, ids = binmax_scan_topk(
            q + seed * 1e-12, c, args.cands, n_valid=args.token_rows,
            corpus_scales=cscales, q_chunk=args.q_chunk,
            per_bin=args.per_bin, tile_rows=args.tile_rows)
        return vals.sum() + (ids.sum() % 2).astype(jnp.float32)

    t0 = time.time()
    seed = search(queries, jnp.float32(0.0), corpus); _ = float(seed)
    print(f"[colbert-bench] compiled in {time.time()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = seed
        for _ in range(args.iters):
            s = search(queries, s, corpus)
        _ = float(s)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    qps_dev = args.batch / best
    print(f"[colbert-bench] device per-token search: {best*1e3:.1f} ms/batch "
          f"= {qps_dev:.0f} query-batches... QPS {qps_dev:.0f}", flush=True)

    # phase 2: host MaxSim merge — the PRODUCTION aggregation
    # (retrieval/colbert_search.aggregate_maxsim_batch, batch-vectorized)
    from matchmaker_tpu.retrieval.colbert_search import aggregate_maxsim_batch

    vals, ids = jax.jit(lambda q, c: binmax_scan_topk(
        q, c, args.cands, n_valid=args.token_rows,
        corpus_scales=cscales, q_chunk=args.q_chunk,
        per_bin=args.per_bin, tile_rows=args.tile_rows))(queries, corpus)
    scores = np.asarray(vals).reshape(args.batch, args.query_len, args.cands)
    idx = (np.asarray(ids) // 8).reshape(args.batch, args.query_len, args.cands)  # ~8 tok/doc
    mask = np.ones((args.batch, args.query_len), np.float32)

    aggregate_maxsim_batch(scores, idx, mask, 100)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        aggregate_maxsim_batch(scores, idx, mask, 100)
    host_t = (time.perf_counter() - t0) / 3
    qps_host = args.batch / host_t
    print(f"[colbert-bench] host MaxSim merge: {host_t*1e3:.1f} ms/batch = {qps_host:.0f} QPS",
          flush=True)

    # phase 2b: DEVICE MaxSim merge (round 3) — the no-sort segmented
    # max-sum (retrieval/colbert_search._device_maxsim_merge): candidates
    # stay in HBM between search and aggregation
    from matchmaker_tpu.retrieval.colbert_search import _device_maxsim_merge

    slots_d = jnp.asarray(idx.astype(np.int32))
    scores_d = jnp.asarray(scores)
    valid_d = jnp.isfinite(scores_d) & (slots_d >= 0)

    @jax.jit
    def dev_merge(s, d, v, seed):
        vals, sel = _device_maxsim_merge(s + seed * 1e-12, d, v, 100)
        return vals.sum() + (sel.sum() % 2).astype(jnp.float32)

    seed = dev_merge(scores_d, slots_d, valid_d, jnp.float32(0)); _ = float(seed)
    best_m = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = seed
        for _ in range(args.iters):
            s = dev_merge(scores_d, slots_d, valid_d, s)
        _ = float(s)
        best_m = min(best_m, (time.perf_counter() - t0) / args.iters)
    qps_devmerge = args.batch / best_m
    print(f"[colbert-bench] device MaxSim merge: {best_m*1e3:.1f} ms/batch = "
          f"{qps_devmerge:.0f} QPS", flush=True)

    composite = 1.0 / (1.0 / qps_dev + 1.0 / qps_host)
    composite_dev = 1.0 / (1.0 / qps_dev + 1.0 / qps_devmerge)
    print(json.dumps({
        "token_rows": args.token_rows, "batch": args.batch, "query_len": args.query_len,
        "device_search_qps": round(qps_dev, 1), "host_merge_qps": round(qps_host, 1),
        "device_merge_qps": round(qps_devmerge, 1),
        "composite_qps": round(composite, 1),
        "composite_device_qps": round(composite_dev, 1),
    }))


if __name__ == "__main__":
    main()
