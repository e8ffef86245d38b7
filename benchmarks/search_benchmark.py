"""Exhaustive-search benchmark: QPS + recall vs exact, on the real chip.

Measures the BASELINE.md north-star configurations over a synthetic clustered
normalized corpus (the shape of real dense-retrieval embeddings):

  exact      f32 corpus, exact top-k             — the ground-truth ranking
  approx     int8-global + approx_max_k          — max-speed scan (recall<1)
  twostage   int8 approx candidates + exact rescore (int8 or f16)
             — the recall-parity configuration (ops/mips_twostage.py)

The corpus is generated on device block-by-block from a fixed PRNG (never
materialized in f32), so 8.9M x 768 fits: int8 copy 6.8 GB; the f16 rescore
copy (13.7 GB) only fits for per-chip shard sizes (<=2M rows), which is the
v5e-8 configuration (8.9M / 8 chips = 1.11M rows/chip).

Timing uses the chained-dependency protocol (iteration i+1 consumes a scalar
of iteration i; one device fetch bounds the whole chain) because the axon
tunnel's block_until_ready is asynchronous.

Usage:
  python benchmarks/search_benchmark.py --rows 1113000 --dim 768 --rescore float16
  python benchmarks/search_benchmark.py --rows 8900000 --dim 768 --rescore int8
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

from matchmaker_tpu.ops.mips_quant import quantized_blocked_topk
from matchmaker_tpu.ops.mips_twostage import twostage_exact_topk

N_CENTERS = 4096
NOISE = 0.35


def _norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def make_generators(dim: int, block: int):
    centers = _norm(jax.random.normal(jax.random.PRNGKey(7), (N_CENTERS, dim)))

    @jax.jit
    def gen_block_f32(i):
        key = jax.random.fold_in(jax.random.PRNGKey(13), i)
        assign = jax.random.randint(jax.random.fold_in(key, 0), (block,), 0, N_CENTERS)
        noise = jax.random.normal(jax.random.fold_in(key, 1), (block, dim))
        return _norm(centers[assign] + NOISE * noise)

    return gen_block_f32


def build_corpus(rows: int, dim: int, block: int, keep_f16: bool):
    """int8 corpus (+global scale) and optionally an f16 copy, on device.

    Blocks are written into preallocated donated buffers so peak memory is
    buffer + one f32 block (a concatenate would double the corpus)."""
    gen = make_generators(dim, block)
    n_blocks = -(-rows // block)
    padded = n_blocks * block
    scale = jnp.float32(1.0 / 127.0)  # normalized rows → |x| <= 1

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_int8(buf, b, i):
        q = jnp.clip(jnp.round(b / scale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, q, (i * block, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_f16(buf, b, i):
        return jax.lax.dynamic_update_slice(buf, b.astype(jnp.float16), (i * block, 0))

    values = jnp.zeros((padded, dim), jnp.int8)
    rescore = jnp.zeros((padded, dim), jnp.float16) if keep_f16 else None
    for i in range(n_blocks):
        b = gen(i)
        values = fill_int8(values, b, i)
        if keep_f16:
            rescore = fill_f16(rescore, b, i)
    # padded tail rows stay zero → scores 0, never in any top-k of interest
    jax.block_until_ready(values)
    return values, scale, rescore, gen


def make_queries(gen, n_queries: int, dim: int):
    base = gen(0)[:n_queries]
    noise = jax.random.normal(jax.random.PRNGKey(99), (n_queries, dim))
    return _norm(base + 0.3 * noise).astype(jnp.float32)


def exact_ground_truth(gen, queries, rows: int, block: int, k: int):
    """Exact f32 top-k by regenerating corpus blocks (never stored)."""
    n_blocks = -(-rows // block)

    @jax.jit
    def score_block(q, i):
        b = gen(i)
        scores = jnp.einsum("qd,nd->qn", q, b, preferred_element_type=jnp.float32)
        base = i * block
        row_ids = base + jnp.arange(block)
        scores = jnp.where(row_ids[None, :] < rows, scores, -jnp.inf)
        v, idx = jax.lax.top_k(scores, k)
        return v, idx + base

    all_v, all_i = [], []
    for i in range(n_blocks):
        v, idx = score_block(queries, i)
        all_v.append(np.asarray(v))
        all_i.append(np.asarray(idx))
    vals = np.concatenate(all_v, axis=1)
    idxs = np.concatenate(all_i, axis=1)
    order = np.argsort(-vals, axis=1)[:, :k]
    return np.take_along_axis(idxs, order, axis=1)


def timed_qps(fn, queries, iters: int, reps: int = 3):
    """Seed-chained timing (bench.py protocol): each dispatch's input depends
    on the previous output scalar; one final fetch bounds the chain. Keeps the
    compiled graph small (one search) — a scan-of-searches chain exceeds the
    remote-compile service's limits."""

    @jax.jit
    def step(q, seed):
        vals, _ = fn(q + seed * 1e-12)
        return vals[:, 0].sum()

    seed = step(queries, jnp.float32(0.0))  # compile + warm
    _ = float(seed)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            seed = step(queries, seed)
        s = float(seed)
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    return queries.shape[0] / best, s


def recall_at(pred_ids: np.ndarray, true_ids: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(set(pred_ids[i][:k]) & set(true_ids[i][:k])) / k for i in range(len(true_ids))
    ]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_113_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--block", type=int, default=131072)
    ap.add_argument("--oversample", type=int, default=4)
    ap.add_argument("--rescore", choices=["int8", "float16", "none"], default="float16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()

    print(f"[search-bench] device={jax.devices()[0]} rows={args.rows} dim={args.dim} k={args.k}")
    keep_f16 = args.rescore == "float16"
    t0 = time.time()
    values, scale, rescore, gen = build_corpus(args.rows, args.dim, args.block, keep_f16)
    queries = make_queries(gen, args.queries, args.dim)
    print(f"[search-bench] corpus built in {time.time()-t0:.0f}s "
          f"(int8 {values.nbytes/1e9:.1f} GB{', f16 %.1f GB' % (rescore.nbytes/1e9) if rescore is not None else ''})")

    results = {"rows": args.rows, "dim": args.dim, "k": args.k, "queries": args.queries}

    true_ids = None
    if not args.skip_exact:
        t0 = time.time()
        true_ids = exact_ground_truth(gen, queries, args.rows, args.block, args.k)
        print(f"[search-bench] exact ground truth in {time.time()-t0:.0f}s")

    def run(name, fn):
        qps, _ = timed_qps(fn, queries, args.iters)
        _, ids = jax.jit(fn)(queries)
        ids = np.asarray(ids)
        entry = {"qps": round(qps, 1)}
        if true_ids is not None:
            entry["recall@10"] = round(recall_at(ids, true_ids, 10), 4)
            entry[f"recall@{args.k}"] = round(recall_at(ids, true_ids, args.k), 4)
        results[name] = entry
        print(f"[search-bench] {name}: {entry}")

    run("approx_int8", lambda q: quantized_blocked_topk(
        q, values, scale, args.k, block_size=args.block, approx=True, recall_target=0.95))
    run(f"twostage_{args.rescore}", lambda q: twostage_exact_topk(
        q, values, scale, args.k, oversample=args.oversample, block_size=args.block,
        recall_target=0.95, rescore_corpus=rescore))
    # the v5e-8 merge cost: one exact top-k over (Q, 8k) partials
    partials = jnp.tile(jnp.asarray(np.random.default_rng(0).normal(
        size=(args.queries, args.k)).astype(np.float32)), (1, 8))
    merge_qps, _ = timed_qps(lambda q: jax.lax.top_k(partials + q[:, :1] * 0, args.k), queries, args.iters)
    results["merge_8shard_qps"] = round(merge_qps, 1)
    print(f"[search-bench] 8-shard merge alone: {merge_qps:.0f} QPS equivalent")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
