"""Exhaustive-search benchmark: QPS + recall vs exact, on the real chip.

Measures the BASELINE.md north-star configurations over a synthetic clustered
normalized corpus (the shape of real dense-retrieval embeddings):

  f32-exact     ground truth (regenerated block-wise, never stored)
  f16-exact     exact ranking over the fp16 corpus — THE parity target
                (the reference's default index is faiss IndexFlatIP over fp16)
  approx_int8   int8-global + approx_max_k — max-speed scan
  f16scan       bf16 scan over the f16 corpus + approx_max_k — the
                recall-parity production config (ops/mips_f16.py)
  twostage_*    int8 approx candidates + exact rescore (ops/mips_twostage.py)

Measured v5e results (clustered 768-dim corpus, k=1000, Q=256, padding
masked via n_valid — round 1 left the build buffer's zero rows unmasked,
which polluted every deep-top-k recall line; score 0.0 beats the real
rank-1000 hits on this corpus):
  1.113M rows (one v5e-8 shard of MS MARCO):
    binmax (fused Pallas + mid tournament)  39.8k QPS solo / 64.5k saturated
        @ recall@1000 0.9967 vs f32 / 0.998 vs f16-exact
    f16scan_full           15.0k QPS @ 0.9863 vs f32
    f16scan blk=557056      4.4k QPS @ 0.9928 vs f32
    approx_int8             5.0k QPS @ 0.9124 vs f32  (strictly dominated by binmax)
  8.9M rows single chip (13.7 GB bf16 in HBM): binmax + level-2 tournament
    10,400 QPS @ recall@1000 0.9953 vs f32-exact.
  All figures consume values AND ids in full (timed_qps docstring: XLA
    narrows top_k to the consumed columns, values-only timings overstate).
  The f16-exact ranking overlaps f32-exact at 0.998@1000 — fp16 storage
    rounding costs ~0.2% (the round-1 "0.9447 parity line" was the padding
    artifact above, not storage rounding).

The corpus is generated on device block-by-block from a fixed PRNG; at 8.9M
only one copy fits (int8 6.8 GB or f16 13.7 GB), so pick configs accordingly.
Timing uses the seed-chained protocol (iteration i+1 consumes a scalar of
iteration i) because the tunnel's block_until_ready is asynchronous, and the
corpora flow through jit arguments (a closure would serialize GBs of
constants into the remote-compile payload).

Usage:
  python benchmarks/search_benchmark.py --rows 1113000 --configs approx_int8,f16scan,f16scan_full
  python benchmarks/search_benchmark.py --rows 8900000 --configs f16scan --queries 256
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root importable

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

from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk
from matchmaker_tpu.ops.mips_f16 import f16_scan_topk
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


def build_corpus(rows: int, dim: int, block: int, keep_f16: bool, keep_int8: bool = True,
                 bf16_direct: bool = False):
    """int8 corpus (+global scale) and/or a 16-bit copy, on device.

    Blocks are written into preallocated donated buffers so peak memory is
    buffer + one f32 block (a concatenate would double the corpus). At MS
    MARCO scale both copies don't fit a 16 GB chip — pick one.
    ``bf16_direct`` stores the 16-bit copy as bf16(f16(x)) — the binmax
    kernel's storage dtype, same values the f16 scan computes with — so an
    8.9M binmax run fits without a second 13.7 GB buffer."""
    gen = make_generators(dim, block)
    n_blocks = -(-rows // block)
    padded = n_blocks * block
    scale = jnp.float32(1.0 / 127.0)  # normalized rows → |x| <= 1
    f16_dtype = jnp.bfloat16 if bf16_direct else jnp.float16

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_int8(buf, b, i):
        q = jnp.clip(jnp.round(b / scale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, q, (i * block, 0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_f16(buf, b, i):
        # via f16 even in bf16_direct mode: identical stored values either way
        return jax.lax.dynamic_update_slice(
            buf, b.astype(jnp.float16).astype(f16_dtype), (i * block, 0))

    values = jnp.zeros((padded, dim), jnp.int8) if keep_int8 else None
    rescore = jnp.zeros((padded, dim), f16_dtype) if keep_f16 else None
    for i in range(n_blocks):
        b = gen(i)
        if keep_int8:
            values = fill_int8(values, b, i)
        if keep_f16:
            rescore = fill_f16(rescore, b, i)
    # padded tail rows stay zero → scores exactly 0.0, which DOES land in
    # a deep top-k on clustered corpora (the rank-1000 score is often < 0):
    # every search below masks them via n_valid=rows
    jax.block_until_ready(values if keep_int8 else rescore)
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


def timed_qps(fn, queries, corpus_args, iters: int, reps: int = 3,
              dispatch_reps: int = 1):
    """Seed-chained timing (bench.py protocol): each dispatch's input depends
    on the previous output scalar; one final fetch bounds the chain.

    ``dispatch_reps`` runs N scans inside ONE dispatch (fori_loop): the
    tunnel's ~2-3 ms per-dispatch overhead dominates short scans (a 1.11M
    binmax scan is ~3.3 ms on-device but ~5.6 ms per solo dispatch), so
    this measures saturated device throughput — what a served query stream
    sees — vs the dispatch-bound floor at dispatch_reps=1.

    The corpus arrays MUST flow through as jit arguments — a closure would
    embed gigabytes as jaxpr constants and the remote-compile payload breaks
    the tunnel ("Broken pipe")."""

    @jax.jit
    def step(q, seed, *corpus):
        def body(_, s):
            # consume BOTH outputs in full: XLA narrows top_k to k'=1 when
            # only column 0 of one output is used, silently dropping ~all of
            # the selection work from the measurement
            vals, ids = fn(q + s * 1e-12, *corpus)
            return vals.sum() + (ids.sum() % 2).astype(vals.dtype)
        if dispatch_reps == 1:
            return body(0, seed)
        return jax.lax.fori_loop(0, dispatch_reps, body, seed)

    seed = step(queries, jnp.float32(0.0), *corpus_args)  # compile + warm
    _ = float(seed)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            seed = step(queries, seed, *corpus_args)
        s = float(seed)
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    return queries.shape[0] * dispatch_reps / best, s


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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dispatch-reps", type=int, default=1,
                    help="scans per dispatch: >1 measures saturated device "
                         "throughput (amortizes ~2-3ms tunnel dispatch cost)")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument(
        "--configs", default="approx_int8,f16scan",
        help="comma list of: approx_int8, f16scan, f16scan_full, binmax[,_t1024,_t4096], "
        "binmax_int8, twostage_int8, twostage_f16",
    )
    ap.add_argument("--scan-block", type=int, default=557056)
    args = ap.parse_args()
    configs = set(args.configs.split(","))

    print(f"[search-bench] device={jax.devices()[0]} rows={args.rows} dim={args.dim} k={args.k}")
    binmax_cfgs = {c for c in configs
                   if c.startswith("binmax") and not c.startswith("binmax_int8")}
    needs_f16 = bool(configs & {"f16scan", "f16scan_full", "twostage_f16"})
    # binmax_int8* needs the float rows too: binwise absmax quantization
    # (the production FlatIndex path) reads them, not the global-scale int8
    keep_f16 = needs_f16 or bool(binmax_cfgs) or bool(
        {c for c in configs if c.startswith("binmax_int8")})
    # binmax-only runs store bf16 directly: no second 13.7 GB buffer at 8.9M
    bf16_direct = bool(binmax_cfgs) and not needs_f16
    keep_int8 = bool(configs & {"approx_int8", "binmax_int8", "twostage_int8", "twostage_f16"})
    t0 = time.time()
    values, scale, rescore, gen = build_corpus(
        args.rows, args.dim, args.block, keep_f16, keep_int8, bf16_direct=bf16_direct
    )
    queries = make_queries(gen, args.queries, args.dim)
    mem = (f"int8 {values.nbytes/1e9:.1f} GB" if values is not None else "") + (
        f" f16 {rescore.nbytes/1e9:.1f} GB" if rescore is not None else "")
    print(f"[search-bench] corpus built in {time.time()-t0:.0f}s ({mem})")

    results = {"rows": args.rows, "dim": args.dim, "k": args.k, "queries": args.queries}

    # ground truths: f32-exact (absolute) and f16-exact (the parity target —
    # the reference's default index is faiss IndexFlatIP over fp16 vectors)
    true_f32 = None
    if not args.skip_exact:
        t0 = time.time()
        true_f32 = exact_ground_truth(gen, queries, args.rows, args.block, args.k)
        print(f"[search-bench] f32-exact ground truth in {time.time()-t0:.0f}s")
    true_f16 = None
    if rescore is not None and not bf16_direct:
        t0 = time.time()
        _, idx = jax.jit(lambda q, c: f16_scan_topk(
            q, c, args.k, block_size=args.scan_block, approx=False,
            n_valid=args.rows))(queries, rescore)
        true_f16 = np.asarray(idx)
        print(f"[search-bench] f16-exact ground truth in {time.time()-t0:.0f}s")
        if true_f32 is not None:
            results["f16exact_vs_f32exact"] = {
                "recall@10": round(recall_at(true_f16, true_f32, 10), 4),
                f"recall@{args.k}": round(recall_at(true_f16, true_f32, args.k), 4),
            }
            print(f"[search-bench] faiss-fp16 parity line: {results['f16exact_vs_f32exact']}")

    def run(name, fn, corpus_args):
        qps, _ = timed_qps(fn, queries, corpus_args, args.iters,
                           dispatch_reps=args.dispatch_reps)
        _, ids = jax.jit(fn)(queries, *corpus_args)
        ids = np.asarray(ids)
        entry = {"qps": round(qps, 1)}
        for label, truth in (("f32", true_f32), ("f16exact", true_f16)):
            if truth is not None:
                entry[f"recall@10_vs_{label}"] = round(recall_at(ids, truth, 10), 4)
                entry[f"recall@{args.k}_vs_{label}"] = round(recall_at(ids, truth, args.k), 4)
        results[name] = entry
        print(f"[search-bench] {name}: {entry}")

    if "approx_int8" in configs:
        run("approx_int8", lambda q, v, s: quantized_blocked_topk(
            q, v, s, args.k, block_size=args.block, approx=True, recall_target=0.95,
            n_valid=args.rows), (values, scale))
    if "f16scan" in configs:
        run("f16scan", lambda q, c: f16_scan_topk(
            q, c, args.k, block_size=args.scan_block, n_valid=args.rows), (rescore,))
    if "f16scan_full" in configs:
        run("f16scan_full", lambda q, c: f16_scan_topk(
            q, c, args.k, block_size=None, n_valid=args.rows), (rescore,))
    if binmax_cfgs:
        # fused Pallas candidate scan (ops/mips_binmax.py): scores never hit
        # HBM; corpus already padded to a tile multiple by build_corpus.
        # Mosaic has no f16 type — the kernel takes a bf16 corpus (same scores
        # as the f16 scan, which casts f16→bf16 pre-matmul anyway).
        if bf16_direct:
            bf16_corpus = rescore
        else:
            bf16_corpus = jax.jit(lambda c: c.astype(jnp.bfloat16))(rescore)
            jax.block_until_ready(bf16_corpus)
        for cfg in sorted(binmax_cfgs):
            tile = int(cfg.split("_t")[1]) if "_t" in cfg else 2048
            run(cfg, functools.partial(
                lambda q, c, t: binmax_scan_topk(q, c, args.k, n_valid=args.rows, tile_rows=t),
                t=tile), (bf16_corpus,))
    if {c for c in configs if c.startswith("binmax_int8")}:
        # fused int8 candidate kernel: MXU double-rate int8 dots at half the
        # HBM corpus traffic, absmax bin scales exactly like FlatIndex's
        # production path (quantize_corpus_binwise). The build_corpus int8
        # buffer's global 1/127 scale assumes |x| <= 1 while normalized
        # 768-dim rows peak at ~0.15 — 2.7 wasted bits that measured
        # recall@1000 0.912; true bin absmax restores the envelope.
        if rescore is not None:
            # binwise absmax quantization ON DEVICE, block-wise (layout
            # identical to ops/mips_quant.quantize_corpus_binwise — that host
            # path costs minutes here because it first pulls the corpus
            # through the TPU tunnel; production FlatIndex quantizes host
            # vectors it already owns, so it never pays that transfer)
            qblk = 131072  # multiple of the 128-row bin width

            @jax.jit
            def quant_block(r):
                v = r.astype(jnp.float32)
                s = jnp.maximum(
                    jnp.abs(v).reshape(-1, 128, v.shape[1]).max(axis=(1, 2))
                    / 127.0, 1e-10)
                q = jnp.clip(jnp.round(v / jnp.repeat(s, 128)[:, None]),
                             -127, 127).astype(jnp.int8)
                return q, s[:, None]

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def fill_q(vbuf, sbuf, qv, qs, i):
                return (jax.lax.dynamic_update_slice(vbuf, qv, (i * qblk, 0)),
                        jax.lax.dynamic_update_slice(sbuf, qs, (i * qblk // 128, 0)))

            n_rows = rescore.shape[0]  # already padded to a bin multiple
            v8 = jnp.zeros((n_rows, args.dim), jnp.int8)
            cscales = jnp.zeros((n_rows // 128, 1), jnp.float32)
            for i in range(-(-n_rows // qblk)):
                blk = jax.lax.dynamic_slice_in_dim(
                    rescore, i * qblk, min(qblk, n_rows - i * qblk), axis=0)
                qv, qs = quant_block(blk)
                v8, cscales = fill_q(v8, cscales, qv, qs, i)
            jax.block_until_ready(v8)
        else:
            v8 = values
            cscales = jnp.full((values.shape[0] // 128, 1), float(scale), jnp.float32)
        if "binmax_int8" in configs:
            run("binmax_int8", lambda q, v, s: binmax_scan_topk(
                q, v, args.k, n_valid=args.rows, corpus_scales=s), (v8, cscales))
        if "binmax_int8_rescore" in configs:
            # int8 binmax candidates + exact rescore of the SAME int8 codes
            # (f32 query, per-row dequant) — recall parity at ~zero memory
            # over the int8 corpus (ops/mips_binmax.binmax_rescore_topk)
            from matchmaker_tpu.ops.mips_binmax import binmax_rescore_topk

            run("binmax_int8_rescore", lambda q, v, s: binmax_rescore_topk(
                q, v, s, args.k, oversample=args.oversample, n_valid=args.rows),
                (v8, cscales))
        if "binmax_int8_bf16q" in configs:
            # MIXED kernel: bf16 query × in-kernel-dequantized int8 codes —
            # bf16-scan recall at int8 memory/HBM traffic, no gather stage
            run("binmax_int8_bf16q", lambda q, v, s: binmax_scan_topk(
                q, v, args.k, n_valid=args.rows, corpus_scales=s,
                mixed_queries=True), (v8, cscales))
    if "twostage_int8" in configs:
        run("twostage_int8", lambda q, v, s: twostage_exact_topk(
            q, v, s, args.k, oversample=args.oversample, block_size=args.block,
            recall_target=0.95, rescore_corpus=None), (values, scale))
    if "twostage_f16" in configs:
        run("twostage_f16", lambda q, v, s, r: twostage_exact_topk(
            q, v, s, args.k, oversample=args.oversample, block_size=args.block,
            recall_target=0.95, rescore_corpus=r), (values, scale, rescore))

    # the v5e-8 merge cost: exact top-k over (Q, 8k) partials + the id
    # gather (timed_qps consumes both outputs, which keeps the full sort +
    # take_along_axis in the measurement — the honest merge cost)
    rng0 = np.random.default_rng(0)
    partials = jnp.asarray(rng0.normal(size=(args.queries, args.k * 8)).astype(np.float32))
    part_ids = jnp.asarray(rng0.integers(0, 2**24, size=(args.queries, args.k * 8)).astype(np.int32))

    def merge(q, p, pid):
        v, pos = jax.lax.top_k(p + q[:, :1] * 0, args.k)
        return v, jnp.take_along_axis(pid, pos, axis=1)

    merge_qps, _ = timed_qps(merge, queries, (partials, part_ids), args.iters)
    results["merge_8shard_qps"] = round(merge_qps, 1)
    print(f"[search-bench] 8-shard merge alone (honest, ids gathered): {merge_qps:.0f} QPS equivalent")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
