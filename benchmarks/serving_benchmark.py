"""End-to-end serving benchmark: query encode → full-corpus search, one chip.

The user-visible dense-retrieval serving number: a batch of raw token-id
queries goes through the DistilBERT-class query encoder (bf16, bf16 norms)
and the fused binmax search over an MS MARCO-scale bf16 corpus, as TWO jitted
programs pipelined back-to-back (the q vectors never leave HBM).

Measured on v5e (8.9M x 768 corpus, batch 256, k=1000):
  two-program pipeline: 32.0 ms/batch = 8,009 QPS end-to-end
  (enc 14.4 ms + search 23.6 ms, partially pipelined dispatches)
Fusing both stages into ONE program measures 106 ms — an XLA/Mosaic
scheduling pathology when the Pallas grid shares a module with the encoder
(reproduce with --fused); two programs are the production configuration.

The reference has no comparable path — its serving story is PyTorch/ONNX
encode + faiss search across the PCIe boundary.

Usage:
  python benchmarks/serving_benchmark.py --rows 8900000 --batch 256
  python benchmarks/serving_benchmark.py --rows 1113000 --batch 32 --latency
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


def log(msg):
    print(f"[serving] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_900_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--query-len", type=int, default=32)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--latency", action="store_true",
                    help="also measure single-dispatch latency (batch as given)")
    ap.add_argument("--fused", action="store_true",
                    help="run encode+search as ONE program (measured 3x slower "
                         "- XLA/Mosaic scheduling pathology; kept to reproduce)")
    ap.add_argument("--fused-encoder", action="store_true",
                    help="whole-layer Pallas kernels in the query encoder "
                         "(ops/fused_attention.py)")
    ap.add_argument("--int8-encoder", action="store_true",
                    help="fused kernels + int8 MLP dots in the query encoder "
                         "— the production encode config (bench.py's), ~2x "
                         "MXU rate on the MLP half at L=32 query shapes")
    ap.add_argument("--pipeline", type=int, default=0, metavar="N",
                    help="serve N independent batches with double-buffered "
                         "dispatch (encode of batch k+1 enqueued behind search "
                         "of batch k) and report e2e QPS + p50/p99 per-batch "
                         "latency — the production serving loop shape")
    ap.add_argument("--pipeline-depth", type=int, default=4,
                    help="in-flight batches before blocking on the oldest "
                         "(absorbs tunnel-congestion jitter)")
    ap.add_argument("--int8-search", action="store_true",
                    help="MIXED int8 binmax scan (bf16 query x in-kernel-"
                         "dequantized int8 codes, mixed_queries=True) — "
                         "bf16-scan recall at half the corpus HBM traffic. "
                         "The gather-based exact rescore measured 106 ms/"
                         "batch at this geometry (XLA gather pathology); "
                         "the mixed kernel replaces it")
    ap.add_argument("--int8-rescore", action="store_true",
                    help="int8 scan + gathered exact rescore (binmax_"
                         "rescore_topk) — kept to reproduce the gather "
                         "pathology measurement")
    args = ap.parse_args()

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig
    from matchmaker_tpu.ops.mips_binmax import binmax_rescore_topk, binmax_scan_topk

    log(f"device={jax.devices()[0]} rows={args.rows} batch={args.batch} k={args.k}")

    # bf16 corpus, built block-wise on device (one 2-byte copy; 13.7 GB at
    # 8.9M). Pad to the binmax grain (8192): a non-multiple would make
    # binmax_candidates re-pad the whole corpus inside the jit (a second
    # 13.7 GB buffer -> OOM).
    from matchmaker_tpu.ops.mips_binmax import padding_grain

    grain = padding_grain()
    n_pad = -(-args.rows // grain) * grain
    block = 131072

    @jax.jit
    def gen_block(key):
        v = jax.random.normal(key, (block, args.dim), jnp.float32)
        return (v / jnp.linalg.norm(v, axis=1, keepdims=True)).astype(jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, b, i):
        return jax.lax.dynamic_update_slice(buf, b, (i * block, 0))

    t0 = time.time()
    if args.int8_search or args.int8_rescore:
        # int8 bin-scale codes built block-wise on device (block is a
        # multiple of the 128-row bin width): absmax per 128-row bin / 127,
        # exactly quantize_corpus_binwise's layout without a host pass.
        @jax.jit
        def quant_block(key):
            v = jax.random.normal(key, (block, args.dim), jnp.float32)
            v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
            s = jnp.abs(v).reshape(-1, 128, args.dim).max(axis=(1, 2)) / 127.0
            s = jnp.maximum(s, 1e-10)
            codes = jnp.clip(
                jnp.round(v / jnp.repeat(s, 128)[:, None]), -127, 127
            ).astype(jnp.int8)
            return codes, s.reshape(-1, 1)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fill2(cbuf, sbuf, c, s, i):
            return (jax.lax.dynamic_update_slice(cbuf, c, (i * block, 0)),
                    jax.lax.dynamic_update_slice(sbuf, s, (i * block // 128, 0)))

        corpus = jnp.zeros((n_pad, args.dim), jnp.int8)
        scales = jnp.zeros((n_pad // 128, 1), jnp.float32)
        for i in range(-(-n_pad // block)):
            c, s = quant_block(jax.random.fold_in(jax.random.PRNGKey(5), i))
            rows = min(block, n_pad - i * block)
            corpus, scales = fill2(corpus, scales, c[:rows], s[: rows // 128], i)
        jax.block_until_ready(corpus)
        log(f"corpus built in {time.time()-t0:.0f}s ({corpus.nbytes/1e9:.1f} GB int8)")
    else:
        scales = None
        corpus = jnp.zeros((n_pad, args.dim), jnp.bfloat16)
        for i in range(-(-n_pad // block)):
            b = gen_block(jax.random.fold_in(jax.random.PRNGKey(5), i))
            corpus = fill(corpus, b[: min(block, n_pad - i * block)], i)
        jax.block_until_ready(corpus)
        log(f"corpus built in {time.time()-t0:.0f}s ({corpus.nbytes/1e9:.1f} GB bf16)")

    # query encoder: DistilBERT-class, bf16 compute + bf16 norms (inference path)
    model = BertDot(
        encoder_cfg=EncoderConfig.distilbert(
            norms_in_compute_dtype=True,
            fused_attention=args.fused_encoder or args.int8_encoder,
            int8_mlp=args.int8_encoder,
        ),
        return_vecs=False, compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1000, 29000, size=(args.batch, args.query_len)).astype(np.int32)
    mask = np.ones_like(ids, np.float32)
    init_batch = {"query_ids": ids, "query_mask": mask, "doc_ids": ids, "doc_mask": mask}
    params = model.init(jax.random.PRNGKey(0), init_batch)["params"]

    @jax.jit
    def encode_program(params, ids, mask, seed):
        shifted = jnp.where(ids > 0, ids + seed % 2, ids)
        return model.apply({"params": params}, shifted, mask, "query", method=BertDot.encode)

    def run_search(q_vecs, corpus):
        # consume BOTH outputs in full (XLA narrows top_k to consumed columns)
        if args.int8_rescore:
            vals, doc_ids = binmax_rescore_topk(
                q_vecs.astype(jnp.float32), corpus, scales, args.k,
                n_valid=args.rows)
        elif args.int8_search:
            vals, doc_ids = binmax_scan_topk(
                q_vecs, corpus, args.k, n_valid=args.rows,
                corpus_scales=scales, mixed_queries=True)
        else:
            vals, doc_ids = binmax_scan_topk(q_vecs, corpus, args.k, n_valid=args.rows)
        return (jnp.abs(jnp.where(jnp.isfinite(vals), vals, 0.0)).sum()
                + doc_ids.sum() % 2).astype(jnp.int32)

    @jax.jit
    def search_program(q_vecs, corpus):
        return run_search(q_vecs, corpus)

    @jax.jit
    def fused_program(params, ids, mask, seed, corpus):
        shifted = jnp.where(ids > 0, ids + seed % 2, ids)
        q_vecs = model.apply({"params": params}, shifted, mask, "query", method=BertDot.encode)
        return run_search(q_vecs, corpus)

    if args.fused:
        def serve(params, ids, mask, seed, corpus):
            return fused_program(params, ids, mask, seed, corpus)
    else:
        def serve(params, ids, mask, seed, corpus):
            return search_program(encode_program(params, ids, mask, seed), corpus)

    ids_d, mask_d = jax.device_put(ids), jax.device_put(mask)
    t0 = time.time()
    seed = serve(params, ids_d, mask_d, jnp.int32(0), corpus)
    _ = int(seed)
    log(f"compiled+warm in {time.time()-t0:.0f}s")

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            seed = serve(params, ids_d, mask_d, seed, corpus)
        _ = int(seed)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    qps = args.batch / best
    log(f"e2e encode+search: {best*1e3:.2f} ms/batch = {qps:.0f} QPS")

    out = {"rows": args.rows, "batch": args.batch, "k": args.k,
           "e2e_qps": round(qps, 1), "ms_per_batch": round(best * 1e3, 2)}

    if args.pipeline:
        # production serving loop: N INDEPENDENT batches double-buffered —
        # encode of batch k+1 is enqueued while search of batch k executes
        # (async dispatch; the tunnel/host latency hides behind device work).
        # Per-batch latency = submit -> top-k scalar on host.
        n = args.pipeline
        batches = [
            (jax.device_put(rng.integers(1000, 29000,
                size=(args.batch, args.query_len)).astype(np.int32)),
             jax.device_put(mask))
            for _ in range(n)
        ]
        # warm both programs
        _ = int(search_program(encode_program(params, *batches[0], jnp.int32(0)), corpus))
        t_start = time.perf_counter()
        submit, results = [], []
        inflight = []
        for bi, (bids, bmask) in enumerate(batches):
            submit.append(time.perf_counter())
            q = encode_program(params, bids, bmask, jnp.int32(bi))
            inflight.append(search_program(q, corpus))
            if len(inflight) > args.pipeline_depth:  # block on the oldest
                done = inflight.pop(0)
                results.append(int(done))
        while inflight:
            results.append(int(inflight.pop(0)))
        wall = time.perf_counter() - t_start
        # latency per batch: completion observed when its int() returned;
        # approximate per-batch latency by re-running single batches blocked
        lats = []
        for bi, (bids, bmask) in enumerate(batches[: min(n, 20)]):
            t0 = time.perf_counter()
            _ = int(search_program(encode_program(params, bids, bmask,
                                                  jnp.int32(100 + bi)), corpus))
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        out["pipeline_batches"] = n
        out["pipeline_qps"] = round(n * args.batch / wall, 1)
        out["pipeline_ms_per_batch"] = round(wall / n * 1e3, 2)
        out["latency_ms_p50"] = round(lats[len(lats) // 2], 1)
        out["latency_ms_p99"] = round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 1)
        log(f"pipelined {n} batches: {out['pipeline_qps']} QPS e2e "
            f"({out['pipeline_ms_per_batch']} ms/batch), "
            f"p50 {out['latency_ms_p50']} ms / p99 {out['latency_ms_p99']} ms "
            f"(single-batch, incl. tunnel round trip)")

    if args.latency:
        # single-dispatch latency: one cold-queue round trip per batch
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            s = serve(params, ids_d, mask_d, jnp.int32(1), corpus)
            _ = int(s)
            lat.append(time.perf_counter() - t0)
        lat_ms = sorted(x * 1e3 for x in lat)
        out["latency_ms_p50"] = round(lat_ms[len(lat_ms) // 2], 1)
        out["latency_ms_best"] = round(lat_ms[0], 1)
        log(f"latency p50 {out['latency_ms_p50']} ms (incl. ~35 ms tunnel round trip)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
