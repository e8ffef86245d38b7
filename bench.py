"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric (matches the reference's, BASELINE.md): corpus-encoding
throughput in passages/s for a DistilBERT-class BERT_DOT encoder (batch
encode, bf16 on the MXU), vs the reference's best published number
(6,900 psg/s, ONNX fp16 on an A40 — documentation/dense_retrieval_evaluate.md:22).
Also measures exhaustive-search QPS over a 1M-vector int8 corpus with the
blocked quantized MIPS kernel ("extra" field).

Tunnel-aware methodology: the remote-TPU link has ~35 ms dispatch latency and
an async block_until_ready, so timing chains each iteration's input on the
previous output (serializing real execution) and ends with one tiny
device→host read. The persistent compile cache amortizes the slow remote
compile across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def bench_encode(jax, batch_size=1024, seq_len=128, n_iters=10):
    import jax.numpy as jnp

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig

    # norms_in_compute_dtype: bf16 LayerNorms/residuals on the inference
    # encode path (+2.8% measured; benchmarks/encode_sweep.py).
    # fused_attention: whole-layer Pallas kernels (attention half + MLP half,
    # ops/fused_attention.py) — +26% measured (12.2k vs 9.7k psg/s): logits
    # and the FF intermediate never touch HBM, LayerNorms fused in-kernel.
    # int8_mlp: the MLP half's two dots in int8 on the MXU (~2× bf16 rate,
    # ops/fused_int8.py) — +15% measured (13.6k vs 11.8k psg/s) at per-layer
    # cosine ≥ 0.9999 vs f32 (tests/test_fused_encoder.py) and unchanged
    # retrieval metrics through the e2e CLI drive; the TPU-native analog of
    # the reference's ONNX-quantized inference ladder (utils/onnx_helper.py).
    model = BertDot(
        encoder_cfg=EncoderConfig.distilbert(
            norms_in_compute_dtype=True, fused_attention=True, int8_mlp=True
        ),
        return_vecs=False, compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1000, 29000, size=(batch_size, seq_len)).astype(np.int32)
    mask = np.ones((batch_size, seq_len), np.float32)
    batch = {"query_ids": ids[:, :32], "query_mask": mask[:, :32], "doc_ids": ids, "doc_mask": mask}
    log("init params (distilbert) on device")
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    @jax.jit
    def encode_step(params, ids, mask, seed):
        # fold the seed into the ids so chained calls serialize real execution
        shifted = jnp.where(ids > 0, ids + seed % 2, ids)
        reps = model.apply({"params": params}, shifted, mask, "doc", method=BertDot.encode)
        return jnp.abs(reps).sum().astype(jnp.int32)

    ids_d = jax.device_put(ids)
    mask_d = jax.device_put(mask)
    log("compiling encode (may take minutes on a cold cache)")
    t0 = time.perf_counter()
    seed = encode_step(params, ids_d, mask_d, jnp.int32(0))
    _ = int(np.asarray(seed))
    log(f"encode compiled+warm in {time.perf_counter() - t0:.1f}s")

    start = time.perf_counter()
    for _ in range(n_iters):
        seed = encode_step(params, ids_d, mask_d, seed)
    _ = int(np.asarray(seed))  # forces the whole chain
    elapsed = time.perf_counter() - start
    return batch_size * n_iters / elapsed


def bench_search(jax, n_corpus=1_048_576, dim=768, q_batch=256, k=1000, n_iters=10):
    """Returns (approx int8 QPS, f16-scan QPS, fused binmax QPS) over 1M."""
    import jax.numpy as jnp

    from matchmaker_tpu.ops.mips_binmax import binmax_scan_topk
    from matchmaker_tpu.ops.mips_f16 import f16_scan_topk
    from matchmaker_tpu.ops.mips_quant import quantized_blocked_topk

    log("building 1M int8 + f16 corpora on device")
    values = jax.jit(
        lambda key: jax.random.randint(key, (n_corpus, dim), -127, 127, dtype=jnp.int8)
    )(jax.random.PRNGKey(0))
    scales = jnp.float32(0.01)  # global-scale mode: scale-free top-k
    f16_corpus = jax.jit(lambda v: (v.astype(jnp.float16) * scales))(values)
    queries = jax.random.normal(jax.random.PRNGKey(1), (q_batch, dim), dtype=jnp.float32)

    def timed(step, *corpus):
        t0 = time.perf_counter()
        seed = step(queries, jnp.float32(0.0), *corpus)
        _ = float(np.asarray(seed))
        log(f"compiled+warm in {time.perf_counter() - t0:.1f}s")
        start = time.perf_counter()
        for _ in range(n_iters):
            seed = step(queries, seed, *corpus)
        _ = float(np.asarray(seed))
        return q_batch * n_iters / (time.perf_counter() - start)

    # corpora flow through as jit ARGUMENTS: a closure would embed gigabytes
    # as jaxpr constants and break the remote-compile tunnel
    @jax.jit
    def approx_step(q, seed, values, scales):
        # both outputs fully consumed: XLA otherwise narrows the top-k to the
        # consumed columns and the timing drops most of the selection work
        vals, ids = quantized_blocked_topk(
            q + seed * 1e-9, values, scales, k=k, block_size=262144, approx=True
        )
        return vals.sum() + (ids.sum() % 2).astype(jnp.float32)

    @jax.jit
    def parity_step(q, seed, corpus):
        # recall-parity config: full-width bf16 scan over the f16 corpus —
        # parity vs the reference's fp16 IndexFlatIP ranking (ops/mips_f16.py)
        vals, ids = f16_scan_topk(q + seed * 1e-9, corpus, k=k, block_size=None)
        return vals.sum() + (ids.sum() % 2).astype(jnp.float32)

    @jax.jit
    def binmax_step(q, seed, corpus):
        # fused Pallas candidate kernel (ops/mips_binmax.py): the production
        # engine — recall@1000 0.9967 vs f32-exact at the highest QPS
        vals, ids = binmax_scan_topk(q + seed * 1e-9, corpus, k=k)
        return vals.sum() + (ids.sum() % 2).astype(jnp.float32)

    log("compiling approx int8 search")
    qps_approx = timed(approx_step, values, scales)
    log(f"approx int8 search qps: {qps_approx:.1f}")
    log("compiling f16-scan recall-parity search")
    qps_parity = timed(parity_step, f16_corpus)
    log(f"f16-scan recall-parity qps: {qps_parity:.1f}")
    log("compiling fused binmax search")
    bf16_corpus = jax.jit(lambda c: c.astype(jnp.bfloat16))(f16_corpus)
    qps_binmax = timed(binmax_step, bf16_corpus)
    log(f"fused binmax qps: {qps_binmax:.1f}")
    return qps_approx, qps_parity, qps_binmax


def main() -> None:
    import jax

    log(f"devices: {jax.devices()}")
    psg_per_s = bench_encode(jax)
    log(f"encode throughput: {psg_per_s:.1f} psg/s")
    try:
        qps, qps_parity, qps_binmax = bench_search(jax)
    except Exception as e:
        log(f"search bench failed: {e}")
        qps = qps_parity = qps_binmax = float("nan")

    baseline = 6900.0  # reference best encoding psg/s (A40, ONNX fp16)
    print(
        json.dumps(
            {
                "metric": "bert_dot_encode_throughput",
                "value": round(psg_per_s, 1),
                "unit": "passages/s",
                "vs_baseline": round(psg_per_s / baseline, 3),
                "extra": {
                    "exhaustive_search_qps_1M_corpus": round(qps, 1),
                    "recall_parity_f16scan_qps_1M_corpus": round(qps_parity, 1),
                    "binmax_fused_qps_1M_corpus": round(qps_binmax, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
