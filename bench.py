"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric (matches the reference's, BASELINE.md): corpus-encoding
throughput in passages/s for a DistilBERT-class BERT_DOT encoder (batch
encode, bf16 on the MXU), vs the reference's best published number
(6,900 psg/s, ONNX fp16 on an A40 — documentation/dense_retrieval_evaluate.md:22).
Also measures exhaustive-search QPS over a 1M-vector corpus with the blocked
MIPS kernel ("extra" field).

Measurement methodology: the remote-TPU tunnel has ~35 ms per-dispatch latency
and an async `block_until_ready`, so each benchmark runs its whole iteration
loop inside ONE jitted `lax.scan` and is timed by a single small device→host
read that depends on every iteration's result.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compile cache: remote (tunnel) compiles cost minutes; cache them
# across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def bench_encode(jax, batch_size=256, seq_len=128, n_iters=10):
    import jax.numpy as jnp

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig

    model = BertDot(
        encoder_cfg=EncoderConfig.distilbert(), return_vecs=False, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1000, 29000, size=(batch_size, seq_len)).astype(np.int32)
    mask = np.ones((batch_size, seq_len), np.float32)
    batch = {"query_ids": ids[:, :32], "query_mask": mask[:, :32], "doc_ids": ids, "doc_mask": mask}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    @jax.jit
    def encode_loop(params, ids, mask):
        def body(carry, _):
            # fold the previous checksum into the input so iterations can't be
            # collapsed or reordered by the compiler
            shifted = ids + (carry.astype(jnp.int32) % 2)
            reps = model.apply({"params": params}, shifted, mask, "doc", method=BertDot.encode)
            return jnp.abs(reps).sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return total

    _ = float(np.asarray(encode_loop(params, ids, mask)))  # compile + warm
    start = time.perf_counter()
    _ = float(np.asarray(encode_loop(params, ids, mask)))
    elapsed = time.perf_counter() - start
    return batch_size * n_iters / elapsed


def bench_search(jax, n_corpus=1_000_000, dim=768, q_batch=64, k=1000, n_iters=10):
    import jax.numpy as jnp

    from matchmaker_tpu.ops.mips import blocked_topk_scores

    corpus = jax.random.normal(jax.random.PRNGKey(0), (n_corpus, dim), dtype=jnp.bfloat16)
    queries = jax.random.normal(jax.random.PRNGKey(1), (q_batch, dim), dtype=jnp.float32)

    @jax.jit
    def search_loop(q, c):
        def body(carry, _):
            vals, idx = blocked_topk_scores(q + carry, c.astype(jnp.float32), k=k, block_size=131072)
            return vals.mean() * 1e-9, None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return total

    _ = float(np.asarray(search_loop(queries, corpus)))
    start = time.perf_counter()
    _ = float(np.asarray(search_loop(queries, corpus)))
    elapsed = time.perf_counter() - start
    return q_batch * n_iters / elapsed


def main() -> None:
    import jax

    psg_per_s = bench_encode(jax)
    try:
        qps = bench_search(jax)
    except Exception:
        qps = float("nan")

    baseline = 6900.0  # reference best encoding psg/s (A40, ONNX fp16)
    print(
        json.dumps(
            {
                "metric": "bert_dot_encode_throughput",
                "value": round(psg_per_s, 1),
                "unit": "passages/s",
                "vs_baseline": round(psg_per_s / baseline, 3),
                "extra": {"exhaustive_search_qps_1M_corpus": round(qps, 1)},
            }
        )
    )


if __name__ == "__main__":
    main()
