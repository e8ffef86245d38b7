"""Training-step throughput: the reference's hot loop #1 (train.py:319-543).

One jitted step = pos forward + neg forward + Margin-MSE + in-batch negatives
+ backward + grad clip + AdamW, DistilBERT-class BERT_DOT, bf16 compute.
Reports steps/s and triples/s on the real chip (seed-chained timing).

Usage: python benchmarks/train_benchmark.py [--batch 32] [--max-doc 200]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-query", type=int, default=30)
    ap.add_argument("--max-doc", type=int, default=200)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fused", action="store_true",
                    help="fused whole-layer Pallas kernels incl. custom-VJP backward")
    ap.add_argument("--block-b", type=int, default=8,
                    help="fused-kernel batch tile (rows per grid step)")
    ap.add_argument("--ff-chunks", type=int, default=4,
                    help="FF-dim chunks in the fused MLP kernels")
    args = ap.parse_args()

    from matchmaker_tpu.losses import get_loss
    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig
    from matchmaker_tpu.training.optim import build_optimizer
    from matchmaker_tpu.training.train_step import make_train_step

    config = {
        "loss": "margin-mse",
        "train_pairwise_distillation": True,
        "in_batch_negatives": True,
        "in_batch_neg_loss": "margin-mse",
        "gradient_clip_norm": 100.0,
        "max_training_steps": 100_000,
        "optimizer_warmup_steps": 1000,
        "learning_rate": 7e-6,
    }
    enc_cfg = EncoderConfig.distilbert(fused_attention=args.fused,
                                       fused_block_b=args.block_b,
                                       fused_ff_chunks=args.ff_chunks)
    model = BertDot(encoder_cfg=enc_cfg, return_vecs=True,
                    compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    b, mq, md = args.batch, args.max_query, args.max_doc
    batch = {
        "query_ids": rng.integers(1000, 29000, (b, mq)).astype(np.int32),
        "query_mask": np.ones((b, mq), np.float32),
        "doc_pos_ids": rng.integers(1000, 29000, (b, md)).astype(np.int32),
        "doc_pos_mask": np.ones((b, md), np.float32),
        "doc_neg_ids": rng.integers(1000, 29000, (b, md)).astype(np.int32),
        "doc_neg_mask": np.ones((b, md), np.float32),
        "pos_score": rng.normal(size=b).astype(np.float32),
        "neg_score": rng.normal(size=b).astype(np.float32),
        "valid": np.ones(b, np.float32),
    }
    pos = {"query_ids": batch["query_ids"], "query_mask": batch["query_mask"],
           "doc_ids": batch["doc_pos_ids"], "doc_mask": batch["doc_pos_mask"]}
    params = model.init(jax.random.PRNGKey(0), pos)["params"]
    tx = build_optimizer(config, params)
    opt_state = tx.init(params)
    step = make_train_step(model, get_loss(config), tx, config)
    device_batch = {k: jax.device_put(v) for k, v in batch.items()}

    t0 = time.perf_counter()
    params, opt_state, stats = step(params, opt_state, device_batch)
    _ = float(np.asarray(stats["loss"]))
    print(f"[train-bench] compiled+warm in {time.perf_counter()-t0:.1f}s", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            # params/opt_state chaining serializes real execution
            params, opt_state, stats = step(params, opt_state, device_batch)
        _ = float(np.asarray(stats["loss"]))
        best = min(best, (time.perf_counter() - t0) / args.iters)

    # model FLOPs: ~6 * layer-params * tokens (fwd+bwd), 2 encoded docs + q
    layer_params = 42.5e6
    tokens = b * (mq + 2 * md)
    mfu = 6 * layer_params * tokens / best / 197e12
    result = {
        "steps_per_s": round(1 / best, 2),
        "triples_per_s": round(b / best, 1),
        "batch": b,
        "fused": bool(args.fused),
        "bf16_mfu_est": round(mfu, 3),
    }
    print(f"[train-bench] {result}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
