"""Re-ranking throughput across the model zoo — the efficiency/effectiveness
axis the TK (ECAI'20) / TKL (SIGIR'20) / IDCM (SIGIR'21) papers trade on.

Measures jitted scoring throughput (query-doc pairs/s) per model on the real
chip, bf16 where the model uses a transformer. Short-doc models score
(30, 200)-token pairs; long-doc models (TKL, IDCM, maxP) score 2000-token
documents, matching the reference configs (config/train/models/*.yaml).

Usage: python benchmarks/rerank_benchmark.py [--models knrm,tk,bert_cat,...]
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
import numpy as np

MODEL_CONFIGS = {
    # embedding-family (GloVe-class vocab), short docs
    "knrm": dict(model="knrm", token_embedder_type="embedding", max_doc_length=200, batch=256),
    "tk": dict(model="tk", token_embedder_type="embedding", max_doc_length=200, batch=256,
               extra={"tk_att_heads": 10}),
    "conv_knrm": dict(model="conv_knrm", token_embedder_type="embedding", max_doc_length=200, batch=256),
    # transformer rankers, short docs
    "bert_cat": dict(model="bert_cat", token_embedder_type="huggingface_bpe", max_doc_length=200, batch=64),
    "bert_dot": dict(model="bert_dot", token_embedder_type="huggingface_bpe", max_doc_length=200, batch=64),
    "colbert": dict(model="colbert", token_embedder_type="huggingface_bpe", max_doc_length=200, batch=64),
    # long-document models (2000-token docs, reference tkl.yaml/idcm.yaml)
    "tkl": dict(model="tkl", token_embedder_type="embedding", max_doc_length=2000, batch=32,
                extra={"tk_att_heads": 10}),
    "idcm": dict(model="idcm", token_embedder_type="huggingface_bpe", max_doc_length=2000, batch=8),
}


def bench_model(name: str, iters: int = 20, fused: bool = False):
    from matchmaker_tpu.config import Config, auto_fill
    from matchmaker_tpu.models import example_batch, get_model, init_params

    spec = MODEL_CONFIGS[name]
    config = Config(auto_fill({
        "model": spec["model"],
        "model_input_type": "auto",
        "token_embedder_type": spec["token_embedder_type"],
        "bert_pretrained_model": "distilbert-base-uncased",
        "use_fp16": True,
        "max_query_length": 30,
        "max_doc_length": spec["max_doc_length"],
        "token_embedding_size": 300,
        "_vocab_size": 30522,
        # whole-layer Pallas kernels (ops/fused_attention.py) for the
        # transformer rankers; no-op for the embedding family
        "encoder_bf16_norms": fused,
        "encoder_fused_attention": fused,
        **spec.get("extra", {}),
    }))

    class _Tok:  # vocab-size holder; no text involved
        vocab_size = 30522
        vocab = type("V", (), {"token_to_id": {}})()

    model = get_model(config, _Tok())
    rng = np.random.default_rng(0)
    b = spec["batch"]
    batch = example_batch(config, batch_size=b)
    for key in batch:
        if key.endswith("_ids"):
            batch[key] = rng.integers(1000, 29000, batch[key].shape).astype(np.int32)
    params = init_params(model, config, jax.random.PRNGKey(0))

    @jax.jit
    def score(params, batch):
        return model.apply({"params": params}, batch)["score"].sum()

    device_batch = {k: jax.device_put(v) for k, v in batch.items()}
    t0 = time.perf_counter()
    s = score(params, device_batch)
    _ = float(np.asarray(s))
    compile_s = time.perf_counter() - t0

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            # seed-chain via a mask nudge to serialize execution
            s = score(params, device_batch)
        _ = float(np.asarray(s))
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"pairs_per_s": round(b / best, 1), "batch": b,
            "doc_len": spec["max_doc_length"], "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODEL_CONFIGS))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fused", action="store_true",
                    help="fused whole-layer Pallas kernels for transformer rankers")
    args = ap.parse_args()

    results = {}
    for name in args.models.split(","):
        try:
            results[name] = bench_model(name, args.iters, args.fused)
            print(f"[rerank-bench] {name}: {results[name]}", flush=True)
        except Exception as e:
            print(f"[rerank-bench] {name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
