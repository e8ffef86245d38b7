"""Int8 inference ACCURACY A/B on TRAINED weights (VERDICT r3 weak-4).

Random-weight cosine checks can't expose the failure mode that matters:
trained transformer MLPs grow outlier channels that symmetric per-row absmax
int8 clips hardest. This script takes a REAL trained run folder (e.g. the
TAS-B recipe's student, cli/tasb_recipe.py) and measures, per int8 variant:

  1. CLS-vector cosine vs the bf16-fused encode on a corpus sample, and
  2. the END-TO-END retrieval metric delta (encode → binmax index → search
     → MRR@10/Recall) on the same planted eval set.

Usage:
  python benchmarks/int8_accuracy_ab.py --run <train_run_folder> \
      --collection <collection.tsv> --queries <queries.tsv> --qrels <qrels.txt> \
      [--work-dir /tmp/int8_ab]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import csv
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np

VARIANTS = {
    "bf16_fused": {"encoder_fused_attention": True, "encoder_bf16_norms": True},
    "int8_mlp": {"encoder_fused_attention": True, "encoder_bf16_norms": True,
                 "encoder_int8_mlp": True},
    "int8_full": {"encoder_fused_attention": True, "encoder_bf16_norms": True,
                  "encoder_int8": True},
}


def cls_cosines(run_folder: str, collection: str, n_sample: int = 2048,
                batch: int = 256):
    """Encode a corpus sample under every variant with the SAME trained
    params; cosine of each int8 variant's CLS vectors vs bf16_fused."""
    import jax

    from matchmaker_tpu.data.loaders import single_sequence_loader
    from matchmaker_tpu.distillation.dynamic_teacher import load_teacher

    vecs = {}
    for name, flags in VARIANTS.items():
        model, params, config, tokenizer = load_teacher(run_folder, dict(flags))
        cfg = dict(config)
        cfg["batch_size_inference"] = batch

        @jax.jit
        def encode(params, ids, mask):
            return model.apply({"params": params}, ids, mask, "doc",
                               method=type(model).encode)

        out, seen = [], 0
        for b, ids_ in single_sequence_loader(cfg, tokenizer, collection, "doc"):
            v = np.asarray(encode(params, b["seq_ids"], b["seq_mask"]), np.float32)
            keep = int(b["valid"].sum())
            out.append(v[:keep])
            seen += keep
            if seen >= n_sample:
                break
        vecs[name] = np.concatenate(out, axis=0)[:n_sample]

    ref = vecs["bf16_fused"]
    refn = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    stats = {}
    for name in ("int8_mlp", "int8_full"):
        v = vecs[name]
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        cos = (refn * vn).sum(axis=1)
        stats[name] = {"cos_mean": float(cos.mean()), "cos_min": float(cos.min()),
                       "cos_p01": float(np.percentile(cos, 1))}
    return stats


def retrieval_metrics(run_folder: str, work_dir: str, collection: str,
                      queries: str, qrels: str, variant: str):
    from matchmaker_tpu.cli.dense_retrieval import run as dr_run
    from matchmaker_tpu.config import Config, auto_fill, get_config_single

    base = dict(get_config_single(os.path.join(run_folder, "config.yaml")))
    folder = os.path.join(work_dir, f"retrieval_{variant}")
    os.makedirs(folder, exist_ok=True)
    cfg = Config(auto_fill({
        **base,
        **VARIANTS[variant],
        "trained_model": run_folder,
        "collection_tsv": collection,
        "collection_batch_size": 256,
        "query_batch_size": 64,
        "token_dtype": "float16",
        "token_block_size": 50_000,
        "faiss_index_type": "scann",
        "query_sets": {"ab": {"queries_tsv": queries, "qrels": qrels,
                              "top_n": 100, "binarization_point": 1.0}},
    }))
    rc = dr_run("encode+index+search", cfg, folder)
    if rc != 0:
        raise RuntimeError(f"dense_retrieval failed for {variant}")
    with open(os.path.join(folder, "ab-metrics.csv")) as f:
        rows = list(csv.reader(f))
    out = {}
    for k, v in zip(rows[0], rows[1]):
        try:
            out[k] = float(v)
        except ValueError:
            pass
    return {k: out.get(k) for k in ("MRR@10", "Recall@100", "QueriesRanked")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="trained run folder")
    ap.add_argument("--collection", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--work-dir", default="/tmp/int8_ab")
    ap.add_argument("--cos-sample", type=int, default=2048)
    args = ap.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    result = {"cosines": cls_cosines(args.run, args.collection, args.cos_sample)}
    print(f"[int8-ab] cosines: {json.dumps(result['cosines'])}", flush=True)
    for variant in VARIANTS:
        result[variant] = retrieval_metrics(
            args.run, args.work_dir, args.collection, args.queries, args.qrels, variant
        )
        print(f"[int8-ab] {variant}: {json.dumps(result[variant])}", flush=True)
    with open(os.path.join(args.work_dir, "int8_accuracy_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
