"""Static teacher scoring: batch-score a triple file → Margin-MSE training file.

Contract: reference distillation/teacher-train-scorer.py:165-243 — reads
``query \t doc_pos \t doc_neg`` triples, scores each pair with a trained
(BERT_CAT-style) teacher, writes ``pos_score \t neg_score \t query \t doc_pos
\t doc_neg`` (the 5-col scored-triple format consumed with
``train_pairwise_distillation: True``).

Usage:
    python -m matchmaker_tpu.cli.score_teacher --teacher <run_folder> \
        --triples in.tsv --out train_scores.tsv [--batch-size 64]
"""

from __future__ import annotations

import os

# persistent XLA compile cache: remote/TPU compiles are expensive; cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import argparse
import sys

import numpy as np

from matchmaker_tpu.data.loaders import device_prefetch, triple_training_loader
from matchmaker_tpu.data.readers import read_triples
from matchmaker_tpu.distillation.dynamic_teacher import load_teacher
from matchmaker_tpu.obs.perf_monitor import PerformanceMonitor


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--teacher", required=True, help="teacher run folder (config.yaml + best-model.flax)")
    parser.add_argument("--triples", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    args = parser.parse_args()

    import jax

    model, params, config, tokenizer = load_teacher(args.teacher)
    cfg = dict(config)
    cfg["batch_size_train"] = args.batch_size
    cfg["train_pairwise_distillation"] = False  # plain 3-col triples in

    @jax.jit
    def score(params, batch):
        from matchmaker_tpu.training.train_step import split_triple_batch

        pos_batch, neg_batch = split_triple_batch(batch)
        return (
            model.apply({"params": params}, pos_batch)["score"],
            model.apply({"params": params}, neg_batch)["score"],
        )

    perf = PerformanceMonitor.get()
    perf.start_block("teacher_scoring")
    texts = read_triples(args.triples)
    n = 0
    with open(args.out, "w", encoding="utf-8") as out:
        loader = triple_training_loader(cfg, tokenizer, args.triples, batch_size=args.batch_size)
        for batch in device_prefetch(loader):
            pos, neg = score(params, batch)
            pos, neg = np.asarray(pos), np.asarray(neg)
            valid = batch["valid"]
            for i in range(len(valid)):
                if valid[i] == 0:
                    continue
                sample = next(texts)
                out.write(f"{pos[i]}\t{neg[i]}\t{sample.query}\t{sample.doc_pos}\t{sample.doc_neg}\n")
                n += 1
    perf.stop_block("teacher_scoring", n)
    perf.print_summary()
    print(f"scored {n} triples -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
