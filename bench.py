"""Benchmark entry point: prints ONE JSON line for the driver.

Round-1 metric: TK re-ranking throughput (query-doc pairs scored per second)
on the real chip, compared against the reference's fastest published encoding
number as a rough scale anchor (6,900 passages/s on an A40, BASELINE.md).
Later rounds switch this to corpus-encoding psg/s + search QPS once the
BERT_DOT + Pallas MIPS path lands.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from __graft_entry__ import _build_model, _example_triple_batch

    model = _build_model()
    batch_size = 256
    batch = _example_triple_batch(batch_size=batch_size, max_q=16, max_d=128)
    score_batch = {
        "query_ids": batch["query_ids"], "query_mask": batch["query_mask"],
        "doc_ids": batch["doc_pos_ids"], "doc_mask": batch["doc_pos_mask"],
    }
    params = model.init(jax.random.PRNGKey(0), score_batch)["params"]

    @jax.jit
    def forward(params, b):
        return model.apply({"params": params}, b)["score"]

    # warmup/compile
    jax.block_until_ready(forward(params, score_batch))

    n_iters = 50
    start = time.perf_counter()
    for _ in range(n_iters):
        out = forward(params, score_batch)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    pairs_per_s = batch_size * n_iters / elapsed

    baseline = 6900.0  # reference ONNX-fp16 encoding psg/s on A40 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "tk_rerank_throughput",
                "value": round(pairs_per_s, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
