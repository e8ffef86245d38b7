"""Encode-throughput sweep on the real chip: batch size x dtype variants.

Finds the production configuration for the corpus-encoding hot loop
(reference hot loop #2, dense_retrieval.py:224-286 — 8.8M forwards).
Variants:
  - batch size (1024 / 2048 / 4096) at seq 128
  - norms_in_compute_dtype: LayerNorms + residual stream in bf16 instead of
    f32 (inference-only option; training keeps f32 norms = AMP semantics)

Tunnel-aware timing: chained seeds serialize execution, one scalar fetch at
the end (see bench.py docstring). Run: python benchmarks/encode_sweep.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root importable

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def log(msg):
    print(f"[sweep] {msg}", file=sys.stderr, flush=True)


def measure(jax, batch_size, seq_len, bf16_norms, n_iters=10):
    import jax.numpy as jnp

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig.distilbert(norms_in_compute_dtype=bf16_norms)
    model = BertDot(encoder_cfg=cfg, return_vecs=False, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = rng.integers(1000, 29000, size=(batch_size, seq_len)).astype(np.int32)
    mask = np.ones((batch_size, seq_len), np.float32)
    batch = {"query_ids": ids[:, :32], "query_mask": mask[:, :32], "doc_ids": ids, "doc_mask": mask}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    @jax.jit
    def encode_step(params, ids, mask, seed):
        shifted = jnp.where(ids > 0, ids + seed % 2, ids)
        reps = model.apply({"params": params}, shifted, mask, "doc", method=BertDot.encode)
        return jnp.abs(reps).sum().astype(jnp.int32)

    ids_d, mask_d = jax.device_put(ids), jax.device_put(mask)
    t0 = time.perf_counter()
    seed = encode_step(params, ids_d, mask_d, jnp.int32(0))
    _ = int(np.asarray(seed))
    log(f"  compiled+warm in {time.perf_counter() - t0:.1f}s")
    start = time.perf_counter()
    for _ in range(n_iters):
        seed = encode_step(params, ids_d, mask_d, seed)
    _ = int(np.asarray(seed))
    qps = batch_size * n_iters / (time.perf_counter() - start)
    del params, ids_d, mask_d
    return qps


def main():
    import jax

    log(f"devices: {jax.devices()}")
    results = {}
    for batch_size in (1024, 2048, 4096):
        for bf16_norms in (False, True):
            key = f"b{batch_size}_norms{'bf16' if bf16_norms else 'f32'}"
            log(f"variant {key}")
            try:
                qps = measure(jax, batch_size, 128, bf16_norms)
            except Exception as e:  # noqa: BLE001 - report and continue the sweep
                log(f"  FAILED: {e}")
                continue
            results[key] = round(qps, 1)
            log(f"  {qps:.1f} psg/s")
    print(results)


if __name__ == "__main__":
    main()
