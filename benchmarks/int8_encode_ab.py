"""A/B the int8 encode variants on the real chip.

Variants (all fused whole-layer kernels, batch 2048 x seq 128, bf16 MXU
baseline):
  - fused        : bf16 dots (ops/fused_attention.py)       [r3 baseline 12.2k]
  - int8_mlp     : MLP half's two dots int8 (ops/fused_int8.py)
  - int8_full    : MLP + attention Q/K/V/out projections int8

Tunnel-aware timing: chained seeds serialize execution, one scalar fetch at
the end (see bench.py docstring). Run: python benchmarks/int8_encode_ab.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def log(msg):
    print(f"[int8-ab] {msg}", file=sys.stderr, flush=True)


def measure(jax, batch_size, seq_len, cfg_kw, n_iters=10):
    import jax.numpy as jnp

    from matchmaker_tpu.models.bert_dot import BertDot
    from matchmaker_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig.distilbert(norms_in_compute_dtype=True,
                                   fused_attention=True, **cfg_kw)
    model = BertDot(encoder_cfg=cfg, return_vecs=False, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = rng.integers(1000, 29000, size=(batch_size, seq_len)).astype(np.int32)
    mask = np.ones((batch_size, seq_len), np.float32)
    batch = {"query_ids": ids[:, :32], "query_mask": mask[:, :32],
             "doc_ids": ids, "doc_mask": mask}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    @jax.jit
    def encode_step(params, ids, mask, seed):
        shifted = jnp.where(ids > 0, ids + seed % 2, ids)
        reps = model.apply({"params": params}, shifted, mask, "doc",
                           method=BertDot.encode)
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
    variants = {
        "fused_bf16": {},
        "int8_mlp": {"int8_mlp": True},
        "int8_full": {"int8_mlp": True, "int8_attention": True},
    }
    results = {}
    for name, kw in variants.items():
        log(f"variant {name}")
        try:
            qps = measure(jax, 2048, 128, kw)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            log(f"  FAILED: {e}")
            continue
        results[name] = round(qps, 1)
        log(f"  {qps:.1f} psg/s")
    print(results)


if __name__ == "__main__":
    main()
