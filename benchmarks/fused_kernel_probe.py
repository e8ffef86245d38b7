"""Decompose the fused train-kernel efficiency (η ≈ 0.70) on the real chip.

docs/tpu_design.md's round-4 roofline pins the train step at 52.5% useful-MFU
and attributes the gap to in-kernel efficiency at the q30/d200 operand
shapes. This probe separates the candidate causes by measuring, per kernel:

  1. bare XLA matmuls at the exact MLP/projection shapes (the hardware
     ceiling for these operands — if THIS is ~0.75, the kernels are done);
  2. the fused forward blocks (attention half, MLP half) and their
     custom-VJP backward kernels, each in isolation;
  3. the same MLP kernels with gelu stubbed to identity (the VPU
     transcendental share: if Mosaic serializes the gelu polynomial with the
     MXU dots, the stub recovers that time);
  4. the attention block with softmax stubbed to a scale (VPU share of the
     softmax exp/renorm);
  5. the plain-XLA reference blocks (what fusion is worth end to end).

All timings chain each iteration's input on the previous output and fetch one
scalar at the end (tunnel-safe, see bench.py). Stubbed variants compute WRONG
math — they exist only to attribute time.

Usage: python benchmarks/fused_kernel_probe.py [--rows 256] [--len 200]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 dense peak


def timeit(fn, x, iters=30, rounds=3):
    """Chained timing: x must be both input and output pytree leaf 0."""
    y = fn(x)
    jnp.asarray(y).ravel()[0].block_until_ready()
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(y)
        _ = float(np.asarray(jnp.asarray(y).ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256, help="batch rows (2B docs at b=128)")
    ap.add_argument("--len", type=int, dest="length", default=200)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import matchmaker_tpu.ops.fused_attention as fa
    import matchmaker_tpu.ops.fused_backward as fb

    B, L, HID, FF, H = args.rows, args.length, 768, 3072, 12
    R = B * L
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, L, HID)).astype(np.float32), dtype=jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.float32)
    w = lambda *s: jnp.asarray(rng.normal(0, 0.02, s).astype(np.float32), dtype=jnp.bfloat16)
    v32 = lambda n: jnp.zeros((n,), jnp.float32)
    w1, w2 = w(HID, FF), w(FF, HID)
    wq, wk, wv, wo = w(HID, HID), w(HID, HID), w(HID, HID), w(HID, HID)
    g = jnp.ones((HID,), jnp.float32)

    flops_mlp = 4 * R * HID * FF          # two matmuls
    flops_attn = 8 * R * HID * HID + 4 * R * L * (HID // H) * H  # 4 proj + 2 inner
    results = {}

    def report(name, t, flops):
        eff = flops / t / PEAK
        results[name] = {"ms": round(t * 1e3, 3), "tflops": round(flops / t / 1e12, 1),
                         "eff_vs_peak": round(eff, 3)}
        print(f"[probe] {name:34s} {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s  ({eff:.2f}x peak)", flush=True)

    # --- 1. bare XLA matmul ceiling at these shapes --------------------------
    x2 = x.reshape(R, HID)

    @jax.jit
    def bare_mlp(x2):
        h = jax.lax.dot_general(x2, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (x2 + o * 1e-3).astype(jnp.bfloat16)

    report("bare_xla_mlp_matmuls_2d", timeit(bare_mlp, x2, args.iters), flops_mlp)

    @jax.jit
    def bare_mlp_3d(x):
        h = jax.lax.dot_general(x, w1, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o = jax.lax.dot_general(h, w2, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (x + o * 1e-3).astype(jnp.bfloat16)

    report("bare_xla_mlp_matmuls_3d", timeit(bare_mlp_3d, x, args.iters), flops_mlp)

    # batched per-head attention inner dots, bare (the small-matmul regime)
    qh = x.reshape(B, L, H, HID // H).transpose(0, 2, 1, 3).reshape(B * H, L, HID // H)

    @jax.jit
    def bare_inner(qh):
        s = jax.lax.dot_general(qh, qh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(s.astype(jnp.bfloat16), qh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return (qh + o * 1e-3).astype(jnp.bfloat16)

    report("bare_xla_attn_inner_batched", timeit(bare_inner, qh, args.iters),
           4 * R * L * (HID // H) * H)

    # --- 2. fused blocks in isolation ---------------------------------------
    @jax.jit
    def f_mlp(x):
        return fa.fused_mlp_block(x, w1, v32(FF), w2, v32(HID), g, v32(HID))

    report("fused_mlp_fwd", timeit(f_mlp, x, args.iters), flops_mlp)

    @jax.jit
    def f_attn(x):
        return fa.fused_attention_block(x, wq, wk, wv, wo, v32(HID), v32(HID),
                                        v32(HID), v32(HID), mask, H, g, v32(HID))

    report("fused_attn_fwd", timeit(f_attn, x, args.iters), flops_attn)

    # backward kernels in isolation (bwd flops ≈ 2x fwd + recompute)
    @jax.jit
    def f_mlp_bwd(x):
        dx = fb._mlp_block_bwd_pallas(x, w1, v32(FF), w2, v32(HID), g, x, x,
                                      1e-12, 8, 4, interpret=False)[0]
        return (x + dx.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)

    report("fused_mlp_bwd", timeit(f_mlp_bwd, x, args.iters),
           int(flops_mlp * 2.5))  # dW2,dh,dW1,dx + z recompute

    @jax.jit
    def f_attn_bwd(x):
        dx = fb._attn_block_bwd_pallas(x, wq, wk, wv, wo, v32(HID), v32(HID),
                                       v32(HID), v32(HID), mask, g, x, x,
                                       H, 1e-12, 8, interpret=False)[0]
        return (x + dx.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)

    report("fused_attn_bwd", timeit(f_attn_bwd, x, args.iters),
           int(flops_attn * 2.4))

    # --- 3. gelu stub (VPU transcendental share of the MLP kernels) ---------
    real_gelu, real_grad = fb._gelu_exact, fb._gelu_grad
    fa._gelu_exact = lambda h: h  # noqa: E731 — probe-only wrong math
    fb._gelu_exact = fa._gelu_exact
    fb._gelu_grad = lambda z: jnp.ones_like(z)  # noqa: E731
    try:
        @jax.jit
        def f_mlp_nogelu(x):
            return fa.fused_mlp_block(x, w1, v32(FF), w2, v32(HID), g, v32(HID))

        report("fused_mlp_fwd_GELU_STUB", timeit(f_mlp_nogelu, x, args.iters), flops_mlp)

        @jax.jit
        def f_mlp_bwd_nogelu(x):
            dx = fb._mlp_block_bwd_pallas(x, w1, v32(FF), w2, v32(HID), g, x, x,
                                          1e-12, 8, 4, interpret=False)[0]
            return (x + dx.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)

        report("fused_mlp_bwd_GELU_STUB", timeit(f_mlp_bwd_nogelu, x, args.iters),
               int(flops_mlp * 2.5))
    finally:
        fa._gelu_exact = real_gelu
        fb._gelu_exact = real_gelu
        fb._gelu_grad = real_grad

    # --- 4. softmax share: LN stub on the attention block -------------------
    # (stubbing softmax needs a kernel edit; the LN stub brackets the other
    #  VPU cost in the same kernel)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
